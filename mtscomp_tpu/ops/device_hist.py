"""Device byte histograms for the encode pipeline.

The encoder needs per-plane 256-bin histograms of the zigzag byte
planes (reference analogue: the zlib stage has no tables, but the rANS
stage's ``quantize_freqs`` input; see codec/ans.py). ``jnp.bincount``
lowers to scatter-add, which serializes on TPU (~0.1 GB/s measured).

TPU-native formulation: **nibble-decomposed one-hot outer products on
the MXU**. For each value ``v = 16*h + l``, ``count[v] = sum_i
onehot16(h_i) x onehot16(l_i)`` — two 16-wide one-hot compares per
value (instead of 256) and a (16, K) @ (K, 16) matmul whose (h, l)
cell counts the pairs. bf16 one-hots are exact (0/1), the MXU
accumulates in f32 (exact below 2^24), and blocks are capped at 2^17
values so per-block counts stay exact; cross-block accumulation is
int32. Measured ~26x faster than bincount on v5e.
"""

import functools

import jax
import jax.numpy as jnp


BLOCK = 1 << 17          # values per scan block (f32-exact: < 2^24)


@jax.jit
def histogram256(v):
    """Exact per-row byte histograms: (N, n) uint8 -> (N, 256) int32."""
    N, n = v.shape
    # Block size adapts to the row length (128-aligned): short rows
    # (e.g. per-channel histograms for segment tables) must not pad to
    # the full 2^17 scan block — that would both waste ~BLOCK/n of the
    # MXU work on zeros and materialize BLOCK-sized one-hot operands
    # per row.
    block = min(BLOCK, max(128, -(-n // 128) * 128))
    nb = max(1, -(-n // block))
    pad = nb * block - n
    vp = jnp.pad(v, ((0, 0), (0, pad)))          # pads land in bin 0
    vb = jnp.moveaxis(vp.reshape(N, nb, block), 1, 0)

    def body(acc, blk):
        hi = jax.nn.one_hot(blk >> 4, 16, dtype=jnp.bfloat16)
        lo = jax.nn.one_hot(blk & 15, 16, dtype=jnp.bfloat16)
        pair = jnp.einsum('nki,nkj->nij', hi, lo,
                          preferred_element_type=jnp.float32)
        return acc + pair.reshape(N, 256).astype(jnp.int32), None

    acc, _ = jax.lax.scan(body, jnp.zeros((N, 256), jnp.int32), vb)
    return acc.at[:, 0].add(-pad)
