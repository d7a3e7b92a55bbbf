"""Pallas TPU kernel: grouped rANS decode at vector-unit speed.

One grid cell decodes one group — GROUP_ROWS (32) segment rows x 128
lanes, one (32, 128) vector — running the scan of ``models/rans.py``
with every data-dependent lookup mapped onto ops Mosaic lowers well:

- **slot -> symbol**: 256-entry coarse bucket table (packed
  ``upper<<8 | dense_id``) + two compare-increments over the *dense*
  alphabet, then one packed dense-table lookup
  (``value<<24 | freq<<12 | cum``). All tables are two (R, 128) rows;
  a lookup is two per-row lane shuffles (``take_along_axis`` on the
  lane axis, the one dynamic gather Mosaic supports) and a select.
- **renorm**: the group's merged word stream is consumed front-to-back;
  lane ranks come from an MXU prefix sum (mask @ upper-triangular ones;
  exact — values <= 128 fit bf16) plus a sublane Hillis-Steele scan of
  row totals, and each lane pulls its word from a window of the stream
  via a row-select shuffle chain. The window is two-tier: a 12-row fast
  path covers typical renorm rates, a full 33-row path the worst case
  (``lax.cond`` on the step's word count).
- **state math**: int32 with logical shifts (values are mod-2^32; the
  unsigned ``x < 2^16`` test becomes ``x >> 16 == 0``).

Group width rationale: Mosaic vector ops cost nearly the same at 8 and
32 sublanes, so (32, 128) groups quarter the per-symbol cost relative
to (8, 128).

Outputs are packed 4 symbols per int32 (u8 stores are off the fast
path on TPU); the caller unpacks with vector shifts.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.rans import SCALE_BITS, LANES, GROUP_ROWS

R = GROUP_ROWS
FAST_ROWS = 12                        # typical-step window
SLOW_ROWS = R * LANES // LANES + 1    # worst case: 128 + R*128 span
WINDOW_ROWS = SLOW_ROWS               # row slack callers must pad


def _srl(x, n):
    return jax.lax.shift_right_logical(x, n)


def _lookup256(t0, t1, idx):
    """Gather from a 256-entry per-row table stored as two (R,128) rows."""
    col = idx & 127
    lo = jnp.take_along_axis(t0, col, axis=1)
    hi = jnp.take_along_axis(t1, col, axis=1)
    return jnp.where(idx < 128, lo, hi)


def _kernel(states_ref, counts_ref, coarse_ref, dense_ref, tri_ref,
            words_ref, out_ref, *, n_steps4):
    x0 = states_ref[0].astype(jnp.int32)                    # (R,128)
    counts = counts_ref[0]                                  # (R,128) i32
    c0 = coarse_ref[0, :, 0, :]
    c1 = coarse_ref[0, :, 1, :]
    d0t = dense_ref[0, :, 0, :]
    d1t = dense_ref[0, :, 1, :]

    lane_col = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    row_id = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)

    def window_gather(n_rows, base, col, wrow):
        window = words_ref[0, pl.ds(base, n_rows), :]
        w = jnp.zeros((R, LANES), jnp.int32)
        for r in range(n_rows):
            cand = jnp.take_along_axis(
                jnp.broadcast_to(window[r:r + 1], (R, LANES)), col, axis=1)
            w = jnp.where(wrow == r, cand, w)
        return w

    def substep(s, x, pos):
        active = (s * LANES + lane_col) < counts
        slot = x & 4095
        # slot -> dense symbol id (coarse bucket + two fixups).
        cp = _lookup256(c0, c1, _srl(slot, 4))
        did = cp & 255
        upper = _srl(cp, 8)
        did = did + jnp.where(slot >= upper, 1, 0)
        pk = _lookup256(d0t, d1t, did)
        upper2 = (pk & 4095) + (_srl(pk, 12) & 4095)
        did = did + jnp.where(slot >= upper2, 1, 0)
        pk = _lookup256(d0t, d1t, did)
        cum = pk & 4095
        f = _srl(pk, 12) & 4095
        val = _srl(pk, 24)
        # rANS inverse update (mod 2^32 in int32).
        x = jnp.where(active, f * _srl(x, SCALE_BITS) + slot - cum, x)
        # Renorm ranks: MXU prefix along lanes + sublane scan of totals.
        need = active & (_srl(x, 16) == 0)
        m = need.astype(jnp.int32)
        inc = jax.lax.dot(m.astype(jnp.float32), tri_ref[...],
                          preferred_element_type=jnp.float32
                          ).astype(jnp.int32)
        row_tot = jnp.broadcast_to(inc[:, 127:128], (R, LANES))
        run = row_tot
        for k in (1, 2, 4, 8, 16):
            rolled = pltpu.roll(run, shift=k, axis=0)
            run = run + jnp.where(row_id >= k, rolled, 0)
        rank = (inc - m) + (run - row_tot)          # exclusive, row-major
        total = jnp.sum(m)
        pos_off = pos & 127
        widx = pos_off + rank
        base = _srl(pos, 7)
        col = widx & 127
        wrow = _srl(widx, 7)
        w = jax.lax.cond(
            pos_off + total <= FAST_ROWS * LANES,
            lambda: window_gather(FAST_ROWS, base, col, wrow),
            lambda: window_gather(SLOW_ROWS, base, col, wrow))
        x = jnp.where(need, (x << 16) | w, x)
        pos = pos + total
        return x, pos, val

    def body(q, carry):
        x, pos = carry
        acc = jnp.zeros((R, LANES), jnp.int32)
        for r4 in range(4):
            x, pos, val = substep(q * 4 + r4, x, pos)
            acc = acc | (val << (8 * r4))
        out_ref[0, pl.ds(q, 1)] = acc[None]
        return x, pos

    jax.lax.fori_loop(0, n_steps4, body, (x0, jnp.int32(0)))


@functools.partial(jax.jit, static_argnames=('n_steps', 'interpret'))
def decode_groups_pallas(states, words_u16, coarse_pk, dense_pk, counts_b,
                         *, n_steps, interpret=False):
    """Decode N groups on TPU; returns (N, 4*ceil(S/4), R, 128) i32 symbols.

    states    (N, R, 128) uint32
    words_u16 (N, WR, 128) uint16 — merged streams, row-padded, with
              >= WINDOW_ROWS rows of slack at the end
    coarse_pk (N, R, 2, 128) int32 — packed coarse tables
    dense_pk  (N, R, 2, 128) int32 — packed dense symbol tables
    counts_b  (N, R, 128) int32 — per-row symbol counts (lane-broadcast)
    """
    N = states.shape[0]
    WR = words_u16.shape[1]
    S4 = -(-max(n_steps, 1) // 4)
    words_i32 = words_u16.astype(jnp.int32)
    # Upper-triangular ones: prefix[l] = sum_{k<=l} m[k] via one matmul.
    tri = (jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
           ).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_kernel, n_steps4=S4),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, R, LANES), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, LANES), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 2, LANES), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 2, LANES), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, LANES), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WR, LANES), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S4, R, LANES),
                               lambda n: (n, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, S4, R, LANES), jnp.int32),
        interpret=interpret,
    )(states.astype(jnp.int32), counts_b, coarse_pk, dense_pk, tri,
      words_i32)
    # Unpack 4 packed symbols per int32 -> (N, 4*S4, R, 128).
    syms = jnp.stack([(jax.lax.shift_right_logical(out, 8 * r) & 255)
                      for r in range(4)], axis=2)
    return syms.reshape(N, S4 * 4, R, LANES)


def pack_device_tables(freqs):
    """Host-side packed tables from a (256,) frequency table.

    Returns (coarse_pk (2,128) int32, dense_pk (2,128) int32).
    """
    freqs = np.asarray(freqs, dtype=np.int64)
    present = np.flatnonzero(freqs)
    f_d = freqs[present]
    upper_d = np.cumsum(f_d)
    cum_d = upper_d - f_d
    dense = np.zeros(256, dtype=np.int64)
    dense[:present.size] = (present << 24) | (f_d << 12) | cum_d
    # coarse: dense id of the symbol containing slot 16*b, with its upper.
    id0 = np.searchsorted(upper_d, np.arange(256) * 16, side='right')
    coarse = (upper_d[id0] << 8) | id0

    def to_i32(a):
        return a.astype(np.uint32).view(np.int32).reshape(2, 128)

    return to_i32(coarse), to_i32(dense)
