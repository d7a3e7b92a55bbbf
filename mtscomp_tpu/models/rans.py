"""Lane-interleaved rANS: the entropy-coding core of format v2.

Design
------
The reference's entropy stage is a sequential zlib stream per chunk
(mtscomp.py:394, 619), which cannot be parallelized *within* a chunk.
This module replaces it with K interleaved rANS streams ("lanes"): symbol
``t`` belongs to lane ``t % K`` at step ``t // K``. All K lanes share one
frequency table, and renormalization words are laid out in **decoder
order** — at each step, the lanes whose state underflows read one 16-bit
word each, in ascending lane order. A vectorized decoder therefore
consumes the payload strictly front-to-back with no per-lane cursors:
it is one masked vector step per K symbols, which is exactly the shape
TPU hardware wants (see ops/device_rans.py for the JAX/Pallas decoders).

Coder parameters (fixed for the format):

- 32-bit states, 16-bit renorm words, state invariant ``[2^16, 2^32)``;
- ``SCALE_BITS = 12`` (frequencies sum to 4096), 256-symbol alphabet;
- per (step, lane) visit, at most ONE word is emitted/read — this is what
  makes the decode step a single masked vector operation.

The encoder walks symbols backward (steps descending), emitting at most
one word per visit *before* each state update; the decoder walks forward,
reading at most one word per visit *after* each state update. The two
word sequences mirror exactly (verified exhaustively in tests).

This file is the host (NumPy) implementation and the normative spec; the
device implementations must match it bit-for-bit.
"""

import numpy as np

SCALE_BITS = 12
SCALE = 1 << SCALE_BITS          # 4096
RANS_L = 1 << 16                 # state lower bound
WORD_BITS = 16
MAX_FREQ = SCALE - 1             # 4096 is expressed as a constant plane instead


def zigzag_encode(values):
    """Map signed integers to small unsigned codes: 0,-1,1,-2,... -> 0,1,2,3,...

    Input may be any integer dtype; it is reinterpreted as the signed type
    of the same width first (wrapped diffs of unsigned data are "small"
    in the signed sense). Returns the unsigned dtype of the same width.
    """
    v = np.asarray(values)
    bits = v.dtype.itemsize * 8
    s = v.view(np.dtype('int%d' % bits)) if v.dtype.kind == 'u' else v
    u = s.view(np.dtype('uint%d' % bits))
    # (s << 1) ^ (s >> (bits - 1)) in modular arithmetic: the arithmetic
    # right shift broadcasts the sign across all bits.
    return (u * np.array(2, u.dtype)) ^ (s >> (bits - 1)).view(u.dtype)


def zigzag_decode(codes, dtype):
    """Inverse of :func:`zigzag_encode`; ``dtype`` is the original dtype."""
    u = np.asarray(codes)
    assert u.dtype.kind == 'u'
    s = (u >> 1).astype(u.dtype)
    out = (s ^ (-(u & 1)).astype(u.dtype)).view(np.dtype('int%d' % (u.dtype.itemsize * 8)))
    return out.view(dtype)


def quantize_freqs(counts, scale_bits=SCALE_BITS):
    """Quantize symbol counts to frequencies summing to ``2**scale_bits``.

    Every present symbol gets frequency >= 1; absent symbols get 0.
    Uses largest-remainder apportionment, then steals from the largest
    buckets if rounding overshoots. Returns ``None`` if only one symbol
    is present (callers should use a constant-plane encoding instead,
    since freq == 4096 does not fit the coder's 12-bit table).
    """
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    assert total > 0
    present = counts > 0
    n_present = int(present.sum())
    if n_present <= 1:
        return None
    scale = 1 << scale_bits
    ideal = counts * scale / total
    freqs = np.floor(ideal).astype(np.int64)
    # Guarantee >= 1 for present symbols.
    freqs[present & (freqs == 0)] = 1
    remainder = int(scale - freqs.sum())
    if remainder > 0:
        # Distribute leftovers to the largest fractional parts.
        frac = np.where(present, ideal - np.floor(ideal), -1.0)
        order = np.argsort(-frac, kind='stable')
        take = order[:remainder]
        freqs[take] += 1
    elif remainder < 0:
        # Steal from the biggest buckets (keeping each >= 1).
        for _ in range(-remainder):
            k = int(np.argmax(freqs))
            assert freqs[k] > 1
            freqs[k] -= 1
    assert freqs.sum() == scale
    assert np.all(freqs[present] >= 1)
    assert np.all(freqs[~present] == 0)
    assert freqs.max() <= MAX_FREQ
    return freqs.astype(np.uint16)


def cumulative_freqs(freqs):
    """Exclusive prefix sum of the frequency table (256 entries, uint32)."""
    cum = np.zeros(256, dtype=np.uint32)
    np.cumsum(freqs[:-1], out=cum[1:])
    return cum


def slot_to_symbol_table(freqs):
    """Dense slot -> symbol lookup of length SCALE (uint8)."""
    return np.repeat(np.arange(256, dtype=np.uint8), freqs.astype(np.int64))


def rans_encode_interleaved(symbols, freqs, n_lanes):
    """Encode a uint8 symbol sequence into K interleaved rANS lanes.

    Returns ``(states, words)``: the K final uint32 states the decoder
    starts from, and the uint16 renorm payload in decoder read order.

    Vectorized over lanes: the backward pass processes one step (K
    symbols) at a time; per-visit emissions are collected per step and
    concatenated in forward order at the end.
    """
    symbols = np.asarray(symbols, dtype=np.uint8)
    n = symbols.size
    K = int(n_lanes)
    assert K >= 1
    n_steps = -(-n // K) if n else 0

    freqs = np.asarray(freqs)
    cum = cumulative_freqs(freqs)
    f_all = freqs.astype(np.uint64)
    c_all = cum.astype(np.uint64)

    x = np.full(K, RANS_L, dtype=np.uint64)
    lane_ids = np.arange(K, dtype=np.int64)
    # words_per_step[s] is the (lanes-ascending) list of words the decoder
    # will read after step s.
    words_per_step = [None] * n_steps

    for s in range(n_steps - 1, -1, -1):
        t0 = s * K
        active = (t0 + lane_ids) < n
        syms = np.zeros(K, dtype=np.int64)
        idx = t0 + lane_ids[active]
        syms[active] = symbols[idx]
        # Padded lanes use f=1 so the (masked-out) update stays well defined.
        f = np.where(active, f_all[syms], np.uint64(1))
        c = c_all[syms]
        # Renormalize before the update: emit the low 16 bits wherever the
        # update would overflow 32 bits.
        emit = active & (x >= (f << np.uint64(20)))
        if emit.any():
            words_per_step[s] = (x[emit] & np.uint64(0xFFFF)).astype(np.uint16)
            x[emit] >>= np.uint64(16)
        else:
            words_per_step[s] = _EMPTY_U16
        # State update (C(x, s) = (x // f) * 4096 + (x % f) + cum).
        upd = (x // f) * np.uint64(SCALE) + (x % f) + c
        x = np.where(active, upd, x)

    words = np.concatenate(words_per_step) if n_steps else _EMPTY_U16
    return x.astype(np.uint32), words


_EMPTY_U16 = np.zeros(0, dtype=np.uint16)


def rans_decode_interleaved(states, words, freqs, n_symbols, n_lanes):
    """Decode ``n_symbols`` uint8 symbols from interleaved rANS lanes.

    This is the normative (host/NumPy) decoder; the device decoders in
    ``ops/device_rans.py`` implement the same step function.
    """
    K = int(n_lanes)
    n = int(n_symbols)
    n_steps = -(-n // K) if n else 0

    freqs = np.asarray(freqs)
    cum = cumulative_freqs(freqs).astype(np.uint64)
    f_all = freqs.astype(np.uint64)
    slot2sym = slot_to_symbol_table(freqs)

    x = np.asarray(states, dtype=np.uint64).copy()
    assert x.size == K
    words = np.asarray(words, dtype=np.uint16)
    lane_ids = np.arange(K, dtype=np.int64)
    out = np.empty(n_steps * K, dtype=np.uint8)
    pos = 0
    for s in range(n_steps):
        active = (s * K + lane_ids) < n
        slot = (x & np.uint64(SCALE - 1)).astype(np.int64)
        sym = slot2sym[slot]
        out[s * K:(s + 1) * K] = sym
        upd = f_all[sym] * (x >> np.uint64(SCALE_BITS)) \
            + slot.astype(np.uint64) - cum[sym]
        x = np.where(active, upd, x)
        # Renormalize after the update: read one word per underflowed lane,
        # lanes ascending.
        need = active & (x < np.uint64(RANS_L))
        cnt = int(need.sum())
        if cnt:
            w = words[pos:pos + cnt].astype(np.uint64)
            x[need] = (x[need] << np.uint64(16)) | w
            pos += cnt
    return out[:n], pos
