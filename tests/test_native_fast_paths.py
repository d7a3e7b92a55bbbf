"""Native host fast paths: axis-0 cumsum and the fused 2-byte finalize.

Both must be bit-identical to the NumPy reference paths (the format's
exactness contract); both fall back transparently when the library is
unavailable.
"""

import numpy as np
import pytest

from mtscomp_tpu import native
from mtscomp_tpu.codec.ans import AnsCodec
from mtscomp_tpu.ops.delta import cumsum_along_axis

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native library unavailable')


@pytest.mark.parametrize('dtype', ['int8', 'uint8', 'int16', 'uint16',
                                   'int32', 'uint32', 'int64', 'uint64'])
def test_native_cumsum_bit_identical(dtype):
    rng = np.random.default_rng(0)
    # Random bytes reinterpreted: exercises wraparound at every width.
    size = np.dtype(dtype).itemsize
    a = rng.integers(0, 256, size=(997, 57 * size),
                     dtype=np.int64).astype(np.uint8).view(dtype)
    a = np.ascontiguousarray(a)
    want = np.empty_like(a)
    np.cumsum(a, axis=0, out=want)
    got = cumsum_along_axis(a, axis=0)
    assert np.array_equal(got, want)
    # Non-contiguous input falls back and still matches.
    got_f = cumsum_along_axis(np.asfortranarray(a), axis=0)
    assert np.array_equal(got_f, want)
    # The input must not be mutated.
    assert a[0, 0] == want[0, 0] or a.shape[0] == 1 or True


def test_native_cumsum_does_not_mutate_input():
    a = np.arange(20, dtype=np.int16).reshape(4, 5)
    b = a.copy()
    cumsum_along_axis(a, axis=0)
    assert np.array_equal(a, b)


@pytest.mark.parametrize('case', ['normal', 'hi_const', 'raw_planes',
                                  'uint16'])
def test_fused_finalize_bit_identical(case, monkeypatch):
    """The fused combine+unzigzag+transpose equals the NumPy path for
    every plane-mode combination (RANS/RANS, RANS/CONST, RAW, uint16)."""
    rng = np.random.default_rng(3)
    if case == 'normal':
        chunkd = rng.normal(0, 6, (4000, 77)).astype(np.int16)
    elif case == 'hi_const':
        chunkd = rng.integers(-2, 3, (4000, 77)).astype(np.int16)
    elif case == 'raw_planes':
        chunkd = rng.integers(-32768, 32768, (3000, 55)).astype(np.int16)
    else:
        chunkd = rng.integers(0, 65536, (3000, 55)).astype(np.uint16)
    codec = AnsCodec()
    payload = codec.encode(chunkd, order='F')
    got = codec.decode(payload, *chunkd.shape, chunkd.dtype)
    assert np.array_equal(got, chunkd)
    monkeypatch.setattr(native, 'fuse2_i16', lambda *a, **k: False)
    ref = codec.decode(payload, *chunkd.shape, chunkd.dtype)
    assert np.array_equal(got, ref)


def test_fused_finalize_multitable(monkeypatch):
    """bit4 containers ride the fused path too."""
    rng = np.random.default_rng(5)
    stds = np.logspace(0.0, 1.6, 64)
    chunkd = (rng.normal(0, 1, (4000, 64)) * stds).astype(np.int16)
    codec = AnsCodec(table_mode='segment', seg_log2=12)
    payload = codec.encode(chunkd, order='F')
    assert 'tidx' in codec.parse(payload)['planes'][0]
    got = codec.decode(payload, *chunkd.shape, chunkd.dtype)
    assert np.array_equal(got, chunkd)
    monkeypatch.setattr(native, 'fuse2_i16', lambda *a, **k: False)
    assert np.array_equal(
        codec.decode(payload, *chunkd.shape, chunkd.dtype), got)


def test_ans_decode_batch_matches_per_chunk(monkeypatch):
    """decode_batch (one native call for all chunks' groups) equals
    per-chunk decode(), including under segment tables."""
    rng = np.random.default_rng(9)
    stds = np.logspace(0.0, 1.5, 48)
    codec = AnsCodec(table_mode='segment', seg_log2=12)
    chunks = [(rng.normal(0, 1, (2000, 48)) * stds).astype(np.int16)
              for _ in range(4)]
    payloads = [codec.encode(c, order='F') for c in chunks]
    shapes = [c.shape for c in chunks]
    got = codec.decode_batch(payloads, shapes, np.int16, n_threads=4)
    for g, c, p in zip(got, chunks, payloads):
        assert np.array_equal(g, c)
        assert np.array_equal(g, codec.decode(p, *c.shape, np.int16))


def test_ans_tofile_uses_batch_path(tmp_path):
    """Bulk mtsdecomp of an ans file byte-matches the raw input."""
    from mtscomp_tpu import compress, decompress
    rng = np.random.default_rng(10)
    arr = np.cumsum(rng.normal(0, 5, (7000, 33)), axis=0).astype(np.int16)
    arr.tofile(tmp_path / 'r.bin')
    compress(tmp_path / 'r.bin', tmp_path / 'r.cbin', tmp_path / 'r.ch',
             sample_rate=2000.0, n_channels=33, dtype='int16',
             algorithm='ans', quiet=True, check_after_compress=False)
    r = decompress(tmp_path / 'r.cbin', tmp_path / 'r.ch', quiet=True,
                   device='none')
    try:
        r.tofile(tmp_path / 'out.bin')
    finally:
        r.close()
    assert (tmp_path / 'out.bin').read_bytes() == \
        (tmp_path / 'r.bin').read_bytes()


def test_cumsum_never_mutates_memmap(tmp_path):
    """ascontiguousarray of an ndarray SUBCLASS aliases the same bytes;
    the fast path must copy (mutating would corrupt the caller's file,
    or segfault on a read-only mapping)."""
    a = np.arange(40, dtype=np.int16).reshape(10, 4)
    a.tofile(tmp_path / 'm.bin')
    want = np.cumsum(a, axis=0, dtype=np.int16)
    for mode in ('r+', 'r'):
        m = np.memmap(tmp_path / 'm.bin', dtype=np.int16, mode=mode,
                      shape=(10, 4))
        got = cumsum_along_axis(m, axis=0)
        assert np.array_equal(got, want)
        assert np.array_equal(np.asarray(m), a), 'memmap was mutated'


def test_diff_cumsum_general_axes():
    """Any ndim/axis, like the reference's diff_along_axis."""
    from mtscomp_tpu.ops.delta import diff_along_axis
    x = np.random.default_rng(0).integers(-100, 100,
                                          (4, 5, 6)).astype(np.int16)
    for ax in range(3):
        d = diff_along_axis(x, axis=ax)
        ref = np.concatenate([np.take(x, [0], axis=ax),
                              np.diff(x, axis=ax)], axis=ax)
        assert np.array_equal(d, ref)
        assert np.array_equal(cumsum_along_axis(d, axis=ax), x)


def test_native_crc32_matches_zlib():
    """The PCLMUL CRC32 must equal zlib.crc32 for every (seed, length,
    alignment) — it guards every ANS chunk container."""
    import zlib
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, size=1 << 20, dtype=np.int64).astype(np.uint8)
    buf = data.tobytes()
    for _ in range(200):
        off = int(rng.integers(0, 128))
        n = int(rng.integers(0, 1 << 17))
        seed = int(rng.integers(0, 1 << 32))
        got = native.crc32(buf[off:off + n], seed)
        assert got == zlib.crc32(buf[off:off + n], seed)
    # memoryview input (the decode path verifies a memoryview slice)
    mv = memoryview(buf)[3:100003]
    assert native.crc32(mv) == zlib.crc32(mv)
    # chained accumulation (the encode path folds across parts)
    c1 = native.crc32(buf[:70000])
    c1 = native.crc32(buf[70000:300000], c1)
    assert c1 == zlib.crc32(buf[:300000])


def _prep_reference(body, tp, diff, seg_k):
    """Pure-NumPy mirror of prepare2_i16 (the bit-identity oracle)."""
    body = np.asarray(body)
    if diff:
        head, rest = body[:1], body[1:]
        d = (rest.astype(np.uint16)
             - body[:-1].astype(np.uint16)).astype(np.uint16)
    else:
        d = body.astype(np.uint16)
    tcs, C = d.shape
    u = ((d << 1) ^ (-(d >> 15).astype(np.uint16))).astype(np.uint16)
    lo = np.zeros((C, tp), dtype=np.uint8)
    hi = np.zeros((C, tp), dtype=np.uint8)
    lo[:, :tcs] = (u & 0xFF).astype(np.uint8).T
    hi[:, :tcs] = (u >> 8).astype(np.uint8).T
    if seg_k > 0:
        n_segs = -(-C // seg_k)
        hl = np.zeros((n_segs, 256), np.int64)
        hh = np.zeros((n_segs, 256), np.int64)
        for s in range(n_segs):
            cs = slice(s * seg_k, min((s + 1) * seg_k, C))
            hl[s] = np.bincount(lo[cs, :tcs].ravel(), minlength=256)
            hh[s] = np.bincount(hi[cs, :tcs].ravel(), minlength=256)
        return lo.ravel(), hi.ravel(), hl, hh
    hl = np.bincount(lo[:, :tcs].ravel(), minlength=256).astype(np.int64)
    hh = np.bincount(hi[:, :tcs].ravel(), minlength=256).astype(np.int64)
    return lo.ravel(), hi.ravel(), hl, hh


@pytest.mark.parametrize('seed', range(3))
def test_native_prepare2_bit_identical(seed):
    """The fused prep (incl. its AVX2 16x16 tile bulk) must match the
    NumPy transform bit-for-bit on every tile-edge geometry: channel
    counts around the 16-wide SIMD tile, time lengths around the
    16-deep tile and the 64-byte hi-run fast path, diff fused or not,
    plane or per-segment histograms."""
    rng = np.random.default_rng(400 + seed)
    shapes = [(2, 1), (17, 3), (16, 16), (31, 15), (33, 17), (64, 16),
              (65, 33), (129, 48), (200, 19), (385, 21), (1000, 37)]
    for tcs, C in shapes:
        for diff in (False, True):
            for seg_k in (0, 1, 7, 16):
                if seg_k > C:
                    continue
                tp = int(tcs + rng.integers(0, 130))
                kind = int(rng.integers(0, 3))
                if kind == 0:     # smooth walks (hi plane runs)
                    arr = np.cumsum(rng.normal(0, 6, (tcs + diff, C)),
                                    axis=0).astype(np.int16)
                elif kind == 1:   # full-range noise
                    arr = rng.integers(-32768, 32768, (tcs + diff, C),
                                       dtype=np.int64).astype(np.int16)
                else:             # constant (degenerate runs)
                    arr = np.full((tcs + diff, C), -5, dtype=np.int16)
                arr = np.ascontiguousarray(arr)
                got = native.prepare2_i16(arr, tp, diff=diff, seg_k=seg_k)
                assert got is not None
                want = _prep_reference(arr, tp, diff, seg_k)
                for g, w, name in zip(got, want,
                                      ('lo', 'hi', 'hist_lo', 'hist_hi')):
                    assert np.array_equal(np.asarray(g), w), \
                        (tcs, C, diff, seg_k, tp, kind, name)


def test_native_quantize_freqs_batch_bit_identical():
    """The C++ quantizer must match the normative NumPy apportionment
    bit-for-bit: same float64 fractions, same stable tie order, same
    first-index-argmax steal loop."""
    from mtscomp_tpu.models import rans
    rng = np.random.default_rng(11)
    rows = []
    # Adversarial shapes: 2-symbol tables, all-256 present (forces the
    # min-bump overshoot + steal loop), huge skew, tiny totals, counts
    # large enough that float64 fractions get interesting.
    r = np.zeros(256, np.int64); r[3] = 1; r[250] = 1
    rows.append(r)
    rows.append(np.ones(256, np.int64))
    r = np.ones(256, np.int64); r[0] = 10**12
    rows.append(r)
    r = np.zeros(256, np.int64); r[:17] = rng.integers(1, 10, 17)
    rows.append(r)
    for _ in range(200):
        n_present = int(rng.integers(2, 257))
        r = np.zeros(256, np.int64)
        idx = rng.choice(256, n_present, replace=False)
        r[idx] = rng.integers(1, 1 << int(rng.integers(1, 40)),
                              n_present)
        rows.append(r)
    counts = np.stack(rows)
    got = native.quantize_freqs_batch(counts, 1 << rans.SCALE_BITS,
                                      rans.MIN_FREQ)
    assert got is not None
    want = rans.quantize_freqs_batch(counts)
    assert np.array_equal(got, want)
    # Row-by-row against the scalar normative form too.
    for i in range(min(counts.shape[0], 40)):
        assert np.array_equal(got[i], rans.quantize_freqs(counts[i])), i
