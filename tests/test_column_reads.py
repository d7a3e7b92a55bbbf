"""Column-restricted random access: ``r[rows, cols]`` decodes only the
rANS groups covering the selected channels (the reference must inflate
whole chunks). Semantics must match NumPy's exactly — the fast path
falls back for anything it does not replicate bit-for-bit."""

import numpy as np
import pytest

from mtscomp_tpu import compress, decompress

from conftest import write_arr


def make_reader(tmp, ns=6000, nc=385, dtype='int16', chunk=1500.0, **kw):
    # Group granularity is 32 segments x (>=4 channels/segment) = 128+
    # channels per group (aligned_geometry floors k at 4), so partial
    # decode only skips work when C > 128: use the Neuropixels width.
    rng = np.random.default_rng(5)
    if np.dtype(dtype).kind == 'f':
        arr = np.cumsum(rng.normal(0, 1, size=(ns, nc)),
                        axis=0).astype(dtype)
    else:
        arr = np.cumsum(rng.normal(0, 9, size=(ns, nc)),
                        axis=0).astype(dtype)
    path = write_arr(tmp / 'c.bin', arr)
    compress(path, tmp / 'c.cbin', tmp / 'c.ch', sample_rate=chunk,
             n_channels=nc, dtype=dtype, algorithm='ans', quiet=True,
             # Small nominal segments => k=4 channels per segment =>
             # ~97 segments (4 groups) per coded plane at C=385.
             ans_seg_log2=12, **kw)
    r = decompress(tmp / 'c.cbin', tmp / 'c.ch', quiet=True, device='none')
    return r, arr


def fast_path_used(r, rows, cols):
    return r._column_window(rows, cols) is not None


SELECTIONS = [
    3,                      # scalar int -> 1-D result
    -1,                     # negative scalar
    slice(5, 9),            # narrow slice
    slice(370, 500),        # clipped slice
    slice(10, 30, 7),       # stepped slice
    [2],                    # 1-element list
    [5, 99, 31],            # unsorted list
    [7, 7, 3],              # duplicates
    np.array([0, 384]),     # ndarray ends
]


@pytest.mark.parametrize('cols', SELECTIONS,
                         ids=[str(i) for i in range(len(SELECTIONS))])
def test_matches_numpy(tmp_path_, cols):
    r, arr = make_reader(tmp_path_)
    try:
        for rows in (slice(100, 1400), slice(1200, 4100),  # multi-chunk
                     slice(None), slice(300, 1200, 5), slice(-2500, -10)):
            got = r[rows, cols]
            want = arr[rows][:, cols]
            assert got.dtype == want.dtype
            assert got.shape == want.shape
            assert np.array_equal(got, want)
    finally:
        r.close()


def test_fast_path_engages_and_is_exact(tmp_path_):
    r, arr = make_reader(tmp_path_)
    try:
        assert fast_path_used(r, slice(100, 1700), 3)
        got = r._column_window(slice(100, 1700), [4, 9])
        assert np.array_equal(got, arr[100:1700][:, [4, 9]])
        # Results are fresh writable arrays (reference contract).
        got[0, 0] += 1
        assert r[100:1700, 4][0] == arr[100, 4]
    finally:
        r.close()


def test_fallbacks(tmp_path_):
    r, arr = make_reader(tmp_path_)
    try:
        C = r.n_channels
        # Wide selections, bool masks, out-of-range, negative steps:
        # generic path (still correct via materialize-then-slice).
        assert r._column_window(slice(0, 100), slice(None)) is None
        assert r._column_window(slice(0, 100), C + 5) is None
        assert r._column_window(slice(0, 100), [0, C]) is None
        assert r._column_window(slice(0, 100, -1), 3) is None
        mask = np.zeros(C, dtype=bool)
        mask[3] = True
        assert r._column_window(slice(0, 100), mask) is None
        # And the public indexing still matches numpy for those.
        assert np.array_equal(r[0:100, :], arr[0:100])
        assert np.array_equal(r[0:100, mask], arr[0:100, mask])
        with pytest.raises(IndexError):
            r[0:100, C + 5]
    finally:
        r.close()


def test_spatial_diff_declines(tmp_path_):
    # Spatial diff couples channels: columns cannot decode independently.
    r, arr = make_reader(tmp_path_, do_spatial_diff=True)
    try:
        assert r._column_window(slice(0, 500), 3) is None
        assert np.array_equal(r[0:500, 3], arr[0:500, 3])
    finally:
        r.close()


def test_float_bitcast_columns(tmp_path_):
    r, arr = make_reader(tmp_path_, dtype='float32')
    try:
        got = r[100:3000, [2, 64]]
        want = arr[100:3000][:, [2, 64]]
        assert np.array_equal(got.view(np.uint32), want.view(np.uint32))
    finally:
        r.close()


def test_zlib_declines(tmp_path_):
    rng = np.random.default_rng(5)
    arr = np.cumsum(rng.normal(0, 9, size=(4000, 64)),
                    axis=0).astype(np.int16)
    path = write_arr(tmp_path_ / 'z.bin', arr)
    compress(path, tmp_path_ / 'z.cbin', tmp_path_ / 'z.ch',
             sample_rate=1000.0, n_channels=64, dtype='int16',
             algorithm='zlib', quiet=True)
    r = decompress(tmp_path_ / 'z.cbin', tmp_path_ / 'z.ch', quiet=True)
    try:
        assert r._column_window(slice(0, 500), 3) is None
        assert np.array_equal(r[0:500, 3], arr[0:500, 3])
    finally:
        r.close()


def test_corruption_surfaces_on_partial_reads(tmp_path_):
    # parse() verifies the whole-container CRC32, so even a partial
    # decode of an undamaged group must surface payload corruption.
    r, arr = make_reader(tmp_path_)
    out = tmp_path_ / 'c.cbin'
    r.close()
    data = bytearray(out.read_bytes())
    data[len(data) // 2] ^= 0x04
    out.write_bytes(bytes(data))
    r = decompress(out, tmp_path_ / 'c.ch', quiet=True, device='none')
    try:
        with pytest.raises(IOError):
            for c0 in range(0, r.n_chunks):
                a = r.chunk_bounds[c0]
                r[a:a + 10, 3]
    finally:
        r.close()


def test_partial_skips_groups(tmp_path_):
    """The fast path must actually decode fewer groups (the point)."""
    from mtscomp_tpu.io_host import pread_exact
    r, arr = make_reader(tmp_path_)
    try:
        payload = pread_exact(r.cdata, r.chunk_offsets[1], 0)
        parsed = r.codec.parse(payload)
        assert len(parsed['groups']) >= 4
        decoded_groups = []
        orig = type(r.codec)._native_groups

        def probe(parsed_, bufs):
            out = orig(parsed_, bufs)
            decoded_groups.append(len(out))
            return out

        import mtscomp_tpu.codec.ans as ans_mod
        # Save the descriptor itself: restoring the resolved function
        # would turn the staticmethod into a bound method for every
        # later caller.
        old = ans_mod.AnsCodec.__dict__['_native_groups']
        ans_mod.AnsCodec._native_groups = staticmethod(probe)
        try:
            got = r[10:900, 2]
        finally:
            ans_mod.AnsCodec._native_groups = old
        assert np.array_equal(got, arr[10:900, 2])
        assert decoded_groups and decoded_groups[0] < len(parsed['groups'])
    finally:
        r.close()
