"""Random-access indexing oracle: Reader[expr] must equal NumPy arr[expr].

Mirrors the reference's exhaustive indexing tests (tests.py:246-342):
generated slice/tuple/scalar expressions compared element-wise against
ground truth, plus hard-coded ``_chunks_for_interval`` expectations.
"""

import numpy as np
import pytest

from mtscomp_tpu import compress, decompress

from conftest import SAMPLE_RATE, N_CHANNELS, N_SAMPLES, write_arr, to_int16, \
    make_signal


@pytest.fixture(scope='module', params=['zlib', 'ans', 'ans-device'])
def reader_and_arr(request, tmp_path_factory):
    algorithm = request.param.split('-')[0]
    device = 'cpu' if request.param.endswith('device') else None
    tmp = tmp_path_factory.mktemp('idx_%s' % request.param)
    arr = to_int16(make_signal('colored'))
    path = write_arr(tmp / 'data.bin', arr)
    compress(path, tmp / 'data.cbin', tmp / 'data.ch',
             sample_rate=SAMPLE_RATE, n_channels=arr.shape[1],
             dtype=arr.dtype, algorithm=algorithm, quiet=True,
             cache_size=2)
    r = decompress(tmp / 'data.cbin', tmp / 'data.ch', device=device,
                   ans_seg_log2=12)
    yield r, arr
    r.close()


def _check(r, arr, expr):
    try:
        expected = arr[expr]
        failed = False
    except IndexError:
        failed = True
    if failed:
        with pytest.raises(IndexError):
            r[expr]
        return
    got = r[expr]
    assert got.dtype == expected.dtype
    assert got.shape == expected.shape
    assert np.array_equal(got, expected)


def test_slices(reader_and_arr):
    r, arr = reader_and_arr
    ns = arr.shape[0]
    exprs = [
        slice(None, None, None),
        slice(0, ns, None),
        slice(0, 10, None),
        slice(0, 10, 2),
        slice(10, 0, None),        # empty
        slice(5, 5, None),         # empty
        slice(-10, None, None),
        slice(None, -10, None),
        slice(-100000, 100000, None),   # clipped
        slice(1233, 1235, None),   # chunk boundary straddle
        slice(1234, 2468, None),   # exact chunk
        slice(0, ns, 7),
        slice(ns - 1, ns, None),
        slice(6996, 6997, None),   # last sample
    ]
    np.random.seed(21)
    for _ in range(150):
        a = int(np.random.randint(-ns - 10, ns + 10))
        b = int(np.random.randint(-ns - 10, ns + 10))
        step = int(np.random.randint(1, 5))
        exprs.append(slice(a, b, step))
    for expr in exprs:
        _check(r, arr, expr)


def test_numpy_int_slice_fields(reader_and_arr):
    r, arr = reader_and_arr
    for tp in (np.int8, np.int16, np.int32, np.int64, np.uint8):
        _check(r, arr, slice(tp(10), tp(100), None))


def test_tuples(reader_and_arr):
    r, arr = reader_and_arr
    exprs = [
        (slice(None, None, None),),
        (slice(0, 100, None), slice(None, None, None)),
        (slice(0, 100, None), slice(2, 7, None)),
        (slice(0, 100, None), 3),
        (slice(0, 100, 3), slice(None, None, 2)),
        (50, slice(2, 5, None)),
        (50, 3),
        (-1, -1),
    ]
    for expr in exprs:
        _check(r, arr, expr)


def test_scalars(reader_and_arr):
    r, arr = reader_and_arr
    ns = arr.shape[0]
    for item in [0, 1, 100, ns - 1, -1, -10, -ns]:
        _check(r, arr, item)
    with pytest.raises(IndexError):
        r[ns]
    with pytest.raises(IndexError):
        r[ns + 100]


def test_fancy_indexing_unsupported(reader_and_arr):
    r, arr = reader_and_arr
    with pytest.raises(NotImplementedError):
        r[[1, 2, 3]]
    with pytest.raises(NotImplementedError):
        r[np.array([1, 2, 3])]


def test_chunks_for_interval(reader_and_arr):
    r, _ = reader_and_arr
    # chunk_bounds = [0, 1234, 2468, 3702, 4936, 6170, 6997]
    expected = {
        (0, 0): (0, 0),
        (0, 1): (0, 0),
        (0, 1233): (0, 0),
        (0, 1234): (0, 1),
        (1233, 1234): (0, 1),
        (1234, 1234): (1, 1),
        (1234, 2467): (1, 1),
        (1234, 2468): (1, 2),
        (0, 6996): (0, 5),
        (6170, 6996): (5, 5),
        (6169, 6996): (4, 5),
        (4936, 4936): (4, 4),
        (3000, 5000): (2, 4),
        (0, 100000): (0, 5),
    }
    for (i0, i1), pair in expected.items():
        assert r._chunks_for_interval(i0, i1) == pair, (i0, i1)


def test_lru_cache(reader_and_arr):
    r, arr = reader_and_arr
    if r._use_device():
        # Device variant: decoded chunks live in the device LRU instead.
        _ = r[0:10]
        assert r._dev_cache is not None and len(r._dev_cache._cache) >= 1
        return
    r.read_chunk.cache_clear()
    _ = r[0:10]
    _ = r[0:10]
    info = r.read_chunk.cache_info()
    assert info.hits >= 1
    assert info.misses >= 1


def test_window_results_are_safely_writable(reader_and_arr):
    """Mutating a returned window must never corrupt later reads (the
    reference always returns fresh arrays; views of the LRU-cached
    chunks would alias)."""
    r, arr = reader_and_arr
    win = r[10:50]
    win[:] = -1
    again = np.asarray(r[10:50])
    assert np.array_equal(again, np.asarray(arr[10:50], dtype=again.dtype))


def test_bulk_span_path(reader_and_arr):
    """Slices spanning >= _BULK_SPAN_CHUNKS chunks batch-decode into one
    span array (no LRU); results must match the oracle, stay fresh
    (safely writable), and steps/offsets must apply after assembly."""
    from mtscomp_tpu.api import _BULK_SPAN_CHUNKS
    r, arr = reader_and_arr
    assert r.n_chunks >= _BULK_SPAN_CHUNKS + 1
    i1 = int(r.chunk_bounds[_BULK_SPAN_CHUNKS]) + 7
    for expr in (slice(3, i1), slice(3, i1, 5), slice(None)):
        _check(r, arr, expr)
    full = r[:]
    full[:] = -1
    assert np.array_equal(r[:], arr)        # mutation must not alias


@pytest.mark.parametrize('algorithm', ['zlib', 'ans'])
def test_bulk_span_spatial_diff(tmp_path, algorithm):
    """Spatial diff makes the in-place inverse decline its destination
    views (the axis-1 cumsum allocates); the bulk span path must then
    fall back to copying per-chunk results without corruption."""
    arr = to_int16(make_signal('colored'))
    path = write_arr(tmp_path / 'sd.bin', arr)
    compress(path, tmp_path / 'sd.cbin', tmp_path / 'sd.ch',
             sample_rate=SAMPLE_RATE, n_channels=arr.shape[1],
             dtype=arr.dtype, algorithm=algorithm, quiet=True,
             do_spatial_diff=True)
    # cache_size below the span so the bulk path engages (spans that
    # fit the LRU keep the cached per-chunk path).
    r = decompress(tmp_path / 'sd.cbin', tmp_path / 'sd.ch', device='none',
                   cache_size=2)
    try:
        assert np.array_equal(r[:], arr)
        _check(r, arr, slice(5, arr.shape[0] - 3, 2))
    finally:
        r.close()


def test_numpy_asarray_protocol(reader_and_arr):
    """np.asarray(reader) materializes the recording (beyond-reference
    convenience via __array__)."""
    r, arr = reader_and_arr
    got = np.asarray(r)
    assert got.dtype == arr.dtype
    assert np.array_equal(got, arr)
    widened = np.asarray(r, dtype=np.int32)
    assert widened.dtype == np.int32
    assert np.array_equal(widened, arr.astype(np.int32))
