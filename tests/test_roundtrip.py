"""Round-trip tests over array kinds, dtypes, algorithms, and parameters.

Mirrors the reference's core round-trip + parameter-sweep groups
(tests.py:212-243, 499-526) and extends them to the ans (v2) format.
"""

import numpy as np
import pytest

from mtscomp_tpu import Writer, Reader, compress, decompress
from mtscomp_tpu.config import CHECK_ATOL

from conftest import SAMPLE_RATE, N_CHANNELS, write_arr, to_int16


def _roundtrip(tmp_path, arr, algorithm='zlib', **kwargs):
    path = write_arr(tmp_path / 'data.bin', arr)
    out = tmp_path / 'data.cbin'
    outmeta = tmp_path / 'data.ch'
    compress(path, out, outmeta, sample_rate=SAMPLE_RATE,
             n_channels=arr.shape[1], dtype=arr.dtype,
             algorithm=algorithm, quiet=True, **kwargs)
    r = decompress(out, outmeta)
    try:
        dec = r[:]
        assert dec.dtype == arr.dtype
        assert dec.shape == arr.shape
        if np.issubdtype(arr.dtype, np.integer):
            assert np.array_equal(dec, arr)
        else:
            assert np.allclose(dec, arr, atol=10 * CHECK_ATOL)
    finally:
        r.close()
    return out, outmeta


def test_low_level_api(tmp_path_, arr, algorithm):
    arr = to_int16(arr)
    path = write_arr(tmp_path_ / 'data.bin', arr)
    w = Writer(algorithm=algorithm, quiet=True)
    w.open(path, sample_rate=SAMPLE_RATE, n_channels=arr.shape[1],
           dtype=arr.dtype)
    ratio = w.write(None, None)  # default output naming
    w.close()
    assert 0 < ratio <= 1.5
    assert (tmp_path_ / 'data.cbin').exists()
    assert (tmp_path_ / 'data.ch').exists()
    r = Reader(quiet=True)
    r.open(tmp_path_ / 'data.cbin', tmp_path_ / 'data.ch')
    assert r.shape == arr.shape
    assert np.array_equal(r[:], arr)
    r.close()


def test_high_level_float(tmp_path_, arr, algorithm):
    # float64: the diff/cumsum error stays within the CHECK_ATOL contract.
    _roundtrip(tmp_path_, arr.astype(np.float64), algorithm)


def test_float32_roundtrip_no_check(tmp_path_, algorithm):
    # float32 accumulates cumsum rounding beyond the automatic check's
    # tolerance (true of the reference as well, which only exercises
    # float64); verify a loose round trip with checks off.
    np.random.seed(6)
    arr = np.random.normal(size=(2000, 7)).astype(np.float32)
    path = write_arr(tmp_path_ / 'data.bin', arr)
    out, outmeta = tmp_path_ / 'data.cbin', tmp_path_ / 'data.ch'
    compress(path, out, outmeta, sample_rate=SAMPLE_RATE, n_channels=7,
             dtype=arr.dtype, algorithm=algorithm, quiet=True,
             check_after_compress=False)
    r = decompress(out, outmeta)
    assert np.allclose(r[:], arr, rtol=1e-3, atol=1e-3)
    r.close()


def test_int_dtypes(tmp_path_, dtype, algorithm):
    np.random.seed(7)
    info = np.iinfo(dtype)
    arr = np.random.randint(info.min, info.max + 1, size=(997, 5),
                            dtype=dtype)
    _roundtrip(tmp_path_, arr, algorithm)


def test_float64(tmp_path_, algorithm):
    np.random.seed(8)
    arr = np.random.normal(size=(997, 5))
    _roundtrip(tmp_path_, arr, algorithm)


@pytest.mark.parametrize('chunk_duration', [0.01, 0.1, 1.0, 10.0])
def test_chunk_durations(tmp_path_, chunk_duration, algorithm):
    np.random.seed(9)
    arr = to_int16(np.random.normal(size=(2345, 7)))
    _roundtrip(tmp_path_, arr, algorithm, chunk_duration=chunk_duration)


@pytest.mark.parametrize('ns,nc', [(1, 1), (1, 10), (10, 1), (100, 100),
                                   (6997, 19)])
def test_shapes(tmp_path_, ns, nc, algorithm):
    np.random.seed(10)
    arr = to_int16(np.random.normal(size=(ns, nc)))
    _roundtrip(tmp_path_, arr, algorithm)


@pytest.mark.parametrize('ns,nc', [(0, 1), (0, 10), (10, 0), (0, 0)])
def test_empty_raises(tmp_path_, ns, nc):
    arr = np.zeros((ns, nc), dtype=np.int16)
    path = tmp_path_ / 'data.bin'
    path.write_bytes(arr.tobytes())
    with pytest.raises((AssertionError, ValueError, ZeroDivisionError)):
        compress(path, tmp_path_ / 'o.cbin', tmp_path_ / 'o.ch',
                 sample_rate=SAMPLE_RATE, n_channels=nc,
                 dtype=np.int16, quiet=True)


@pytest.mark.parametrize('do_time_diff', [False, True])
@pytest.mark.parametrize('do_spatial_diff', [False, True])
def test_diff_flags(tmp_path_, do_time_diff, do_spatial_diff, algorithm):
    np.random.seed(11)
    arr = to_int16(np.random.normal(size=(1000, 13)))
    _roundtrip(tmp_path_, arr, algorithm,
               do_time_diff=do_time_diff, do_spatial_diff=do_spatial_diff)


@pytest.mark.parametrize('chunk_order', ['C', 'F'])
def test_chunk_orders(tmp_path_, chunk_order, algorithm):
    np.random.seed(12)
    arr = to_int16(np.random.normal(size=(1000, 13)))
    _roundtrip(tmp_path_, arr, algorithm, chunk_order=chunk_order)


@pytest.mark.parametrize('n_threads', [1, 2, 4, None])
def test_n_threads(tmp_path_, n_threads, algorithm):
    np.random.seed(13)
    arr = to_int16(np.random.normal(size=(3000, 11)))
    _roundtrip(tmp_path_, arr, algorithm, n_threads=n_threads)


@pytest.mark.parametrize('ans_seg_log2', [7, 9, 12, 17, 24])
def test_ans_segment_sizes(tmp_path_, ans_seg_log2):
    np.random.seed(14)
    arr = to_int16(np.random.normal(size=(2000, 9)))
    _roundtrip(tmp_path_, arr, 'ans', ans_seg_log2=ans_seg_log2)


def test_npy_roundtrip(tmp_path_, algorithm):
    # 3D .npy arrays are flattened to 2D; the original shape is in .ch.
    np.random.seed(15)
    arr = np.random.randint(-1000, 1000, size=(10, 311, 13), dtype=np.int16)
    path = tmp_path_ / 'data.npy'
    np.save(path, arr)
    out = tmp_path_ / 'data.cnpy'
    outmeta = tmp_path_ / 'data.ch'
    compress(path, out, outmeta, sample_rate=int(SAMPLE_RATE),
             algorithm=algorithm, quiet=True)
    r = decompress(out, outmeta)
    try:
        assert tuple(r.cmeta.shape) == arr.shape
        dec = r[:].reshape(r.cmeta.shape)
        assert np.array_equal(dec, arr)
    finally:
        r.close()


def test_npy_default_naming(tmp_path_):
    np.random.seed(16)
    arr = np.random.randint(-99, 99, size=(500, 7), dtype=np.int16)
    path = tmp_path_ / 'data.npy'
    np.save(path, arr)
    w = Writer(quiet=True)
    w.open(path, sample_rate=SAMPLE_RATE)
    w.write(None, None)
    w.close()
    assert (tmp_path_ / 'data.cnpy').exists()
    assert (tmp_path_ / 'data.ch').exists()


def test_sample_rate_required(tmp_path_):
    arr = np.zeros((100, 3), dtype=np.int16)
    path = write_arr(tmp_path_ / 'data.bin', arr)
    with pytest.raises(ValueError):
        compress(path, sample_rate=None, n_channels=3, dtype='int16',
                 quiet=True)


def test_unsupported_algorithm(tmp_path_):
    with pytest.raises(ValueError):
        Writer(algorithm='lz4')


def test_decompress_pool_concurrent(tmp_path_, algorithm):
    """Overlapping chunk sets through a shared thread pool (reference
    tests.py:413-430): results stay correctly keyed and the LRU holds."""
    np.random.seed(17)
    arr = to_int16(np.random.normal(size=(6000, 7)))
    path = write_arr(tmp_path_ / 'data.bin', arr)
    compress(path, tmp_path_ / 'data.cbin', tmp_path_ / 'data.ch',
             sample_rate=1000.0, n_channels=7, dtype=arr.dtype,
             algorithm=algorithm, quiet=True)
    r = decompress(tmp_path_ / 'data.cbin', tmp_path_ / 'data.ch',
                   cache_size=2, n_threads=4)
    try:
        pool = r.start_thread_pool()
        for ids in (range(0, 4), range(2, 6), range(0, 6), range(5, 6)):
            out = r.decompress_chunks(list(ids), pool)
            assert set(out) == set(ids)
            for idx in ids:
                i0, i1 = r.chunk_bounds[idx], r.chunk_bounds[idx + 1]
                assert np.array_equal(out[idx], arr[i0:i1])
        r.stop_thread_pool()
    finally:
        r.close()


def test_comp_level_is_recorded_not_applied(tmp_path_):
    """Reference quirk (SURVEY §2c.1): comp_level is read and written to
    the sidecar but never passed to deflate — zlib output is
    byte-identical at every level (legacy byte-compat depends on it)."""
    import json
    np.random.seed(23)
    arr = to_int16(np.random.normal(size=(3000, 5)))
    path = write_arr(tmp_path_ / 'data.bin', arr)
    blobs = {}
    for level in (-1, 1, 9):
        out = tmp_path_ / ('l%d.cbin' % level)
        meta = tmp_path_ / ('l%d.ch' % level)
        compress(path, out, meta, sample_rate=1000.0, n_channels=5,
                 dtype=arr.dtype, algorithm='zlib', comp_level=level,
                 quiet=True)
        blobs[level] = out.read_bytes()
        assert json.loads(meta.read_text())['comp_level'] == level
    assert blobs[-1] == blobs[1] == blobs[9]
