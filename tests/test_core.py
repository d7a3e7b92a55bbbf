"""Utility, config, loader, and delta-transform tests.

Mirrors the reference's utils/config test group (tests.py:152-205).
"""

import json

import numpy as np
import pytest

from mtscomp_tpu import (Bunch, load_raw_data, diff_along_axis,
                         cumsum_along_axis, read_config, write_config)
from mtscomp_tpu.config import DEFAULT_CONFIG, CHECK_ATOL
from mtscomp_tpu.format import compute_chunk_bounds

from conftest import write_arr


def test_bunch():
    b = Bunch(a=1)
    b.c = 2
    assert b['a'] == b.a == 1
    assert b['c'] == b.c == 2


def test_default_config():
    config = read_config()
    assert config.algorithm == 'zlib'
    assert config.cache_size == 10
    assert config.check_after_compress
    assert config.check_after_decompress
    assert config.chunk_duration == 1.0
    assert config.chunk_order == 'F'
    assert config.do_time_diff
    # 'auto' probes ans files only; it resolves to the reference
    # default (False) for zlib, preserving byte-identity.
    assert config.do_spatial_diff == 'auto'
    assert config.n_threads >= 1


def test_config_merge(tmp_path_):
    # defaults < user file < kwargs, None skipped.
    write_config(cache_size=20)
    config = read_config()
    assert config.cache_size == 20
    config = read_config(cache_size=None)
    assert config.cache_size == 20
    config = read_config(cache_size=3)
    assert config.cache_size == 3
    # The file holds the merged config.
    saved = json.loads((tmp_path_ / '.mtscomp').read_text())
    assert saved['cache_size'] == 20
    # Unknown keys pass through (permissive merge, reference behavior).
    assert read_config(whatever=1).whatever == 1


def test_default_config_immutable():
    d = dict(DEFAULT_CONFIG)
    d['cache_size'] = 999
    assert read_config().cache_size != 999


@pytest.mark.parametrize('n_channels', [1, 4, 19])
@pytest.mark.parametrize('dt', ['int16', 'float32'])
@pytest.mark.parametrize('mmap', [True, False])
def test_load_raw_data(tmp_path_, n_channels, dt, mmap):
    for ns in (0, 1, 7, 100):
        arr = np.random.normal(size=(ns, n_channels)).astype(dt)
        path = write_arr(tmp_path_ / ('data_%d.bin' % ns), arr)
        loaded = load_raw_data(path, n_channels=n_channels, dtype=dt, mmap=mmap)
        assert loaded.dtype == arr.dtype
        assert loaded.shape == (ns, n_channels)
        assert np.array_equal(loaded, arr)


def test_load_raw_data_errors(tmp_path_):
    path = tmp_path_ / 'bad.bin'
    path.write_bytes(b'\x00' * 7)  # not divisible by itemsize*nc
    with pytest.raises(ValueError):
        load_raw_data(path, n_channels=2, dtype='int16')
    with pytest.raises(AssertionError):
        load_raw_data(path, n_channels=2, dtype=None)


@pytest.mark.parametrize('dt', ['uint8', 'int8', 'int16', 'int32',
                                'float32', 'float64'])
@pytest.mark.parametrize('axis', [0, 1, None])
def test_diff_cumsum_inverse(dt, axis):
    np.random.seed(0)
    scale = 1000 if np.issubdtype(np.dtype(dt), np.integer) else 1.0
    x = (np.random.normal(0, scale, size=(123, 7))).astype(dt)
    d = diff_along_axis(x, axis=axis)
    assert d.shape == x.shape and d.dtype == x.dtype
    back = cumsum_along_axis(d, axis=axis)
    if np.issubdtype(np.dtype(dt), np.integer):
        assert np.array_equal(back, x)
    elif dt == 'float64':
        assert np.allclose(back, x, atol=CHECK_ATOL)
    else:
        # float32 diff+cumsum accumulates rounding error over the chunk.
        assert np.allclose(back, x, rtol=1e-3, atol=1e-3)


def test_diff_keeps_first_row():
    x = np.arange(20, dtype=np.int16).reshape(4, 5)
    d0 = diff_along_axis(x, axis=0)
    assert np.array_equal(d0[0], x[0])
    d1 = diff_along_axis(x, axis=1)
    assert np.array_equal(d1[:, 0], x[:, 0])


def test_diff_wraparound_exact():
    # Integer wraparound: diff/cumsum must be modular, not widening.
    x = np.array([[32760, -32760], [-32760, 32760], [5, -5]], dtype=np.int16)
    d = diff_along_axis(x, axis=0)
    back = cumsum_along_axis(d, axis=0)
    assert np.array_equal(back, x)


def test_chunk_bounds():
    assert compute_chunk_bounds(10, 10.0, 1.0) == [0, 10]
    assert compute_chunk_bounds(25, 10.0, 1.0) == [0, 10, 20, 25]
    assert compute_chunk_bounds(6997, 1234.0, 1.0) == \
        [0, 1234, 2468, 3702, 4936, 6170, 6997]
    assert compute_chunk_bounds(5, 10.0, 1.0) == [0, 5]


def test_decode_identity_normalization():
    """The shared multi-file compatibility predicate: absent v2
    extension keys equal their defaults, representations normalize
    (dtype aliases, 0/1 vs bool), and every key that changes decode
    semantics is in DECODE_IDENTITY_KEYS."""
    from mtscomp_tpu.format import DECODE_IDENTITY_KEYS, decode_identity
    old = dict(algorithm='ans', dtype='<i2', n_channels=19,
               chunk_order='F', do_time_diff=1, do_spatial_diff=0)
    new = dict(algorithm='ans', dtype='int16', n_channels=19,
               chunk_order='F', do_time_diff=True, do_spatial_diff=False,
               time_diff_order=1, float_bitcast=False)
    assert decode_identity(old) == decode_identity(new)
    assert set(decode_identity(old)) == set(DECODE_IDENTITY_KEYS)
    for key, val in [('time_diff_order', 2), ('float_bitcast', True),
                     ('algorithm', 'zlib'), ('dtype', 'int32'),
                     ('n_channels', 20), ('chunk_order', 'C'),
                     ('do_time_diff', False), ('do_spatial_diff', True)]:
        assert decode_identity(dict(old, **{key: val})) != \
            decode_identity(old), key


def test_phase_tracing():
    from mtscomp_tpu.utils import trace
    trace.enable_tracing(True)
    trace.reset_stats()
    with trace.phase('unit-test'):
        pass
    stats = trace.phase_stats()
    trace.enable_tracing(False)
    assert stats['unit-test'][0] == 1
    with trace.phase('off'):
        pass
    assert 'off' not in trace.phase_stats()
