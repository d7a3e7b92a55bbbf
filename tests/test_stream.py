"""StreamWriter: live append-as-acquired compression, byte-identical to
batch compress of the same data."""

import hashlib

import numpy as np
import pytest

from mtscomp_tpu import StreamWriter, compress, decompress

from conftest import write_arr, to_int16, make_signal, tmp_path_  # noqa: F401

SR = 2000.0
NC = 11


@pytest.mark.parametrize('algorithm', ['zlib', 'ans'])
def test_stream_matches_batch(tmp_path_, algorithm):
    """Arbitrary block sizes stream to the exact bytes of compress()."""
    arr = to_int16(make_signal('colored', ns=5 * 2000 + 333, nc=NC))
    path = write_arr(tmp_path_ / 'batch.bin', arr)
    compress(path, tmp_path_ / 'batch.cbin', tmp_path_ / 'batch.ch',
             sample_rate=SR, n_channels=NC, dtype='int16',
             algorithm=algorithm, quiet=True)
    rng = np.random.default_rng(3)
    with StreamWriter(tmp_path_ / 'live.cbin', tmp_path_ / 'live.ch',
                      sample_rate=SR, n_channels=NC, dtype='int16',
                      algorithm=algorithm) as w:
        i = 0
        while i < arr.shape[0]:
            n = int(rng.integers(1, 3000))
            w.append(arr[i:i + n])
            i += n
    assert (tmp_path_ / 'live.cbin').read_bytes() == \
        (tmp_path_ / 'batch.cbin').read_bytes()
    import json
    live = json.loads((tmp_path_ / 'live.ch').read_text())
    batch = json.loads((tmp_path_ / 'batch.ch').read_text())
    assert live == batch
    r = decompress(tmp_path_ / 'live.cbin', tmp_path_ / 'live.ch',
                   quiet=True)
    try:
        assert np.array_equal(r[:], arr)
    finally:
        r.close()


def test_stream_single_sample_blocks(tmp_path_):
    """Degenerate feed: one sample at a time, sub-chunk total."""
    arr = to_int16(make_signal('randn', ns=700, nc=NC))
    with StreamWriter(tmp_path_ / 's.cbin', tmp_path_ / 's.ch',
                      sample_rate=SR, n_channels=NC,
                      dtype='int16') as w:
        for i in range(arr.shape[0]):
            w.append(arr[i])
    r = decompress(tmp_path_ / 's.cbin', tmp_path_ / 's.ch', quiet=True)
    try:
        assert np.array_equal(r[:], arr)
        assert r.n_chunks == 1          # single partial chunk
    finally:
        r.close()


def test_stream_empty_rejected(tmp_path_):
    w = StreamWriter(tmp_path_ / 'e.cbin', tmp_path_ / 'e.ch',
                     sample_rate=SR, n_channels=NC, dtype='int16')
    with pytest.raises(ValueError):
        w.close()
    assert not (tmp_path_ / 'e.cbin').exists()


def test_stream_abort_cleans_up(tmp_path_):
    """An exception inside the with-block removes the partial output."""
    arr = to_int16(make_signal('randn', ns=3000, nc=NC))
    with pytest.raises(RuntimeError):
        with StreamWriter(tmp_path_ / 'a.cbin', tmp_path_ / 'a.ch',
                          sample_rate=SR, n_channels=NC,
                          dtype='int16') as w:
            w.append(arr)
            raise RuntimeError("acquisition died")
    assert not (tmp_path_ / 'a.cbin').exists()
    assert not (tmp_path_ / 'a.ch').exists()
