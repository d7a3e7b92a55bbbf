"""Integrity machinery: SHA1s, compress-then-verify, fault injection.

Mirrors the reference's test_check_fail / test_comp_decomp
(tests.py:345-430): byte-equality of the decompressed file, sidecar SHA1
semantics, and a corrupted-file RuntimeError through the before_check
fault-injection hook.
"""

import hashlib
import json

import numpy as np
import pytest

from mtscomp_tpu import Writer, compress, decompress

from conftest import SAMPLE_RATE, write_arr, to_int16, make_signal


def sha1(path_or_bytes):
    h = hashlib.sha1()
    data = path_or_bytes if isinstance(path_or_bytes, bytes) \
        else open(path_or_bytes, 'rb').read()
    h.update(data)
    return h.hexdigest()


def test_sha1_semantics(tmp_path_, algorithm):
    arr = to_int16(make_signal('colored', ns=3000, nc=11))
    path = write_arr(tmp_path_ / 'data.bin', arr)
    out, outmeta = tmp_path_ / 'data.cbin', tmp_path_ / 'data.ch'
    compress(path, out, outmeta, sample_rate=SAMPLE_RATE, n_channels=11,
             dtype=arr.dtype, algorithm=algorithm, quiet=True)
    cmeta = json.loads(outmeta.read_text())
    # sha1_uncompressed == SHA1 of the original file;
    # sha1_compressed == SHA1 of the .cbin.
    assert cmeta['sha1_uncompressed'] == sha1(path)
    assert cmeta['sha1_compressed'] == sha1(out)


def test_decompress_to_file_byte_equal(tmp_path_, algorithm):
    arr = to_int16(make_signal('white_sine', ns=2500, nc=9))
    path = write_arr(tmp_path_ / 'data.bin', arr)
    out, outmeta = tmp_path_ / 'data.cbin', tmp_path_ / 'data.ch'
    compress(path, out, outmeta, sample_rate=SAMPLE_RATE, n_channels=9,
             dtype=arr.dtype, algorithm=algorithm, quiet=True)
    dec_path = tmp_path_ / 'data_dec.bin'
    r = decompress(out, outmeta, out=dec_path, quiet=True)
    r.close()
    assert sha1(dec_path) == sha1(path)


def test_tofile_overwrite(tmp_path_):
    arr = to_int16(make_signal('randn', ns=500, nc=3))
    path = write_arr(tmp_path_ / 'data.bin', arr)
    out, outmeta = tmp_path_ / 'data.cbin', tmp_path_ / 'data.ch'
    compress(path, out, outmeta, sample_rate=SAMPLE_RATE, n_channels=3,
             dtype=arr.dtype, quiet=True)
    dec = tmp_path_ / 'dec.bin'
    r = decompress(out, outmeta, quiet=True)
    r.tofile(dec)
    with pytest.raises(ValueError):
        r.tofile(dec, overwrite=False)
    r.tofile(dec, overwrite=True)
    r.close()


def test_check_fail_fault_injection(tmp_path_, algorithm):
    """Corrupt the source after write but before verify => RuntimeError."""
    arr = to_int16(make_signal('colored', ns=3000, nc=7))
    path = write_arr(tmp_path_ / 'data.bin', arr)

    def corrupt(writer):
        # Flip bytes in the middle of the original file; the post-compress
        # check re-reads it and must now mismatch.
        with open(path, 'r+b') as f:
            f.seek(arr.nbytes // 2)
            f.write(b'\xde\xad\xbe\xef' * 2)

    w = Writer(algorithm=algorithm, quiet=True, before_check=corrupt)
    w.open(path, sample_rate=SAMPLE_RATE, n_channels=7, dtype=arr.dtype)
    with pytest.raises(RuntimeError):
        w.write(tmp_path_ / 'data.cbin', tmp_path_ / 'data.ch')
    w.close()


def test_corrupted_chunk_raises(tmp_path_, algorithm):
    arr = to_int16(make_signal('randn', ns=2000, nc=5))
    path = write_arr(tmp_path_ / 'data.bin', arr)
    out, outmeta = tmp_path_ / 'data.cbin', tmp_path_ / 'data.ch'
    compress(path, out, outmeta, sample_rate=SAMPLE_RATE, n_channels=5,
             dtype=arr.dtype, algorithm=algorithm, quiet=True)
    # Truncate a chunk payload in place.
    blob = bytearray(out.read_bytes())
    blob[len(blob) // 3] ^= 0xFF
    out.write_bytes(bytes(blob))
    r = decompress(out, outmeta)
    # A flipped byte must either raise (zlib checksum / ans consistency)
    # or decode to data that no longer matches the original.
    try:
        dec = r[:]
        detected = not np.array_equal(dec, arr)
    except Exception:
        detected = True
    finally:
        r.close()
    assert detected


def test_no_check_flag(tmp_path_):
    arr = to_int16(make_signal('randn', ns=500, nc=3))
    path = write_arr(tmp_path_ / 'data.bin', arr)
    # check disabled => corrupting before check does not raise
    def corrupt(writer):  # pragma: no cover
        raise AssertionError("check hook should not run")
    w = Writer(quiet=True, before_check=corrupt, check_after_compress=False)
    w.open(path, sample_rate=SAMPLE_RATE, n_channels=3, dtype=arr.dtype)
    w.write(tmp_path_ / 'o.cbin', tmp_path_ / 'o.ch')
    w.close()


def test_corrupted_chunk_surfaces_in_bulk_span(tmp_path_, algorithm):
    """The bulk span read path (>= 4 chunks batch-decoded into one
    array) must surface corruption exactly like the per-chunk path."""
    from mtscomp_tpu.api import _BULK_SPAN_CHUNKS
    arr = to_int16(make_signal('randn'))
    path = write_arr(tmp_path_ / 'data.bin', arr)
    out, outmeta = tmp_path_ / 'data.cbin', tmp_path_ / 'data.ch'
    compress(path, out, outmeta, sample_rate=SAMPLE_RATE,
             n_channels=arr.shape[1], dtype=arr.dtype,
             algorithm=algorithm, quiet=True)
    blob = bytearray(out.read_bytes())
    blob[len(blob) // 2] ^= 0xFF
    out.write_bytes(bytes(blob))
    # cache_size below the span so the bulk path engages.
    r = decompress(out, outmeta, device='none', cache_size=2)
    try:
        assert r.n_chunks >= _BULK_SPAN_CHUNKS
        assert r.n_chunks > r.cache_size
        if algorithm == 'ans':
            # The v2 container CRC32 makes detection deterministic.
            with pytest.raises(IOError):
                r[:]
        else:
            try:
                detected = not np.array_equal(r[:], arr)
            except Exception:
                detected = True
            assert detected
    finally:
        r.close()
