"""Golden interop against the reference implementation (if present).

These tests import the original mtscomp from /root/reference (read-only)
to assert byte-identical v1.0 output and mutual readability. They skip
cleanly when the reference is not available.
"""

import hashlib
import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest

from mtscomp_tpu import compress, decompress

from conftest import write_arr, to_int16, make_signal

REFERENCE = Path('/root/reference/mtscomp.py')

pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason='reference implementation not present')


@pytest.fixture(scope='module')
def ref():
    spec = importlib.util.spec_from_file_location('mtscomp_ref', REFERENCE)
    mod = importlib.util.module_from_spec(spec)
    sys.modules['mtscomp_ref'] = mod
    spec.loader.exec_module(mod)
    return mod


def _sha1(path):
    return hashlib.sha1(Path(path).read_bytes()).hexdigest()


def test_byte_identical_output(tmp_path_, ref, monkeypatch):
    monkeypatch.setattr(ref, 'CONFIG_PATH', tmp_path_ / '.mtscomp_ref')
    arr = to_int16(make_signal('colored', ns=6997, nc=19))
    path = write_arr(tmp_path_ / 'data.bin', arr)

    ours_out = tmp_path_ / 'ours.cbin'
    ours_ch = tmp_path_ / 'ours.ch'
    compress(path, ours_out, ours_ch, sample_rate=1234.0, n_channels=19,
             dtype='int16', quiet=True)

    ref_out = tmp_path_ / 'ref.cbin'
    ref_ch = tmp_path_ / 'ref.ch'
    ref.compress(path, ref_out, ref_ch, sample_rate=1234.0, n_channels=19,
                 dtype='int16', check_after_compress=False)

    assert _sha1(ours_out) == _sha1(ref_out)
    ours_meta = json.loads(ours_ch.read_text())
    ref_meta = json.loads(ref_ch.read_text())
    assert set(ours_meta) == set(ref_meta)
    for k in ref_meta:
        assert ours_meta[k] == ref_meta[k], k


def test_read_reference_file(tmp_path_, ref, monkeypatch):
    monkeypatch.setattr(ref, 'CONFIG_PATH', tmp_path_ / '.mtscomp_ref')
    arr = to_int16(make_signal('white_sine', ns=3000, nc=11))
    path = write_arr(tmp_path_ / 'data.bin', arr)
    out, ch = tmp_path_ / 'ref.cbin', tmp_path_ / 'ref.ch'
    ref.compress(path, out, ch, sample_rate=1000.0, n_channels=11,
                 dtype='int16', check_after_compress=False)
    r = decompress(out, ch)
    assert np.array_equal(r[:], arr)
    assert np.array_equal(r[100:200, 3:5], arr[100:200, 3:5])
    r.close()


def test_reference_reads_our_file(tmp_path_, ref, monkeypatch):
    monkeypatch.setattr(ref, 'CONFIG_PATH', tmp_path_ / '.mtscomp_ref')
    arr = to_int16(make_signal('randn', ns=2500, nc=9))
    path = write_arr(tmp_path_ / 'data.bin', arr)
    out, ch = tmp_path_ / 'ours.cbin', tmp_path_ / 'ours.ch'
    compress(path, out, ch, sample_rate=1000.0, n_channels=9,
             dtype='int16', quiet=True)
    r = ref.decompress(out, ch)
    assert np.array_equal(r[:], arr)
    r.close()


def test_legacy_reencode_to_ans(tmp_path_, ref, monkeypatch):
    """BASELINE config 5: inflate a reference zlib .cbin, re-encode as ans."""
    monkeypatch.setattr(ref, 'CONFIG_PATH', tmp_path_ / '.mtscomp_ref')
    arr = to_int16(make_signal('colored', ns=5000, nc=19))
    path = write_arr(tmp_path_ / 'data.bin', arr)
    zout, zch = tmp_path_ / 'legacy.cbin', tmp_path_ / 'legacy.ch'
    ref.compress(path, zout, zch, sample_rate=1000.0, n_channels=19,
                 dtype='int16', check_after_compress=False)
    # Inflate with our reader, re-encode with ans, verify.
    r = decompress(zout, zch)
    dec = r[:]
    r.close()
    path2 = write_arr(tmp_path_ / 'dec.bin', dec)
    aout, ach = tmp_path_ / 'native.cbin', tmp_path_ / 'native.ch'
    ratio = compress(path2, aout, ach, sample_rate=1000.0, n_channels=19,
                     dtype='int16', algorithm='ans', quiet=True)
    r2 = decompress(aout, ach)
    assert np.array_equal(r2[:], arr)
    r2.close()
