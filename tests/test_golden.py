"""Golden-file corpus: on-disk format stability across versions.

The committed artifacts under ``tests/golden/`` freeze both formats:

- the legacy v1 (zlib) writer must keep producing byte-identical
  ``.cbin`` output for the frozen inputs (the reference-compatibility
  contract, independent of having /root/reference mounted);
- both frozen ``.cbin`` files (v1 zlib and v2 ans) must keep decoding
  byte-exactly — i.e. files written by ANY past version of this
  framework stay readable forever.

Regenerate only on intentional format changes: tests/golden/make_golden.py.
"""

import hashlib
from pathlib import Path

import numpy as np
import pytest

from mtscomp_tpu import Writer, decompress

from conftest import tmp_path_  # noqa: F401

GOLDEN = Path(__file__).parent / 'golden'

CASES = [
    ('int16_19ch', np.int16, 19, 1234.0),
    ('uint8_7ch', np.uint8, 7, 500.0),
]


def _raw(name, dtype, nc):
    return np.fromfile(GOLDEN / ('np_%s.bin' % name), dtype).reshape(-1, nc)


@pytest.mark.parametrize('name,dtype,nc,rate', CASES)
@pytest.mark.parametrize('algo', ['zlib', 'ans'])
def test_golden_decode(tmp_path_, name, dtype, nc, rate, algo):
    """Frozen compressed files keep decoding byte-exactly."""
    arr = _raw(name, dtype, nc)
    r = decompress(GOLDEN / ('%s_%s.cbin' % (algo, name)),
                   GOLDEN / ('%s_%s.ch' % (algo, name)), quiet=True)
    try:
        assert r.dtype == np.dtype(dtype)
        assert np.array_equal(r[:], arr)
    finally:
        r.close()


@pytest.mark.parametrize('name,dtype,nc,rate', CASES)
def test_golden_zlib_writer_stable(tmp_path_, name, dtype, nc, rate):
    """The v1 writer still produces the frozen bytes (legacy contract)."""
    w = Writer(algorithm='zlib', quiet=True, check_after_compress=False)
    w.open(GOLDEN / ('np_%s.bin' % name), sample_rate=rate, n_channels=nc,
           dtype=np.dtype(dtype).name)
    out = tmp_path_ / 'g.cbin'
    w.write(out, tmp_path_ / 'g.ch')
    w.close()
    got = hashlib.sha1(out.read_bytes()).hexdigest()
    want = hashlib.sha1(
        (GOLDEN / ('zlib_%s.cbin' % name)).read_bytes()).hexdigest()
    assert got == want


def test_golden_multitable_decode(tmp_path_):
    """The frozen multi-table (flags bit4) file keeps decoding exactly,
    on the host path and through the device batch pipeline."""
    from mtscomp_tpu.codec.ans import AnsCodec
    from mtscomp_tpu.parallel.pipeline import decompress_to_array
    arr = _raw('mt_int16_48ch', np.int16, 48)
    r = decompress(GOLDEN / 'ans_mt_int16_48ch.cbin',
                   GOLDEN / 'ans_mt_int16_48ch.ch', quiet=True)
    try:
        # The artifact really exercises the bit4 layout.
        payload = (GOLDEN / 'ans_mt_int16_48ch.cbin').read_bytes()[
            r.chunk_offsets[0]:r.chunk_offsets[1]]
        parsed = AnsCodec(seg_log2=13).parse(payload)
        assert parsed['planes'][0].get('tidx') is not None
        assert np.array_equal(r[:], arr)
        assert np.array_equal(decompress_to_array(r), arr)
    finally:
        r.close()


def test_golden_order2_decode(tmp_path_):
    """The frozen `time_diff_order: 2` file keeps decoding exactly
    (host slicing, bulk path, and the device batch pipeline)."""
    import json
    from mtscomp_tpu.parallel.pipeline import decompress_to_array
    meta = json.loads((GOLDEN / 'ans_o2_int16_17ch.ch').read_text())
    assert meta['time_diff_order'] == 2     # artifact really is order-2
    arr = _raw('o2_int16_17ch', np.int16, 17)
    r = decompress(GOLDEN / 'ans_o2_int16_17ch.cbin',
                   GOLDEN / 'ans_o2_int16_17ch.ch', quiet=True)
    try:
        assert np.array_equal(r[:], arr)
        assert np.array_equal(r[917:2203, 3:9], arr[917:2203, 3:9])
        assert np.array_equal(decompress_to_array(r), arr)
    finally:
        r.close()


def test_golden_transform_adapt_decode(tmp_path_):
    """The frozen flags-bit5 (adaptive transform) file keeps decoding
    exactly, with its per-chunk descriptors honored over the sidecar
    (the artifact genuinely switches transforms mid-file)."""
    import json
    from mtscomp_tpu.parallel.pipeline import _read_payload
    meta = json.loads((GOLDEN / 'ans_adapt_int16_13ch.ch').read_text())
    assert meta['transform_adapt'] == 2
    arr = _raw('adapt_int16_13ch', np.int16, 13)
    r = decompress(GOLDEN / 'ans_adapt_int16_13ch.cbin',
                   GOLDEN / 'ans_adapt_int16_13ch.ch', quiet=True)
    try:
        descs = [r.codec.parse(_read_payload(r, i))['transform']
                 for i in range(r.n_chunks)]
        assert all(d is not None for d in descs)
        assert len(set(descs)) > 1       # the windows really switched
        assert np.array_equal(r[:], arr)
        assert np.array_equal(r[500:3500, 2:9], arr[500:3500, 2:9])
        assert np.array_equal(r[:, 12], arr[:, 12])
    finally:
        r.close()


def test_golden_tail_split_decode(tmp_path_):
    """The frozen flags-bit6 (ragged-tail split) file keeps decoding
    exactly — segment derivation must honor the header's tail_split."""
    from mtscomp_tpu.parallel.pipeline import _read_payload
    arr = _raw('ts_int16_129ch', np.int16, 129)
    r = decompress(GOLDEN / 'ans_ts_int16_129ch.cbin',
                   GOLDEN / 'ans_ts_int16_129ch.ch', quiet=True)
    try:
        parsed = r.codec.parse(_read_payload(r, 0))
        assert parsed['tail_split'] == 8
        assert [len(g['segments']) for g in parsed['groups']] == [32, 8]
        assert np.array_equal(r[:], arr)
        assert np.array_equal(r[300:2100, 120:], arr[300:2100, 120:])
        assert np.array_equal(r[:, 128], arr[:, 128])
    finally:
        r.close()


def test_golden_float_bitcast_decode(tmp_path_):
    """The frozen `float_bitcast` file keeps decoding BIT-exactly."""
    import json
    meta = json.loads((GOLDEN / 'ans_f32_11ch.ch').read_text())
    assert meta['float_bitcast'] is True
    arr = _raw('f32_11ch', np.float32, 11)
    r = decompress(GOLDEN / 'ans_f32_11ch.cbin',
                   GOLDEN / 'ans_f32_11ch.ch', quiet=True)
    try:
        assert r.dtype == np.float32
        got = r[:]
        assert np.array_equal(got.view(np.int32), arr.view(np.int32))
    finally:
        r.close()


@pytest.mark.parametrize('name,dtype,nc,rate', CASES)
def test_golden_sidecar_sha1(tmp_path_, name, dtype, nc, rate):
    """Frozen .ch SHA1 fields match independently computed hashes."""
    import json
    for algo in ('zlib', 'ans'):
        meta = json.loads((GOLDEN / ('%s_%s.ch' % (algo, name))).read_text())
        raw_sha = hashlib.sha1(
            (GOLDEN / ('np_%s.bin' % name)).read_bytes()).hexdigest()
        comp_sha = hashlib.sha1(
            (GOLDEN / ('%s_%s.cbin' % (algo, name))).read_bytes()).hexdigest()
        assert meta['sha1_uncompressed'] == raw_sha
        assert meta['sha1_compressed'] == comp_sha
