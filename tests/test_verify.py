"""mtsverify / verify_file: in-place archive audits without the raw file."""

import numpy as np
import pytest

from mtscomp_tpu import compress, decompress, verify_file
from mtscomp_tpu.cli import mtsverify

from conftest import SAMPLE_RATE, to_int16, write_arr


def _make(tmp, algorithm='ans', dtype='int16', name='data', **kw):
    rng = np.random.default_rng(3)
    arr = np.cumsum(rng.normal(0, 4, size=(5000, 9)), axis=0)
    arr = arr.astype(dtype) if np.dtype(dtype).kind == 'f' else to_int16(arr)
    path = write_arr(tmp / (name + '.bin'), arr)
    out, ch = tmp / (name + '.cbin'), tmp / (name + '.ch')
    compress(path, out, ch, sample_rate=SAMPLE_RATE, n_channels=9,
             dtype=arr.dtype, algorithm=algorithm, quiet=True, **kw)
    return out, ch, arr


@pytest.mark.parametrize('algorithm', ['zlib', 'ans'])
def test_intact_file_verifies(tmp_path_, algorithm):
    out, ch, _ = _make(tmp_path_, algorithm)
    report = verify_file(out, ch, quiet=True)
    assert report['ok'] and not report['issues']
    assert report['checks']['sha1_compressed'] == 'ok'
    assert report['checks']['chunks_decode'] == 'ok'
    assert report['checks']['sha1_uncompressed'] == 'ok'


def test_bitcast_float_verifies_exactly(tmp_path_):
    out, ch, _ = _make(tmp_path_, dtype='float32')
    report = verify_file(out, ch, quiet=True)
    assert report['ok']
    assert report['checks']['sha1_uncompressed'] == 'ok'


def test_legacy_float_skips_raw_hash(tmp_path_):
    out, ch, _ = _make(tmp_path_, algorithm='zlib', dtype='float64')
    report = verify_file(out, ch, quiet=True)
    assert report['ok']
    assert report['checks']['sha1_uncompressed'].startswith('skipped')
    assert report['checks']['sha1_compressed'] == 'ok'


def test_payload_corruption_detected(tmp_path_):
    out, ch, _ = _make(tmp_path_)
    data = bytearray(out.read_bytes())
    data[len(data) // 2] ^= 0x20
    out.write_bytes(bytes(data))
    report = verify_file(out, ch, quiet=True)
    assert not report['ok']
    assert report['checks']['sha1_compressed'] == 'MISMATCH'
    # The deep pass surfaces it too (CRC32 / stream audit / raw hash).
    deep_failed = (report['checks']['chunks_decode'] != 'ok'
                   or report['checks']['sha1_uncompressed'] == 'MISMATCH')
    assert deep_failed


def test_truncated_payload_detected(tmp_path_):
    out, ch, _ = _make(tmp_path_)
    data = out.read_bytes()
    out.write_bytes(data[:-10])
    report = verify_file(out, ch, deep=False, quiet=True)
    assert not report['ok']
    assert report['checks']['payload_size'] == 'MISMATCH'


def test_tampered_sidecar_detected(tmp_path_):
    import json
    out, ch, _ = _make(tmp_path_)
    cm = json.loads(ch.read_text())
    cm['chunk_offsets'][2] = cm['chunk_offsets'][1]  # zero-byte chunk
    ch.write_text(json.dumps(cm))
    report = verify_file(out, ch, deep=False, quiet=True)
    assert not report['ok']
    assert 'not strictly increasing' in report['checks']['structure']


def test_unparseable_sidecar(tmp_path_):
    out, ch, _ = _make(tmp_path_)
    ch.write_text('not json at all')
    report = verify_file(out, ch, quiet=True)
    assert not report['ok']
    assert 'sidecar' in report['checks']


def test_chopped_file_verifies(tmp_path_):
    # chop() nulls both SHA1s: hashes skip, decode still audits.
    out, ch, _ = _make(tmp_path_, chunk_duration=0.5)
    r = decompress(out, ch)
    r.chop(2, out=tmp_path_ / 'c.cbin')
    r.close()
    report = verify_file(tmp_path_ / 'c.cbin', quiet=True)
    assert report['ok']
    assert report['checks']['sha1_compressed'].startswith('skipped')
    assert report['checks']['chunks_decode'] == 'ok'


def test_fast_mode_skips_decode(tmp_path_):
    out, ch, _ = _make(tmp_path_)
    report = verify_file(out, ch, deep=False, quiet=True)
    assert report['ok']
    assert report['checks']['chunks_decode'] == 'skipped (--fast)'


def test_cli_exit_codes(tmp_path_, capsys):
    out, ch, _ = _make(tmp_path_)
    mtsverify([str(out), str(ch)])          # exit 0 = no SystemExit
    stdout = capsys.readouterr().out
    assert 'verdict' in stdout and 'OK' in stdout
    data = bytearray(out.read_bytes())
    data[100] ^= 0xFF
    out.write_bytes(bytes(data))
    with pytest.raises(SystemExit) as e:
        mtsverify([str(out), str(ch), '--fast'])
    assert e.value.code == 1
    assert 'FAILED' in capsys.readouterr().out
