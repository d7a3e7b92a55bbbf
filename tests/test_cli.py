"""CLI round trips and arg->config mapping (reference: tests.py:533-712)."""

import json
import re

import numpy as np
import pytest

from mtscomp_tpu import cli, load_raw_data
from mtscomp_tpu.config import read_config

from conftest import SAMPLE_RATE, write_arr, to_int16, make_signal


@pytest.fixture
def data(tmp_path_):
    arr = to_int16(make_signal('colored', ns=3000, nc=5))
    path = write_arr(tmp_path_ / 'data.bin', arr)
    return tmp_path_, path, arr


def test_args_to_config():
    parser = cli.mtscomp_parser()
    pargs, config = cli._args_to_config(
        parser, ['f.bin', '-d', 'int16 ', '-s', '20000', '-n', '385',
                 '-p', '2'], compress=True)
    assert config.dtype == 'int16'
    assert config.sample_rate == 20000.0
    assert config.n_channels == 385
    assert config.n_threads == 2
    # -nc not passed => check_after_compress stays at its default True
    assert config.check_after_compress is True


def test_args_no_check():
    parser = cli.mtscomp_parser()
    pargs, config = cli._args_to_config(
        parser, ['f.bin', '-d', 'int16', '-s', '1', '-n', '3', '-nc'],
        compress=True)
    assert config.check_after_compress is False


def test_cli_roundtrip(data, capsys):
    tmp, path, arr = data
    out = tmp / 'data.cbin'
    outmeta = tmp / 'data.ch'
    cli.mtscomp([str(path), str(out), str(outmeta), '-d', 'int16',
                 '-s', str(SAMPLE_RATE), '-n', '5'])
    assert out.exists() and outmeta.exists()

    # mtsdesc prints recoverable metadata.
    cli.mtsdesc([str(out), str(outmeta)])
    desc = capsys.readouterr().out
    assert re.search(r'dtype\s+int16', desc)
    assert re.search(r'n_channels\s+5', desc)

    # --json emits one machine-readable object with the same fields.
    cli.mtsdesc([str(out), str(outmeta), '--json'])
    import json as _json
    info = _json.loads(capsys.readouterr().out)
    assert info['dtype'] == 'int16'
    assert info['n_channels'] == 5
    assert info['algorithm'] == 'zlib'
    assert info['n_samples'] == arr.shape[0]

    dec = tmp / 'dec.bin'
    cli.mtsdecomp([str(out), str(outmeta), '-o', str(dec)])
    loaded = load_raw_data(dec, n_channels=5, dtype='int16')
    assert np.array_equal(loaded, arr)
    # Decompressing again without -f fails; with -f succeeds.
    with pytest.raises(ValueError):
        cli.mtsdecomp([str(out), str(outmeta), '-o', str(dec)])
    cli.mtsdecomp([str(out), str(outmeta), '-o', str(dec), '-f'])


def test_cli_ans_roundtrip(data):
    tmp, path, arr = data
    out, outmeta = tmp / 'a.cbin', tmp / 'a.ch'
    cli.mtscomp([str(path), str(out), str(outmeta), '-d', 'int16',
                 '-s', str(SAMPLE_RATE), '-n', '5', '-a', 'ans'])
    cmeta = json.loads(outmeta.read_text())
    assert cmeta['algorithm'] == 'ans'
    dec = tmp / 'dec.bin'
    cli.mtsdecomp([str(out), str(outmeta), '-o', str(dec)])
    assert np.array_equal(load_raw_data(dec, n_channels=5, dtype='int16'),
                          arr)


def test_cli_missing_args(data):
    tmp, path, arr = data
    with pytest.raises((ValueError, SystemExit)):
        cli.mtscomp([str(path)])  # no dtype/rate/channels


def test_cli_set_default(data):
    tmp, path, arr = data
    out, outmeta = tmp / 'd.cbin', tmp / 'd.ch'
    cli.mtscomp([str(path), str(out), str(outmeta), '-d', 'int16',
                 '-s', str(SAMPLE_RATE), '-n', '5', '--set-default'])
    # The config file now holds these defaults.
    config = read_config()
    assert config.n_channels == 5
    assert config.dtype == 'int16'
    # A later compress can rely on the persisted defaults.
    out2, outmeta2 = tmp / 'e.cbin', tmp / 'e.ch'
    cli.mtscomp([str(path), str(out2), str(outmeta2)])
    assert out2.exists()


def test_cli_npy(tmp_path_):
    arr = np.random.randint(-500, 500, size=(4, 250, 7)).astype(np.int16)
    path = tmp_path_ / 'data.npy'
    np.save(path, arr)
    out, outmeta = tmp_path_ / 'data.cnpy', tmp_path_ / 'data.ch'
    cli.mtscomp([str(path), str(out), str(outmeta), '-s', '1000'])
    cmeta = json.loads(outmeta.read_text())
    assert tuple(cmeta['shape']) == arr.shape


def test_cli_chop(data):
    tmp, path, arr = data
    out, outmeta = tmp / 'data.cbin', tmp / 'data.ch'
    cli.mtscomp([str(path), str(out), str(outmeta), '-d', 'int16',
                 '-s', '1000', '-n', '5'])
    chopped = tmp / 'chopped.cbin'
    cli.mtschop([str(out), '-n', '2', '-o', str(chopped)])
    assert chopped.exists()
    cmeta = json.loads((tmp / 'chopped.ch').read_text())
    assert cmeta['chopped'] is True
    assert len(cmeta['chunk_bounds']) == 3


def test_benchmark_plots(tmp_path_):
    """The plot generator builds the standard panel from harness rows."""
    matplotlib = pytest.importorskip('matplotlib')
    matplotlib.use('Agg')
    from mtscomp_tpu.benchmarks.plots import bar_chart, benchmark_plots
    rows = [
        {'dataset': 'ap', 'algorithm': 'zlib', 'n_threads': 1,
         'ratio': 2.9, 'write_mbps': 10, 'read_mbps': 20, 'window_ms': 5},
        {'dataset': 'ap', 'algorithm': 'zlib', 'n_threads': 4,
         'ratio': 2.9, 'write_mbps': 30, 'read_mbps': 21, 'window_ms': 5},
        {'dataset': 'ap', 'algorithm': 'ans', 'n_threads': 1,
         'ratio': 3.3, 'write_mbps': 40, 'read_mbps': 90, 'window_ms': 2},
        {'dataset': 'ap', 'algorithm': 'ans', 'n_threads': 4,
         'ratio': 3.3, 'write_mbps': 90, 'read_mbps': 91, 'window_ms': 2},
    ]
    fig = bar_chart(rows, metric='read_mbps', group_by='algorithm',
                    bar_by='n_threads')
    assert fig.axes[0].get_ylabel() == 'read_mbps'
    figs = benchmark_plots(output_dir=tmp_path_ / 'plots', rows=rows)
    assert set(figs) == {'ratio', 'write_mbps', 'read_mbps', 'window_ms'}
    for metric in figs:
        assert (tmp_path_ / 'plots' / ('%s.png' % metric)).exists()


def test_cli_range_and_merge(tmp_path_):
    """mtscomp --range + mtsmerge: parts merge byte-identically to a
    full compress."""
    from mtscomp_tpu import decompress
    from mtscomp_tpu.cli import mtscomp, mtsmerge
    arr = to_int16(make_signal('colored', ns=4 * 1000, nc=7))
    path = write_arr(tmp_path_ / 'r.bin', arr)
    base = ['-d', 'int16', '-s', '1000', '-n', '7']
    mtscomp([str(path), str(tmp_path_ / 'full.cbin'),
             str(tmp_path_ / 'full.ch')] + base)
    mtscomp([str(path), str(tmp_path_ / 'p0.cbin'), str(tmp_path_ / 'p0.ch'),
             '--range', '0:2'] + base)
    mtscomp([str(path), str(tmp_path_ / 'p1.cbin'), str(tmp_path_ / 'p1.ch'),
             '--range', '2:4'] + base)
    mtsmerge([str(tmp_path_ / 'p0.cbin'), str(tmp_path_ / 'p1.cbin'),
              '-o', str(tmp_path_ / 'm.cbin')])
    assert (tmp_path_ / 'm.cbin').read_bytes() == \
        (tmp_path_ / 'full.cbin').read_bytes()
    r = decompress(tmp_path_ / 'm.cbin', tmp_path_ / 'm.ch', quiet=True)
    try:
        assert np.array_equal(r[:], arr)
    finally:
        r.close()


def test_cli_decomp_samples_window(data, tmp_path):
    """mtsdecomp --samples A:B exports just a window (random access)."""
    tmp, path, arr = data
    out, outmeta = tmp / 'w.cbin', tmp / 'w.ch'
    cli.mtscomp([str(path), str(out), str(outmeta), '-d', 'int16',
                 '-s', str(SAMPLE_RATE), '-n', '5', '-a', 'ans'])
    dst = tmp_path / 'win.bin'
    cli.mtsdecomp([str(out), str(outmeta), '-o', str(dst),
                   '--samples', '100:300'])
    got = np.fromfile(dst, dtype=arr.dtype).reshape(-1, 5)
    assert np.array_equal(got, arr[100:300])
    # Existing output without -f is refused; -f overwrites.
    with pytest.raises(ValueError):
        cli.mtsdecomp([str(out), str(outmeta), '-o', str(dst),
                       '--samples', '0:10'])
    cli.mtsdecomp([str(out), str(outmeta), '-o', str(dst),
                   '--samples=-200:', '-f'])
    got = np.fromfile(dst, dtype=arr.dtype).reshape(-1, 5)
    assert np.array_equal(got, arr[-200:])
    # Malformed range surfaces a descriptive error.
    with pytest.raises(ValueError, match='A:B'):
        cli.mtsdecomp([str(out), str(outmeta), '-o', str(dst),
                       '--samples', 'abc', '-f'])


def test_cli_compress_from_stdin(data, tmp_path, monkeypatch):
    """mtscomp - streams raw samples from stdin, byte-identical to
    compressing the finished file."""
    import io

    class _Stdin:
        def __init__(self, payload):
            self.buffer = io.BytesIO(payload)

    tmp, path, arr = data
    cli.mtscomp([str(path), str(tmp / 'file.cbin'), str(tmp / 'file.ch'),
                 '-d', 'int16', '-s', str(SAMPLE_RATE), '-n', '5',
                 '-a', 'ans'])
    monkeypatch.setattr(cli.sys, 'stdin', _Stdin(arr.tobytes()))
    cli.mtscomp(['-', str(tmp_path / 'pipe.cbin'), str(tmp_path / 'pipe.ch'),
                 '-d', 'int16', '-s', str(SAMPLE_RATE), '-n', '5',
                 '-a', 'ans'])
    assert (tmp_path / 'pipe.cbin').read_bytes() == \
        (tmp / 'file.cbin').read_bytes()

    # Trailing bytes that do not form a full row must error and leave
    # no output behind.
    monkeypatch.setattr(cli.sys, 'stdin', _Stdin(arr.tobytes() + b'\x01'))
    with pytest.raises(ValueError, match='trailing'):
        cli.mtscomp(['-', str(tmp_path / 'bad.cbin'),
                     str(tmp_path / 'bad.ch'), '-d', 'int16',
                     '-s', str(SAMPLE_RATE), '-n', '5', '-a', 'ans'])
    assert not (tmp_path / 'bad.cbin').exists()

    # stdin requires explicit outputs and the required params.
    with pytest.raises(ValueError, match='out'):
        cli.mtscomp(['-', '-d', 'int16', '-s', '1000', '-n', '5'])


def test_cli_decomp_to_stdout(data, monkeypatch, capsysbinary):
    """mtsdecomp -o - streams raw decoded bytes to stdout; with
    --samples only the window is written."""
    tmp, path, arr = data
    out, outmeta = tmp / 'so.cbin', tmp / 'so.ch'
    cli.mtscomp([str(path), str(out), str(outmeta), '-d', 'int16',
                 '-s', str(SAMPLE_RATE), '-n', '5', '-a', 'ans'])
    cli.mtsdecomp([str(out), str(outmeta), '-o', '-'])
    got = np.frombuffer(capsysbinary.readouterr().out,
                        dtype=arr.dtype).reshape(-1, 5)
    assert np.array_equal(got, arr)
    cli.mtsdecomp([str(out), str(outmeta), '-o', '-',
                   '--samples', '50:250'])
    got = np.frombuffer(capsysbinary.readouterr().out,
                        dtype=arr.dtype).reshape(-1, 5)
    assert np.array_equal(got, arr[50:250])


def test_cli_decomp_stdout_hash_check(data, capsysbinary):
    """The full-stream stdout path hash-verifies the streamed bytes
    against sha1_uncompressed (a decodable-but-wrong corruption must
    not stream silently)."""
    tmp, path, arr = data
    out, outmeta = tmp / 'hc.cbin', tmp / 'hc.ch'
    cli.mtscomp([str(path), str(out), str(outmeta), '-d', 'int16',
                 '-s', str(SAMPLE_RATE), '-n', '5'])   # zlib: no CRC
    meta = json.loads(outmeta.read_text())
    # Tamper with the sidecar hash to emulate wrong decoded content.
    meta['sha1_uncompressed'] = '0' * 40
    outmeta.write_text(json.dumps(meta))
    with pytest.raises(IOError, match='sha1_uncompressed'):
        cli.mtsdecomp([str(out), str(outmeta), '-o', '-'])
    capsysbinary.readouterr()
    # -nc skips the incremental check.
    cli.mtsdecomp([str(out), str(outmeta), '-o', '-', '-nc'])
    got = np.frombuffer(capsysbinary.readouterr().out,
                        dtype=arr.dtype).reshape(-1, 5)
    assert np.array_equal(got, arr)


def test_cli_decomp_channels(data, capsysbinary):
    """mtsdecomp --channels exports only the selected columns, in the
    requested order, to a file or stdout, with or without --samples."""
    tmp, path, arr = data
    out, outmeta = tmp / 'ch.cbin', tmp / 'ch.ch'
    cli.mtscomp([str(path), str(out), str(outmeta), '-d', 'int16',
                 '-s', str(SAMPLE_RATE), '-n', '5', '-a', 'ans'])

    # File export: ranges + indices + duplicates + negatives, order kept.
    dec = tmp / 'cols.bin'
    cli.mtsdecomp([str(out), str(outmeta), '-o', str(dec),
                   '--channels', '3,0:2,-1,3'])
    cols = [3, 0, 1, 4, 3]
    got = np.fromfile(dec, dtype=arr.dtype).reshape(-1, len(cols))
    assert np.array_equal(got, arr[:, cols])

    # Combined with --samples; overwrite guard applies.
    with pytest.raises(ValueError, match='exists'):
        cli.mtsdecomp([str(out), str(outmeta), '-o', str(dec),
                       '--channels', '2', '--samples', '100:300'])
    cli.mtsdecomp([str(out), str(outmeta), '-o', str(dec), '-f',
                   '--channels', '2', '--samples', '100:300'])
    got = np.fromfile(dec, dtype=arr.dtype).reshape(-1, 1)
    assert np.array_equal(got, arr[100:300, [2]])

    # stdout form streams the same bytes.
    cli.mtsdecomp([str(out), str(outmeta), '-o', '-',
                   '--channels', '1:3', '--samples', '50:250'])
    got = np.frombuffer(capsysbinary.readouterr().out,
                        dtype=arr.dtype).reshape(-1, 2)
    assert np.array_equal(got, arr[50:250, 1:3])

    # Also exercised on the legacy zlib container (full-chunk fallback).
    zout, zmeta = tmp / 'chz.cbin', tmp / 'chz.ch'
    cli.mtscomp([str(path), str(zout), str(zmeta), '-d', 'int16',
                 '-s', str(SAMPLE_RATE), '-n', '5'])
    dec2 = tmp / 'colsz.bin'
    cli.mtsdecomp([str(zout), str(zmeta), '-o', str(dec2),
                   '--channels', '4,0'])
    got = np.fromfile(dec2, dtype=arr.dtype).reshape(-1, 2)
    assert np.array_equal(got, arr[:, [4, 0]])

    # Bad specs are rejected with a clear error.
    for spec in ('', 'a', '1;2', '9'):
        with pytest.raises((ValueError, IndexError)):
            cli.mtsdecomp([str(out), str(outmeta), '-o', str(dec), '-f',
                           '--channels', spec])
