"""Auto spatial prediction (``do_spatial_diff='auto'``), the joint
transform probe over (time-diff order x spatial diff).

The spatial diff is a reference feature (mtscomp.py:382, default off at
mtscomp.py:52); the 'auto' value is a v2-side extension: probe chunk 0
under each candidate transform and keep the winner with a 2% margin
over the reference transform. It wins on channel-correlated bands
(smooth LFP fields, common-mode artifacts) and must stay off on
independent channels; zlib files always resolve 'auto' to False so the
legacy output stays byte-identical to the reference.
"""

import json

import numpy as np
import pytest

from mtscomp_tpu import StreamWriter, compress, decompress, transcode

from conftest import tmp_path_  # noqa: F401

SR = 2500.0
NC = 16
NS = 3 * 2500 + 217


def common_mode(ns=NS, nc=NC, seed=0):
    """Independent random walks + a strong shared artifact: the spatial
    diff removes the shared term (measured +17-19% here)."""
    rng = np.random.RandomState(seed)
    ind = np.cumsum(rng.normal(0, 4., (ns, nc)), axis=0)
    cm = np.cumsum(rng.normal(0, 10., (ns, 1)), axis=0)
    return (ind + cm).astype(np.int16)


def independent(ns=NS, nc=NC, seed=1):
    """Independent random walks: the spatial diff doubles the noise
    variance; auto must keep it off."""
    rng = np.random.RandomState(seed)
    return np.cumsum(rng.normal(0, 6., (ns, nc)),
                     axis=0).astype(np.int16)


def smooth_field(ns=NS, nc=NC, seed=2):
    """Smooth spatial modes x slow oscillations: neighbors correlate
    (ephys-LFP-like); both the spatial diff and order 2 win — the
    joint probe must pick the best combination, not a fixed one."""
    rng = np.random.RandomState(seed)
    t = np.arange(ns) / SR
    k = 5
    modes = np.stack([np.sin(2 * np.pi * f * t + p)
                      for f, p in zip(rng.uniform(1., 30., k),
                                      rng.uniform(0., 6., k))])
    x = np.linspace(0., 1., nc)
    prof = np.stack([np.cos(2 * np.pi * (i + 1) * x / 4 + rng.uniform(0, 6))
                     for i in range(k)])
    sig = (modes.T @ prof) * 800. + rng.normal(0, 12., (ns, nc))
    return sig.astype(np.int16)


def _compress(tmp, arr, name, **kwargs):
    raw = tmp / (name + '.bin')
    arr.tofile(str(raw))
    kwargs.setdefault('sample_rate', SR)
    kwargs.setdefault('n_channels', arr.shape[1])
    kwargs.setdefault('dtype', arr.dtype)
    kwargs.setdefault('algorithm', 'ans')
    kwargs.setdefault('quiet', True)
    compress(raw, tmp / (name + '.cbin'), tmp / (name + '.ch'), **kwargs)
    return tmp / (name + '.cbin'), tmp / (name + '.ch')


def _spatial(ch):
    return json.loads(ch.read_text())['do_spatial_diff']


def test_auto_engages_on_common_mode_and_wins(tmp_path_):
    arr = common_mode()
    cba, cha = _compress(tmp_path_, arr, 'auto')
    assert _spatial(cha) is True
    cb0, ch0 = _compress(tmp_path_, arr, 'off', do_spatial_diff=False)
    assert _spatial(ch0) is False
    # The probe exists to win: require a real ratio improvement.
    assert cba.stat().st_size < 0.95 * cb0.stat().st_size
    for cb, ch in ((cba, cha), (cb0, ch0)):
        with decompress(cb, ch, quiet=True) as r:
            assert np.array_equal(r[:], arr)


def test_auto_stays_off_on_independent_channels(tmp_path_):
    cb, ch = _compress(tmp_path_, independent(), 'ind')
    assert _spatial(ch) is False
    with decompress(cb, ch, quiet=True) as r:
        assert np.array_equal(r[:], independent())


def test_joint_probe_beats_each_single_axis(tmp_path_):
    """On smooth-field data the joint choice must be at least as small
    as forcing either single-axis transform."""
    arr = smooth_field()
    cba, _ = _compress(tmp_path_, arr, 'joint')
    cb1, _ = _compress(tmp_path_, arr, 'ord-only', do_spatial_diff=False)
    cb2, _ = _compress(tmp_path_, arr, 'sp-only', time_diff_order=1,
                       do_spatial_diff=True)
    assert cba.stat().st_size <= cb1.stat().st_size
    assert cba.stat().st_size <= cb2.stat().st_size


def test_zlib_auto_resolves_off(tmp_path_):
    """'auto' must never flip zlib output (reference byte-identity);
    the explicit boolean is a reference feature and stays honored."""
    arr = common_mode()
    cb, ch = _compress(tmp_path_, arr, 'z', algorithm='zlib')
    assert _spatial(ch) is False
    cbs, chs = _compress(tmp_path_, arr, 'zs', algorithm='zlib',
                         do_spatial_diff=True)
    assert _spatial(chs) is True
    for c, h in ((cb, ch), (cbs, chs)):
        with decompress(c, h, quiet=True) as r:
            assert np.array_equal(r[:], arr)


def test_invalid_spatial_value_raises(tmp_path_):
    with pytest.raises(ValueError):
        _compress(tmp_path_, common_mode(), 'bad',
                  do_spatial_diff='always')


def test_spatial_file_random_access_and_bulk(tmp_path_):
    arr = common_mode()
    cb, ch = _compress(tmp_path_, arr, 'ra')
    assert _spatial(ch) is True
    with decompress(cb, ch, quiet=True) as r:
        assert np.array_equal(r[1234:5678], arr[1234:5678])
        assert np.array_equal(r[-100:, 3:7], arr[-100:, 3:7])
        out = tmp_path_ / 'ra.out.bin'
        r.tofile(out)
    assert out.read_bytes() == arr.tobytes()


def test_device_encode_decode_byte_identical(tmp_path_):
    """The device pipeline supports spatial files both directions
    (diff_space_jnp / cumsum_space_jnp); outputs must match the host
    codec bit for bit."""
    arr = common_mode()
    cbh, chh = _compress(tmp_path_, arr, 'h', check_after_compress=False)
    assert _spatial(chh) is True
    cbd, chd = _compress(tmp_path_, arr, 'd', check_after_compress=False,
                         device='cpu')
    assert cbh.read_bytes() == cbd.read_bytes()
    assert _spatial(chd) is True
    with decompress(cbh, chh, quiet=True, device='cpu') as r:
        assert np.array_equal(r.to_array(), arr)


def test_stream_auto_probes_spatial_at_first_flush(tmp_path_):
    """Streaming 'auto' probes the first buffered chunk (same probe as
    the batch Writer): channel-correlated data engages the spatial diff
    and the stream's bytes equal the batch compress; explicit True is
    honored as given."""
    arr = common_mode()
    cb, ch = _compress(tmp_path_, arr, 'batch_auto')   # default: auto
    assert _spatial(ch) is True
    for name, flag, expect in (('s_auto', 'auto', True),
                               ('s_on', True, True)):
        sw = StreamWriter(tmp_path_ / (name + '.cbin'),
                          tmp_path_ / (name + '.ch'), sample_rate=SR,
                          n_channels=NC, dtype=np.int16, algorithm='ans',
                          quiet=True, do_spatial_diff=flag)
        sw.append(arr)
        sw.close()
        meta = json.loads((tmp_path_ / (name + '.ch')).read_text())
        assert meta['do_spatial_diff'] is expect
        with decompress(tmp_path_ / (name + '.cbin'),
                        tmp_path_ / (name + '.ch'), quiet=True) as r:
            assert np.array_equal(r[:], arr)
    # Fully-default stream (joint auto) == fully-default batch, byte
    # for byte.
    assert (tmp_path_ / 's_auto.cbin').read_bytes() == cb.read_bytes()
    # Independent channels: the stream probe keeps spatial off.
    ind = independent()
    sw = StreamWriter(tmp_path_ / 'ind.cbin', tmp_path_ / 'ind.ch',
                      sample_rate=SR, n_channels=NC, dtype=np.int16,
                      algorithm='ans', quiet=True)
    sw.append(ind)
    sw.close()
    assert _spatial(tmp_path_ / 'ind.ch') is False


def test_transcode_inherits_and_rejects_auto(tmp_path_):
    arr = common_mode()
    cb, ch = _compress(tmp_path_, arr, 't')
    assert _spatial(ch) is True
    out, outmeta = tmp_path_ / 't2.cbin', tmp_path_ / 't2.ch'
    transcode(cb, ch, out, outmeta, quiet=True)
    assert _spatial(outmeta) is True
    with decompress(out, outmeta, quiet=True) as r:
        assert np.array_equal(r[:], arr)
    with pytest.raises(ValueError):
        transcode(cb, ch, tmp_path_ / 't3.cbin', tmp_path_ / 't3.ch',
                  do_spatial_diff='auto', quiet=True)


def test_cli_spatial_flag(tmp_path_):
    from mtscomp_tpu.cli import mtscomp as cli_compress
    arr = common_mode()
    raw = tmp_path_ / 'c.bin'
    arr.tofile(str(raw))
    cli_compress([str(raw), str(tmp_path_ / 'c.cbin'),
                  str(tmp_path_ / 'c.ch'), '-s', str(SR),
                  '-n', str(NC), '-d', 'int16', '-a', 'ans',
                  '--spatial-diff', '0'])
    assert _spatial(tmp_path_ / 'c.ch') is False
    cli_compress([str(raw), str(tmp_path_ / 'c2.cbin'),
                  str(tmp_path_ / 'c2.ch'), '-s', str(SR),
                  '-n', str(NC), '-d', 'int16', '-a', 'ans',
                  '--spatial-diff', 'auto'])
    assert _spatial(tmp_path_ / 'c2.ch') is True
