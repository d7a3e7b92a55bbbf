"""Second-order time prediction (``time_diff_order``), a v2 sidecar
extension beyond the reference transform (mtscomp.py:143-169 is always
order 1).

Order 2 codes the diff-of-diff: oversampled/LFP-like bands compress
substantially better (the first difference of a smooth signal is still
strongly correlated), noise-dominated bands worse (the second
difference doubles white-noise variance) — so the default is 'auto',
which probes chunk 0 both ways and keeps the winner with a 2% margin.
Every reader path (host chunk, host bulk, column-restricted, device
batch, stream, transcode) must invert it byte-exactly, and absent-key
files must keep decoding as order 1.
"""

import json

import numpy as np
import pytest

from mtscomp_tpu import (StreamReader, StreamWriter, compress, decompress,
                         transcode, verify_file)

from conftest import tmp_path_  # noqa: F401

SR = 2500.0
NC = 13
NS = 4 * 2500 + 333   # partial last chunk


def lfp_like(ns=NS, nc=NC, seed=0):
    """Oscillatory, oversampled signal: order 2 wins big."""
    rng = np.random.RandomState(seed)
    t = np.arange(ns) / SR
    x = (np.sin(2 * np.pi * 8.0 * t)[:, None] * 12000.
         + np.cos(2 * np.pi * 13.0 * t)[:, None] * 3000.
         + rng.normal(0, 30., (ns, nc)))
    return x.astype(np.int16)


def noise_like(ns=NS, nc=NC, seed=1):
    """White noise: the second difference hurts; auto must pick 1."""
    rng = np.random.RandomState(seed)
    return rng.normal(0, 1000., (ns, nc)).astype(np.int16)


def _compress(tmp, arr, name, **kwargs):
    raw = tmp / (name + '.bin')
    arr.tofile(str(raw))
    kwargs.setdefault('sample_rate', SR)
    kwargs.setdefault('n_channels', arr.shape[1])
    kwargs.setdefault('dtype', arr.dtype)
    kwargs.setdefault('algorithm', 'ans')
    kwargs.setdefault('quiet', True)
    # This module targets the ORDER machinery: lfp_like's shared
    # carrier is also strongly channel-correlated, so the joint auto
    # probe would otherwise pick the spatial diff here (that interplay
    # is covered in test_spatial_auto.py).
    kwargs.setdefault('do_spatial_diff', False)
    compress(raw, tmp / (name + '.cbin'), tmp / (name + '.ch'), **kwargs)
    return tmp / (name + '.cbin'), tmp / (name + '.ch')


def _order(ch):
    return json.loads(ch.read_text()).get('time_diff_order', 1)


def test_auto_picks_order2_on_lfp_and_wins(tmp_path_):
    arr = lfp_like()
    cb2, ch2 = _compress(tmp_path_, arr, 'auto')
    assert _order(ch2) == 2
    cb1, ch1 = _compress(tmp_path_, arr, 'o1', time_diff_order=1)
    assert _order(ch1) == 1
    # The probe exists to win: require a real ratio improvement.
    assert cb2.stat().st_size < 0.95 * cb1.stat().st_size
    for cb, ch in ((cb1, ch1), (cb2, ch2)):
        with decompress(cb, ch, quiet=True) as r:
            assert np.array_equal(r[:], arr)


def test_auto_stays_order1_on_noise(tmp_path_):
    cb, ch = _compress(tmp_path_, noise_like(), 'n')
    assert _order(ch) == 1
    assert 'time_diff_order' not in json.loads(ch.read_text())


def test_zlib_never_order2(tmp_path_):
    """zlib output must stay byte-identical to the reference: the
    explicit flag is ignored for non-ans algorithms."""
    cb, ch = _compress(tmp_path_, lfp_like(), 'z', algorithm='zlib',
                       time_diff_order=2)
    assert _order(ch) == 1
    with decompress(cb, ch, quiet=True) as r:
        assert np.array_equal(r[:], lfp_like())


def test_invalid_order_raises(tmp_path_):
    with pytest.raises(ValueError):
        _compress(tmp_path_, lfp_like(), 'bad', time_diff_order=3)


def test_device_encode_byte_identical(tmp_path_):
    arr = lfp_like()
    cbh, chh = _compress(tmp_path_, arr, 'h', time_diff_order=2,
                         check_after_compress=False)
    cbd, chd = _compress(tmp_path_, arr, 'd', time_diff_order=2,
                         check_after_compress=False, device='cpu')
    assert cbh.read_bytes() == cbd.read_bytes()
    assert _order(chd) == 2


def test_device_decode_and_windows(tmp_path_):
    arr = lfp_like()
    cb, ch = _compress(tmp_path_, arr, 'dd', time_diff_order=2)
    with decompress(cb, ch, device='cpu', quiet=True) as r:
        assert np.array_equal(r.to_array(), arr)
        # windowed reads through the device chunk cache
        assert np.array_equal(r[1000:6000, 3:9], arr[1000:6000, 3:9])
        assert np.array_equal(r[-700:], arr[-700:])


def test_column_restricted_read(tmp_path_):
    arr = lfp_like()
    cb, ch = _compress(tmp_path_, arr, 'col', time_diff_order=2)
    with decompress(cb, ch, quiet=True) as r:
        assert np.array_equal(r[:, [2, 7]], arr[:, [2, 7]])
        assert np.array_equal(r[500:900, 5], arr[500:900, 5])


def test_order2_int64_and_float32(tmp_path_):
    t = np.arange(NS) / SR
    base = np.sin(2 * np.pi * 5.0 * t)[:, None] * 3e9
    a64 = (base + np.random.RandomState(2).normal(0, 1e4, (NS, NC))
           ).astype(np.int64)
    cb, ch = _compress(tmp_path_, a64, 'i64', time_diff_order=2)
    with decompress(cb, ch, quiet=True) as r:
        assert np.array_equal(r[:], a64)
    f32 = (base / 1e9).astype(np.float32) \
        + np.random.RandomState(3).normal(0, 1e-3, (NS, NC)
                                          ).astype(np.float32)
    cb, ch = _compress(tmp_path_, f32, 'f32', time_diff_order=2)
    assert json.loads(ch.read_text()).get('float_bitcast') is True
    with decompress(cb, ch, quiet=True) as r:
        out = r[:]
        assert out.dtype == np.float32
        assert out.tobytes() == f32.tobytes()


def test_stream_matches_batch_order2(tmp_path_):
    arr = lfp_like()
    cb, ch = _compress(tmp_path_, arr, 'b', time_diff_order=2)
    rng = np.random.default_rng(7)
    with StreamWriter(tmp_path_ / 's.cbin', tmp_path_ / 's.ch',
                      sample_rate=SR, n_channels=NC, dtype='int16',
                      algorithm='ans', time_diff_order=2) as w:
        i = 0
        while i < arr.shape[0]:
            n = int(rng.integers(1, 4000))
            w.append(arr[i:i + n])
            i += n
    assert (tmp_path_ / 's.cbin').read_bytes() == cb.read_bytes()
    assert _order(tmp_path_ / 's.ch') == 2


def test_stream_resume_keeps_order(tmp_path_):
    arr = lfp_like()
    cut = 2 * 2500   # resume requires whole chunks on disk
    w = StreamWriter(tmp_path_ / 'r.cbin', tmp_path_ / 'r.ch',
                     sample_rate=SR, n_channels=NC, dtype='int16',
                     algorithm='ans', time_diff_order=2)
    w.append(arr[:cut])
    w.close()
    w2 = StreamWriter.resume(tmp_path_ / 'r.cbin', tmp_path_ / 'r.ch')
    assert w2.time_diff_order == 2
    w2.append(arr[cut:])
    w2.close()
    with StreamReader(tmp_path_ / 'r.cbin', tmp_path_ / 'r.ch') as sr:
        assert np.array_equal(sr[:], arr)


def test_stream_auto_probes_first_flush(tmp_path_):
    """Streaming 'auto' runs the batch probe on the first buffered
    chunk: an LFP-like stream under the DEFAULT config must produce
    bytes identical to compress() of the finished recording (which
    picks order 2 here) — not silently lose the order-2 ratio win."""
    arr = lfp_like()
    cb, ch = _compress(tmp_path_, arr, 'ba')          # auto -> order 2
    assert _order(ch) == 2
    with StreamWriter(tmp_path_ / 'a.cbin', tmp_path_ / 'a.ch',
                      sample_rate=SR, n_channels=NC, dtype='int16',
                      algorithm='ans', do_spatial_diff=False) as w:
        assert w.time_diff_order == 1   # unresolved until first flush
        for i in range(0, arr.shape[0], 777):
            w.append(arr[i:i + 777])
    assert _order(tmp_path_ / 'a.ch') == 2
    assert (tmp_path_ / 'a.cbin').read_bytes() == cb.read_bytes()
    assert (json.loads((tmp_path_ / 'a.ch').read_text())['sha1_compressed']
            == json.loads(ch.read_text())['sha1_compressed'])


def test_stream_auto_probes_partial_tail_flush(tmp_path_):
    """A stream shorter than one chunk probes at the close()-time
    partial flush — still byte-identical to the batch compress (whose
    chunk 0 is the whole short recording)."""
    arr = lfp_like(ns=900)
    cb, ch = _compress(tmp_path_, arr, 'short')
    with StreamWriter(tmp_path_ / 'p.cbin', tmp_path_ / 'p.ch',
                      sample_rate=SR, n_channels=NC, dtype='int16',
                      algorithm='ans', do_spatial_diff=False) as w:
        w.append(arr)
    assert (tmp_path_ / 'p.cbin').read_bytes() == cb.read_bytes()
    assert _order(tmp_path_ / 'p.ch') == _order(ch)


def test_stream_auto_stays_order1_on_noise(tmp_path_):
    """The stream probe keeps the reference transform when order 2
    would hurt (white noise), like the batch probe."""
    arr = noise_like()
    with StreamWriter(tmp_path_ / 'n.cbin', tmp_path_ / 'n.ch',
                      sample_rate=SR, n_channels=NC, dtype='int16',
                      algorithm='ans', do_spatial_diff=False) as w:
        w.append(arr)
    assert _order(tmp_path_ / 'n.ch') == 1
    assert 'time_diff_order' not in \
        json.loads((tmp_path_ / 'n.ch').read_text())


def test_transcode_inherits_and_overrides(tmp_path_):
    arr = lfp_like()
    cb2, ch2 = _compress(tmp_path_, arr, 't', time_diff_order=2)
    # ans(2) -> zlib: forced back to order 1, decodes exactly
    transcode(cb2, ch2, tmp_path_ / 'z.cbin', tmp_path_ / 'z.ch',
              algorithm='zlib')
    assert _order(tmp_path_ / 'z.ch') == 1
    with decompress(tmp_path_ / 'z.cbin', tmp_path_ / 'z.ch',
                    quiet=True) as r:
        assert np.array_equal(r[:], arr)
    # zlib -> ans with explicit order 2: identical bytes to direct write
    transcode(tmp_path_ / 'z.cbin', tmp_path_ / 'z.ch',
              tmp_path_ / 'a.cbin', tmp_path_ / 'a.ch', algorithm='ans',
              time_diff_order=2)
    assert (tmp_path_ / 'a.cbin').read_bytes() == cb2.read_bytes()
    # ans(2) -> ans (re-segment): inherits the source's order
    transcode(cb2, ch2, tmp_path_ / 'i.cbin', tmp_path_ / 'i.ch',
              algorithm='ans')
    assert _order(tmp_path_ / 'i.ch') == 2
    with decompress(tmp_path_ / 'i.cbin', tmp_path_ / 'i.ch',
                    quiet=True) as r:
        assert np.array_equal(r[:], arr)


def test_verify_and_chop_order2(tmp_path_):
    arr = lfp_like()
    cb, ch = _compress(tmp_path_, arr, 'v', time_diff_order=2)
    res = verify_file(cb, ch, quiet=True)
    assert res['ok']
    with decompress(cb, ch, quiet=True) as r:
        r.chop(2, tmp_path_ / 'chopped.cbin')
    with decompress(tmp_path_ / 'chopped.cbin',
                    tmp_path_ / 'chopped.ch', quiet=True) as rc:
        assert _order(tmp_path_ / 'chopped.ch') == 2
        assert np.array_equal(rc[:], arr[:rc.n_samples])


def test_cli_diff_order_flag(tmp_path_):
    from mtscomp_tpu import cli
    arr = lfp_like()
    raw = tmp_path_ / 'c.bin'
    arr.tofile(str(raw))
    cli.mtscomp([str(raw), str(tmp_path_ / 'c.cbin'), '-s', str(SR),
                 '-n', str(NC), '-d', 'int16', '--algorithm', 'ans',
                 '--diff-order', '2'])
    assert _order(tmp_path_ / 'c.ch') == 2
    with decompress(tmp_path_ / 'c.cbin', tmp_path_ / 'c.ch',
                    quiet=True) as r:
        assert np.array_equal(r[:], arr)


def test_ranged_parts_auto_merge_matches_one_shot(tmp_path_):
    """Distributed seam for the 'auto' default: every ranged part
    probes chunk 0 of the WHOLE raw file (Writer.open runs the probe
    before write(first_chunk, last_chunk) selects a range), so parts
    of one session always resolve the same transform — mtsmerge must
    accept them and the merged file must be byte-identical to a
    one-shot compress, with a decoded hash equal to the raw stream's.
    (If the probe ever moved to each part's own first chunk, parts
    could legitimately resolve different orders and the
    decode-identity guard would refuse the advertised workflow.)"""
    import hashlib
    from mtscomp_tpu.parallel.distributed import (compress_range,
                                                  merge_parts, plan_ranges)
    arr = lfp_like()
    raw = tmp_path_ / 'd.bin'
    arr.tofile(str(raw))
    full_cb, full_ch = _compress(tmp_path_, arr, 'full')
    assert _order(full_ch) == 2         # auto engages on this signal
    n_chunks = len(json.loads(full_ch.read_text())['chunk_offsets']) - 1
    parts = []
    for first, last in plan_ranges(n_chunks, 2):
        cb = tmp_path_ / ('part%d.cbin' % first)
        ch = tmp_path_ / ('part%d.ch' % first)
        compress_range(raw, cb, ch, first, last, sample_rate=SR,
                       n_channels=NC, dtype='int16', algorithm='ans',
                       do_spatial_diff=False, quiet=True)
        assert _order(ch) == 2, "part resolved a different transform"
        parts.append((cb, ch))
    meta = merge_parts(parts, tmp_path_ / 'm.cbin', tmp_path_ / 'm.ch',
                       expected_n_chunks=n_chunks)
    assert (tmp_path_ / 'm.cbin').read_bytes() == full_cb.read_bytes()
    assert meta['sha1_uncompressed'] == \
        hashlib.sha1(arr.tobytes()).hexdigest()
    with decompress(tmp_path_ / 'm.cbin', tmp_path_ / 'm.ch',
                    quiet=True) as r:
        assert np.array_equal(r[:], arr)
