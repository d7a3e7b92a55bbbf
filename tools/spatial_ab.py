#!/usr/bin/env python
"""A/B the joint transform auto-probe (``do_spatial_diff='auto'`` x
``time_diff_order='auto'``) on channel-correlation regimes.

Per config: compress under the reference transform (order 1, spatial
off), forced spatial, and full auto (the shipped default: probe chunk 0
over every (order, spatial) candidate, keep the winner with a 2% margin
over the reference transform). Reports ratio + encode wall time so the
keep-rule (real ratio win where it engages, zero regression elsewhere)
is checked by a measurement.

Configs:
- ap_band: the headline BASELINE.json config — 385 ch int16 @ 30 kHz
  independent random walks. Channels are independent, so auto must
  keep the spatial diff OFF (the channel diff doubles white-noise
  variance).
- common_mode: independent walks + a strong shared artifact (movement/
  reference contamination — the classic ephys case for channel
  demixing). The spatial diff removes the shared term.
- lfp_field: smooth spatial modes x slow oscillations (neighboring
  LFP channels correlate); both the spatial diff and order 2 win —
  the JOINT probe must find the best combination.

Usage: python tools/spatial_ab.py [--seconds N]
One JSON line per (config, mode) to stdout; human table to stderr.
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make(config, seconds):
    C = 385
    if config == 'ap_band':
        T = 30000 * seconds
        rng = np.random.default_rng(0)
        return np.cumsum(rng.normal(0.0, 6.0, size=(T, C)),
                         axis=0).astype(np.int16), 30000.0
    if config == 'common_mode':
        T = 30000 * seconds
        rng = np.random.default_rng(1)
        ind = np.cumsum(rng.normal(0, 4.0, size=(T, C)), axis=0)
        cm = np.cumsum(rng.normal(0, 12.0, size=(T, 1)), axis=0)
        return (ind + cm).astype(np.int16), 30000.0
    # lfp_field: smooth spatial modes x slow oscillations + noise floor.
    T = int(2500 * seconds * 12)
    rng = np.random.default_rng(2)
    t = np.arange(T) / 2500.0
    k = 6
    freqs = rng.uniform(1.0, 30.0, k)
    phases = rng.uniform(0, 2 * np.pi, k)
    modes = np.stack([np.sin(2 * np.pi * f * t + p)
                      for f, p in zip(freqs, phases)])      # (k, T)
    x = np.linspace(0.0, 1.0, C)
    prof = np.stack([np.cos(2 * np.pi * (i + 1) * x / 4
                            + rng.uniform(0, 2 * np.pi))
                     for i in range(k)])                    # (k, C)
    sig = (modes.T @ prof) * 900.0 + rng.normal(0, 6.0, (T, C))
    return sig.astype(np.int16), 2500.0


MODES = (
    # (label, compress kwargs)
    ('reference', dict(time_diff_order=1, do_spatial_diff=False)),
    ('spatial', dict(time_diff_order=1, do_spatial_diff=True)),
    ('auto', dict(time_diff_order='auto', do_spatial_diff='auto')),
)


def run(config, seconds):
    import mtscomp_tpu.config as cfg
    from mtscomp_tpu import compress
    arr, sr = make(config, seconds)
    rows = []
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        cfg.CONFIG_PATH = tmp / '.mtscomp'
        raw = tmp / 'raw.bin'
        arr.tofile(raw)
        for label, kw in MODES:
            best = None
            for _ in range(3):
                cb, ch = tmp / ('%s.cbin' % label), tmp / ('%s.ch' % label)
                for p in (cb, ch):
                    if p.exists():
                        p.unlink()
                t0 = time.time()
                compress(raw, cb, ch, sample_rate=sr, n_channels=385,
                         dtype='int16', algorithm='ans', quiet=True,
                         check_after_compress=False, **kw)
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            meta = json.load(open(ch))
            rows.append(dict(
                config=config, mode=label,
                picked_order=meta.get('time_diff_order', 1),
                picked_spatial=bool(meta.get('do_spatial_diff', False)),
                ratio=round(arr.nbytes / cb.stat().st_size, 4),
                size=cb.stat().st_size,
                encode_s=round(best, 3),
                encode_mbps=round(arr.nbytes / 1e6 / best, 1)))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seconds', type=int, default=2)
    args = ap.parse_args()
    for config in ('ap_band', 'common_mode', 'lfp_field'):
        rows = run(config, args.seconds)
        base = rows[0]
        for r in rows:
            r['ratio_vs_reference'] = round(r['ratio'] / base['ratio'] - 1, 4)
            r['cost_vs_reference'] = round(
                r['encode_s'] / base['encode_s'] - 1, 4)
            print(json.dumps(r))
            print("%-12s mode=%-9s picked=(o%d,sp%d) ratio=%.3f (%+.1f%%) "
                  "encode=%.0f MB/s (%+.1f%%)" % (
                      r['config'], r['mode'], r['picked_order'],
                      r['picked_spatial'], r['ratio'],
                      100 * r['ratio_vs_reference'], r['encode_mbps'],
                      100 * r['cost_vs_reference']), file=sys.stderr)
    return 0


if __name__ == '__main__':
    sys.exit(main())
