#!/usr/bin/env python
"""A/B the second-order time predictor (``time_diff_order``) on the
BASELINE configs.

Per config: compress under order 1 (the reference transform), forced
order 2, and 'auto' (the shipped default: probe chunk 0, keep the
winner with a 2% margin). Reports ratio and encode wall time so the
keep/drop rule from VERDICT round 2 item 8 — keep if >= +3% ratio at
< 10% encode cost on the configs where it engages — is checked by a
measurement, not an estimate.

Configs:
- ap_band: the headline BASELINE.json config — 385 ch int16 @ 30 kHz
  random-walk (diff std ~6). The first diff is already white noise,
  so order 2 must NOT engage (auto -> 1, zero cost beyond the probe).
- lfp_band: 385 ch int16 @ 2.5 kHz oversampled oscillatory band (the
  reference README's own use case for LFP files). Order 2 engages.
- lfp_real_noise: same with a realistic noise floor (diff std ~3).

Usage: python tools/order2_ab.py [--seconds N]
One JSON line per (config, mode) to stdout; human table to stderr.
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np


def make(config, seconds):
    C = 385
    if config == 'ap_band':
        T = 30000 * seconds
        rng = np.random.default_rng(0)
        return np.cumsum(rng.normal(0.0, 6.0, size=(T, C)),
                         axis=0).astype(np.int16), 30000.0
    T = int(2500 * seconds * 12)  # same sample count as ap at 2.5 kHz
    rng = np.random.default_rng(1)
    t = np.arange(T) / 2500.0
    phase = rng.uniform(0, 2 * np.pi, C)
    x = (np.sin(2 * np.pi * 8.0 * t[:, None] + phase) * 9000.
         + np.sin(2 * np.pi * 1.5 * t[:, None] + phase * 0.7) * 4000.)
    noise_std = 3.0 if config == 'lfp_real_noise' else 30.0
    x = x + rng.normal(0, noise_std, (T, C))
    return x.astype(np.int16), 2500.0


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
        for mode in (1, 2, 'auto'):
            best = None
            for _ in range(3):
                cb, ch = tmp / ('%s.cbin' % mode), tmp / ('%s.ch' % mode)
                for p in (cb, ch):
                    if p.exists():
                        p.unlink()
                t0 = time.time()
                compress(raw, cb, ch, sample_rate=sr, n_channels=385,
                         dtype='int16', algorithm='ans', quiet=True,
                         check_after_compress=False, time_diff_order=mode)
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            picked = json.load(open(ch)).get('time_diff_order', 1)
            rows.append(dict(config=config, mode=str(mode),
                             picked_order=picked,
                             ratio=round(arr.nbytes / cb.stat().st_size, 4),
                             size=cb.stat().st_size,
                             encode_s=round(best, 3),
                             encode_mbps=round(arr.nbytes / 1e6 / best, 1)))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seconds', type=int, default=2)
    args = ap.parse_args()
    all_rows = []
    for config in ('ap_band', 'lfp_band', 'lfp_real_noise'):
        rows = run(config, args.seconds)
        all_rows += rows
        base = rows[0]
        for r in rows:
            r['ratio_vs_order1'] = round(r['ratio'] / base['ratio'] - 1, 4)
            r['cost_vs_order1'] = round(
                r['encode_s'] / base['encode_s'] - 1, 4)
            print(json.dumps(r))
            print("%-16s mode=%-5s picked=%d ratio=%.3f (%+.1f%%) "
                  "encode=%.0f MB/s (%+.1f%%)" % (
                      r['config'], r['mode'], r['picked_order'], r['ratio'],
                      100 * r['ratio_vs_order1'], r['encode_mbps'],
                      100 * r['cost_vs_order1']), file=sys.stderr)
    return 0


if __name__ == '__main__':
    sys.exit(main())
