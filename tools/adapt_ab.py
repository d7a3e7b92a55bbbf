#!/usr/bin/env python
"""A/B: periodic transform adaptation (--adapt) vs the global chunk-0
probe, on recordings whose statistics drift mid-file.

The reference's transform (and our default) is chosen once per file;
`transform_adapt=N` re-probes every N chunks and stamps each chunk's
transform into its container (FORMAT.md, flags bit5). This measures
the ratio gain on synthetic drifting signals and verifies exactness +
byte determinism. Host-only (no device), one JSON line per config.

Usage: python tools/adapt_ab.py
"""
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def signals():
    rng = np.random.default_rng(0)
    C, csz, n = 64, 2500, 24
    half = csz * n // 2
    t = np.arange(half)

    noise = np.cumsum(rng.normal(0, 8, size=(half, C)), axis=0)
    lfp = (800 * np.sin(2 * np.pi * 4 * t / csz)[:, None]
           + np.cumsum(rng.normal(0, .6, size=(half, C)), axis=0))
    yield ('noise_to_lfp', csz, C,
           np.concatenate([noise, lfp]).astype(np.int16))

    indep = np.cumsum(rng.normal(0, 8, size=(half, C)), axis=0)
    common = (np.cumsum(rng.normal(0, 60, size=(half, 1)), axis=0)
              + np.cumsum(rng.normal(0, .5, size=(half, C)), axis=0))
    yield ('indep_to_common', csz, C,
           np.concatenate([indep, common]).astype(np.int16))

    # Alternating epochs (artifact bursts): adaptation must follow.
    parts = []
    for i in range(n):
        if (i // 3) % 2 == 0:
            parts.append(np.cumsum(rng.normal(0, 8, (csz, C)), axis=0))
        else:
            tt = np.arange(csz)
            parts.append(700 * np.sin(2 * np.pi * 5 * tt / csz)[:, None]
                         + np.cumsum(rng.normal(0, .5, (csz, C)), axis=0))
    yield ('alternating_epochs', csz, C,
           np.concatenate(parts).astype(np.int16))

    # Statistically stationary control: adaptation must NOT lose.
    yield ('stationary_ap', csz, C,
           np.cumsum(rng.normal(0, 6, size=(csz * n, C)),
                     axis=0).astype(np.int16))


def main():
    from mtscomp_tpu import compress, decompress
    import mtscomp_tpu.config as cfg
    cfg.CONFIG_PATH = Path(tempfile.mkdtemp()) / '.mtscomp'
    for name, csz, C, arr in signals():
        tmp = Path(tempfile.mkdtemp())
        raw = tmp / 'r.bin'
        arr.tofile(raw)
        res = {'config': name}
        for tag, kw in (('static', {}), ('adapt', {'transform_adapt': 3})):
            r = compress(raw, tmp / (tag + '.cbin'), tmp / (tag + '.ch'),
                         sample_rate=float(csz), n_channels=C,
                         dtype='int16', algorithm='ans', quiet=True,
                         check_after_compress=False, **kw)
            res['ratio_' + tag] = round(1.0 / r, 4)
            rd = decompress(tmp / (tag + '.cbin'), tmp / (tag + '.ch'),
                            quiet=True)
            try:
                assert np.array_equal(rd[:], arr), 'round trip mismatch'
            finally:
                rd.close()
        res['gain_pct'] = round(100 * (res['ratio_adapt']
                                       / res['ratio_static'] - 1), 2)
        print(json.dumps(res))
    return 0


if __name__ == '__main__':
    sys.exit(main())
