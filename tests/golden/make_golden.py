"""Regenerate the golden-file corpus (run from the repo root).

The corpus pins the on-disk formats across framework versions:

- ``np_*.bin``      deterministic raw input (seeded RNG)
- ``zlib_*.cbin/.ch``  legacy v1 output — must stay byte-identical to
  what the reference implementation produces for the same input
- ``ans_*.cbin/.ch``   format v2 output at the time the corpus was
  frozen — future readers must keep decoding it byte-exactly (writers
  may diverge: v2 containers are versioned by the `algorithm` field
  and header, and the reader never assumes writer details)

Only regenerate when the format intentionally changes; the tests in
``test_golden.py`` otherwise guarantee old files stay readable.

CAUTION: a full run rewrites EVERY artifact with the current writer,
destroying the frozen past-version bytes (e.g. the pre-segment-default
plane containers). When adding a case, pass its name as argv[1] to
regenerate only that artifact: ``python make_golden.py f32_11ch``.
"""

import sys

from pathlib import Path

import numpy as np

HERE = Path(__file__).parent


def signal(ns, nc, seed, dtype, hetero=False):
    rng = np.random.default_rng(seed)
    if hetero:
        stds = np.logspace(0.0, 1.6, nc)
        steps = rng.normal(0, 1, size=(ns, nc)) * stds
    else:
        steps = rng.normal(0, 4, size=(ns, nc))
    walk = np.cumsum(steps, axis=0)
    return np.clip(walk, -30000, 30000).astype(dtype)


CASES = [
    ('int16_19ch', dict(ns=3000, nc=19, seed=0, dtype=np.int16), 1234.0),
    ('uint8_7ch', dict(ns=2000, nc=7, seed=1, dtype=np.uint8), 500.0),
]

# ans-only artifacts exercising the multi-table plane layout
# (flags bit4): channel-heterogeneous input, clustered segment tables.
MT_CASES = [
    ('mt_int16_48ch',
     dict(ns=4000, nc=48, seed=2, dtype=np.int16, hetero=True), 1000.0),
]

# v2 sidecar-extension artifacts: once frozen, every future reader must
# keep decoding these byte-exactly even if the writer defaults change.
#  - o2_int16: `time_diff_order: 2` (second-order time prediction) —
#    smooth data so the order-2 probe genuinely wins;
#  - f32:      `float_bitcast: true` (integer view of the IEEE bits).


def smooth_signal(ns, nc, seed):
    """Twice-integrated noise: near-linear locally, order-2 friendly."""
    rng = np.random.default_rng(seed)
    accel = rng.normal(0, 0.02, size=(ns, nc))
    walk = np.cumsum(np.cumsum(accel, axis=0), axis=0)
    return np.clip(walk, -30000, 30000).astype(np.int16)


def main():
    from mtscomp_tpu import compress
    only = sys.argv[1] if len(sys.argv) > 1 else None

    def wanted(name):
        return only is None or only in name

    for name, kw, rate in CASES:
        if not wanted(name):
            continue
        arr = signal(**kw)
        raw = HERE / ('np_%s.bin' % name)
        arr.tofile(raw)
        for algo in ('zlib', 'ans'):
            compress(raw, HERE / ('%s_%s.cbin' % (algo, name)),
                     HERE / ('%s_%s.ch' % (algo, name)),
                     sample_rate=rate, n_channels=kw['nc'],
                     dtype=np.dtype(kw['dtype']).name, algorithm=algo,
                     quiet=True)
    for name, kw, rate in MT_CASES:
        if not wanted(name):
            continue
        arr = signal(**kw)
        raw = HERE / ('np_%s.bin' % name)
        arr.tofile(raw)
        compress(raw, HERE / ('ans_%s.cbin' % name),
                 HERE / ('ans_%s.ch' % name),
                 sample_rate=rate, n_channels=kw['nc'],
                 dtype=np.dtype(kw['dtype']).name, algorithm='ans',
                 ans_table_mode='segment', ans_seg_log2=13, quiet=True)

    if wanted('o2_int16_17ch'):
        arr = smooth_signal(ns=3000, nc=17, seed=3)
        raw = HERE / 'np_o2_int16_17ch.bin'
        arr.tofile(raw)
        compress(raw, HERE / 'ans_o2_int16_17ch.cbin',
                 HERE / 'ans_o2_int16_17ch.ch',
                 sample_rate=800.0, n_channels=17, dtype='int16',
                 algorithm='ans', time_diff_order=2, quiet=True)

    if wanted('adapt_int16_13ch'):
        # Per-chunk transform descriptors (flags bit5): drifting signal
        # (noise half -> smooth half) so the adaptive windows genuinely
        # switch transforms mid-file; freezes the bit5 container layout.
        rng = np.random.default_rng(5)
        half = 2000
        noise = np.cumsum(rng.normal(0, 8, size=(half, 13)), axis=0)
        accel = rng.normal(0, 0.02, size=(half, 13))
        smooth = np.cumsum(np.cumsum(accel, axis=0), axis=0) * 50
        arr = np.clip(np.concatenate([noise, smooth]), -30000,
                      30000).astype(np.int16)
        raw = HERE / 'np_adapt_int16_13ch.bin'
        arr.tofile(raw)
        compress(raw, HERE / 'ans_adapt_int16_13ch.cbin',
                 HERE / 'ans_adapt_int16_13ch.ch',
                 sample_rate=1000.0, n_channels=13, dtype='int16',
                 algorithm='ans', transform_adapt=2, quiet=True)


    if wanted('ts_int16_129ch'):
        # Ragged-tail segment split (flags bit6): 129 channels at
        # seg_log2=12 -> k=4 segments, 33 per plane, the 33rd ragged ->
        # the writer splits it into 8 sub-rows. Freezes the bit6 layout.
        rng = np.random.default_rng(6)
        arr = np.clip(np.cumsum(rng.normal(0, 5, size=(2500, 129)),
                                axis=0), -30000, 30000).astype(np.int16)
        raw = HERE / 'np_ts_int16_129ch.bin'
        arr.tofile(raw)
        compress(raw, HERE / 'ans_ts_int16_129ch.cbin',
                 HERE / 'ans_ts_int16_129ch.ch',
                 sample_rate=1000.0, n_channels=129, dtype='int16',
                 algorithm='ans', ans_seg_log2=12, quiet=True)

    if wanted('f32_11ch'):
        rng = np.random.default_rng(4)
        arr = np.cumsum(rng.normal(0, 0.5, size=(2500, 11)),
                        axis=0).astype(np.float32)
        raw = HERE / 'np_f32_11ch.bin'
        arr.tofile(raw)
        compress(raw, HERE / 'ans_f32_11ch.cbin',
                 HERE / 'ans_f32_11ch.ch',
                 sample_rate=600.0, n_channels=11, dtype='float32',
                 algorithm='ans', quiet=True)
    print("golden corpus regenerated under", HERE,
          "(only=%s)" % only if only else "(all)")


if __name__ == '__main__':
    main()
