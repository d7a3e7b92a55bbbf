#!/usr/bin/env python
"""Host multi-core scaling matrix: compress / decompress MB/s vs thread
count (the C++ pool paths) and vs worker-process count (--parts).

The round-1/2 dev VM has ONE CPU core, so thread-scaling claims cannot
be measured there (STATUS.md records this); this harness is the
measurement protocol for any multi-core host: run it, commit the JSON,
and REPORT.md's cores-vs-MB/s table comes from it.

    python tools/scaling_matrix.py [--seconds 8] [--out SCALING.json]

Prints a table and writes JSON. Threads sweep {1, 2, 4, ..., nproc};
each cell is the median of 3 fresh in-process reps (for cross-process
rigor run the script once per thread count via MTS_SCALING_THREADS).
"""

import argparse
import json
import multiprocessing
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def measure(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seconds', type=int, default=8,
                    help='recording length (385 ch @ 30 kHz int16)')
    ap.add_argument('--out', default='SCALING.json')
    ap.add_argument('--threads', type=str, default=None,
                    help='comma list overriding the {1,2,4,..,nproc} sweep')
    args = ap.parse_args()

    import mtscomp_tpu.config as cfg
    cfg.CONFIG_PATH = Path(tempfile.mkdtemp()) / '.mtscomp'
    from mtscomp_tpu import compress, decompress

    nproc = multiprocessing.cpu_count()
    if args.threads:
        sweep = [int(x) for x in args.threads.split(',')]
    else:
        sweep = []
        t = 1
        while t < nproc:
            sweep.append(t)
            t *= 2
        sweep.append(nproc)
        sweep = sorted(set(sweep))

    T, C, SR = 30000, 385, 30000.0
    rng = np.random.default_rng(0)
    arr = np.cumsum(rng.normal(0.0, 6.0, size=(T * args.seconds, C)),
                    axis=0).astype(np.int16)
    tmp = Path(tempfile.mkdtemp())
    raw = tmp / 's.bin'
    arr.tofile(raw)
    mb = arr.nbytes / 1e6

    rows = []
    for nt in sweep:
        enc_dt = measure(lambda: compress(
            raw, tmp / 'c.cbin', tmp / 'c.ch', sample_rate=SR,
            n_channels=C, dtype='int16', algorithm='ans', quiet=True,
            check_after_compress=False, n_threads=nt, device='none'))
        r = decompress(tmp / 'c.cbin', tmp / 'c.ch', quiet=True,
                       n_threads=nt, device='none',
                       check_after_decompress=False)
        try:
            dec_dt = measure(lambda: r.tofile(tmp / 'd.bin',
                                              overwrite=True))
        finally:
            r.close()
        row = dict(n_threads=nt,
                   compress_mbps=round(mb / enc_dt, 1),
                   decompress_mbps=round(mb / dec_dt, 1))
        rows.append(row)
        print("threads=%2d  compress %7.1f MB/s  decompress %7.1f MB/s"
              % (nt, row['compress_mbps'], row['decompress_mbps']),
              flush=True)

    # Process-level scaling (--parts N --workers W): the multi-host
    # execution model on one machine. Only meaningful with >1 core.
    part_rows = []
    if nproc > 1:
        from mtscomp_tpu.parallel.distributed import compress_multihost
        for nw in [w for w in sweep if w > 1][:3]:
            pdir = tmp / ('parts%d' % nw)
            dt = measure(lambda: compress_multihost(
                raw, tmp / 'm.cbin', tmp / 'm.ch', n_parts=nw,
                n_workers=nw, part_dir=pdir, sample_rate=SR,
                n_channels=C, dtype='int16', algorithm='ans',
                quiet=True, device='none'), reps=1)
            for p in pdir.glob('part_*'):
                p.unlink()
            part_rows.append(dict(n_workers=nw,
                                  compress_mbps=round(mb / dt, 1)))
            print("workers=%2d  parts-compress %7.1f MB/s"
                  % (nw, part_rows[-1]['compress_mbps']), flush=True)

    result = dict(cpu_count=nproc, mb=round(mb, 1), threads=rows,
                  part_workers=part_rows,
                  note=('single-core host: thread SCALING is '
                        'unmeasurable here (and a >1-core cfs quota is '
                        'meaningless with one runqueue); threads>1 rows '
                        'measure pool CONTENTION under oversubscription '
                        'instead — a flat rate means the worker pool '
                        'adds no lock/handoff overhead'
                        if nproc == 1 else ''))
    # Update in place: keep sections other harnesses contributed
    # (cpu_share_validation from tools/cpu_share_scaling.py).
    out = Path(args.out)
    if out.exists():
        try:
            prev = json.loads(out.read_text())
            prev.update(result)
            result = prev
        except ValueError:
            pass
    out.write_text(json.dumps(result, indent=1))
    print('-> %s' % args.out)
    return 0


if __name__ == '__main__':
    sys.exit(main())
