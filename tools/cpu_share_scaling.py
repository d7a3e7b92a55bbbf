#!/usr/bin/env python
"""Validate the auto-routing per-core extrapolation on a 1-CPU VM.

``tools/scaling_matrix.py`` is the cores-vs-MB/s protocol for real
multi-core hosts; this VM has ONE core, so thread scaling cannot be
measured here. What CAN be measured is the premise under it: the host
codec's single-stream rate is compute-bound and scales linearly with
the CPU share it gets. Each cell runs a FRESH child process pinned into
a cgroup (v1 cpu controller) with a cfs quota of {1.0, 0.5, 0.25}
cores and times the same encode/decode block host_profile() uses
(larger, more reps). If rate tracks share ~linearly, extrapolating a
measured single-core rate by core count is sound to first order (and
the routing decision only needs ~100x separation).

Requires root + writable /sys/fs/cgroup/cpu (this dev VM has both).
Prints one JSON object and appends nothing; callers record the output.
"""

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
CG_BASE = '/sys/fs/cgroup/cpu'
PERIOD = 100000

CHILD = r"""
import json, os, sys, time
import numpy as np
sys.path.insert(0, %(root)r)
cg = %(cg)r
if cg:
    with open(os.path.join(cg, 'cgroup.procs'), 'w') as f:
        f.write(str(os.getpid()))
from mtscomp_tpu.codec.ans import AnsCodec
from mtscomp_tpu.ops.delta import cumsum_along_axis
ns, nc = 65536, 128                     # 16 MB int16
rng = np.random.default_rng(0)
arr = np.ascontiguousarray(np.cumsum(
    rng.normal(0.0, 6.0, size=(ns, nc)), axis=0).astype(np.int16))
codec = AnsCodec()
# Sustained-average timing, NOT best-of-N: cfs throttling meters CPU
# per 100 ms period, so a single rep that fits inside one period's
# quota runs at full speed and min-timing would hide the cap entirely.
# >= 3 s of continuous work averages across many periods.
payload = codec.encode(arr, order='F', time_diff_pending=True)  # warmup


def sustained(fn):
    t0 = time.perf_counter()
    done = 0
    while True:
        fn()
        done += arr.nbytes
        dt = time.perf_counter() - t0
        if dt >= 3.0:
            return done / dt / 1e6


enc = sustained(lambda: codec.encode(arr, order='F',
                                     time_diff_pending=True))


def dec_once():
    out = codec.decode(payload, ns, nc, arr.dtype, order='F')
    cumsum_along_axis(out, axis=0, inplace=True)


dec = sustained(dec_once)
print(json.dumps({'encode_mbps': enc, 'decode_mbps': dec}))
"""


def run_cell(share):
    cg = None
    if share is not None:
        cg = os.path.join(CG_BASE, 'mts_share_%d' % int(share * 100))
        os.makedirs(cg, exist_ok=True)
        with open(os.path.join(cg, 'cpu.cfs_period_us'), 'w') as f:
            f.write(str(PERIOD))
        with open(os.path.join(cg, 'cpu.cfs_quota_us'), 'w') as f:
            f.write(str(int(share * PERIOD)))
    try:
        out = subprocess.run(
            [sys.executable, '-c', CHILD % {'root': str(ROOT),
                                            'cg': cg or ''}],
            capture_output=True, text=True, timeout=600)
        if out.returncode != 0:
            raise RuntimeError(out.stderr[-2000:])
        return json.loads(out.stdout.strip().splitlines()[-1])
    finally:
        if cg:
            # Empty after the child exits; best-effort removal.
            try:
                os.rmdir(cg)
            except OSError:
                pass


def main():
    if not os.access(os.path.join(CG_BASE, 'cgroup.procs'), os.W_OK):
        print(json.dumps({'error': 'cgroup cpu controller not writable'}))
        return 1
    rows = []
    for share in (1.0, 0.5, 0.25):
        cell = run_cell(share)
        cell['cpu_share'] = share
        rows.append(cell)
        print(json.dumps(cell), flush=True)
    base = rows[0]
    lin = {
        'encode_linearity': [round(r['encode_mbps']
                                   / (base['encode_mbps'] * r['cpu_share']),
                                   3) for r in rows],
        'decode_linearity': [round(r['decode_mbps']
                                   / (base['decode_mbps'] * r['cpu_share']),
                                   3) for r in rows],
    }
    print(json.dumps({'rows': rows, **lin}))
    return 0


if __name__ == '__main__':
    sys.exit(main())
