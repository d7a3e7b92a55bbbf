#!/usr/bin/env python
"""A/B harness for the staged Pallas encode kernel (fresh-process rule:
run once per variant per process; compare medians across >= 3 runs).

Mirrors bench.py's _device_encode_rate: one verified real encode stages
device-resident inputs, then the kernel closure is re-dispatched INNER
times per sync (relay sync ~30 ms would otherwise dominate).

Prints one JSON line: {"gbps": ..., "payload_ok": true}.
"""

import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir',
                      os.path.expanduser('~/.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    import mtscomp_tpu.config as cfg
    cfg.CONFIG_PATH = Path(tempfile.mkdtemp()) / '.mtscomp'
    from mtscomp_tpu import Writer
    from mtscomp_tpu.parallel.pipeline import DeviceBatchEncoder

    T, C, SR = 30000, 385, 30000.0
    B = int(os.environ.get('AB_BATCH', '4'))
    rng = np.random.default_rng(0)
    arr = np.cumsum(rng.normal(0.0, 6.0, size=(T * B, C)),
                    axis=0).astype(np.int16)
    tmp = Path(tempfile.mkdtemp())
    raw = tmp / 'enc.bin'
    arr.tofile(raw)
    w = Writer(algorithm='ans', quiet=True, ans_table_mode='plane')
    try:
        w.open(raw, sample_rate=SR, n_channels=C, dtype='int16')
        chunks = np.stack([np.asarray(w.get_chunk(i)) for i in range(B)])
        enc = DeviceBatchEncoder(w)
        assert enc.supported(T)
        payloads = enc.encode_batch(chunks)
        run = getattr(enc, 'last_kernel_run', None)
        assert payloads is not None and run is not None, "kernel did not run"
        host = w.codec.encode(w._transform_chunk(chunks[0]),
                              order=w.chunk_order)
        ok = payloads[0] == host

        inner = int(os.environ.get('AB_INNER', '8'))

        def run_once():
            for _ in range(inner):
                _, _, nw = run()
            return float(jnp.sum(nw[:, 0, 0]))

        run_once()
        times = []
        for _ in range(int(os.environ.get('AB_REPS', '8'))):
            t0 = time.time()
            run_once()
            times.append(time.time() - t0)
        dt = sorted(times)[len(times) // 2] / inner
        print(json.dumps({"gbps": round(chunks.nbytes / 1e9 / dt, 3),
                          "payload_ok": bool(ok)}))
    finally:
        w.close()
    return 0


if __name__ == '__main__':
    sys.exit(main())
