#!/usr/bin/env python
"""Stage ablation for the staged device decode: time the full fused
decode, the rANS kernel alone, and (by difference) the finalize.

Fresh-process rule applies; sync-amortized timing like bench.py.
Prints one JSON line.
"""

import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _median_rate(nbytes, run_once, reps, inner):
    run_once()
    times = []
    for _ in range(reps):
        t0 = time.time()
        run_once()
        times.append(time.time() - t0)
    dt = sorted(times)[len(times) // 2] / inner
    return nbytes / 1e9 / dt


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir',
                      os.path.expanduser('~/.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    import mtscomp_tpu.config as cfg
    cfg.CONFIG_PATH = Path(tempfile.mkdtemp()) / '.mtscomp'
    from mtscomp_tpu import compress, decompress
    from mtscomp_tpu.parallel.pipeline import (DeviceBatchDecoder,
                                               _read_payload)
    from mtscomp_tpu.ops.pallas_rans import decode_groups_pallas

    T, C, SR = 30000, 385, 30000.0
    seconds = int(os.environ.get('BENCH_SECONDS', '4'))
    rng = np.random.default_rng(0)
    arr = np.cumsum(rng.normal(0.0, 6.0, size=(T * seconds, C)),
                    axis=0).astype(np.int16)
    tmp = Path(tempfile.mkdtemp())
    raw = tmp / 'bench.bin'
    arr.tofile(raw)
    compress(raw, tmp / 'bench.cbin', tmp / 'bench.ch', sample_rate=SR,
             n_channels=C, dtype='int16', algorithm='ans', quiet=True,
             check_after_compress=False)
    r = decompress(tmp / 'bench.cbin', tmp / 'bench.ch', quiet=True)
    try:
        parsed = [r.codec.parse(_read_payload(r, i))
                  for i in range(r.n_chunks)]
        dec = DeviceBatchDecoder(r)
        assert dec.supported(parsed, T)
        fn, dev_args = dec.pack(parsed, T)
        out, used = fn(*dev_args)
        assert np.array_equal(np.asarray(out).reshape(arr.shape), arr)
        (states, words, freqs, counts, coarse_pk, dense_pk, counts_b,
         const_vals, raw_vals, heads) = dev_args

        # Reconstruct the kernel statics the way pack/_build_decode_fn do.
        first = parsed[0]
        seg = first['seg']
        n_stream = first['n_stream']
        from mtscomp_tpu.models.rans import LANES
        S = -(-min(seg, n_stream) // LANES)
        spb_f = max(d for d in range(1, 129) if S % d == 0)

        # Mirror the production statics: pack() placed octet rows in
        # coarse_pk unless MTSCOMP_DEC_LOOKUP=coarse opted out.
        octet = os.environ.get('MTSCOMP_DEC_LOOKUP', '') != 'coarse'
        kern = jax.jit(lambda st, wd, cp, dp, cb: decode_groups_pallas(
            st, wd, cp, dp, cb, n_steps=S, small_alpha=True,
            steps_per_block=spb_f, one_fixup=True, octet=octet))

        inner = int(os.environ.get('BENCH_INNER', '8'))
        reps = int(os.environ.get('BENCH_REPS', '8'))

        def full_once():
            for _ in range(inner):
                o, _u = fn(*dev_args)
            return float(jnp.sum(o[:, ::61, ::17].astype(jnp.float32)))

        def kern_once():
            for _ in range(inner):
                syms, _u = kern(states, words, coarse_pk, dense_pk,
                                counts_b)
            return float(jnp.sum(syms[:, ::7, ::61].astype(jnp.float32)))

        full = _median_rate(arr.nbytes, full_once, reps, inner)
        konly = _median_rate(arr.nbytes, kern_once, reps, inner)
        # finalize-by-difference in ms per batch
        t_full = arr.nbytes / 1e9 / full
        t_kern = arr.nbytes / 1e9 / konly
        print(json.dumps({
            "full_gbps": round(full, 3),
            "kernel_gbps": round(konly, 3),
            "finalize_ms_per_batch": round((t_full - t_kern) * 1e3, 2),
            "kernel_frac": round(t_kern / t_full, 3),
        }))
    finally:
        r.close()
    return 0


if __name__ == '__main__':
    sys.exit(main())
