#!/usr/bin/env python
"""Stage ablation for the Pallas encode kernel: time truncated variants
('state' chain only, + 'rank' matmul/ladder, + compaction 'search',
+ everything-but-scatter 'noscat', and the full kernel) on the same
staged inputs, attributing kernel time per stage by differences.

Ablated variants are NOT bit-correct (timing only); the full variant is
validated against the host codec payload first. Fresh-process rule
applies; sync-amortized timing like bench.py. Prints one JSON line.
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
    from mtscomp_tpu import Writer
    from mtscomp_tpu.parallel import pipeline as pl
    from mtscomp_tpu.ops.pallas_rans_enc import encode_groups_pallas

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
        enc = pl.DeviceBatchEncoder(w)
        assert enc.supported(T)
        # Capture the staged kernel inputs by probing _encode_pallas.
        staged = {}
        orig = pl.DeviceBatchEncoder._encode_pallas

        def probe(self, symbols, freq_arr, row_bits, counts, S):
            out = orig(self, symbols, freq_arr, row_bits, counts, S)
            staged['args'] = (symbols, freq_arr, row_bits, counts, S)
            return out

        pl.DeviceBatchEncoder._encode_pallas = probe
        try:
            payloads = enc.encode_batch(chunks)
        finally:
            pl.DeviceBatchEncoder._encode_pallas = orig
        assert payloads is not None and 'args' in staged, "kernel not run"
        host = w.codec.encode(w._transform_chunk(chunks[0]),
                              order=w.chunk_order)
        assert payloads[0] == host, "full kernel payload mismatch"

        symbols, freq_arr, row_bits, counts_arr, S = staged['args']
        from mtscomp_tpu.models import rans
        from mtscomp_tpu.ops.pallas_rans_enc import (pack_enc_device_tables,
                                                     resolve_div_mode)
        NG, R = counts_arr.shape
        pk_arr = np.zeros((NG, R, 2, rans.LANES), np.int32)
        rcp_arr = np.zeros_like(pk_arr)
        div = resolve_div_mode()
        cache = {}
        for i in range(NG):
            for r_ in range(R):
                key = freq_arr[i, r_].tobytes()
                if key not in cache:
                    cache[key] = pack_enc_device_tables(freq_arr[i, r_],
                                                        div=div)
                pk_arr[i, r_], rcp_arr[i, r_] = cache[key]
        est = row_bits.sum(axis=1) / 16.0
        cap_words = int(est.max(initial=0.0) * 1.25) + 4096
        cap_rows = -(-cap_words // (128 * 512)) * 512
        counts_b = np.ascontiguousarray(np.broadcast_to(
            counts_arr[:, :, None], (NG, R, rans.LANES)))
        pk_d = jnp.asarray(pk_arr)
        rcp_d = jnp.asarray(rcp_arr)
        cb_d = jnp.asarray(counts_b)

        # Production lookup/compaction flags (pipeline._encode_pallas):
        # the split must attribute time in the kernel that actually runs.
        small_alpha = not freq_arr[:, :, 128:].any()

        inner = int(os.environ.get('AB_INNER', '8'))
        reps = int(os.environ.get('AB_REPS', '8'))
        # AB_DIV overrides the division form of the TIMED variants only
        # (the capture/validation above always runs the production div).
        # 'fake' (one multiply instead of the divide; WRONG output, fine
        # for ablation timing) sizes the divide's share of the chain.
        timed_div = os.environ.get('AB_DIV', div)
        out = {'small_alpha': bool(small_alpha), 'div': timed_div}
        for mode in (os.environ.get('AB_MODES',
                                    'state,rank,search,noscat,full')
                     .split(',')):
            ab = None if mode == 'full' else mode

            def once(ab=ab):
                for _ in range(inner):
                    st, wd, nw = encode_groups_pallas(
                        symbols, pk_d, rcp_d, cb_d, n_steps=S,
                        cap_rows=cap_rows, small_alpha=small_alpha,
                        div=timed_div, ablate=ab)
                return float(jnp.sum(nw[:, 0, :].astype(jnp.float32)))

            out[mode] = round(_median_rate(chunks.nbytes, once, reps,
                                           inner), 2)
        print(json.dumps(out))
    finally:
        w.close()
    return 0


if __name__ == '__main__':
    sys.exit(main())
