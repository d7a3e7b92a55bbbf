#!/usr/bin/env python
"""A/B: ragged-tail split decode vs current mixed-cell packing.

Measures ONLY the decode kernel(s) at the bench geometry (385 ch):
  base : one decode_groups_pallas call over all B*G groups (cells mix
         940-step full groups with the 235-step ragged tails).
  split: call A = full groups only (cells all 940), call B = tail
         groups with R=1 (one (8,128)-row cell, 235 steps).

Usage: python tools/tail_ab.py base|split [C]
Prints one JSON line with the median kernel GB/s (raw decoded bytes).
Run each variant in a FRESH process, interleaved (CLAUDE.md timing
discipline).
"""
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np


def main():
    variant = sys.argv[1]
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 385
    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.expanduser('~/.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    import jax.numpy as jnp
    from mtscomp_tpu import compress, decompress
    from mtscomp_tpu.parallel.pipeline import _read_payload
    from mtscomp_tpu.ops.pallas_rans import (decode_groups_pallas,
                                             pack_device_tables,
                                             WINDOW_ROWS, force_interpret)
    from mtscomp_tpu.models.rans import GROUP_ROWS, LANES
    from mtscomp_tpu.codec.ans import seg_freqs as ans_seg_freqs
    RANS_L = 1 << 16

    T, SR_HZ, B = 30000, 30000.0, 8
    rng = np.random.default_rng(0)
    arr = np.cumsum(rng.normal(0.0, 6.0, size=(T * B, C)),
                    axis=0).astype(np.int16)
    tmp = Path(tempfile.mkdtemp(dir='/dev/shm' if os.path.isdir('/dev/shm')
                                else None))
    arr.tofile(tmp / 'a.bin')
    compress(tmp / 'a.bin', tmp / 'a.cbin', tmp / 'a.ch', sample_rate=SR_HZ,
             n_channels=C, dtype='int16', algorithm='ans', quiet=True,
             check_after_compress=False)
    r = decompress(tmp / 'a.cbin', tmp / 'a.ch', quiet=True)
    parsed_list = [r.codec.parse(_read_payload(r, i))
                   for i in range(r.n_chunks)]

    def pack_groups(sel):
        """Pack the selected (chunk, group) list into kernel arrays."""
        groups = [(parsed_list[b], parsed_list[b]['groups'][g])
                  for b, g in sel]
        R = max(len(g['segments']) for _, g in groups)
        R = max(8 // 8, R)
        N = len(groups)
        w_max = max(g['words'].size for _, g in groups)
        wr = -(-w_max // LANES) + WINDOW_ROWS
        WR = -(-wr // 512) * 512
        states = np.full((N, R, LANES), RANS_L, dtype=np.uint32)
        words = np.zeros((N, WR, LANES), dtype=np.uint16)
        counts_b = np.zeros((N, R, LANES), dtype=np.int32)
        coarse_pk = np.zeros((N, R, 2, LANES), dtype=np.int32)
        dense_pk = np.zeros((N, R, 2, LANES), dtype=np.int32)
        octet_rows = np.zeros((N, R, LANES), dtype=np.int32)
        cache = {}
        alpha_max, fix2 = 0, False
        for i, (parsed, g) in enumerate(groups):
            Rg = len(g['segments'])
            states[i, :Rg] = g['states']
            words[i].reshape(-1)[:g['words'].size] = g['words']
            for rr, (p, start, n) in enumerate(g['segments']):
                tb = ans_seg_freqs(parsed, p, start)
                key = tb.tobytes()
                if key not in cache:
                    cache[key] = (pack_device_tables(tb),
                                  int(np.count_nonzero(tb)))
                (coarse_pk[i, rr], dense_pk[i, rr], n2, orow), a = cache[key]
                counts_b[i, rr] = n
                alpha_max = max(alpha_max, a)
                fix2 = fix2 or n2
                octet_rows[i, rr] = orow
        coarse_pk[:, :, 0, :] = octet_rows
        n_steps = int(-(-counts_b.max() // LANES))
        return (jnp.asarray(states), jnp.asarray(words),
                jnp.asarray(coarse_pk), jnp.asarray(dense_pk),
                jnp.asarray(counts_b), n_steps,
                alpha_max <= 128, not fix2)

    G = len(parsed_list[0]['groups'])
    tail_R = len(parsed_list[0]['groups'][-1]['segments'])
    full_sel = [(b, g) for b in range(B) for g in range(G - 1)]
    tail_sel = [(b, G - 1) for b in range(B)]
    all_sel = [(b, g) for b in range(B) for g in range(G)]
    print('# C=%d G=%d tail_R=%d' % (C, G, tail_R), file=sys.stderr)

    on_accel = jax.default_backend() != 'cpu'
    inner = int(os.environ.get('BENCH_INNER', '8' if on_accel else '1'))
    reps = int(os.environ.get('BENCH_REPS', '8' if on_accel else '1'))

    if variant in ('pipe', 'pipe_off'):
        # Full staged pipeline (pack + fused decode incl. finalize),
        # exactly bench.py's headline phase; 'pipe_off' disables the
        # ragged-tail packing via the kill switch for the A/B.
        if variant == 'pipe_off':
            os.environ['MTSCOMP_DEC_TAILSPLIT'] = '0'
        from mtscomp_tpu.parallel.pipeline import (DeviceBatchDecoder,
                                                   check_words_used)
        dec = DeviceBatchDecoder(r)
        assert dec.supported(parsed_list, T)
        fnp, dev_args = dec.pack(parsed_list, T)
        print('# tail=%r' % (dec.last_tail,), file=sys.stderr)
        out, used = fnp(*dev_args)
        check_words_used(parsed_list, used)
        assert np.array_equal(np.asarray(out).reshape(arr.shape), arr)

        def run():
            for _ in range(inner):
                o, _u = fnp(*dev_args)
            return float(jnp.sum(o[:, ::61, ::17].astype(jnp.float32)))
    elif variant == 'base':
        sA, wA, cA, dA, cbA, nsA, small, onef = pack_groups(all_sel)

        def run():
            for _ in range(inner):
                o, u = decode_groups_pallas(sA, wA, cA, dA, cbA,
                                            n_steps=nsA, small_alpha=small,
                                            one_fixup=onef, octet=True)
            return float(jnp.sum(u))
    elif variant == 'full_only':
        sA, wA, cA, dA, cbA, nsA, small, onef = pack_groups(full_sel)

        def run():
            for _ in range(inner):
                o, u = decode_groups_pallas(sA, wA, cA, dA, cbA,
                                            n_steps=nsA, small_alpha=small,
                                            one_fixup=onef, octet=True)
            return float(jnp.sum(u))
    elif variant == 'tail_only':
        sB, wB, cB, dB, cbB, nsB, smallB, onefB = pack_groups(tail_sel)

        def run():
            for _ in range(inner):
                o2, u2 = decode_groups_pallas(sB, wB, cB, dB, cbB,
                                              n_steps=nsB,
                                              small_alpha=smallB,
                                              one_fixup=onefB, octet=True)
            return float(jnp.sum(u2))
    elif variant == 'split1':
        # Both kernel calls inside ONE jit: a single Python dispatch,
        # kernels back-to-back in one XLA program — the shape the real
        # fused decode fn would take (the two-dispatch 'split' variant
        # measures this attachment's ~3 ms per-dispatch overhead, not
        # the kernels).
        sA, wA, cA, dA, cbA, nsA, small, onef = pack_groups(full_sel)
        sB, wB, cB, dB, cbB, nsB, smallB, onefB = pack_groups(tail_sel)
        import jax as _jax

        @_jax.jit
        def both(sA, wA, cA, dA, cbA, sB, wB, cB, dB, cbB):
            o, u = decode_groups_pallas(sA, wA, cA, dA, cbA,
                                        n_steps=nsA, small_alpha=small,
                                        one_fixup=onef, octet=True)
            o2, u2 = decode_groups_pallas(sB, wB, cB, dB, cbB,
                                          n_steps=nsB, small_alpha=smallB,
                                          one_fixup=onefB, octet=True)
            return o, u, o2, u2

        def run():
            for _ in range(inner):
                o, u, o2, u2 = both(sA, wA, cA, dA, cbA,
                                    sB, wB, cB, dB, cbB)
            return float(jnp.sum(u)) + float(jnp.sum(u2))
    else:
        sA, wA, cA, dA, cbA, nsA, small, onef = pack_groups(full_sel)
        sB, wB, cB, dB, cbB, nsB, smallB, onefB = pack_groups(tail_sel)

        def run():
            for _ in range(inner):
                o, u = decode_groups_pallas(sA, wA, cA, dA, cbA,
                                            n_steps=nsA, small_alpha=small,
                                            one_fixup=onef, octet=True)
                o2, u2 = decode_groups_pallas(sB, wB, cB, dB, cbB,
                                              n_steps=nsB,
                                              small_alpha=smallB,
                                              one_fixup=onefB, octet=True)
            return float(jnp.sum(u)) + float(jnp.sum(u2))

    run()   # compile + warm
    # Correctness signal: exact per-group stream-word consumption.
    if variant in ('full_only', 'tail_only', 'split1', 'pipe', 'pipe_off'):
        pass
    elif variant == 'base':
        _, u = decode_groups_pallas(sA, wA, cA, dA, cbA, n_steps=nsA,
                                    small_alpha=small, one_fixup=onef,
                                    octet=True)
        exp = [parsed_list[b]['groups'][g]['words'].size for b, g in all_sel]
        assert list(np.asarray(u)) == exp, 'word audit failed'
    else:
        _, u = decode_groups_pallas(sA, wA, cA, dA, cbA, n_steps=nsA,
                                    small_alpha=small, one_fixup=onef,
                                    octet=True)
        _, u2 = decode_groups_pallas(sB, wB, cB, dB, cbB, n_steps=nsB,
                                     small_alpha=smallB, one_fixup=onefB,
                                     octet=True)
        exp = [parsed_list[b]['groups'][g]['words'].size for b, g in full_sel]
        exp2 = [parsed_list[b]['groups'][G - 1]['words'].size
                for b in range(B)]
        assert list(np.asarray(u)) == exp, 'word audit failed (full)'
        assert list(np.asarray(u2)) == exp2, 'word audit failed (tail)'
    times = []
    for _ in range(reps):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    dt = sorted(times)[len(times) // 2] / inner
    r.close()
    print(json.dumps({"variant": variant, "C": C,
                      "gbps": round(arr.nbytes / 1e9 / dt, 3)}))
    return 0


if __name__ == '__main__':
    sys.exit(main())
