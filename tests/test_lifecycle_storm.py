"""Randomized FORMAT-LIFECYCLE storm: compose whole-file operations.

The per-surface tests pin each operation against its own oracle; this
storm chains them the way archives actually live — compress with random
parameters, then a random sequence of transcode / chop / chopped-head
re-merge / stream-resume-append steps — and asserts exactness against a
live NumPy model of the file after EVERY step. Seams between surfaces
(sidecar key inheritance, decode-identity checks, domain switches) are
exactly where round-3's silent-corruption bugs lived; composing
operations randomly is the cheapest way to keep finding that class.

Seeds are fixed — failures reproduce. Float trials stay on ans-only
chains (the bitcast domain keeps the byte-level oracle; the zlib float
domain is allclose-only by reference parity, so transcodes to zlib are
excluded for float files)."""

import json

import numpy as np
import pytest

from mtscomp_tpu import StreamWriter, compress, decompress, transcode
from mtscomp_tpu.parallel.distributed import merge_parts
from mtscomp_tpu.verify import verify_file

from conftest import write_arr, tmp_path_  # noqa: F401

DTYPES = ['int16', 'uint16', 'int32', 'uint8', 'float32',
          'float16']


def _signal(rng, ns, nc, dtype):
    kind = int(rng.integers(0, 3))
    if kind == 0:
        arr = np.cumsum(rng.normal(0, 10, size=(ns, nc)), axis=0)
    elif kind == 1:
        t = np.arange(ns) / 1000.0
        arr = (np.sin(2 * np.pi * 3.0 * t)[:, None] * 9000
               + rng.normal(0, 8.0, (ns, nc)))
    else:
        arr = rng.normal(0, 1, (ns, nc)) * np.exp(rng.uniform(0, 4, nc))
    if np.dtype(dtype).kind == 'f':
        # float16 at full signal scale saturates to inf; normalize.
        return (np.asarray(arr) / 100.0).astype(dtype)
    return np.asarray(arr).astype(np.int64).astype(dtype)


def _decode_exact(cb, ch, arr):
    r = decompress(cb, ch, quiet=True)
    try:
        assert r.shape == arr.shape, (r.shape, arr.shape)
        def same(x, y):
            x, y = np.asarray(x), np.asarray(y)
            return x.tobytes() == y.tobytes()
        assert same(r[:], arr)
        if r.shape[0] > 3:
            i = r.shape[0] // 3
            assert same(r[i:2 * i], arr[i:2 * i])
        return dict(r.cmeta)
    finally:
        r.close()


@pytest.mark.parametrize('seed', range(3))
def test_lifecycle_storm(tmp_path_, seed):
    rng = np.random.default_rng(7000 + seed)
    for trial in range(4):
        base = tmp_path_ / ('t%d' % trial)
        base.mkdir()
        sr = float(rng.choice([1000.0, 2000.0]))
        nc = int(rng.integers(3, 23))
        # Half the trials are exact chunk multiples: the resume op is
        # only legal on full-chunk tails, and chop cuts on chunk
        # boundaries — aligned files keep that branch live.
        tail = int(rng.integers(0, sr)) if rng.integers(0, 2) else 0
        ns = int(rng.integers(3, 7) * sr) + tail
        dtype = str(rng.choice(DTYPES))
        arr = _signal(rng, ns, nc, dtype)
        raw = write_arr(base / 'raw.bin', arr)
        kwargs = {}
        if rng.integers(0, 2):
            kwargs['time_diff_order'] = int(rng.choice([1, 2]))
        if rng.integers(0, 2):
            kwargs['do_spatial_diff'] = bool(rng.integers(0, 2))
        if rng.integers(0, 2):
            kwargs['ans_seg_log2'] = int(rng.integers(9, 14))
        if rng.integers(0, 2):
            # Per-chunk transform adaptation (flags bit5): chains must
            # keep decoding self-described chunks exactly through
            # transcode/chop/merge/resume.
            kwargs['transform_adapt'] = int(rng.integers(1, 4))
        cb, ch = base / 'f0.cbin', base / 'f0.ch'
        compress(raw, cb, ch, sample_rate=sr, n_channels=nc, dtype=dtype,
                 algorithm='ans', quiet=True, **kwargs)
        _decode_exact(cb, ch, arr)

        for step in range(int(rng.integers(2, 5))):
            op = rng.choice(['transcode', 'chop', 'chop_merge', 'resume'])
            nxt_cb = base / ('f%d.cbin' % (step + 1))
            nxt_ch = base / ('f%d.ch' % (step + 1))
            if op == 'transcode':
                alg = str(rng.choice(['ans', 'zlib', 'ans']))
                if np.dtype(dtype).kind == 'f':
                    alg = 'ans'  # keep the bitcast byte oracle
                tkw = {}
                if alg == 'ans' and rng.integers(0, 2):
                    tkw['ans_table_mode'] = str(
                        rng.choice(['plane', 'segment']))
                transcode(cb, ch, nxt_cb, nxt_ch, algorithm=alg,
                          quiet=True, **tkw)
                cb, ch = nxt_cb, nxt_ch
            elif op in ('chop', 'chop_merge'):
                meta = json.loads(ch.read_text())
                n_chunks = len(meta['chunk_bounds']) - 1
                if n_chunks < 2:
                    continue
                keep = int(rng.integers(1, n_chunks))
                r = decompress(cb, ch, quiet=True)
                try:
                    r.chop(keep, nxt_cb)  # sidecar: nxt_cb's .ch sibling
                finally:
                    r.close()
                if op == 'chop_merge' and meta['algorithm'] == 'ans' \
                        and 'part' not in meta:
                    # Chopped head is a valid leading part of the file
                    # it was chopped from only when both are complete
                    # containers; merge must either refuse (identity
                    # mismatch) or reproduce the full file's decode.
                    mcb = base / ('m%d.cbin' % (step + 1))
                    try:
                        merge_parts([(nxt_cb, nxt_ch), (cb, ch)],
                                    mcb, base / ('m%d.ch' % (step + 1)))
                    except ValueError:
                        pass  # provenance/bounds mismatch: refusal ok
                    else:
                        cut = meta['chunk_bounds'][keep]
                        stitched = np.concatenate([arr[:cut], arr],
                                                  axis=0)
                        _decode_exact(mcb, base / ('m%d.ch' % (step + 1)),
                                      stitched)
                arr = arr[:meta['chunk_bounds'][keep]]
                cb, ch = nxt_cb, nxt_ch
            else:  # resume-append (only valid on full-chunk ans tails)
                meta = json.loads(ch.read_text())
                if meta['algorithm'] != 'ans' or 'part' in meta:
                    continue  # chopped files stay: resume must either
                # refuse them (ValueError below) or append correctly.
                bounds = meta['chunk_bounds']
                chunk = bounds[1] - bounds[0] if len(bounds) > 1 else 0
                if chunk == 0 or (bounds[-1] % chunk) != 0:
                    continue
                extra = _signal(rng, int(rng.integers(1, 2 * chunk + 1)),
                                nc, dtype)
                try:
                    w = StreamWriter.resume(cb, ch)
                except ValueError:
                    continue  # e.g. transform unsupported for resume
                try:
                    w.append(extra)
                finally:
                    w.close()
                arr = np.concatenate([arr, extra], axis=0)
            cmeta = _decode_exact(cb, ch, arr)
            assert verify_file(cb, ch, deep=True)['ok'], cmeta
