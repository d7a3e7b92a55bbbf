#!/usr/bin/env python
"""Hardware storm: the full ANS format surface through the Mosaic-compiled
Pallas kernels on a real TPU chip.

The pytest suite pins JAX to CPU (tests/conftest.py), so the Pallas
kernels run there in interpreter mode; this driver executes the same
format matrix on actual silicon and asserts byte-equality against the
normative host coder for every cell (the reference's analogue is its
exhaustive parameter sweeps, tests.py:499-526, which run on the machine
that executes the hot path).

Matrix axes (every cell is decode byte-exactness; <=2-byte cells also
assert device-encode containers byte-identical to the host codec):

- dtype: int8 / uint8 / int16 / uint16 / int32 / uint32
- tables: per-plane vs clustered per-segment multitable (flags bit4)
- layout: channel-aligned segments (bit2) vs non-aligned
- table origin: self-written 8-aligned (one-fixup decode) vs foreign
  min-8 tables (two-fixup decode)
- chunk geometry: partial tail chunks; chunk_order='C'; spatial diff;
  time diff off
- encode-kernel capacity overflow -> deterministic XLA-scan fallback
- corruption surfacing (CRC + stream-word audit) on the hardware path

Writes TPU_STORM.md + TPU_STORM.json at the repo root.

Usage: python tools/tpu_storm.py [--quick] [--out TPU_STORM]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import traceback
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

RESULTS = []


def _setup_jax():
    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.expanduser('~/.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    return jax.default_backend()


def _install_pallas_probes():
    """Count Pallas kernel invocations (at trace time — each fresh shape
    signature traces once, so >=1 per cell proves the Mosaic kernel, not
    the XLA-scan fallback, handled it)."""
    from mtscomp_tpu.ops import pallas_rans, pallas_rans_enc
    counters = {'decode': 0, 'encode': 0}

    dec = pallas_rans.decode_groups_pallas
    enc = pallas_rans_enc.encode_groups_pallas

    def wrap(fn, key):
        def inner(*a, **k):
            counters[key] += 1
            return fn(*a, **k)
        return inner

    pallas_rans.decode_groups_pallas = wrap(dec, 'decode')
    pallas_rans_enc.encode_groups_pallas = wrap(enc, 'encode')
    return counters


def make_data(kind, dtype, ns, nc, seed=0):
    """Random-walk test signal wrapped into the dtype's range.

    'gradient' scales the walk per channel (k+1 amplitude bands) so
    per-channel histograms differ — the geometry segment-table
    clustering exists for.
    """
    rng = np.random.default_rng(seed)
    dtype = np.dtype(dtype)
    if dtype.kind == 'f':
        # Smooth float walk (realistic smooth-signal bit patterns for
        # the bitcast transform) plus sign flips via mean removal.
        walk = np.cumsum(rng.normal(0.0, 1.0, size=(ns, nc)), axis=0)
        if kind == 'gradient':
            walk *= (0.25 + 4.0 * (np.arange(nc) / max(nc - 1, 1)))[None]
        walk -= walk.mean(axis=0, keepdims=True)
        return (walk * 0.03).astype(dtype)
    std = {1: 2.0, 2: 6.0, 4: 6.0}[dtype.itemsize]
    walk = np.cumsum(rng.normal(0.0, std, size=(ns, nc)), axis=0)
    if kind == 'gradient':
        walk = walk * (0.25 + 4.0 * (np.arange(nc) / max(nc - 1, 1)))[None]
    elif kind == 'common':
        # Strong shared artifact on top of the independent walks: the
        # joint transform auto-probe must engage the spatial diff.
        walk = walk + np.cumsum(
            rng.normal(0.0, 3 * std, size=(ns, 1)), axis=0)
    info = np.iinfo(dtype)
    span = int(info.max) - int(info.min) + 1
    wrapped = np.mod(np.round(walk).astype(np.int64) - int(info.min), span)
    return (wrapped + int(info.min)).astype(dtype)


def quantize_foreign(counts, scale_bits=None, min_freq=None):
    """A *foreign* writer's quantizer: min-8 frequencies at UNIT
    granularity, so cumulative table boundaries are generally not
    multiples of 8 and 16-slot buckets can hold three symbols — decode
    must take the two-fixup path. Valid per the format contract
    (FORMAT.md: decoders accept arbitrary min-8 tables)."""
    from mtscomp_tpu.models import rans
    scale_bits = rans.SCALE_BITS if scale_bits is None else scale_bits
    min_freq = rans.MIN_FREQ if min_freq is None else min_freq
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    present = counts > 0
    if int(present.sum()) <= 1:
        return None
    scale = 1 << scale_bits
    ideal = counts * scale / total
    freqs = np.floor(ideal).astype(np.int64)
    freqs[present] = np.maximum(freqs[present], min_freq)
    rem = int(scale - freqs.sum())
    if rem > 0:
        frac = np.where(present, ideal - np.floor(ideal), -1.0)
        order = np.argsort(-frac, kind='stable')
        bump = order[:rem]
        freqs[bump] += 1
    while freqs.sum() > scale:
        k = int(np.argmax(freqs))
        assert freqs[k] > min_freq, "cannot rebalance foreign table"
        freqs[k] -= 1
    assert freqs.sum() == scale
    return freqs


class _patched:
    """Temporarily replace module attributes ({(mod, name): value})."""

    def __init__(self, repl):
        self.repl = repl
        self.saved = {}

    def __enter__(self):
        for (mod, name), val in self.repl.items():
            self.saved[(mod, name)] = getattr(mod, name)
            setattr(mod, name, val)

    def __exit__(self, *exc):
        for (mod, name), val in self.saved.items():
            setattr(mod, name, val)


def table_fixups(reader):
    """(n_tables, n_two_fixup) over every rANS table in the file."""
    from mtscomp_tpu.codec.ans import MODE_RANS, seg_freqs
    from mtscomp_tpu.ops.pallas_rans import pack_device_tables
    from mtscomp_tpu.parallel.pipeline import _read_payload
    n_tables = n_two = 0
    seen = set()
    for i in range(reader.n_chunks):
        parsed = reader.codec.parse(_read_payload(reader, i))
        for g in parsed['groups']:
            for (p, start, n) in g['segments']:
                t = seg_freqs(parsed, p, start)
                key = t.tobytes()
                if key in seen:
                    continue
                seen.add(key)
                n_tables += 1
                if pack_device_tables(t)[2]:
                    n_two += 1
    return n_tables, n_two


def device_decode_all(reader, arr):
    """Decode every chunk through DeviceBatchDecoder, asserting the
    device path accepted each batch (no silent host fallback), the
    stream-word audit passed, and the bytes match ``arr``.

    Chunks are grouped by their full container signature (size, plane
    modes, segment geometry): data-dependent mode differences between
    chunks are legal and batch separately, exactly as the production
    pipeline's per-group batching does.
    """
    from mtscomp_tpu.parallel.pipeline import DeviceBatchDecoder, \
        _read_payload
    groups = []
    for idx in range(reader.n_chunks):
        ns = reader.chunk_bounds[idx + 1] - reader.chunk_bounds[idx]
        parsed = reader.codec.parse(_read_payload(reader, idx))
        sig = (ns, tuple(parsed['modes']), parsed['seg'],
               parsed['aligned'], parsed['zigzag'], parsed['n_stream'],
               parsed['n_head'], parsed.get('transform'))
        if groups and groups[-1][1] == sig:
            groups[-1][0].append(parsed)
        else:
            groups.append(([parsed], sig))
    parts = []
    for parsed_list, sig in groups:
        ns = sig[0]
        dec = DeviceBatchDecoder(reader)
        if not dec.supported(parsed_list, ns):
            raise AssertionError("device path declined a uniform batch "
                                 "(sig=%r)" % (sig,))
        out = dec.decode_batch(parsed_list, ns)
        parts.extend(out[i] for i in range(len(parsed_list)))
    got = np.concatenate(parts, axis=0)
    if not np.array_equal(got, arr):
        bad = int(np.argmax((got != arr).any(axis=1)))
        raise AssertionError("decode mismatch from sample %d" % bad)


def device_encode_check(raw, arr, sr, nc, compress_kwargs,
                        force_scan=False):
    """Device-encode equal-size chunks; containers must be byte-identical
    to the host codec. Returns 'kernel', 'scan' or 'host' (which path
    actually ran — detected by instrumenting the seams, not inferred).
    The production mixed-mode guard (sub-batches < MIN_DEVICE_SUBBATCH
    encode on host) is pinned to 1 here: the storm's job is to exercise
    the device coder on every mode row, not to avoid compiles."""
    from mtscomp_tpu import Writer
    from mtscomp_tpu.ops import device_rans
    from mtscomp_tpu.parallel import pipeline as pl
    w = Writer(algorithm='ans', quiet=True,
               **{k: v for k, v in compress_kwargs.items()
                  if k.startswith('ans_') or k in
                  ('chunk_order', 'do_time_diff', 'do_spatial_diff',
                   'chunk_duration', 'time_diff_order')})
    try:
        w.open(raw, sample_rate=sr, n_channels=nc, dtype=arr.dtype.name)
        csize = w.chunk_bounds[1] - w.chunk_bounds[0]
        B = 0
        while (B < w.n_chunks
               and w.chunk_bounds[B + 1] - w.chunk_bounds[B] == csize):
            B += 1
        chunks = np.stack([np.asarray(w.get_chunk(i)) for i in range(B)])
        enc = pl.DeviceBatchEncoder(w)
        if not enc.supported(csize):
            raise AssertionError("device encode declined the geometry")
        scan_calls = {'n': 0}
        orig_scan = device_rans.encode_groups

        def scan_spy(*a, **k):
            scan_calls['n'] += 1
            return orig_scan(*a, **k)

        patches = {(device_rans, 'encode_groups'): scan_spy,
                   (pl, 'MIN_DEVICE_SUBBATCH'): 1}
        if force_scan:
            patches[(pl.DeviceBatchEncoder, '_encode_pallas')] = \
                lambda self, *a, **k: None
        with _patched(patches):
            payloads = enc.encode_batch(chunks)
        if payloads is None:
            raise AssertionError("device encode fell back to host")
        for b in range(B):
            host = w.codec.encode(w._transform_chunk(chunks[b]),
                                  order=w.chunk_order)
            if payloads[b] != host:
                raise AssertionError(
                    "device container %d != host codec bytes" % b)
        ran_kernel = getattr(enc, 'last_kernel_run', None) is not None
        if ran_kernel and not force_scan:
            return 'kernel'
        return 'scan' if scan_calls['n'] else 'host'
    finally:
        w.close()


CELL_FILTER = None


def run_cell(name, note, fn):
    if CELL_FILTER and CELL_FILTER not in name:
        return
    t0 = time.time()
    try:
        extra = fn() or {}
        RESULTS.append(dict(cell=name, ok=True, note=note,
                            secs=round(time.time() - t0, 1), **extra))
        print("PASS %-34s %5.1fs  %s"
              % (name, time.time() - t0, extra or ''), flush=True)
    except Exception as e:
        traceback.print_exc()
        RESULTS.append(dict(cell=name, ok=False, note=note,
                            secs=round(time.time() - t0, 1),
                            error="%s: %s" % (type(e).__name__, e)))
        print("FAIL %-34s %s" % (name, e), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--quick', action='store_true',
                    help='smaller geometry (dev smoke; still every cell)')
    ap.add_argument('--out', default='TPU_STORM',
                    help='report basename (writes .md and .json)')
    ap.add_argument('--random', type=int, default=0, metavar='N',
                    help='append N randomized cells (random geometry/'
                         'dtype/mode/order/diff) — fresh Mosaic '
                         'compiles beyond the fixed grid')
    ap.add_argument('--seed', type=int, default=0,
                    help='base seed for --random cells')
    ap.add_argument('--cells', default=None, metavar='SUBSTR',
                    help='run only cells whose name contains SUBSTR '
                         '(targeted re-runs; the full artifact should '
                         'come from an unfiltered run)')
    args = ap.parse_args()
    global CELL_FILTER
    CELL_FILTER = args.cells

    backend = _setup_jax()
    import mtscomp_tpu.config as cfg
    cfg.CONFIG_PATH = Path(tempfile.mkdtemp()) / '.mtscomp'
    from mtscomp_tpu import compress, decompress
    from mtscomp_tpu.models import rans
    from mtscomp_tpu.parallel import pipeline as pl
    counters = _install_pallas_probes()

    # Geometry: C=385 (the Neuropixels non-128-multiple), ~1.55 s/chunk
    # worth of samples per chunk at SR, 2 full chunks + a partial tail.
    SR = 2000.0 if args.quick else 4000.0
    C = 385
    csize = int(SR)
    NS = 2 * csize + csize // 2
    tmp = Path(tempfile.mkdtemp())

    def cbase(**kw):
        # Cells pin their table mode explicitly (the library default is
        # 'segment'): the dtype sweep exercises plane containers, the
        # segment_tables_* cells the bit4 multitable ones.
        d = dict(algorithm='ans', quiet=True, check_after_compress=False,
                 ans_table_mode='plane')
        d.update(kw)
        return d

    def cell_roundtrip(dtype, kind='walk', expect_fixups=None,
                       window=False, encode=True, seed=0,
                       expect_meta=None, **kw):
        def fn():
            dt = np.dtype(dtype)
            arr = make_data(kind, dt, NS, C, seed=seed)
            # Bitcast float files decode (on device) in their integer
            # coding dtype; compare in that domain (bit equality).
            code = (arr.view('int%d' % (dt.itemsize * 8))
                    if dt.kind == 'f' else arr)
            sub = tmp / ("cell_%d" % len(RESULTS))
            sub.mkdir()
            raw = sub / 'x.bin'
            arr.tofile(raw)
            quant = kw.pop('quantizer', None)
            patches = {}
            if quant:
                # Patch EVERY quantizer seam the encode paths use: the
                # scalar normative entry (device-encoder fallback) AND
                # the batched fast path the host codec's decide_plane
                # now routes through (codec.ans._quantize_rows — the
                # native row-batched quantizer made the old scalar-only
                # patch silently dead, which this storm caught as
                # two_fixup == 0).
                from mtscomp_tpu.codec import ans as ans_mod

                def quant_rows(sums, _q=quant):
                    return np.stack(
                        [_q(row) for row in np.asarray(sums)]
                    ).astype(np.uint16)

                patches[(rans, 'quantize_freqs')] = quant
                patches[(ans_mod, '_quantize_rows')] = quant_rows
            with _patched(patches):
                compress(raw, sub / 'x.cbin', sub / 'x.ch',
                         sample_rate=SR, n_channels=C, dtype=dt.name,
                         **cbase(**kw))
            r = decompress(sub / 'x.cbin', sub / 'x.ch', quiet=True)
            try:
                extra = {}
                for mk, mv in (expect_meta or {}).items():
                    got = r.cmeta.get(mk)
                    assert got == mv, \
                        "sidecar %s=%r, expected %r" % (mk, got, mv)
                n_tables, n_two = table_fixups(r)
                extra['tables'] = n_tables
                extra['two_fixup'] = n_two
                if expect_fixups == 'two':
                    assert n_two > 0, "expected >=1 two-fixup table"
                elif expect_fixups == 'one':
                    assert n_two == 0, "self-written tables must be " \
                        "single-fixup (%d/%d)" % (n_two, n_tables)
                d0 = counters['decode']
                device_decode_all(r, code)
                if backend == 'tpu':
                    assert counters['decode'] > d0, \
                        "decode never traced a Pallas kernel"
                if window:
                    from mtscomp_tpu.parallel.pipeline import \
                        DeviceChunkCache
                    cache = DeviceChunkCache(r)
                    for (a, b) in [(7, csize // 2), (csize - 3, csize + 9),
                                   (NS - csize // 3, NS)]:
                        got = cache.read_window(a, b)
                        assert got.dtype == dt
                        assert np.array_equal(got.view(code.dtype),
                                              code[a:b]), \
                            "device window [%d:%d) mismatch" % (a, b)
                    extra['windows'] = 'ok'
                if encode and dt.itemsize <= 2:
                    with _patched(patches):
                        # Full merged config (incl. cbase's pinned
                        # table mode), matching what compress() used.
                        extra['encode'] = device_encode_check(
                            raw, arr, SR, C, cbase(**kw))
            finally:
                r.close()
            return extra
        return fn

    # --- dtype sweep: aligned layout, per-plane self-written tables ----
    for dtype in ('int8', 'uint8', 'int16', 'uint16', 'int32', 'uint32'):
        run_cell('dtype_%s' % dtype,
                 'aligned, plane tables, partial tail',
                 cell_roundtrip(dtype, expect_fixups='one',
                                window=(dtype == 'int16')))

    # --- bitcast floats: the v2 float transform on silicon --------------
    # float16 codes through the full i16 path (fused prep, device encode,
    # 2-byte kernels); float32 through the int32 decode variant. float64
    # (int64 coding dtype) has no device kernel — host path by design.
    run_cell('dtype_float16',
             'bitcast float via the i16 kernels + device encode',
             cell_roundtrip('float16', expect_fixups='one'))
    run_cell('dtype_float32',
             'bitcast float via the int32 decode variant + windows',
             cell_roundtrip('float32', expect_fixups='one', window=True))

    # --- 8-byte dtypes: the device decoder must DECLINE (JAX x64-off
    # truncates a uint64 plane accumulator — the round-2 silent
    # corruption) and every forced-device entry point must fall back to
    # the host codec byte-exactly. Values exceed 2**32 so upper-plane
    # loss cannot hide.
    def cell_wide_dtype(dtype):
        def fn():
            from mtscomp_tpu.parallel.pipeline import (
                DeviceBatchDecoder, DeviceChunkCache, _read_payload,
                decompress_to_array)
            rng = np.random.default_rng(13)
            walk = np.cumsum(rng.integers(-2000, 2000, size=(NS, C),
                                          dtype=np.int64), axis=0) \
                + (np.int64(3) << 40)
            if dtype == 'int64':
                arr = walk
            elif dtype == 'uint64':
                arr = walk.astype(np.uint64) + (np.uint64(1) << np.uint64(63))
            else:
                arr = walk.astype(np.float64) * 1.5
                arr[0, 0] = np.nan
                arr[0, 1] = -np.inf
            sub = tmp / ("wide_%s" % dtype)
            sub.mkdir()
            raw = sub / 'x.bin'
            arr.tofile(raw)
            compress(raw, sub / 'x.cbin', sub / 'x.ch', sample_rate=SR,
                     n_channels=C, dtype=dtype, **cbase())
            r = decompress(sub / 'x.cbin', sub / 'x.ch', quiet=True,
                           device='tpu' if backend == 'tpu' else 'cpu')
            try:
                parsed = [r.codec.parse(_read_payload(r, 0))]
                ns0 = r.chunk_bounds[1] - r.chunk_bounds[0]
                assert not DeviceBatchDecoder(r).supported(parsed, ns0), \
                    "device decoder accepted an 8-byte dtype"
                try:
                    DeviceChunkCache(r)._chunk(0)
                    raise AssertionError(
                        "device chunk cache accepted an 8-byte dtype")
                except NotImplementedError:
                    pass
                got = decompress_to_array(r)   # forced-device bulk entry
                assert got.dtype == arr.dtype, got.dtype
                assert got.tobytes() == arr.tobytes(), \
                    "host-fallback bulk decode mismatch"
                for (a, b) in [(7, csize // 2), (csize - 3, csize + 9),
                               (NS - csize // 3, NS)]:
                    win = r[a:b]               # forced-device window entry
                    assert win.dtype == arr.dtype
                    assert win.tobytes() == arr[a:b].tobytes(), \
                        "window [%d:%d) mismatch" % (a, b)
                return {'declined': 'host-exact'}
            finally:
                r.close()
        return fn

    for dtype in ('int64', 'uint64', 'float64'):
        run_cell('wide_dtype_%s' % dtype,
                 'device path declines; host fallback byte-exact',
                 cell_wide_dtype(dtype))

    # --- clustered per-segment multitable (flags bit4) -----------------
    run_cell('segment_tables_int16',
             'bit4 multitable on gradient data',
             cell_roundtrip('int16', kind='gradient',
                            ans_table_mode='segment', expect_fixups='one'))
    run_cell('segment_tables_uint16',
             'bit4 multitable, uint16 bitcast ride',
             cell_roundtrip('uint16', kind='gradient',
                            ans_table_mode='segment'))

    # --- non-aligned container layout (bit2 clear) ----------------------
    run_cell('nonaligned_int16', 'channel segments off',
             cell_roundtrip('int16', ans_channel_segments=False))

    # --- foreign min-8 tables: the two-fixup decode variant -------------
    run_cell('foreign_two_fixup_int16',
             'unit-granularity min-8 tables from a foreign writer',
             cell_roundtrip('int16', expect_fixups='two',
                            quantizer=quantize_foreign))
    run_cell('foreign_two_fixup_int32',
             'foreign tables on the 4-byte kernel variant',
             cell_roundtrip('int32', expect_fixups='two',
                            quantizer=quantize_foreign))

    # --- transform/order variants ---------------------------------------
    run_cell('order_C_int16', "chunk_order='C'",
             cell_roundtrip('int16', chunk_order='C'))
    run_cell('spatial_diff_int16', 'time+spatial diff',
             cell_roundtrip('int16', do_spatial_diff=True))
    run_cell('no_time_diff_int16', 'raw rows (no delta)',
             cell_roundtrip('int16', do_time_diff=False))

    # --- second-order time prediction (sidecar time_diff_order: 2) ------
    # Forced (no auto probe) so the cells exercise the order-2 device
    # decode (extra carried scan after the fused d2->d1 inversion),
    # device windows and the order-2 device ENCODE (second diff in the
    # transform stage) regardless of the data's probe outcome.
    run_cell('order2_int16',
             'time_diff_order=2: device decode + windows + encode',
             cell_roundtrip('int16', time_diff_order=2, window=True))
    run_cell('order2_int32',
             'time_diff_order=2 on the 4-byte decode variant',
             cell_roundtrip('int32', time_diff_order=2))
    run_cell('spatial_order2_int16',
             'order-2 x spatial combined: device decode/windows/encode',
             cell_roundtrip('int16', time_diff_order=2,
                            do_spatial_diff=True, window=True))
    # Joint auto probe on common-mode data: 'auto' must engage the
    # spatial diff (sidecar records True) and the resulting file must
    # ride the device paths like any forced-flag file.
    run_cell('spatial_auto_common_int16',
             'joint auto probe engages spatial on common-mode data',
             cell_roundtrip('int16', kind='common',
                            do_spatial_diff='auto',
                            time_diff_order='auto',
                            expect_meta={'do_spatial_diff': True}))

    # --- ragged-tail split packing (the 385th-channel fix) --------------
    # ans_seg_log2=14 -> k=4-channel segments, 97 per plane; the bit6
    # writer splits the ragged tail into 8 sub-rows -> groups
    # [32,32,32,8]: the packer must engage the [fulls | tails] layout
    # (pack introspection asserted) and the two-ref finalize must be
    # byte-exact on silicon — the interpret tests cannot prove the
    # Mosaic lowering of either.
    def cell_ragged_tail():
        from mtscomp_tpu.parallel.pipeline import (DeviceBatchDecoder,
                                                   _read_payload,
                                                   check_words_used)
        dt = np.dtype(np.int16)
        arr = make_data('walk', dt, NS, C, seed=5)
        sub = tmp / ("cell_%d" % len(RESULTS))
        sub.mkdir()
        raw = sub / 'x.bin'
        arr.tofile(raw)
        # k=4-channel segments at either storm SR (tp 2048 quick / 4096
        # full): seg0 <= 4*tp keeps k at the 4 floor.
        compress(raw, sub / 'x.cbin', sub / 'x.ch', sample_rate=SR,
                 n_channels=C, dtype='int16',
                 **cbase(ans_seg_log2=13 if args.quick else 14))
        r = decompress(sub / 'x.cbin', sub / 'x.ch', quiet=True)
        try:
            parsed = [r.codec.parse(_read_payload(r, i))
                      for i in range(2)]          # the two full chunks
            assert [len(g['segments'])
                    for g in parsed[0]['groups']] == [32, 32, 32, 8]
            ns = r.chunk_bounds[1]
            dec = DeviceBatchDecoder(r)
            assert dec.supported(parsed, ns)
            fn, dev_args = dec.pack(parsed, ns)
            assert dec.last_tail is not None, "tail split not engaged"
            out, used = fn(*dev_args)
            check_words_used(parsed, used)
            got = np.asarray(out).reshape(2 * ns, C)
            assert np.array_equal(got, arr[:2 * ns]), "split mismatch"
            device_decode_all(r, arr)      # incl. the partial tail chunk
            # Device window reads over the split layout (the chunk
            # cache packs B=1 batches through the same tail path).
            from mtscomp_tpu.parallel.pipeline import DeviceChunkCache
            cache = DeviceChunkCache(r)
            for (a, b) in [(3, ns // 2), (ns - 5, ns + 7)]:
                w = cache.read_window(a, b)
                assert np.array_equal(w, arr[a:b]), \
                    "bit6 device window [%d:%d) mismatch" % (a, b)
            return {'tail': list(dec.last_tail), 'windows': 'ok'}
        finally:
            r.close()

    run_cell('ragged_tail_split',
             'groups [32,32,32,1]: [fulls|tails] packing + two-ref '
             'finalize byte-exact', cell_ragged_tail)

    # --- per-chunk transform adaptation (flags bit5) ---------------------
    def cell_transform_adapt():
        dt = np.dtype(np.int16)
        half = NS // 2
        rng = np.random.default_rng(21)
        t = np.arange(half)
        noise = np.cumsum(rng.normal(0, 8, size=(half, C)), axis=0)
        lfp = (800 * np.sin(2 * np.pi * 4 * t / SR)[:, None]
               + np.cumsum(rng.normal(0, .6, size=(NS - half, C)),
                           axis=0))
        arr = np.concatenate([noise, lfp]).astype(dt)
        sub = tmp / ("cell_%d" % len(RESULTS))
        sub.mkdir()
        raw = sub / 'x.bin'
        arr.tofile(raw)
        # Short chunks -> 10 of them: window 0 (8 chunks) exercises the
        # device-encode run path, the 2-chunk tail run falls to the
        # host codec (MIN_DEVICE_SUBBATCH) — both must produce bytes
        # identical to the all-host compress.
        cd = (NS // 10) / SR
        compress(raw, sub / 'x.cbin', sub / 'x.ch', sample_rate=SR,
                 n_channels=C, dtype='int16',
                 **cbase(transform_adapt=8, chunk_duration=cd))
        compress(raw, sub / 'd.cbin', sub / 'd.ch', sample_rate=SR,
                 n_channels=C, dtype='int16',
                 **cbase(transform_adapt=8, chunk_duration=cd,
                         device='tpu'))
        assert (sub / 'd.cbin').read_bytes() \
            == (sub / 'x.cbin').read_bytes(), \
            "adaptive device encode diverged from host bytes"
        r = decompress(sub / 'x.cbin', sub / 'x.ch', quiet=True)
        try:
            from mtscomp_tpu.parallel.pipeline import _read_payload
            descs = [r.codec.parse(_read_payload(r, i))['transform']
                     for i in range(r.n_chunks)]
            assert all(d is not None for d in descs)
            device_decode_all(r, arr)    # per-window device batches
            return {'descs': [list(d) for d in descs],
                    'device_encode': 'byte-identical'}
        finally:
            r.close()

    run_cell('transform_adapt_int16',
             'adaptive bit5 chunks decode on device per uniform window',
             cell_transform_adapt)

    # --- encode kernel: capacity overflow + scan fallback ---------------
    def cell_encode_overflow():
        from mtscomp_tpu import Writer
        dt = np.dtype(np.int16)
        arr = make_data('walk', dt, NS, C, seed=5)
        sub = tmp / 'ovf'
        sub.mkdir()
        raw = sub / 'x.bin'
        arr.tofile(raw)
        w = Writer(algorithm='ans', quiet=True)
        extra = {}
        try:
            w.open(raw, sample_rate=SR, n_channels=C, dtype='int16')
            chunks = np.stack([np.asarray(w.get_chunk(0))])
            enc = pl.DeviceBatchEncoder(w)
            # Reach the kernel staging with a deliberately understated
            # capacity estimate (row_bits forced to 0 -> cap 65536
            # words): overflow must be DETECTED (None returned), never
            # silent truncation.
            payload = w.codec.encode(w._transform_chunk(chunks[0]),
                                     order=w.chunk_order)
            parsed = w.codec.parse(payload)
            group_words = max(g['words'].size for g in parsed['groups'])
            if backend == 'tpu':
                assert group_words > 512 * 128, \
                    "stream too small to exercise overflow (%d words " \
                    "in the largest group)" % group_words
                orig = pl.DeviceBatchEncoder._encode_pallas
                seen = {}

                def probe(self, symbols, freq_arr, row_bits, counts, S):
                    out = orig(self, symbols, freq_arr,
                               np.zeros_like(row_bits), counts, S)
                    seen['overflow_detected'] = out is None
                    return out
                with _patched({(pl.DeviceBatchEncoder,
                                '_encode_pallas'): probe}):
                    payloads = enc.encode_batch(chunks)
                assert seen.get('overflow_detected'), \
                    "tiny capacity did not trigger the overflow fallback"
                assert payloads is not None and payloads[0] == payload, \
                    "post-overflow scan fallback not byte-identical"
                extra['overflow'] = 'detected+scan-identical'
            # Forced scan path on hardware (the non-kernel device encode).
            extra['forced_scan'] = device_encode_check(
                raw, arr, SR, C, {}, force_scan=True)
        finally:
            w.close()
        return extra
    run_cell('encode_overflow_fallback',
             'kernel capacity overflow -> XLA scan, byte-identical',
             cell_encode_overflow)

    # --- corruption surfaces on the hardware path ------------------------
    def cell_corruption():
        dt = np.dtype(np.int16)
        arr = make_data('walk', dt, NS, C, seed=7)
        sub = tmp / 'corr'
        sub.mkdir()
        raw = sub / 'x.bin'
        arr.tofile(raw)
        compress(raw, sub / 'x.cbin', sub / 'x.ch', sample_rate=SR,
                 n_channels=C, dtype='int16', **cbase())
        data = bytearray((sub / 'x.cbin').read_bytes())
        data[len(data) // 2] ^= 0x40
        (sub / 'x.cbin').write_bytes(bytes(data))
        r = decompress(sub / 'x.cbin', sub / 'x.ch', quiet=True)
        try:
            try:
                device_decode_all(r, arr)
            except (IOError, AssertionError) as e:
                return {'detected': type(e).__name__}
            raise AssertionError("corrupted payload decoded silently")
        finally:
            r.close()
    run_cell('corruption_detected', 'flipped byte mid-.cbin must surface',
             cell_corruption)

    # --- randomized cells: fresh Mosaic compiles off the fixed grid -----
    def cell_random(i):
        def fn():
            rng = np.random.default_rng(args.seed * 1000 + i)
            dt = np.dtype(str(rng.choice(
                ['int8', 'uint8', 'int16', 'uint16', 'int32', 'uint32',
                 'float16', 'float32'])))
            nc = int(rng.integers(3, 512))
            csz = int(rng.integers(400, 6000))
            ns = int(csz * rng.uniform(1.1, 3.4))
            kw = dict(
                ans_table_mode=str(rng.choice(['plane', 'segment'])),
                ans_channel_segments=bool(rng.integers(0, 2)),
                ans_seg_log2=int(rng.integers(10, 18)),
                chunk_order=str(rng.choice(['F', 'F', 'F', 'C'])),
                do_spatial_diff=bool(rng.integers(0, 4) == 0),
                do_time_diff=bool(rng.integers(0, 8) != 0),
                time_diff_order=int(rng.choice([1, 1, 2])),
            )
            kind = str(rng.choice(['walk', 'gradient']))
            arr = make_data(kind, dt, ns, nc, seed=int(rng.integers(1e6)))
            sub = tmp / ('rand_%d' % i)
            sub.mkdir()
            raw = sub / 'x.bin'
            arr.tofile(raw)
            compress(raw, sub / 'x.cbin', sub / 'x.ch',
                     sample_rate=float(csz), n_channels=nc, dtype=dt.name,
                     **cbase(**kw))
            code = (arr.view('int%d' % (dt.itemsize * 8))
                    if dt.kind == 'f' else arr)
            r = decompress(sub / 'x.cbin', sub / 'x.ch', quiet=True)
            try:
                device_decode_all(r, code)
                extra = dict(dtype=dt.name, nc=nc, csize=csz, ns=ns,
                             mode=kw['ans_table_mode'],
                             aligned=kw['ans_channel_segments'],
                             order=kw['chunk_order'])
                if dt.itemsize <= 2 and csz > 1:
                    from mtscomp_tpu import Writer
                    w = Writer(algorithm='ans', quiet=True,
                               **{k: v for k, v in cbase(**kw).items()
                                  if k.startswith('ans_')
                                  or k in ('chunk_order', 'do_time_diff',
                                           'do_spatial_diff',
                                           'time_diff_order')})
                    try:
                        w.open(raw, sample_rate=float(csz), n_channels=nc,
                               dtype=dt.name)
                        enc = pl.DeviceBatchEncoder(w)
                        if enc.supported(csz):
                            chunk = np.stack([np.asarray(w.get_chunk(0))])
                            payloads = enc.encode_batch(chunk)
                            if payloads is not None:
                                host = w.codec.encode(
                                    w._transform_chunk(chunk[0]),
                                    order=w.chunk_order)
                                assert payloads[0] == host, \
                                    "random-cell device container " \
                                    "diverged from host"
                                extra['encode'] = 'identical'
                    finally:
                        w.close()
            finally:
                r.close()
            return extra
        return fn

    for i in range(args.random):
        run_cell('random_%02d' % i, 'randomized geometry/mode',
                 cell_random(i))

    # ---------------------------------------------------------------------
    n_ok = sum(r['ok'] for r in RESULTS)
    summary = dict(backend=backend, cells=len(RESULTS), passed=n_ok,
                   failed=len(RESULTS) - n_ok,
                   pallas_decode_traces=counters['decode'],
                   pallas_encode_traces=counters['encode'],
                   quick=bool(args.quick),
                   geometry=dict(sr=SR, n_channels=C, n_samples=NS))
    (ROOT / (args.out + '.json')).write_text(
        json.dumps(dict(summary=summary, cells=RESULTS), indent=1))

    lines = [
        "# TPU hardware storm — full ANS format surface on real silicon",
        "",
        "Driver: `tools/tpu_storm.py` (run fresh; results below are from "
        "the last run).",
        "Backend: **%s** — %d/%d cells passed; Pallas kernel traces: "
        "%d decode / %d encode."
        % (backend, n_ok, len(RESULTS), counters['decode'],
           counters['encode']),
        "",
        "Every cell: host-compress (normative coder) -> device batch "
        "decode on the %s backend -> byte-compare vs the original "
        "array, with the stream-word corruption audit live. Cells with "
        "itemsize <= 2 also device-encode and require containers "
        "byte-identical to the host codec." % backend,
        "",
        "| cell | ok | s | detail | notes |",
        "|---|---|---|---|---|",
    ]
    for r in RESULTS:
        detail = {k: v for k, v in r.items()
                  if k not in ('cell', 'ok', 'note', 'secs', 'error')}
        lines.append("| %s | %s | %.0f | %s | %s |" % (
            r['cell'], 'PASS' if r['ok'] else '**FAIL**', r['secs'],
            ', '.join('%s=%s' % kv for kv in detail.items()) or '—',
            r.get('error', r['note'])))
    lines += [
        "",
        "Axes covered: 6 integer dtypes (1/2/4-byte kernel variants), "
        "bitcast floats (float16 via the i16 kernels incl. device "
        "encode, float32 via the int32 decode variant), "
        "8-byte dtypes (int64/uint64/float64: device path declines, "
        "host fallback byte-exact through every forced-device entry), "
        "plane + segment-multitable (bit4) containers, aligned + "
        "non-aligned layouts, self-written one-fixup + foreign "
        "two-fixup tables, partial tail chunks, chunk_order C, spatial "
        "diff, no-time-diff, "
        "encode-kernel overflow fallback, and corruption surfacing.",
        "",
    ]
    (ROOT / (args.out + '.md')).write_text('\n'.join(lines))
    print("\n%d/%d cells passed on backend=%s -> %s.md"
          % (n_ok, len(RESULTS), backend, args.out), flush=True)
    return 0 if n_ok == len(RESULTS) else 1


if __name__ == '__main__':
    sys.exit(main())
