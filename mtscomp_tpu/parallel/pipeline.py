"""Batched device decode pipeline.

Replaces the reference's ThreadPool-of-chunks decompression
(mtscomp.py:645-650, 686-699) with a device program: a batch of B chunk
containers is parsed on the host, every rANS *group* across the batch is
decoded by the vectorized scan (``ops/device_rans.py``), segments are
reassembled into byte planes, planes are combined, zigzag is inverted,
the F-order element stream is reshaped, and the inverse delta scan runs
— all inside ONE jitted function per shape signature, so XLA fuses the
postprocessing and the only host<->device traffic is (compressed payload
in, decoded chunks out).

Shape signatures are (B, T, C, dtype, plane modes, segment geometry,
W-bucket); payload word lengths are padded to power-of-two buckets to
bound the number of compilations.
"""

import functools
import os

import numpy as np

from ..codec.ans import MODE_RAW, MODE_RANS, MODE_CONST
from ..codec.ans import seg_freqs as ans_seg_freqs
from ..models.rans import LANES, GROUP_ROWS, RANS_L
from ..utils.misc import logger
from ..utils.trace import phase


_CACHE_SET = False


def _jax():
    import jax
    import jax.numpy as jnp
    global _CACHE_SET
    if not _CACHE_SET:
        _CACHE_SET = True
        try:
            # Persistent compile cache for every device path: the fused
            # decode/encode programs take 20-40 s to compile on TPU
            # (worse through relays); CLI invocations are fresh
            # processes every time. Never override a user setting.
            if jax.config.jax_compilation_cache_dir is None:
                import os
                jax.config.update(
                    'jax_compilation_cache_dir',
                    os.path.expanduser('~/.cache/mtscomp_tpu/jax'))
                jax.config.update(
                    'jax_persistent_cache_min_compile_time_secs', 0.5)
        except Exception:  # pragma: no cover - cache is best-effort
            pass
    return jax, jnp


_LINK_PROFILE = None


def link_profile(refresh=False):
    """Measured ``(sync_latency_s, device->host_bytes_per_s)`` of this
    process's accelerator attachment; cached after the first call.

    The same TPU chip can sit behind a ~us PCIe link or a ~30 ms
    dev-relay tunnel; random-access routing (``Reader._use_device``)
    must know which, because a window read pays one sync plus the
    window download. Measured, not configured: a tiny reduction fetch
    bounds the round-trip latency and a 1 MB array fetch bounds the
    device->host bandwidth (``block_until_ready`` is unreliable through
    relays, so completion is always observed via the fetch itself).
    CPU backends report (0, inf): arrays are host-resident already.
    """
    global _LINK_PROFILE
    if _LINK_PROFILE is not None and not refresh:
        return _LINK_PROFILE
    jax, jnp = _jax()
    # Backend check BEFORE the disk cache: the cache is keyed per
    # machine, but the same machine can run CPU-backend processes
    # (plugin absent, jax_platforms=cpu) right after an accelerator
    # run wrote the relay's profile — host-resident arrays must always
    # report (0, inf).
    if jax.default_backend() == 'cpu':
        _LINK_PROFILE = (0.0, float('inf'))
        return _LINK_PROFILE
    if not refresh:
        cached = _load_link_cache()
        if cached is not None:
            _LINK_PROFILE = cached
            return _LINK_PROFILE
    small = jnp.zeros((8, LANES), jnp.float32)
    float(jnp.sum(small))                   # compile + first-fetch
    lat = min(_timed(lambda: float(jnp.sum(small))) for _ in range(3))
    # The fetch must hit the wire every rep: jax.Array caches its host
    # copy after the first materialization (zeros measured ~TB/s that
    # way), so each rep fetches a FRESH device buffer — host random
    # payload (incompressible to any relay-side compression), xor'd on
    # device so the fetched buffer never aliases the uploaded one.
    payload = np.random.default_rng(0).integers(
        0, 1 << 32, size=(1 << 16,), dtype=np.uint32)     # 256 KB
    fetches = []
    for i in range(2):
        dev = jax.device_put(payload) ^ np.uint32(i + 1)
        fetches.append(_timed(lambda d=dev: np.asarray(d)))
    bw = payload.nbytes / max(min(fetches) - lat, 1e-7)
    _LINK_PROFILE = (lat, bw)
    logger.debug("Accelerator link profile: sync %.2f ms, fetch %.0f MB/s.",
                 lat * 1e3, bw / 1e6)
    _store_link_cache(_LINK_PROFILE)
    return _LINK_PROFILE


_LINK_CACHE_TTL = 24 * 3600.0


def _profile_cache_path(name):
    import os
    return os.path.join(os.path.expanduser('~/.cache/mtscomp_tpu'), name)


def _load_profile_cache(name, keys):
    """Probing costs time (a backend init for the link, ~100 ms of
    codec work for the host) — one measured profile serves every
    process on the machine for a day. A stale entry only costs speed,
    never correctness (every route is byte-exact)."""
    import json
    import os
    import time
    try:
        path = _profile_cache_path(name)
        if time.time() - os.stat(path).st_mtime > _LINK_CACHE_TTL:
            return None
        with open(path) as f:
            d = json.load(f)
        return tuple(float(d[k]) for k in keys)
    except (OSError, ValueError, KeyError, TypeError):
        return None


def _store_profile_cache(name, keys, values):
    import json
    import os
    try:
        path = _profile_cache_path(name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = '%s.%d.tmp' % (path, os.getpid())
        with open(tmp, 'w') as f:
            json.dump(dict(zip(keys, values)), f)
        os.replace(tmp, path)
    except OSError:  # pragma: no cover - cache is best-effort
        pass


_LINK_KEYS = ('latency_s', 'bytes_per_s')


def _load_link_cache():
    return _load_profile_cache('link_profile.json', _LINK_KEYS)


def _store_link_cache(profile):
    _store_profile_cache('link_profile.json', _LINK_KEYS, profile)


_HOST_PROFILE = None
_HOST_KEYS = ('encode_bytes_per_s', 'decode_bytes_per_s')
# Fallbacks if the measurement itself fails (never expected): the
# round-1/2 hardcoded estimates (~300 MB/s native encode, ~250 MB/s
# native decode per core on a commodity core).
_HOST_FALLBACK = (300e6, 250e6)


def host_profile(refresh=False):
    """Measured ``(encode_bytes_per_s, decode_bytes_per_s)`` of ONE
    host core running the ans codec on a synthetic Neuropixels-like
    block; cached in-process and on disk (24 h, beside the link
    profile).

    Auto routing (``Writer._use_device`` / ``Reader._use_device``)
    compares the accelerator link against the host codec; the host
    side was a hardcoded ``300e6 x cores`` guess through round 2 —
    wrong on hosts whose cores aren't ~300 MB/s, and blind to whether
    the native runtime is actually loaded. Measuring a ~4 MB block
    through the real encode/decode entry points (~100 ms with the C++
    runtime, sub-second even on the numpy fallback) makes the decision
    derive from two measurements instead of one measurement and one
    guess.
    """
    global _HOST_PROFILE
    if _HOST_PROFILE is not None and not refresh:
        return _HOST_PROFILE
    if not refresh:
        cached = _load_profile_cache('host_profile.json', _HOST_KEYS)
        if cached is not None:
            _HOST_PROFILE = cached
            return _HOST_PROFILE
    _HOST_PROFILE = _measure_host_rates()
    logger.debug("Host codec profile: encode %.0f MB/s, decode %.0f MB/s "
                 "per core.", _HOST_PROFILE[0] / 1e6,
                 _HOST_PROFILE[1] / 1e6)
    _store_profile_cache('host_profile.json', _HOST_KEYS, _HOST_PROFILE)
    return _HOST_PROFILE


def _measure_host_rates():
    """One-shot single-thread codec rates on a ~4 MB synthetic chunk.

    Times the same entry points the production paths use: encode with
    the fused time-diff prep (Writer._compress_chunk) and decode +
    in-dtype inverse cumsum (Reader.read_chunk). Best of 3 reps — the
    routing decision separates links that differ ~100x, so scheduler
    jitter is immaterial.
    """
    import time
    try:
        from ..codec.ans import AnsCodec
        from ..ops.delta import cumsum_along_axis
        ns, nc = 16384, 128                     # 4 MB int16
        rng = np.random.default_rng(0)
        arr = np.ascontiguousarray(np.cumsum(
            rng.normal(0.0, 6.0, size=(ns, nc)), axis=0).astype(np.int16))
        codec = AnsCodec()
        enc_t = dec_t = float('inf')
        payload = None
        for _ in range(3):
            t0 = time.perf_counter()
            payload = codec.encode(arr, order='F', time_diff_pending=True)
            enc_t = min(enc_t, time.perf_counter() - t0)
        for _ in range(3):
            t0 = time.perf_counter()
            out = codec.decode(payload, ns, nc, arr.dtype, order='F')
            cumsum_along_axis(out, axis=0, inplace=True)
            dec_t = min(dec_t, time.perf_counter() - t0)
        return (arr.nbytes / max(enc_t, 1e-7),
                arr.nbytes / max(dec_t, 1e-7))
    except Exception:  # pragma: no cover - fallback only
        logger.debug("Host codec rate probe failed; using fallback "
                     "estimates.", exc_info=True)
        return _HOST_FALLBACK


def _timed(fn):
    import time
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _fuse8_geom(modes, dtype, zigzag, order, do_time_diff,
                do_spatial_diff, seg, tp, T, S, use_pallas, aligned,
                has_head):
    """Shared fuse8 predicate: ``(fuse8, k, spb_f)``.

    Default fast path: u8 kernel output feeds a combine+zigzag+
    transpose+scan kernel directly (zero-copy reshape, since the
    row-linear rows ARE k channels of tp symbols each) — the decode
    never materializes a combined int16 diff stream. Needs full
    segments (seg_eff == seg) so the reshape is clean, and spb
    dividing S so the kernel emits exactly seg_eff columns.

    One function because TWO places must agree exactly: the compiled
    decode fn takes the fuse8 branch, and the packer decides whether
    to pack the ragged-tail split arrays (which only that branch
    consumes).
    """
    rans_planes = [p for p, m in enumerate(modes) if m == MODE_RANS]
    const_planes = [p for p, m in enumerate(modes) if m == MODE_CONST]
    raw_planes = [p for p, m in enumerate(modes) if m == MODE_RAW]
    k = (seg // tp) if aligned and tp else 0
    seg_eff = min(seg, S * LANES) if rans_planes else 0
    spb_f = max((d for d in range(1, 129) if S % d == 0), default=1) \
        if S else 1
    i16_kind = dtype in (np.dtype(np.int16), np.dtype(np.uint16))
    fuse8 = (use_pallas and aligned and has_head
             and os.environ.get('MTSCOMP_NO_FUSE8', '') in ('', '0')
             and rans_planes == [0] and not raw_planes
             and len(const_planes) == 1
             and i16_kind and zigzag
             and order == 'F' and do_time_diff and not do_spatial_diff
             and (GROUP_ROWS * k) % 128 == 0
             and seg_eff == seg and spb_f >= 8 and tp >= T)
    return fuse8, k, spb_f


@functools.lru_cache(maxsize=32)
def _build_decode_fn(B, T, C, dtype_str, modes, n_seg, seg, G, S, W, order,
                     do_time_diff, do_spatial_diff, zigzag, has_head,
                     use_pallas, small_alpha=False, aligned=False,
                     one_fixup=False, diff_order=1, octet=False,
                     tail=None, tail_split=1):
    """Compile the fused decode for one shape signature.

    B chunks of (T, C); ``modes`` per-plane; each RANS plane has
    ``n_seg`` segments of ``seg`` symbols; G groups per chunk; scan
    length S; word buffers padded to W words ( = WR rows of 128).
    ``aligned``: the container uses channel-aligned segments (RANS
    plane streams are per-channel padded to tp = ceil((T-1)/128)*128).
    """
    jax, jnp = _jax()
    from ..ops.device_rans import decode_groups
    from ..ops.pallas_rans import decode_groups_pallas
    from ..ops.device_delta import (cumsum_time, cumsum_time_jnp,
                                    cumsum_space_jnp, cumsum_time_transposed,
                                    pad_to, zigzag_decode_jnp)

    dtype = np.dtype(dtype_str)
    Tc = T - 1 if has_head else T       # rows covered by the coded planes
    n_elems = Tc * C
    tp = -(-Tc // LANES) * LANES if aligned else 0
    n_stream = C * tp if aligned else n_elems
    rans_planes = [p for p, m in enumerate(modes) if m == MODE_RANS]
    const_planes = [p for p, m in enumerate(modes) if m == MODE_CONST]
    raw_planes = [p for p, m in enumerate(modes) if m == MODE_RAW]
    n_rows = len(rans_planes) * n_seg          # flat segments per chunk
    # Segment payload slice: full segments carry exactly ``seg`` symbols;
    # when the chunk is smaller than one segment, rows only span S*128.
    seg_eff = min(seg, S * LANES) if rans_planes else 0

    # (A fully fused 16-bit kernel variant — elements finished inside
    # the decode kernel via per-symbol element tables — was A/B'd on
    # hardware in rounds 1 and 2 and lost to this path both times
    # (6.37 vs 6.66 GB/s median, r2): the 16-bit kernel stores outweigh
    # the combine pass XLA already fuses. Removed; see git history.)
    fuse8, k, spb_f = _fuse8_geom(modes, dtype, zigzag, order,
                                  do_time_diff, do_spatial_diff, seg, tp,
                                  T, S, use_pallas, aligned, has_head)
    # uint16 rides the int16 kernels bit-for-bit: the scans/zigzag are
    # wrapping mod-2^16 arithmetic, so a bitcast in and out is exact
    # (the reference's canonical Neuropixels dataset is uint16).
    i16_kind = dtype in (np.dtype(np.int16), np.dtype(np.uint16))
    # 1-byte dtypes ride them too: widen to int16, scan mod 2^16, keep
    # the low byte — mod 256 is a quotient of mod 2^16, so truncation
    # reproduces the wrapping 8-bit cumsum exactly.
    one_byte = dtype.itemsize == 1
    # 4-byte integers use the kernels' int32 variant (4 byte-split
    # matmuls per tile instead of 2); uint32 bitcasts like uint16.
    four_byte = dtype in (np.dtype(np.int32), np.dtype(np.uint32))
    kdtype = jnp.int32 if four_byte else jnp.int16
    scan_kinds = i16_kind or one_byte or four_byte
    if tail_split > 1 and tail is None:
        # flags bit6 without the tail packing engaged (kill switch, or
        # a foreign layout the tail check rejected): the plain fuse8
        # reshape assumes uniform k-channel rows, which bit6's sub-rows
        # are not — use the generic per-row reassembly instead.
        fuse8 = False
    c_cap = G * GROUP_ROWS * k if fuse8 else 0
    assert tail is None or (fuse8 and G >= 2), \
        "tail-split packing requires the fuse8 path"

    def as_i16(a):
        """To the scan-kernel dtype (int16/int32), bit-preserving."""
        if one_byte:
            return a.astype(jnp.int16)      # value-extend; see one_byte
        return a if a.dtype == kdtype \
            else jax.lax.bitcast_convert_type(a, kdtype)

    def from_i16(a):
        """Back from the scan-kernel dtype to the element dtype."""
        if one_byte:
            u = (a & 255).astype(jnp.uint8)
            return u if dtype == np.uint8 \
                else jax.lax.bitcast_convert_type(u, jnp.int8)
        return a if a.dtype == jnp.dtype(dtype) \
            else jax.lax.bitcast_convert_type(a, jnp.dtype(dtype))

    @jax.jit
    def decode(states, words, freqs, counts, coarse_pk, dense_pk, counts_b,
               const_vals, raw_vals, heads):
        if fuse8 and tail is not None:
            # Ragged-tail packing (the 385th-channel fix): the last
            # group of each chunk holds ONE short segment (rem < k
            # channels, S_t steps), and stacked cells scan to their
            # longest member — chunk-major packing mixed tails with
            # full groups, making EVERY cell scan the full S steps for
            # +rem/C more data (measured -26% on the canonical 385-ch
            # Neuropixels geometry). The packer instead orders the
            # batch [all full groups chunk-major | all tail groups], so
            # tails share cells and the kernel's per-cell step clamp
            # scans them S_t steps only. One kernel call as before (a
            # second pallas_call measured ~3 ms of fixed launch cost on
            # the dev attachment — tools/tail_ab.py); full groups stay
            # chunk-major, so the bulk of the output still feeds the
            # fused finalize as a zero-copy view, and only the tiny
            # tail block (B x rem x tp bytes) is sliced out. The
            # two-ref finalize merges the blocks in VMEM — a plain
            # concatenate would burn a full extra HBM pass.
            rem, ctB, rows_n = tail
            NF = B * (G - 1)                       # full-group rows
            cA = (G - 1) * GROUP_ROWS * k          # == C - rem
            from ..ops.device_delta import cumsum_time_transposed_u8_tail
            syms, used = decode_groups_pallas(
                states, words, coarse_pk, dense_pk, counts_b, n_steps=S,
                small_alpha=small_alpha, steps_per_block=spb_f,
                one_fixup=one_fixup, octet=octet)
            chanA = syms[:NF].reshape(B, cA, tp)
            # Tail rows: one ragged segment pre-bit6, M sub-rows with
            # flags bit6 — their real symbol ranges concatenate to the
            # tail channels' stream (tiny: B x rem x tp bytes).
            chanB = jnp.concatenate(
                [syms[NF:, r, :n] for r, n in enumerate(rows_n)],
                axis=1).reshape(B, rem, tp)
            chanB = jnp.pad(chanB, ((0, 0), (0, ctB - rem), (0, 0)))
            heads16 = as_i16(heads)
            headB = jnp.pad(heads16[:, cA:], ((0, 0), (0, ctB - rem)))
            out = cumsum_time_transposed_u8_tail(
                chanA, chanB, heads16[:, :cA], headB, const_vals[:, 0])
            res = out[:, :T, :C]
            if diff_order == 2:
                res = cumsum_time(res, use_pallas=True)
            # Back to chunk-major group order for the word audit.
            used = jnp.concatenate(
                [used[:NF].reshape(B, G - 1), used[NF:].reshape(B, 1)],
                axis=1)
            return from_i16(res), used.reshape(-1)
        if fuse8:
            from ..ops.device_delta import cumsum_time_transposed_u8
            syms, used = decode_groups_pallas(
                states, words, coarse_pk, dense_pk, counts_b, n_steps=S,
                small_alpha=small_alpha, steps_per_block=spb_f,
                one_fixup=one_fixup, octet=octet)
            chan = syms.reshape(B, c_cap, tp)
            heads_p = jnp.pad(as_i16(heads), ((0, 0), (0, c_cap - C)))
            out = cumsum_time_transposed_u8(chan, heads_p,
                                            const_vals[:, 0])
            res = out[:, :T, :C]
            if diff_order == 2:
                # The fused scan inverted the SECOND diff (d2 -> d1);
                # one more carried scan pass restores the samples.
                res = cumsum_time(res, use_pallas=True)
            return from_i16(res), used
        ubits = 'uint%d' % (dtype.itemsize * 8)
        acc = jnp.zeros((B, n_elems), dtype=jnp.dtype(ubits))
        used = jnp.zeros((B,), dtype=jnp.int32)
        if rans_planes:
            if use_pallas:
                # Kernel output is already row-linear (N, R, steps*128).
                syms, used = decode_groups_pallas(
                    states, words, coarse_pk, dense_pk, counts_b,
                    n_steps=S, small_alpha=small_alpha,
                    one_fixup=one_fixup, octet=octet)
                rows = syms.reshape(B, G * GROUP_ROWS, -1)
            else:
                syms, used = decode_groups(
                    states, words.reshape(words.shape[0], -1),
                    freqs, counts, n_steps=S)
                # (B*G, S, R, 128) -> (B, G*R rows, S*128)
                rows = syms.reshape(B, G, S, GROUP_ROWS, LANES)
                rows = jnp.transpose(rows, (0, 1, 3, 2, 4))
                rows = rows.reshape(B, G * GROUP_ROWS, S * LANES)
            if tail_split > 1:
                # flags bit6: the flat segment list is non-uniform (the
                # ragged tail is M sub-rows), so the uniform reshape
                # below does not apply — reassemble the plane streams
                # from each row's real symbol range (fallback path;
                # the fuse8 branch above handles the hot shape).
                from ..codec.ans import segment_counts as _seg_counts
                seg_list = _seg_counts(n_stream, seg, modes, tail_split)
                planes = jnp.concatenate(
                    [rows[:, r, :n] for r, (_sp, _ss, n)
                     in enumerate(seg_list)], axis=1)
                planes = planes.reshape(B, len(rans_planes), n_stream)
            else:
                rows = rows[:, :n_rows, :seg_eff]
                planes = rows.reshape(B, len(rans_planes),
                                      n_seg * seg_eff)
                planes = planes[:, :, :n_stream]
            if aligned:
                # Drop the per-channel zero pads of the coded streams.
                planes = planes.reshape(
                    B, len(rans_planes), C, tp)[:, :, :, :Tc]
                planes = planes.reshape(B, len(rans_planes), n_elems)
            for j, p in enumerate(rans_planes):
                acc = acc | (planes[:, j, :].astype(ubits) << (8 * p))
        for j, p in enumerate(const_planes):
            acc = acc | (const_vals[:, j:j + 1].astype(ubits) << (8 * p))
        for j, p in enumerate(raw_planes):
            acc = acc | (raw_vals[:, j, :].astype(ubits) << (8 * p))
        if zigzag:
            elems = zigzag_decode_jnp(acc, dtype)
        else:
            elems = acc.astype(dtype)
        if (use_pallas and order == 'F' and do_time_diff
                and not do_spatial_diff and scan_kinds):
            # Fused finalize: channel-major elements (with the verbatim
            # head as column 0, so the scan emits it as sample 0) go
            # through one transpose+scan kernel — one HBM pass instead
            # of separate transpose and cumsum passes.
            ct = as_i16(elems).reshape(B, C, Tc)
            if has_head:
                ct = jnp.concatenate([as_i16(heads)[:, :, None], ct],
                                     axis=2)
            T_out = ct.shape[2]
            ct = pad_to(pad_to(ct, 128, axis=2), 128, axis=1)
            res = cumsum_time_transposed(ct)[:, :T_out, :C]
            if diff_order == 2:
                res = cumsum_time(res, use_pallas=True)
            return from_i16(res), used
        if order == 'F':
            chunks = jnp.transpose(elems.reshape(B, C, Tc), (0, 2, 1))
        else:
            chunks = elems.reshape(B, Tc, C)
        if has_head:
            chunks = jnp.concatenate([heads[:, None, :], chunks], axis=1)
        if do_spatial_diff:
            chunks = cumsum_space_jnp(chunks)
        if do_time_diff:
            # The Pallas carried-scan kernel: XLA's cumsum lowering over
            # tens of thousands of timesteps is unusable on TPU.
            if use_pallas and scan_kinds:
                x = as_i16(chunks)
                for _ in range(diff_order):
                    x = cumsum_time(x, use_pallas=True)
                chunks = from_i16(x)
            else:
                for _ in range(diff_order):
                    chunks = cumsum_time_jnp(chunks)
        return chunks, used

    return decode


def check_words_used(parsed_list, used):
    """Compare device-reported per-group word consumption to the
    containers' stored stream lengths; IOError on mismatch."""
    n_groups = sum(len(p['groups']) for p in parsed_list)
    if n_groups == 0:
        return
    used = np.asarray(used).reshape(-1)
    i = 0
    for parsed in parsed_list:
        for g in parsed['groups']:
            if used[i] != g['words'].size:
                raise IOError("ANS group consumed %d of %d payload words."
                              % (used[i], g['words'].size))
            i += 1


class DeviceBatchDecoder:
    """Decode batches of parsed ANS chunk containers on the device."""

    def __init__(self, reader):
        self.reader = reader
        assert reader.algorithm == 'ans', \
            "device batch decode requires the ans (v2) format"
        # Bitcast float files decode in their integer coding dtype
        # (float16 -> the fused i16 kernels, float32 -> the int32
        # variant); callers reinterpret the decoded buffers back to the
        # reader dtype (same bytes, zero copy).
        self.dtype = np.dtype(getattr(reader, 'code_dtype', reader.dtype))
        self.order = reader.chunk_order
        self.do_time_diff = bool(reader.cmeta.do_time_diff)
        self.do_spatial_diff = bool(reader.cmeta.do_spatial_diff)
        self.diff_order = int(getattr(reader, 'time_diff_order', 1))

    def supported(self, parsed_list, n_samples):
        """Uniform geometry/modes across the batch, integer dtype.

        Containers that fail here take the host path, which raises the
        decoders' documented IOErrors for genuinely malformed inputs
        (dtype/itemsize mismatch, foreign head geometry) instead of
        producing wrong bytes or raw broadcast errors.
        """
        if self.dtype.kind not in 'iu':
            return False
        if self.dtype.itemsize > 4:
            # 8-byte dtypes (int64/uint64, and float64 via bitcast)
            # must decode on the host: under JAX's default x64-disabled
            # mode a uint64 plane accumulator silently truncates to
            # uint32, OR-shifting the upper four byte planes into
            # oblivion — wrong values with the wrong dtype, and every
            # payload-level guard (CRC, table validation, word audit)
            # still passes. The host codec is exact for any width
            # (reference semantics, mtscomp.py:143-169, 375-397).
            return False
        if self.dtype.byteorder not in '<=|':
            return False     # JAX has no non-native dtypes; host path
        first = parsed_list[0]
        if first['itemsize'] != self.dtype.itemsize:
            return False
        if first['n_head'] not in (0, self.reader.n_channels):
            return False
        for parsed in parsed_list:
            if parsed['modes'] != first['modes']:
                return False
            if parsed.get('transform') != first.get('transform'):
                # Adaptive chunks with differing transforms cannot share
                # one compiled decode fn; host path decodes them
                # per-chunk (uniform windows still batch on device).
                return False
            if parsed.get('tail_split', 1) != first.get('tail_split', 1):
                return False
            if parsed['seg'] != first['seg']:
                return False
            if parsed['aligned'] != first['aligned']:
                return False
            if parsed['zigzag'] != first['zigzag']:
                return False
            if parsed['n_stream'] != first['n_stream']:
                return False
            if parsed['itemsize'] != first['itemsize']:
                return False
            if parsed['n_elems'] != n_samples * self.reader.n_channels:
                return False
            if parsed['n_head'] != first['n_head']:
                return False
        return True

    def decode_batch(self, parsed_list, n_samples, mesh=None):
        """Returns (B, n_samples, n_channels) decoded ndarray.

        Raises IOError when any group's stream-word consumption differs
        from its container's stored length (corrupt payload) — the
        device analogue of the sequential decoders' inline check.
        """
        with phase('decode.pack'):
            fn, args = self.pack(parsed_list, n_samples, mesh=mesh)
        with phase('decode.device'):
            out, used = fn(*args)
        with phase('decode.fetch'):
            check_words_used(parsed_list, used)
            return np.asarray(out)

    def pack(self, parsed_list, n_samples, mesh=None):
        """Stage a batch: build device arrays + the compiled decode fn.

        Returns ``(fn, device_args)``; ``fn(*device_args)`` decodes
        entirely on-device and returns ``(chunks, words_used)`` — pass
        ``words_used`` to :func:`check_words_used` for the corruption
        audit (decode_batch does). Useful to amortize host->device
        transfer of the compressed batch across repeated decodes.

        With ``mesh`` (a 1-D device mesh), the chunk batch is sharded
        across devices under shard_map — each device decodes its own
        chunks' groups; no cross-chunk communication is needed.
        """
        jax, jnp = _jax()
        B = len(parsed_list)
        C = self.reader.n_channels
        T = n_samples
        n_elems = T * C
        first = parsed_list[0]
        modes = tuple(first['modes'])
        seg = first['seg']
        has_head = first['n_head'] > 0
        n_coded = n_elems - first['n_head']
        n_stream = first['n_stream']
        aligned = first['aligned']
        rans_planes = [p for p, m in enumerate(modes) if m == MODE_RANS]
        const_planes = [p for p, m in enumerate(modes) if m == MODE_CONST]
        raw_planes = [p for p, m in enumerate(modes) if m == MODE_RAW]
        n_seg = -(-n_stream // seg) if rans_planes else 0
        G = len(first['groups'])
        S = -(-min(seg, n_stream) // LANES) if rans_planes else 0
        # Effective transform: adaptive chunks' payload descriptor
        # (batch-uniform, enforced by supported()) overrides the
        # sidecar-derived reader attributes.
        tr = first.get('transform')
        if tr is not None:
            do_time_diff = tr[0] > 0
            diff_order = tr[0] if tr[0] else 1
            do_spatial_diff = bool(tr[1])
        else:
            do_time_diff = self.do_time_diff
            diff_order = self.diff_order
            do_spatial_diff = self.do_spatial_diff

        jax_mod = _jax()[0]
        from ..ops.pallas_rans import force_interpret
        use_pallas = bool(rans_planes) and (
            jax_mod.default_backend() == 'tpu' or force_interpret())

        from ..ops.pallas_rans import pack_device_tables, WINDOW_ROWS

        # Ragged-tail split decision (fuse8 path only; see
        # _build_decode_fn). When the last group of each chunk is ONE
        # short segment (C % k channels), packing it into the stacked
        # cells makes every cell scan the full step count; splitting it
        # out decodes it as B 1-row cells at its own (much shorter)
        # step count instead.
        Tc = T - 1 if has_head else T
        tp = -(-Tc // LANES) * LANES if aligned else 0
        fuse8_pre, k8, _spb8 = _fuse8_geom(
            modes, self.dtype, first['zigzag'], self.order,
            do_time_diff, do_spatial_diff, seg, tp, T, S,
            use_pallas, aligned, has_head)
        tail = None
        if (fuse8_pre and G >= 2
                and os.environ.get('MTSCOMP_DEC_TAILSPLIT', '1') != '0'):
            tail_segs = first['groups'][-1]['segments']
            rem = C - (n_seg - 1) * k8 if k8 else 0
            # The last group must hold exactly the ragged channels'
            # symbols, contiguously (one segment pre-bit6, M sub-rows
            # with flags bit6 — either way the rows concatenate to the
            # tail channels' stream).
            base = (n_seg - 1) * seg
            n_tail = sum(n for _, _, n in tail_segs)
            contiguous, nxt = True, base
            for _, s, n in tail_segs:
                contiguous = contiguous and s == nxt
                nxt = s + n
            S_t = max((-(-n // LANES) for _, _, n in tail_segs),
                      default=0)
            if (0 < rem < k8 and contiguous and n_tail == rem * tp
                    and S_t and 2 * S_t <= S and rem <= 32
                    and (G - 1) * GROUP_ROWS * k8 + 128 <= 1024):
                tail = (rem, -(-rem // 8) * 8,
                        tuple(n for _, _, n in tail_segs))

        w_max = 1
        for parsed in parsed_list:
            for g in parsed['groups']:
                w_max = max(w_max, g['words'].size)
        # Word buffers: rows of 128, bucketed to 512-row multiples (bounds
        # recompiles without doubling VMEM), plus window slack.
        wr = -(-w_max // LANES) + WINDOW_ROWS
        WR = -(-wr // 512) * 512
        W = WR * LANES
        if use_pallas and WR > 16384:
            # Word stream too large for the VMEM-resident kernel window
            # (u16 blocks: 16384 rows = 4 MB, double-buffered; only
            # near-incompressible planes get here); use the XLA scan.
            use_pallas = False
        if not use_pallas:
            tail = None             # ragged-tail packing is Pallas-only

        # Group index layout: chunk-major by default; with the ragged
        # tail, [full groups chunk-major | tail groups] PER MESH SHARD
        # (each shard's slab must stay self-contained for the leading-
        # axis sharding — the inner decode fn sees exactly this layout
        # at its local batch size).
        n_shard = 1
        if mesh is not None and G > 0:
            n_shard = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
            if B % n_shard != 0:
                n_shard = 1     # the mesh assert below fires anyway
        Bl = B // n_shard if n_shard else B

        def group_slot(b, gi):
            if tail is None:
                return b * G + gi
            s, bl = divmod(b, Bl)
            base = s * (Bl * G)
            if gi == G - 1:
                return base + Bl * (G - 1) + bl
            return base + bl * (G - 1) + gi

        NG = max(B * G, 1)
        states = np.full((NG, GROUP_ROWS, LANES), RANS_L, dtype=np.uint32)
        words = np.zeros((NG, WR, LANES), dtype=np.uint16)
        freqs = np.zeros((NG, GROUP_ROWS, 256), dtype=np.int32)
        counts = np.zeros((NG, GROUP_ROWS), dtype=np.int32)
        counts_b = np.zeros((NG, GROUP_ROWS, LANES), dtype=np.int32)
        coarse_pk = np.zeros((NG, GROUP_ROWS, 2, LANES), dtype=np.int32)
        dense_pk = np.zeros((NG, GROUP_ROWS, 2, LANES), dtype=np.int32)
        const_vals = np.zeros((B, max(len(const_planes), 1)), dtype=np.uint8)
        raw_vals = np.zeros((B, max(len(raw_planes), 1),
                             n_coded if raw_planes else 1), dtype=np.uint8)
        heads = np.zeros((B, C), dtype=self.dtype)
        octet_rows = np.zeros((NG, GROUP_ROWS, LANES), dtype=np.int32)
        table_cache = {}
        alpha_max = 0
        needs_fixup2 = False
        octet_ok = True

        def packed_table(parsed, p, start):
            # Key on the table CONTENT: identical tables across
            # chunks (the common case) pack once per batch.
            nonlocal alpha_max, needs_fixup2, octet_ok
            table = ans_seg_freqs(parsed, p, start)
            key = table.tobytes()
            if key not in table_cache:
                table_cache[key] = (pack_device_tables(table),
                                    int(np.count_nonzero(table)))
            (cpk, dpk, n2, orow), a = table_cache[key]
            alpha_max = max(alpha_max, a)
            needs_fixup2 = needs_fixup2 or n2
            if orow is None:
                octet_ok = False
                orow = 0
            return table, cpk, dpk, orow

        for b, parsed in enumerate(parsed_list):
            if has_head:
                heads[b] = parsed['head'].view(self.dtype)
            for gi, g in enumerate(parsed['groups']):
                i = group_slot(b, gi)
                R = len(g['segments'])
                states[i, :R] = g['states']
                words[i].reshape(-1)[:g['words'].size] = g['words']
                for r, (p, start, n) in enumerate(g['segments']):
                    table, coarse_pk[i, r], dense_pk[i, r], \
                        octet_rows[i, r] = packed_table(parsed, p, start)
                    freqs[i, r] = table
                    counts[i, r] = n
                    counts_b[i, r] = n
            for j, p in enumerate(const_planes):
                const_vals[b, j] = parsed['planes'][p]['value']
            for j, p in enumerate(raw_planes):
                raw_vals[b, j] = parsed['planes'][p]['raw']

        small_alpha = alpha_max <= 128
        one_fixup = not needs_fixup2
        # Octet variant: every table 8-aligned (always true for files
        # this writer produced) -> the kernel's slot lookup drops to one
        # shuffle + a variable shift. The octet rows ride coarse_pk's
        # first row (same block shape, stale coarse row 1 never read).
        # MTSCOMP_DEC_LOOKUP=coarse keeps the fixup form for A/B.
        octet = (use_pallas and octet_ok and bool(rans_planes)
                 and os.environ.get('MTSCOMP_DEC_LOOKUP', '') != 'coarse')
        if octet:
            coarse_pk[:, :, 0, :] = octet_rows
        raw_args = (states, words, freqs, counts, coarse_pk, dense_pk,
                    counts_b, const_vals, raw_vals, heads)
        # Introspection for tests/benchmarks: the ragged-tail decision.
        self.last_tail = tail
        if mesh is not None and G == 0:
            # No rANS groups (all planes CONST/RAW): the group arrays
            # have a placeholder leading dim of 1 that cannot shard;
            # plain jit decodes such batches trivially anyway.
            mesh = None
        if mesh is None:
            fn = _build_decode_fn(
                B, T, C, str(self.dtype), modes, n_seg, seg, G, S, W,
                self.order, do_time_diff, do_spatial_diff,
                first['zigzag'], has_head, use_pallas, small_alpha,
                aligned, one_fixup, diff_order, octet, tail,
                first.get('tail_split', 1))
            return fn, tuple(jnp.asarray(a) for a in raw_args)

        # Shard the chunk batch over the mesh: every array's leading dim
        # is chunk-major (B or B*G), so a leading-axis shard keeps whole
        # chunks per device.
        try:
            from jax import shard_map
        except ImportError:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec, NamedSharding
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        assert B % n_dev == 0, "chunk batch must divide the mesh"
        axis = mesh.axis_names[0]
        inner = _build_decode_fn(
            B // n_dev, T, C, str(self.dtype), modes, n_seg, seg, G, S, W,
            self.order, do_time_diff, do_spatial_diff,
            first['zigzag'], has_head, use_pallas, small_alpha, aligned,
            one_fixup, diff_order, octet, tail,
            first.get('tail_split', 1))
        spec = PartitionSpec(axis)
        # check_vma stays on for compiled (TPU) runs; interpret-mode
        # pallas_call cannot declare its outputs' varying-manifest, so
        # the CPU-mesh tests would trip the check spuriously.
        fn = jax.jit(shard_map(
            lambda *a: inner(*a), mesh=mesh,
            in_specs=(spec,) * len(raw_args), out_specs=(spec, spec),
            check_vma=not force_interpret()))
        sharding = NamedSharding(mesh, spec)
        return fn, tuple(jax.device_put(a, sharding) for a in raw_args)


@functools.lru_cache(maxsize=16)
def _build_transform_fn(B, T, C, dtype_str, order, do_time_diff,
                        do_spatial_diff, split_head, diff_order=1):
    """Device transform stage: diff -> zigzag -> byte planes + histograms."""
    jax, jnp = _jax()
    from ..ops.device_delta import (diff_time_jnp, diff_space_jnp,
                                    zigzag_encode_jnp)
    from ..ops.device_hist import histogram256
    dtype = np.dtype(dtype_str)
    P = dtype.itemsize

    @jax.jit
    def transform(chunks):
        d = chunks
        if do_time_diff:
            for _ in range(diff_order):
                d = diff_time_jnp(d)
        if do_spatial_diff:
            d = diff_space_jnp(d)
        coded = d[:, 1:, :] if split_head else d
        z = zigzag_encode_jnp(coded)
        if order == 'F':
            flat = jnp.transpose(z, (0, 2, 1)).reshape(B, -1)
        else:
            flat = z.reshape(B, -1)
        planes = jnp.stack(
            [(flat >> (8 * p)).astype(jnp.uint8) for p in range(P)], axis=1)
        n = planes.shape[-1]
        hists = histogram256(planes.reshape(B * P, n)).reshape(B, P, 256)
        head = d[:, 0, :] if split_head else None
        return planes, hists, head

    return transform


# Mixed-mode encode batches split into mode-uniform sub-batches; rows
# smaller than this take the host codec (byte-identical) instead of
# compiling tiny device signatures.
MIN_DEVICE_SUBBATCH = 4


class DeviceBatchEncoder:
    """Encode batches of equal-size integer chunks on the device.

    Produces containers byte-identical to the host AnsCodec (the device
    coder is bit-exact against the normative spec). Mirrors the decode
    pipeline: one transform+histogram pass, host-side table
    quantization and mode decisions, then the grouped encode scan.
    """

    def __init__(self, writer, transform=None):
        self.writer = writer
        self.codec = writer.codec
        # Bitcast float writers hand the encoder integer views; code in
        # the coding dtype (float16 -> int16 runs the full device path).
        self.dtype = np.dtype(getattr(writer, 'code_dtype', writer.dtype))
        self.order = writer.chunk_order
        self.do_time_diff = bool(writer.do_time_diff)
        self.do_spatial_diff = bool(writer.do_spatial_diff)
        self.diff_order = int(getattr(writer, 'time_diff_order', 1))
        # Adaptive windows: ``transform=(order, spatial)`` overrides the
        # writer's global transform for this (window-uniform) batch, and
        # every produced container gets the bit5 descriptor stamp —
        # byte-identical to what Writer._compress_chunk's host path
        # writes for the same chunks.
        self.stamp = None
        if transform is not None:
            t_order, t_spatial = transform
            self.do_spatial_diff = bool(t_spatial)
            self.diff_order = t_order if t_order else 1
            self.do_time_diff = self.do_time_diff and t_order > 0
            self.stamp = (t_order if writer.do_time_diff else 0,
                          bool(t_spatial))

    def supported(self, n_samples):
        return (self.dtype.kind in 'iu' and self.dtype.itemsize <= 2
                and self.dtype.byteorder in '<=|'
                and n_samples > 1
                and self.writer.n_channels < 65536)

    def _encode_pallas(self, symbols, freq_arr, row_bits, counts_arr, S):
        """Run the Pallas encode kernel; None on capacity overflow.

        The kernel writes each group's merged stream right-to-left into
        a fixed VMEM region provisioned from ``row_bits`` — the Shannon
        estimate of each row's stream under its own frequency table
        (x1.25 + slack). If any group's stream exceeds the region
        (pathological rows), the caller falls back to the XLA scan —
        deterministic either way.
        """
        jax, jnp = _jax()
        from ..models import rans
        from ..ops.pallas_rans_enc import (encode_groups_pallas,
                                           pack_enc_device_tables)
        NG, R = counts_arr.shape
        est = row_bits.sum(axis=1) / 16.0          # 16-bit stream words
        pk_arr = np.zeros((NG, R, 2, rans.LANES), np.int32)
        rcp_arr = np.zeros_like(pk_arr)
        from ..ops.pallas_rans_enc import resolve_div_mode
        div = resolve_div_mode()    # table packing must match the kernel
        enc_cache = {}
        for i in range(NG):
            for r in range(R):
                key = freq_arr[i, r].tobytes()
                if key not in enc_cache:
                    enc_cache[key] = pack_enc_device_tables(
                        freq_arr[i, r], div=div)
                pk_arr[i, r], rcp_arr[i, r] = enc_cache[key]
        cap_words = int(est.max(initial=0.0) * 1.25) + 4096
        cap_rows = -(-cap_words // (128 * 512)) * 512
        if cap_rows > 24576:   # > 6 MB u16: near-incompressible planes
            return None
        counts_b = np.ascontiguousarray(np.broadcast_to(
            counts_arr[:, :, None], (NG, R, rans.LANES)))
        pk_d = jnp.asarray(pk_arr)
        rcp_d = jnp.asarray(rcp_arr)
        cb_d = jnp.asarray(counts_b)
        # Every occurring symbol < 128 (zigzag low planes of smooth data
        # usually qualify): the kernel's table lookups halve.
        small_alpha = not freq_arr[:, :, 128:].any()

        def run_kernel():
            return encode_groups_pallas(symbols, pk_d, rcp_d, cb_d,
                                        n_steps=S, cap_rows=cap_rows,
                                        small_alpha=small_alpha, div=div)

        with phase('encode.kernel'):
            states_d, words_d, nw_d = run_kernel()
            n_words = np.asarray(nw_d)[:, 0, 0]
        capw = cap_rows * rans.LANES
        if n_words.max(initial=0) > capw:  # pragma: no cover - rare
            logger.debug("Pallas encode overflowed %d-word region; "
                         "falling back to the XLA scan.", capw)
            return None
        # Staged closure (device-resident inputs) kept for benchmarks —
        # the encode analogue of DeviceBatchDecoder.pack. Set only for
        # validated (non-overflowed) runs.
        self.last_kernel_run = run_kernel
        with phase('encode.align'):
            # Left-align the right-anchored streams on device, then one
            # bucketed download (avoids per-size transfer compiles).
            wflat = words_d.reshape(NG, -1)[:, :capw]
            shifts = jnp.asarray((capw - n_words).astype(np.int32))
            aligned_w = jax.vmap(jnp.roll)(wflat, -shifts)
            wmax = min(capw, -(-int(n_words.max(initial=1)) // 65536)
                       * 65536)
            streams = np.asarray(aligned_w[:, :wmax])
        states = np.asarray(states_d).view(np.uint32)
        return states, streams, n_words

    def _encode_scan_mesh(self, symbols, freq_arr, counts_arr, S, mesh):
        """Shard the encode scan's group axis over a device mesh.

        Groups are independent (the codec's chunk-parallel axis under
        shard_map, like DeviceBatchDecoder.pack(mesh=...)); the
        compaction runs as plain jit ops over the sharded outputs.
        Returns ``(states, streams, n_words)`` host arrays.
        """
        jax, jnp = _jax()
        from ..models import rans
        from ..ops.device_rans import encode_groups, compact_words
        try:
            from jax import shard_map
        except ImportError:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec, NamedSharding
        N = int(symbols.shape[0])
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        pad = (-N) % n_dev
        if pad:
            # Inactive filler groups (zero counts, placeholder tables).
            symbols = jnp.pad(symbols, ((0, pad), (0, 0), (0, 0)))
            freq_arr = np.pad(freq_arr, ((0, pad), (0, 0), (0, 0)))
            counts_arr = np.pad(counts_arr, ((0, pad), (0, 0)))
        enc_pk, enc_rcp = rans.encoder_tables(freq_arr)
        axis = mesh.axis_names[0]
        spec = PartitionSpec(axis)
        spec1 = PartitionSpec(None, axis)
        fn = jax.jit(shard_map(
            lambda s, pk, rc, c: encode_groups(s, pk, rc, c, n_steps=S),
            mesh=mesh, in_specs=(spec,) * 4,
            out_specs=(spec, spec1, spec1)))
        sh = NamedSharding(mesh, spec)
        states_d, words_dense, emit = fn(
            jax.device_put(symbols, sh),
            jax.device_put(jnp.asarray(enc_pk), sh),
            jax.device_put(jnp.asarray(enc_rcp), sh),
            jax.device_put(jnp.asarray(counts_arr), sh))
        n_words_d = jnp.sum(emit, axis=(0, 2), dtype=jnp.int32)
        w_bound = max(int(np.asarray(jnp.max(n_words_d))), 1)
        streams_d, nw_d = compact_words(words_dense, emit, w_bound)
        sl = slice(None, N)
        return (np.asarray(states_d)[sl], np.asarray(streams_d)[sl],
                np.asarray(nw_d)[sl])

    def encode_batch(self, chunks, mesh=None):
        """chunks: (B, T, C) ndarray -> list of container payload bytes.

        With ``mesh`` (1-D device mesh), the group axis of the encode
        scan is sharded across devices (chunk-level data parallelism
        over ICI; no cross-group communication).
        """
        import struct
        jax, jnp = _jax()
        from ..codec import ans as ans_mod
        from ..models import rans
        from ..ops.device_rans import encode_groups, compact_words

        B, T, C = chunks.shape
        P = self.dtype.itemsize
        seg = self.codec.seg
        w = self.writer
        transform = _build_transform_fn(
            B, T, C, str(self.dtype), self.order, self.do_time_diff,
            self.do_spatial_diff, True, self.diff_order)
        with phase('encode.transform'):
            planes_d, hists_d, head_d = transform(jnp.asarray(chunks))
        hists = np.asarray(hists_d)
        heads = np.asarray(head_d)
        n_coded = (T - 1) * C

        # Channel-aligned segments (flags bit2): same eligibility rule
        # and geometry as the host codec (AnsCodec.encode).
        aligned = (getattr(self.codec, 'channel_aligned', False)
                   and self.order == 'F' and n_coded > 0)
        if aligned:
            k, seg, tp, tcs, n_stream = ans_mod.aligned_geometry(
                n_coded, C, seg)
        else:
            k = tp = tcs = 0
            n_stream = n_coded
        n_pad = n_stream - n_coded
        seg_mode = getattr(self.codec, 'table_mode', 'plane') == 'segment'
        if seg_mode and not aligned:
            return None    # host codec handles non-aligned clustering

        # Per-channel histograms for segment-table clustering: the
        # F-order plane stream is channel-major, so per-segment
        # histograms are sums of per-channel ones (plus the per-channel
        # zero pads) — bit-identical to the host codec's bincounts.
        ch_hists = None
        if seg_mode and n_stream > seg:
            from ..ops.device_hist import histogram256
            with phase('encode.seghist'):
                ch = histogram256(planes_d.reshape(B * P * C, tcs))
                ch_hists = np.asarray(ch).reshape(B, P, C, 256)
        n_segs = -(-n_stream // seg) if aligned else 0

        def _seg_hists(b, p):
            out = np.empty((n_segs, 256), dtype=np.int64)
            for s in range(n_segs):
                a, z = s * k, min((s + 1) * k, C)
                out[s] = ch_hists[b, p, a:z].sum(axis=0)
                out[s, 0] += (z - a) * (tp - tcs)
            return out

        # Host: tables + per-plane modes (must be uniform across the
        # batch for one device call; callers fall back otherwise).
        # The decision logic is ans_mod.decide_plane — the SAME code
        # the host codec runs, so containers stay byte-identical.
        modes = np.empty((B, P), dtype=np.int64)
        plane_tables = {}
        for b in range(B):
            for p in range(P):
                seg_fn = ((lambda b=b, p=p: _seg_hists(b, p))
                          if ch_hists is not None else None)
                mode, ptables, tidx = ans_mod.decide_plane(
                    hists[b, p], n_pad, n_stream, n_coded, seg,
                    'segment' if seg_mode else 'plane', seg_fn)
                modes[b, p] = mode
                if mode == ans_mod.MODE_RANS:
                    plane_tables[(b, p)] = (ptables, tidx)
        if not (modes == modes[0]).all():
            # Plane modes are data-dependent per chunk (RAW/RANS/CONST
            # decisions near the ratio boundary — common for float
            # mantissa planes). Split into mode-uniform sub-batches and
            # encode each on device rather than abandoning the batch;
            # decide_plane is deterministic, so each sub-batch passes
            # the uniformity check on re-entry. Sub-batches below
            # MIN_DEVICE_SUBBATCH chunks go to the host codec instead
            # (byte-identical by the cross-implementation invariant):
            # a pathological batch with B distinct mode rows would
            # otherwise compile B one-chunk device signatures, thrashing
            # the lru_cached builders.
            payloads = [None] * B
            for row in sorted({tuple(m) for m in modes.tolist()}):
                ids = [b for b in range(B) if tuple(modes[b]) == row]
                if len(ids) < MIN_DEVICE_SUBBATCH:
                    enc_one = getattr(self.codec, 'encode', None)
                    for b in ids:
                        payloads[b] = enc_one(
                            self.writer._transform_chunk(
                                chunks[b], self.diff_order,
                                self.do_spatial_diff),
                            order=self.order, transform=self.stamp)
                    continue
                sub = self.encode_batch(np.ascontiguousarray(chunks[ids]),
                                        mesh=mesh)
                if sub is None:  # pragma: no cover - sub-batch declined
                    return None
                for j, b in enumerate(ids):
                    payloads[b] = sub[j]
            return payloads
        mode_row = [int(m) for m in modes[0]]
        rans_planes = [p for p, m in enumerate(mode_row)
                       if m == ans_mod.MODE_RANS]
        raw_planes = [p for p, m in enumerate(mode_row)
                      if m == ans_mod.MODE_RAW]

        # Ragged-tail segment split (flags bit6): identical decision to
        # the host codec (shared helper) so containers stay
        # byte-identical.
        tsplit = ans_mod.tail_split_for(aligned, mode_row, n_stream, seg)

        group_words, group_states, group_counts = [], [], []
        if rans_planes:
            n_seg = -(-n_stream // seg)
            segments = ans_mod.segment_counts(n_stream, seg, mode_row,
                                              tail_split=tsplit)
            G = -(-len(segments) // rans.GROUP_ROWS)
            R = rans.GROUP_ROWS
            S = -(-min(seg, n_stream) // rans.LANES)
            seg_eff = S * rans.LANES
            # Device: assemble (B*G, R, S*128) symbols from the planes.
            Pr = len(rans_planes)
            n_rows = len(segments)
            pad_rows = G * R - n_rows
            pad_tail = n_seg * seg_eff - n_stream

            @jax.jit
            def gather_symbols(planes):
                sel = planes[:, jnp.asarray(rans_planes), :]
                if aligned:
                    # Pad each channel's stream to tp symbols so the
                    # segment rows are the (C, tp) layout.
                    sel = sel.reshape(B, Pr, C, tcs)
                    sel = jnp.pad(sel, ((0, 0), (0, 0), (0, 0),
                                        (0, tp - tcs)))
                    sel = sel.reshape(B, Pr, n_stream)
                if tsplit > 1:
                    # Non-uniform rows: one seg_eff-padded row per
                    # (start, n) of the flat list (bit6 tails shorter).
                    flat = sel.reshape(B, Pr * n_stream)
                    rows = jnp.stack(
                        [jnp.pad(
                            flat[:, rans_planes.index(p) * n_stream
                                 + start:
                                 rans_planes.index(p) * n_stream
                                 + start + n],
                            ((0, 0), (0, seg_eff - n)))
                         for p, start, n in segments], axis=1)
                else:
                    sel = jnp.pad(sel, ((0, 0), (0, 0), (0, pad_tail)))
                    rows = sel.reshape(B, Pr * n_seg, seg_eff)
                rows = jnp.pad(rows, ((0, 0), (0, pad_rows), (0, 0)))
                return rows.reshape(B * G, R, seg_eff)

            symbols = gather_symbols(planes_d)
            freq_arr = np.zeros((B * G, R, 256), dtype=np.int32)
            counts_arr = np.zeros((B * G, R), dtype=np.int32)
            row_bits = np.zeros((B * G, R), dtype=np.float64)
            fallback = rans.quantize_freqs(
                np.array([1, 1] + [0] * 254, dtype=np.int64))

            bits_cache = {}

            def _shannon(cnt, fq):
                nz = fq > 0
                return float(np.sum(cnt[nz].astype(np.float64)
                                    * (rans.SCALE_BITS - np.log2(fq[nz]))))

            def _row_bits(b, p, start, n):
                """Shannon-estimate stream bits of one row (capacity
                provisioning for the Pallas encode kernel)."""
                ptables, tidx = plane_tables[(b, p)]
                if tidx is None:
                    key = (b, p)
                    if key not in bits_cache:
                        cnt = hists[b, p].astype(np.float64).copy()
                        if aligned:
                            cnt[0] += n_pad
                        bits_cache[key] = (_shannon(cnt, ptables[0])
                                           / max(cnt.sum(), 1.0))
                    return n * bits_cache[key]
                s = start // seg
                key = (b, p, 'seg')
                if key not in bits_cache:
                    bits_cache[key] = _seg_hists(b, p)
                return _shannon(bits_cache[key][s], ptables[tidx[s]])

            for b in range(B):
                for gi in range(G):
                    i = b * G + gi
                    segs = segments[gi * R:(gi + 1) * R]
                    for r in range(R):
                        if r < len(segs):
                            p, start, n = segs[r]
                            ptables, tidx = plane_tables[(b, p)]
                            freq_arr[i, r] = ptables[
                                0 if tidx is None else tidx[start // seg]]
                            counts_arr[i, r] = n
                            row_bits[i, r] = _row_bits(b, p, start, n)
                        else:
                            freq_arr[i, r] = fallback
            from ..ops.pallas_rans import force_interpret
            streams = states = n_words = None
            if mesh is not None:
                states, streams, n_words = self._encode_scan_mesh(
                    symbols, freq_arr, counts_arr, S, mesh)
            elif jax.default_backend() == 'tpu' or force_interpret():
                out = self._encode_pallas(
                    symbols, freq_arr, row_bits, counts_arr, S)
                if out is not None:
                    states, streams, n_words = out
            if streams is None:
                enc_pk, enc_rcp = rans.encoder_tables(freq_arr)
                states_d, words_dense, emit = encode_groups(
                    symbols, jnp.asarray(enc_pk), jnp.asarray(enc_rcp),
                    jnp.asarray(counts_arr), n_steps=S)
                n_words_d = jnp.sum(emit, axis=(0, 2), dtype=jnp.int32)
                w_bound = int(np.asarray(jnp.max(n_words_d)))
                w_bound = max(w_bound, 1)
                streams_d, nw_d = compact_words(words_dense, emit, w_bound)
                states = np.asarray(states_d)
                streams = np.asarray(streams_d)
                n_words = np.asarray(nw_d)
            for b in range(B):
                gw, gs, gc = [], [], []
                for gi in range(G):
                    i = b * G + gi
                    segs = segments[gi * R:(gi + 1) * R]
                    gw.append(streams[i, :n_words[i]])
                    gs.append(states[i, :len(segs)])
                    gc.append(int(n_words[i]))
                group_words.append(gw)
                group_states.append(gs)
                group_counts.append(gc)

        planes_np = None
        if raw_planes:
            planes_np = np.asarray(planes_d)

        # Host: assemble containers (identical layout to AnsCodec.encode).
        payloads = []
        for b in range(B):
            multitable = any(
                plane_tables[(b, p)][1] is not None
                for p in rans_planes)
            flags = (1 | 2 | (4 if aligned else 0)
                     | (ans_mod.FLAG_MULTITABLE if multitable else 0)
                     | ans_mod.FLAG_CRC32)
            tdesc = 0
            if self.stamp is not None:
                flags |= ans_mod.FLAG_TRANSFORM
                tdesc = self.stamp[0] | (4 if self.stamp[1] else 0)
            if tsplit > 1:
                flags |= ans_mod.FLAG_TAILSPLIT
            parts = [ans_mod._HEADER.pack(
                ans_mod.MAGIC, ans_mod.CONTAINER_VERSION, P,
                flags, rans.SCALE_BITS, T * C,
                k if aligned else self.codec.seg_log2,
                rans.MIN_FREQ, rans.GROUP_ROWS, tdesc, C,
                tsplit if tsplit > 1 else 0)]
            parts.append(np.ascontiguousarray(heads[b]).tobytes())
            for p in range(P):
                m = mode_row[p]
                if m == ans_mod.MODE_CONST:
                    # The constant byte: derive from the histogram.
                    v = int(np.argmax(hists[b, p]))
                    parts.append(struct.pack('<BB', m, v))
                elif m == ans_mod.MODE_RAW:
                    parts.append(struct.pack('<B', m)
                                 + planes_np[b, p].tobytes())
                else:
                    ptables, tidx = plane_tables[(b, p)]
                    if multitable:
                        meta = (struct.pack('<BB', m, ptables.shape[0])
                                + ptables.astype('<u2').tobytes())
                        if ptables.shape[0] > 1:
                            meta += tidx.tobytes()
                        parts.append(meta)
                    else:
                        parts.append(struct.pack('<B', m)
                                     + ptables[0].astype('<u2').tobytes())
            if rans_planes:
                parts.append(struct.pack('<I', len(group_words[b])))
                parts.append(np.asarray(group_counts[b], '<u4').tobytes())
                for st, wd in zip(group_states[b], group_words[b]):
                    parts.append(st.astype('<u4').tobytes())
                    parts.append(wd.astype('<u2').tobytes())
            payloads.append(ans_mod._append_crc(parts))
        return payloads


class DeviceChunkCache:
    """Random-access acceleration: decoded chunks cached on the device.

    ``read_window`` decodes the covering chunk(s) on the device (one
    chunk per call signature, so compiles are reused), keeps the decoded
    arrays device-resident in a small LRU, slices on device and only
    downloads the requested window — the analogue of the reference's
    host-side LRU chunk cache (mtscomp.py:582-588) with the decode and
    the slicing moved on-chip.
    """

    def __init__(self, reader, capacity=None):
        self.reader = reader
        self.capacity = capacity or reader.cache_size
        self._cache = {}          # chunk_idx -> device array (ns, C)
        self._order = []

    def _chunk(self, idx):
        if idx in self._cache:
            self._order.remove(idx)
            self._order.append(idx)
            return self._cache[idx]
        r = self.reader
        ns = r.chunk_bounds[idx + 1] - r.chunk_bounds[idx]
        parsed = [r.codec.parse(_read_payload(r, idx))]
        dec = DeviceBatchDecoder(r)
        if not dec.supported(parsed, ns):
            # e.g. 8-byte dtypes; Reader._device_window catches this
            # and serves the window through the (exact) host path.
            raise NotImplementedError("unsupported chunk for device cache")
        fn, args = dec.pack(parsed, ns)
        chunks, used = fn(*args)
        check_words_used(parsed, used)
        out = chunks[0]           # (ns, C), stays on device
        self._cache[idx] = out
        self._order.append(idx)
        while len(self._order) > self.capacity:
            evict = self._order.pop(0)
            del self._cache[evict]
        return out

    def read_window(self, i0, i1):
        """Decoded samples [i0, i1) as a host ndarray."""
        import jax.numpy as jnp
        r = self.reader
        first, last = r._chunks_for_interval(i0, max(i0, i1 - 1))
        parts = []
        for idx in range(first, last + 1):
            c0, c1 = r.chunk_bounds[idx], r.chunk_bounds[idx + 1]
            a = max(i0, c0) - c0
            b = min(i1, c1) - c0
            parts.append(self._chunk(idx)[a:b])
        dev = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        # np.array (not asarray): the download must be a fresh writable
        # host array, never a read-only view of cached device memory
        # (reference windows are writable, mtscomp.py:815-831).
        return _as_user_dtype(np.array(dev), r)


def decompress_to_array(reader, first_chunk=0, last_chunk=None, out=None,
                        writable=True):
    """Bulk-decode chunks [first, last] to one array via the device path.

    Decodes straight into one span-wide destination (``out`` if given,
    else allocated here) — a batch's device output is chunk-major, so a
    whole group lands with ONE reshape/copy and the old per-chunk view
    list + full-span ``np.concatenate`` copy is gone. With
    ``writable=False`` (bulk consumers that only read the result, e.g.
    ``tofile``) a single-uniform-batch span returns the fetched device
    buffer itself (read-only, zero extra copies). Mirrors the host bulk
    path's ``outs=`` span-destination contract
    (``Reader._read_span_bulk``).

    Falls back to the host codec for chunk groups the device path cannot
    batch (mixed plane modes, 8-byte dtypes, foreign geometry).
    """
    last_chunk = reader.n_chunks - 1 if last_chunk is None else last_chunk
    bounds = reader.chunk_bounds
    C = reader.n_channels
    total = bounds[last_chunk + 1] - bounds[first_chunk]
    if out is not None:
        assert out.shape == (total, C) and out.dtype == reader.dtype
    def _peek_desc(idx):
        # Batches must be uniform in the per-chunk transform (flags
        # bit5) and the tail-split derivation (bit6 — data-dependent
        # plane modes can flip it between chunks), so runs split at
        # those boundaries — each uniform run still rides the device
        # path instead of the whole span falling back to host.
        # 20-byte header pread only.
        if reader.algorithm != 'ans':
            return None
        from ..codec.ans import peek_desc
        from ..io_host import pread_exact
        start = reader.chunk_offsets[idx]
        length = min(20, reader.chunk_offsets[idx + 1] - start)
        return peek_desc(pread_exact(reader.cdata, length, start))

    groups = []
    for idx in range(first_chunk, last_chunk + 1):
        ns = bounds[idx + 1] - bounds[idx]
        key = (ns, _peek_desc(idx))
        if groups and groups[-1][1] == key:
            groups[-1][0].append(idx)
        else:
            groups.append(([idx], key))
    pos = 0
    for chunk_ids, (ns, _desc) in groups:
        n_span = len(chunk_ids) * ns
        device_ok = False
        if reader.algorithm == 'ans':
            # Only the v2 container has a parse()/device decoder; zlib
            # readers (e.g. legacy probes handed to decompress_multi)
            # go straight to the host branch below.
            payloads = [_read_payload(reader, i) for i in chunk_ids]
            parsed = [reader.codec.parse(p) for p in payloads]
            dec = DeviceBatchDecoder(reader)
            device_ok = dec.supported(parsed, ns)
        if device_ok:
            block = dec.decode_batch(parsed, ns)       # (B, ns, C)
            if out is None and len(groups) == 1 and not writable:
                # The fetched batch is chunk-major: the span IS its
                # flat view — no destination copy at all.
                return _as_user_dtype(block.reshape(total, C), reader)
            if out is None:
                out = np.empty((total, C), reader.dtype)
            np.copyto(out[pos:pos + n_span],
                      _as_user_dtype(block.reshape(n_span, C), reader))
        else:
            logger.debug("Device decode unsupported for chunks %s; "
                         "using host path.", chunk_ids)
            if out is None:
                out = np.empty((total, C), reader.dtype)
            for j, i in enumerate(chunk_ids):
                np.copyto(out[pos + j * ns:pos + (j + 1) * ns],
                          reader._decompress_chunk(i)[1])
        pos += n_span
    return out


def _read_payload(reader, idx):
    from ..io_host import pread_exact
    start = reader.chunk_offsets[idx]
    length = reader.chunk_offsets[idx + 1] - start
    return pread_exact(reader.cdata, length, start)


def _as_user_dtype(arr, reader):
    """Reinterpret device-decoded buffers (coding dtype) as the user
    dtype — a zero-copy view; only differs for bitcast float files."""
    if getattr(reader, 'float_bitcast', False):
        return arr.view(reader.dtype)
    return arr


def decompress_multi(readers, mesh=None, first_chunk=0, last_chunk=None):
    """Decode the same chunk range of several recordings (multi-probe).

    The probes' chunk batches are concatenated and decoded in one device
    call — optionally sharded across a mesh (BASELINE config 4: N probes
    chunk-parallel across chips). All probes must share geometry
    (channels, chunk sizes, dtype, plane modes). Returns a list of
    ``(n_samples, n_channels)`` arrays, one per reader.

    Falls back to per-reader :func:`decompress_to_array` when the
    batches cannot be merged.
    """
    assert readers
    last = readers[0].n_chunks - 1 if last_chunk is None else last_chunk
    n_chunks = last - first_chunk + 1
    if not 0 <= first_chunk <= last:
        raise ValueError(
            "decompress_multi: invalid chunk range [%d, %d]"
            % (first_chunk, last))
    for k, r in enumerate(readers):
        # One COMMON chunk range per call is the contract (the batch is
        # reshaped (n_readers, n_chunks*ns)); a shorter probe would
        # previously surface as a raw IndexError from the fallback.
        if r.n_chunks <= last:
            raise ValueError(
                "decompress_multi decodes one common chunk range, but "
                "reader %d has %d chunks and chunks [%d, %d] were "
                "requested — pass last_chunk to restrict the range."
                % (k, r.n_chunks, first_chunk, last))
    parsed_all, ns = [], None
    r0 = readers[0]
    # Probes must agree on everything the decoder derives from
    # readers[0] — the FULL decode identity (incl. the v2 sidecar
    # extensions time_diff_order/float_bitcast, which supported() can
    # never see: they are sidecar-only, not in the chunk payloads).
    # A mismatch would decode the other probes with the wrong
    # metadata. Fallback, never corrupt.
    from ..format import decode_identity
    ident0 = decode_identity(r0.cmeta)
    mergeable = all(
        r.algorithm == 'ans'
        and decode_identity(r.cmeta) == ident0
        for r in readers)
    if mergeable:
        for r in readers:
            bounds = r.chunk_bounds
            sizes = {bounds[i + 1] - bounds[i]
                     for i in range(first_chunk, last + 1)}
            if len(sizes) != 1 or (ns is not None and sizes != {ns}):
                mergeable = False
                break
            ns = sizes.pop()
            parsed_all.extend(r.codec.parse(_read_payload(r, i))
                              for i in range(first_chunk, last + 1))
    if mergeable:
        dec = DeviceBatchDecoder(readers[0])
        if dec.supported(parsed_all, ns):
            out = _as_user_dtype(dec.decode_batch(parsed_all, ns, mesh=mesh),
                                 r0)
            per = out.reshape(len(readers), n_chunks * ns, -1)
            return [per[i] for i in range(len(readers))]
    return [decompress_to_array(r, first_chunk, last)
            for r in readers]
