"""Pallas TPU kernel: grouped rANS ENCODE at vector-unit speed.

The mirror of ``ops/pallas_rans.py``: one grid cell encodes one group
(GROUP_ROWS x 128 lanes) by running the normative backward scan
(models/rans.py rans_encode_group) with every data-dependent operation
mapped onto TPU-friendly primitives:

- **symbol -> (cum, cmpl, rcp_shift, rcp)**: per-row 256-entry packed
  tables as two (R, 128) rows; a lookup is two lane shuffles + select
  (same scheme as the decode kernel's tables).
- **division**: the rANS update needs ``x // f`` with a per-lane
  divisor. Default ('float'): f32 divide of the halved state plus one
  exact two-sided fixup — no reciprocal table, one table gather per
  step total (the rANS invariant bounds q < 2^20, well inside f32's
  exact range; see the kernel comment for the error budget). A/B
  alternatives (``MTSCOMP_ENC_DIV``): 'frcp' (gathered pre-rounded
  f32 reciprocal) and 'mulhi' (Granlund-Montgomery round-up
  reciprocal via a 16-bit-limb ``mulhi32``, models/rans.py
  ``encoder_tables``) — measured medians 14.20 / 13.86 / 13.79 GB/s
  on this attachment; all three bit-identical (tested).
- **stream compaction (the hard part)**: the encoder walks steps
  backward while the decoder reads the merged word stream forward, so
  word positions are only known from the stream's END. The kernel
  therefore writes the stream RIGHT-TO-LEFT into a VMEM-resident
  buffer: step ``s``'s words occupy ``[CAPW - epos_after, CAPW -
  epos_before)`` (``epos`` = words emitted so far in the backward
  pass), which lands every word at its final decoder-order position.
  Within a step: lane ranks come from the same MXU prefix + sublane
  ladder as the decode kernel; each row's emitted words are compacted
  left via a branchless 7-step binary search over the inclusive rank
  (per-lane shuffles), rotated to the row-start offset, and scattered
  to the right stream rows with one-hot MXU matmuls (reverse of the
  decode kernel's two-phase window fetch). A select against the
  ``[wstart, wstart + k_s)`` range merges the step's words into the
  buffer without a zero-init pass.

The emitted stream is bit-identical to the normative encoder (tested);
the capacity ``cap_rows`` must be provisioned by the caller from an
entropy estimate — on overflow the kernel clamps (output garbage) and
the returned word count exceeds the stream region, which callers must
detect and fall back on (deterministic, and the codec's automatic
verify double-covers it).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.rans import SCALE, LANES, GROUP_ROWS, RANS_L
from .pallas_rans import force_interpret, window_rows


def _srl(x, n):
    return jax.lax.shift_right_logical(x, n)


_SIGN = np.int32(np.uint32(0x80000000))


def _ge_u(a, b):
    """Unsigned >= on int32 bit patterns (sign-bias flip)."""
    return (a ^ _SIGN) >= (b ^ _SIGN)


def _lt_u(a, b):
    return (a ^ _SIGN) < (b ^ _SIGN)


def _mulhi32_i32(a, b):
    """High 32 bits of the u32 product, on int32 bit patterns."""
    mask = jnp.int32(0xFFFF)
    al, ah = a & mask, _srl(a, 16)
    bl, bh = b & mask, _srl(b, 16)
    p0 = al * bl
    mid = al * bh + _srl(p0, 16)            # no overflow: < 2^32
    mid2 = mid + ah * bl                    # may wrap; detect carry
    carry = _lt_u(mid2, mid).astype(jnp.int32)
    return ah * bh + _srl(mid2, 16) + (carry << 16)


def _enc_kernel(counts_ref, pk_ref, rcp_ref, syms_ref, words_ref,
                states_ref, nw_ref, x_scr, epos_scr, *, steps_per_block,
                cb_total, cap_rows, fuse_steps, small_alpha=False,
                butterfly=True, compact16=False, div='float',
                fixup='signed', mask_split=True, ablate=None):
    # ``ablate`` (compile-time, tools/enc_ablate.py only): truncate the
    # emit machinery after a named stage — 'state', 'rank', 'search',
    # 'noscat' — keeping earlier stages live via cheap XOR folds, to
    # attribute kernel time per stage. None (production) compiles the
    # exact original program.
    cb = pl.program_id(1)
    R = x_scr.shape[0]
    G = fuse_steps
    WROWS = window_rows(G * R)      # one window covers a G-step run
    CAPW = cap_rows * LANES

    @pl.when(cb == 0)
    def _():
        x_scr[...] = jnp.full((R, LANES), RANS_L, jnp.int32)
        epos_scr[0] = 0

    x0 = x_scr[...]
    epos0 = epos_scr[0]
    counts = counts_ref[0]
    blk = cb_total - 1 - cb                 # symbol block (backward)

    R2 = G * R
    lane_col = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    lane_col2 = jax.lax.broadcasted_iota(jnp.int32, (R2, LANES), 1)
    # Lower-triangular ones: inclusive lane prefix via dot(m, tril^T)
    # == dot(m, triu) with triu[k, j] = k <= j.
    triu = (jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
            ).astype(jnp.float32)
    row_id2 = jax.lax.broadcasted_iota(jnp.int32, (R2, LANES), 0)
    wrow_iota = jax.lax.broadcasted_iota(jnp.int32, (R2, WROWS), 1)
    win_row = jax.lax.broadcasted_iota(jnp.int32, (WROWS, LANES), 0)
    win_col = jax.lax.broadcasted_iota(jnp.int32, (WROWS, LANES), 1)

    def compact_row_words(emit2, word2, inc, row_tot):
        """Left-compact each row's emitted words to lanes [0, rank-1).

        Three formulations, bit-identical:

        - 'butterfly' (default): every emitted word moves LEFT by
          ``dist = lane - (rank - 1)``; distances are applied LSB->MSB
          as masked static lane-rotates. For monotone distinct
          destinations this is collision-free (after rounds 0..b-1 all
          remaining distances are multiples of 2^b; two elements
          colliding at round b would need equal remaining distances,
          i.e. be the same element). ~10 cheap vreg ops per round,
          ZERO gathers.
        - 'butterfly16' (compact16): the same rounds in 16-bit packed
          vregs — every operand fits 16 bits (words are u16, distances
          and lanes < 128), and 16-bit tiles pack (16, 128) per vreg,
          halving the vector issues of the dominant rounds for two
          pack/unpack conversions at the edges.
        - 'search': branchless 7-step binary search over the sorted
          inclusive rank + one gather per probe (8 gathers total) —
          the round-2 form, kept for A/B on other attachments
          (gathers cost per-element on the measured ones).
        """
        if butterfly:
            dist = jnp.where(emit2, lane_col2 - inc + 1, 0)
            cw = jnp.where(emit2, word2, 0)
            if compact16:
                # Values are bit patterns in [0, 2^16): u16 keeps the
                # word bits intact (i16 would sign-extend on widening);
                # dist/lane fit comfortably.
                dist = dist.astype(jnp.uint16)
                cw = cw.astype(jnp.uint16)
                lane16 = lane_col2.astype(jnp.uint16)
                z16 = jnp.uint16(0)
                for b in range(7):
                    k = 1 << b
                    mv_w = pltpu.roll(cw, shift=LANES - k, axis=1)
                    mv_d = pltpu.roll(dist, shift=LANES - k, axis=1)
                    arriving = ((mv_d & jnp.uint16(k)) != z16) \
                        & (lane16 < jnp.uint16(LANES - k))
                    moving = (dist & jnp.uint16(k)) != z16
                    cw = jnp.where(arriving, mv_w,
                                   jnp.where(moving, z16, cw))
                    dist = jnp.where(arriving, mv_d - jnp.uint16(k),
                                     jnp.where(moving, z16, dist))
                return cw.astype(jnp.int32)
            for b in range(7):
                k = 1 << b
                # Left-rotate by k == right-rotate by LANES - k
                # (pltpu.roll requires a non-negative shift).
                mv_w = pltpu.roll(cw, shift=LANES - k, axis=1)
                mv_d = pltpu.roll(dist, shift=LANES - k, axis=1)
                arriving = ((mv_d & k) != 0) & (lane_col2 < LANES - k)
                moving = (dist & k) != 0
                cw = jnp.where(arriving, mv_w,
                               jnp.where(moving, 0, cw))
                dist = jnp.where(arriving, mv_d - k,
                                 jnp.where(moving, 0, dist))
            return cw
        lo = jnp.zeros((R2, LANES), jnp.int32)
        step = 64
        while step >= 1:
            cand = lo + step
            probe = jnp.take_along_axis(inc, cand - 1, axis=1)
            lo = jnp.where(probe < lane_col2 + 1, cand, lo)
            step //= 2
        inv = jnp.minimum(lo, 127)
        cw = jnp.take_along_axis(word2, inv, axis=1)
        return jnp.where(lane_col2 < row_tot, cw, 0)

    def lookup2(tbl_ref, idx):
        col = idx & 127
        lo = jnp.take_along_axis(tbl_ref[0, :, 0, :], col, axis=1)
        if small_alpha:
            # Every occurring symbol is < 128 (caller checked the freq
            # tables): the hi-half gather + select disappear. Inactive
            # lanes may carry idx >= 128 but their lookup results are
            # never used (every consumer is masked by ``active``).
            return lo
        hi = jnp.take_along_axis(tbl_ref[0, :, 1, :], col, axis=1)
        return jnp.where(idx < 128, lo, hi)

    # Hoisted activity threshold: active = sg*128 + lane < counts
    # becomes one scalar-vector compare against counts - lane (the loop
    # bodies below cannot rely on Mosaic hoisting the subtraction).
    cl_m = counts - lane_col

    def state_step(s_local, x, full):
        """One step's sequential state math; returns (emit, words, x').

        ``full`` (static): every lane of every row is active at this
        step — the activity compare, its AND into the emit test and the
        update select all drop out (the caller proves fullness from
        min(counts); see the split loops at the bottom).
        """
        sg = blk * steps_per_block + s_local
        active = None if full else (sg * LANES < cl_m)
        sy = syms_ref[0, :, pl.ds(s_local * LANES, LANES)].astype(jnp.int32)
        pk = lookup2(pk_ref, sy)
        cum = pk & 4095
        cmpl = _srl(pk, 12) & 8191
        f = SCALE - cmpl
        # Renorm BEFORE the update (normative order): emit the low 16
        # bits wherever the update would overflow 32 bits. The unsigned
        # x >= f << 20 test is srl(x, 20) >= f — both sides < 2^13, so
        # the plain signed compare is exact (2 ops vs the 4-op
        # sign-bias form). Relies on f <= 4088: quantize_freqs never
        # emits single-symbol tables (the f = 4096 case, where f << 20
        # would need 33 bits; the AVX coder leans on the same bound).
        emit = _srl(x, 20) >= f
        if not full:
            emit = active & emit
        word = x & jnp.int32(0xFFFF)
        x = jnp.where(emit, _srl(x, 16), x)
        if div in ('float', 'frcp', 'fake'):
            # q = x // f in f32 + one exact two-sided fixup round.
            # 'float' divides in-kernel — NO reciprocal table, killing
            # one of the two per-step gathers (gathers cost per-ELEMENT
            # on the measured attachments; the small-alpha 4->2 gather
            # cut was +10%). 'frcp' keeps the gather but reads a
            # pre-rounded f32 reciprocal (pack_enc_device_tables
            # div='frcp'), trading the divide for one multiply.
            # Exactness (both): after renorm x < f << 20 (rANS
            # invariant), so q_true <= 2^20 - 1. The conversion drops
            # x's low bit (srl keeps the value in signed-positive
            # range: 2 ops vs the 4-op sign-mask form), costing
            # <= 1/f <= 1/8 in q; rounding adds ~3 ulp rel err * 2^20
            # < 0.25 (a correctly-rounded divide is tighter still), so
            # floor lands in {q-1, q, q+1} and one two-sided fixup is
            # exact. The clamp to 2^20 - 1 (safe: q_true <= 2^20 - 1)
            # keeps t = q0 * f < 2^32 so the unsigned compares see
            # true values.
            x_f = _srl(x, 1).astype(jnp.float32)
            if div == 'fake':
                # TIMING PROBE ONLY (tools/enc_ab.py, never production):
                # replace the divide with one multiply to measure the
                # divide's share of the state chain. Output is WRONG.
                q0 = x_f * jnp.float32(2.44140625e-4)
            elif div == 'frcp':
                # The table stores RN(2/f) (pack_enc_device_tables):
                # the halved x needs no separate doubling multiply.
                rcp_f = jax.lax.bitcast_convert_type(
                    lookup2(rcp_ref, sy), jnp.float32)
                q0 = x_f * rcp_f
            else:
                q0 = (x_f + x_f) / f.astype(jnp.float32)
            if fixup == 'onesided':
                # Bias +0.5 makes the fixup ONE-sided: q_float's error
                # vs x/f is bounded by [-0.3125, +0.1875] (halving drop
                # <= 1/f <= 0.125 down since quantize_freqs' f >= 8;
                # conversion + divide roundings <= 2^20 * 2^-23 = 0.125
                # each way for 'float', <= 3*2^-24 rel for 'frcp'), so
                # trunc(q_float + 0.5) is in {q, q+1} with >= 0.25
                # margin both sides — the d >= f branch of the signed
                # form vanishes (3 fewer ops in the dominant chain).
                q0 = (q0 + 0.5).astype(jnp.int32)
                d = x - q0 * f
                q = jnp.where(d < 0, q0 - 1, q0)
            elif fixup == 'signed':
                q0 = q0.astype(jnp.int32)
                # The residual d = x - q0*f is tiny: q0 in {q-1, q, q+1}
                # (error budget above) puts the TRUE difference in
                # (-f, 2f) with f <= 4088, so the wrapped int32
                # subtraction recovers it exactly as a small signed
                # value — plain signed compares replace the sign-bias
                # unsigned forms (saves 4 vector ops/step) and the
                # t < 2^32 clamp is unnecessary (q0 <= 2^20 keeps the
                # wrapped product's residual in range either way).
                d = x - q0 * f
                lt = d < 0
                q0 = jnp.where(lt, q0 - 1, q0)
                d = jnp.where(lt, d + f, d)
                q = jnp.where(d >= f, q0 + 1, q0)
            else:
                # Round-2 unsigned-compare form, kept for A/B
                # (MTSCOMP_ENC_FIXUP=unsigned).
                q0 = jnp.minimum(q0.astype(jnp.int32),
                                 jnp.int32((1 << 20) - 1))
                t = q0 * f
                q0 = jnp.where(_lt_u(x, t), q0 - 1, q0)
                t = jnp.where(_lt_u(x, t), t - f, t)
                q = jnp.where(_ge_u(x - t, f), q0 + 1, q0)
        else:
            # Round-up-reciprocal form (Granlund-Montgomery): one more
            # gather per step; kept for A/B on other attachments.
            rcp = lookup2(rcp_ref, sy)
            rshift = _srl(pk, 25)
            t = _mulhi32_i32(x, rcp)
            q = _srl(_srl(x - t, 1) + t, rshift)
        # x' = x + cum + q * (SCALE - f).
        if full:
            x = x + cum + q * cmpl
        else:
            x = jnp.where(active, x + cum + q * cmpl, x)
        return emit, word, x

    def substep_group_ablate(s_hi, x, epos, acc):
        """Ablated variant (tools/enc_ablate.py): run stages up to
        ``ablate``, folding live results into ``acc`` so Mosaic cannot
        dead-code them; NOT bit-correct output, timing only."""
        ew = []
        for d in range(G):                  # backward: s_hi - d
            e, w, x = state_step(s_hi - d, x, False)
            ew.append((e, w))
        if ablate == 'state':
            for _, w in ew:
                acc = acc ^ w
            return x, epos, acc
        emit2 = jnp.concatenate([e for e, _ in reversed(ew)], axis=0)
        word2 = jnp.concatenate([w for _, w in reversed(ew)], axis=0)
        m = emit2.astype(jnp.int32)
        inc = jax.lax.dot(m.astype(jnp.float32), triu,
                          preferred_element_type=jnp.float32
                          ).astype(jnp.int32)
        row_tot = jnp.broadcast_to(inc[:, 127:128], (R2, LANES))
        run = row_tot
        k = 1
        while k < R2:
            rolled = pltpu.roll(run, shift=k, axis=0)
            run = run + jnp.where(row_id2 >= k, rolled, 0)
            k *= 2
        row_off = run - row_tot
        ks = run[R2 - 1, 0]

        def fold(acc, a2):                  # (G*R, 128) -> (R, 128) XOR
            out = acc
            for d in range(G):
                out = out ^ a2[d * R:(d + 1) * R]   # static slices
            return out

        if ablate == 'rank':
            return x, epos + ks, fold(acc ^ word2[:R], row_off)
        cw = compact_row_words(emit2, word2, inc, row_tot)
        if ablate == 'search':
            return x, epos + ks, fold(acc, cw)
        wstart = jnp.maximum(CAPW - epos - ks, 0)
        base_row = pl.multiple_of(_srl(wstart, 10) * 8, 8)
        first = (wstart - base_row * LANES) + row_off
        brow = _srl(first, 7)
        off = first & 127
        rot_idx = (lane_col2 - off) & 127
        rotated = jnp.take_along_axis(cw, rot_idx, axis=1)
        c0 = lane_col2 - off
        c1 = lane_col2 + LANES - off
        part0 = jnp.where((lane_col2 >= off) & (c0 < row_tot), rotated, 0)
        part1 = jnp.where((lane_col2 < off) & (c1 < row_tot), rotated, 0)
        brow_c = brow[:, 0:1]
        oh0 = (wrow_iota == brow_c).astype(jnp.float32)
        oh1 = (wrow_iota == brow_c + 1).astype(jnp.float32)
        # 'noscat': everything but the scatter matmuls + window RW.
        acc = fold(fold(acc, part0), part1)
        acc = acc ^ (oh0[:R, :LANES] + oh1[:R, :LANES]).astype(jnp.int32)
        return x, epos + ks, acc

    def substep_group(s_hi, x, epos, full=False):
        """Steps ``s_hi`` down to ``s_hi - G + 1``, ONE joint scatter.

        The state math is inherently sequential per step, but the emit
        machinery (rank matmul, sublane ladder, compaction search,
        rotate, one-hot scatter, window merge) is not: consecutive
        backward steps emit into adjacent stream ranges, so stacking
        the G steps' rows in ascending decoder order
        [s_hi-G+1 rows; ...; s_hi rows] and running the machinery once
        over (G*R, 128) emits every step's words at exactly the
        per-step positions — 1/G the vector-op issues for the dominant
        stage (per-op issue rate, not FLOPs, bounds this kernel on the
        measured attachments).

        ``full`` (static) compiles the mask-free state chain for runs
        the caller proves fully active.
        """
        ew = []
        for d in range(G):                  # backward: s_hi - d
            e, w, x = state_step(s_hi - d, x, full)
            ew.append((e, w))
        # Ascending stream order: the backward pass emits the highest
        # step first at the top of the range, so reverse the stack.
        emit2 = jnp.concatenate([e for e, _ in reversed(ew)], axis=0)
        word2 = jnp.concatenate([w for _, w in reversed(ew)], axis=0)
        # Ranks in decoder (row-major) order: MXU lane prefix
        # (inclusive) + sublane ladder of row totals.
        m = emit2.astype(jnp.int32)
        inc = jax.lax.dot(m.astype(jnp.float32), triu,
                          preferred_element_type=jnp.float32
                          ).astype(jnp.int32)
        row_tot = jnp.broadcast_to(inc[:, 127:128], (R2, LANES))
        # Sublane ladder for the row offsets (A/B'd against an MXU
        # prefix matmul with sync-amortized timing; ladder wins
        # slightly in both kernels).
        run = row_tot
        k = 1
        while k < R2:
            rolled = pltpu.roll(run, shift=k, axis=0)
            run = run + jnp.where(row_id2 >= k, rolled, 0)
            k *= 2
        row_off = run - row_tot
        # Words this pair: the prefix's last row (saves a reduction).
        ks = run[R2 - 1, 0]
        cw = compact_row_words(emit2, word2, inc, row_tot)
        # Place each row's compacted block at its stream range
        # [wstart + row_off, wstart + row_off + k_r): rotate to the
        # in-row offset, split across the (at most two) stream rows,
        # scatter rows with one-hot MXU matmuls, select-merge.
        wstart = jnp.maximum(CAPW - epos - ks, 0)
        # 8-row alignment hint: u16 sublane slices must start at x8 rows.
        base_row = pl.multiple_of(_srl(wstart, 10) * 8, 8)
        first = (wstart - base_row * LANES) + row_off   # row-constant
        brow = _srl(first, 7)
        off = first & 127
        rot_idx = (lane_col2 - off) & 127
        rotated = jnp.take_along_axis(cw, rot_idx, axis=1)
        c0 = lane_col2 - off
        c1 = lane_col2 + LANES - off
        part0 = jnp.where((lane_col2 >= off) & (c0 < row_tot), rotated, 0)
        part1 = jnp.where((lane_col2 < off) & (c1 < row_tot), rotated, 0)
        brow_c = brow[:, 0:1]
        oh0 = (wrow_iota == brow_c).astype(jnp.float32)
        oh1 = (wrow_iota == brow_c + 1).astype(jnp.float32)
        # (2*R2, WROWS)^T @ (2*R2, 128): contract the stacked row axis —
        # both split halves scatter in ONE pair of matmuls (same FLOPs
        # as separate oh0/oh1 products, half the MXU issues; per-op
        # overhead dominates at these shapes). Byte-split because u16
        # words exceed bf16's mantissa; each byte half is bf16-exact,
        # and two single-pass matmuls beat one HIGHEST (~6-pass
        # emulated) matmul.
        dn = (((0,), (0,)), ((), ()))
        oh = jnp.concatenate([oh0, oh1], axis=0)
        parts = jnp.concatenate([part0, part1], axis=0)

        def scat(oh, part):
            lo = (part & 255).astype(jnp.float32)
            hi = _srl(part, 8).astype(jnp.float32)
            return (jax.lax.dot_general(
                        oh, lo, dn, preferred_element_type=jnp.float32
                    ).astype(jnp.int32)
                    + (jax.lax.dot_general(
                        oh, hi, dn, preferred_element_type=jnp.float32
                    ).astype(jnp.int32) << 8))

        window = scat(oh, parts)
        flatg = (base_row + win_row) * LANES + win_col
        touched = (flatg >= wstart) & (flatg < wstart + ks)
        cur = words_ref[0, pl.ds(base_row, WROWS), :]
        words_ref[0, pl.ds(base_row, WROWS), :] = jnp.where(
            touched, window.astype(jnp.uint16), cur)
        return x, epos + ks

    # Per-group step clamp (mirror of the decode kernel's): the backward
    # pass iterates local steps high to low, so a group needing fewer
    # steps than the batch max skips the LEADING iterations of its high
    # blocks — those steps are all-inactive (emit nothing, keep state),
    # so skipping is bit-exact; a ``todo`` that is not a multiple of G
    # rounds up to a whole G-run whose leading steps are likewise
    # all-inactive.
    steps_needed = _srl(jnp.max(counts) + 127, 7)
    todo = jnp.clip(steps_needed - blk * steps_per_block, 0,
                    steps_per_block)
    runs_todo = (todo + (G - 1)) // G

    if ablate is not None:
        def body_a(i, carry):
            x, epos, acc = carry
            p = runs_todo - 1 - i           # run index, descending
            return substep_group_ablate(G * p + (G - 1), x, epos, acc)

        acc0 = jnp.zeros((R, LANES), jnp.int32)
        x, epos, acc = jax.lax.fori_loop(0, runs_todo, body_a,
                                         (x0, epos0, acc0))
        x_scr[...] = x
        epos_scr[0] = epos
        states_ref[0] = x ^ acc             # keep every stage live
        nw_ref[0] = jnp.broadcast_to(epos, nw_ref.shape[1:]) \
            ^ acc[:nw_ref.shape[1]]
        return

    def body(i, carry):
        x, epos = carry
        p = runs_todo - 1 - i               # run index, descending
        return substep_group(G * p + (G - 1), x, epos)

    def body_full(i, carry):
        x, epos = carry
        p = runs_todo - 1 - i
        return substep_group(G * p + (G - 1), x, epos, full=True)

    # Split the backward pass at the fullness boundary: run p (local
    # steps [G*p, G*p + G)) is fully active iff every lane of every row
    # is, i.e. blk*spb + G*p + G <= floor(min(counts) / 128). The
    # backward loop visits runs in DESCENDING p, so the partially-
    # active runs (the stream tail) come first and the fully-active
    # ones — the bulk, for realistic chunk geometries — run a state
    # chain with no activity compare, no emit AND and no update select
    # (bit-exact: 'full' only drops ops whose masks are all-true).
    if mask_split:
        full_steps = jnp.clip(_srl(jnp.min(counts), 7)
                              - blk * steps_per_block, 0, todo)
        full_runs = jnp.minimum(full_steps // G, runs_todo)
    else:
        # A/B escape (MTSCOMP_ENC_MASKSPLIT=0): masked chain throughout.
        full_runs = jnp.int32(0)
    split = runs_todo - full_runs
    x, epos = jax.lax.fori_loop(0, split, body, (x0, epos0))
    x, epos = jax.lax.fori_loop(split, runs_todo, body_full, (x, epos))
    x_scr[...] = x
    epos_scr[0] = epos
    states_ref[0] = x
    nw_ref[0] = jnp.broadcast_to(epos, nw_ref.shape[1:])


def resolve_div_mode():
    """The division form the encode kernel (and its table packing)
    uses: 'float' (in-kernel f32 divide, no reciprocal table), 'frcp'
    (gathered pre-rounded f32 reciprocal), or 'mulhi' (round-up integer
    reciprocal). Table packing and the kernel static flag must agree —
    resolve once and pass to both."""
    import os
    mode = os.environ.get('MTSCOMP_ENC_DIV', 'float')
    # div='fake' (WRONG output, timing only) is deliberately NOT
    # resolvable here: only tools/enc_ablate.py passes it, explicitly,
    # to its ablated timing loop (AB_DIV) — never to a production path.
    return mode if mode in ('float', 'frcp', 'mulhi') else 'float'


@functools.partial(jax.jit, static_argnames=('n_steps', 'cap_rows',
                                             'interpret',
                                             'steps_per_block',
                                             'fuse_steps', 'small_alpha',
                                             'butterfly', 'compact16',
                                             'div', 'fixup',
                                             'mask_split', 'ablate'))
def encode_groups_pallas(symbols, enc_pk, enc_rcp, counts_b, *, n_steps,
                         cap_rows, interpret=False, steps_per_block=None,
                         fuse_steps=None, small_alpha=False,
                         butterfly=None, compact16=None, div=None,
                         fixup=None, mask_split=None, ablate=None):
    """Encode N groups on TPU; bit-identical to the normative encoder.

    symbols  (N, R, S*128) uint8 — row-linear segment rows (S*128
             column-padded so that steps_per_block divides S)
    enc_pk   (N, R, 2, 128) int32 — packed (rcp_shift, cmpl, cum)
    enc_rcp  (N, R, 2, 128) int32 — reciprocals (encoder_tables)
    counts_b (N, R, 128) int32 — per-row symbol counts, lane-broadcast
    cap_rows — stream-region rows per group; the merged stream of group
             n lands at ``words[n].reshape(-1)[cap_rows*128 - nw[n] :
             cap_rows*128]``. Callers must provision from an entropy
             estimate and fall back when ``nw > cap_rows*128``.

    Returns ``(states (N, R, 128) int32, words (N, cap_rows + slack,
    128) uint16, n_words (N, 8, 128) int32 broadcast)``.
    """
    interpret = interpret or force_interpret()
    N, R_in, SK = symbols.shape
    if butterfly is None or compact16 is None:
        import os
        mode = os.environ.get('MTSCOMP_ENC_COMPACT', 'butterfly')
        if butterfly is None:
            butterfly = mode != 'search'
        if compact16 is None:
            compact16 = mode == 'butterfly16'
    if div is None:
        div = resolve_div_mode()
    if fixup is None:
        import os
        fixup = os.environ.get('MTSCOMP_ENC_FIXUP', 'onesided')
        if fixup not in ('onesided', 'signed', 'unsigned'):
            fixup = 'onesided'
    if mask_split is None:
        import os
        mask_split = os.environ.get('MTSCOMP_ENC_MASKSPLIT', '1') != '0'
    if fuse_steps is None:
        # Hardware A/B (fresh processes, this attachment): G=2 7.9,
        # G=4 11.5, G=8 {12.4, 12.3}, G=16 {11.2, 11.6} GB/s — 8 is
        # the measured optimum (env knob kept for other attachments).
        import os
        fuse_steps = int(os.environ.get('MTSCOMP_ENC_FUSE', '8'))
    WROWS = window_rows(fuse_steps * R_in)  # a window covers a G-run
    if steps_per_block is None:
        # Env knob for hardware A/B sweeps (fresh processes); the
        # measured optimum default on this attachment is 64 below.
        import os
        spb_env = os.environ.get('MTSCOMP_ENC_SPB')
        if spb_env:
            steps_per_block = int(spb_env)
    spb = steps_per_block or min(64, max(fuse_steps,
                                         -(-n_steps // fuse_steps)
                                         * fuse_steps))
    if spb % fuse_steps:
        raise ValueError("steps_per_block must be a multiple of "
                         "fuse_steps (the kernel scatters substeps in "
                         "runs of %d)." % fuse_steps)
    CB = -(-max(n_steps, 1) // spb)
    pad_cols = CB * spb * LANES - SK
    if pad_cols:
        symbols = jnp.pad(symbols, ((0, 0), (0, 0), (0, pad_cols)))
    # Slack above the stream region: windows anchored near CAPW read
    # and (select-preserving) write up to WROWS - 1 rows past it.
    buf_rows = -(-(cap_rows + WROWS) // 8) * 8
    out = pl.pallas_call(
        functools.partial(_enc_kernel, steps_per_block=spb, cb_total=CB,
                          cap_rows=cap_rows, fuse_steps=fuse_steps,
                          small_alpha=small_alpha, butterfly=butterfly,
                          compact16=bool(compact16), div=div,
                          fixup=fixup, mask_split=mask_split,
                          ablate=ablate),
        grid=(N, CB),
        in_specs=[
            pl.BlockSpec((1, R_in, LANES), lambda n, c: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R_in, 2, LANES), lambda n, c: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R_in, 2, LANES), lambda n, c: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R_in, spb * LANES),
                         lambda n, c: (n, 0, CB - 1 - c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, buf_rows, LANES), lambda n, c: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R_in, LANES), lambda n, c: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda n, c: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, buf_rows, LANES), jnp.uint16),
            jax.ShapeDtypeStruct((N, R_in, LANES), jnp.int32),
            jax.ShapeDtypeStruct((N, 8, LANES), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((R_in, LANES), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(counts_b, enc_pk, enc_rcp, symbols)
    words, states, nw = out
    return states, words, nw


def pack_enc_device_tables(freqs, div='mulhi'):
    """(256,) freq table -> packed (pk, rcp) (2, 128) int32 pairs.

    ``div`` must match the kernel's static flag: 'mulhi' packs the
    round-up integer reciprocals (models/rans.py encoder_tables),
    'frcp' packs bitcast f32 RN(2/f) (the kernel multiplies the
    halved state and runs the exact two-sided fixup), 'float' needs
    no reciprocal (the rcp rows are returned zeroed; the kernel
    divides in-register).
    """
    freqs = np.asarray(freqs, dtype=np.int64)
    from ..models.rans import encoder_tables
    pk, rcp = encoder_tables(freqs)
    if div == 'frcp':
        with np.errstate(divide='ignore'):
            rcp_f = (np.float32(2.0)
                     / freqs.astype(np.float32)).astype(np.float32)
        rcp = rcp_f.view(np.uint32)
    elif div == 'float':
        rcp = np.zeros_like(rcp)
    return (pk.view(np.int32).reshape(2, 128),
            rcp.view(np.int32).reshape(2, 128))
