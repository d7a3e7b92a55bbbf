"""Pallas TPU kernel: grouped rANS decode at vector-unit speed.

One grid cell decodes one group — GROUP_ROWS (32) segment rows x 128
lanes, one (32, 128) vector — running the scan of ``models/rans.py``
with every data-dependent lookup mapped onto ops Mosaic lowers well:

- **slot -> symbol**: 256-entry coarse bucket table (packed
  ``upper<<8 | dense_id``) + two compare-increments over the *dense*
  alphabet, then one packed dense-table lookup
  (``value<<24 | freq<<12 | cum``). All tables are two (R, 128) rows;
  a lookup is two per-row lane shuffles (``take_along_axis`` on the
  lane axis, the one dynamic gather Mosaic supports) and a select.
- **renorm**: the group's merged word stream is consumed front-to-back;
  lane ranks come from an MXU prefix sum (mask @ upper-triangular ones;
  exact — values <= 128 fit bf16) plus a sublane Hillis-Steele scan of
  row totals, and each lane pulls its word from a window of the stream
  in two phases: each target row's words span at most two consecutive
  128-word stream rows, which are brought to the row by BYTE-SPLIT
  one-hot MXU matmuls (the u16 words split into two u8 halves whose
  one-hot products are bf16-exact — operands in {0,1,255,256}, sums
  < 2^24 — so default-precision matmuls suffice; see the fetch code),
  then a per-lane shuffle picks within them.
- **state math**: int32 with logical shifts (values are mod-2^32; the
  unsigned ``x < 2^16`` test becomes ``x >> 16 == 0``).

Group width rationale: Mosaic vector ops cost nearly the same at 8 and
32 sublanes, so (32, 128) groups quarter the per-symbol cost relative
to (8, 128).

Symbols are stored directly as one (32, 128) uint8 tile per step.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.rans import SCALE_BITS, LANES, GROUP_ROWS

R = GROUP_ROWS


def force_interpret():
    """Env escape hatch: run the Pallas paths in interpreter mode (lets
    CPU test runs exercise the TPU pipeline branches)."""
    import os
    return os.environ.get('MTSCOMP_PALLAS_INTERPRET', '') not in ('', '0')


def window_rows(r):
    # Word rows one step of an r-row group can span: up to 8 alignment
    # rows (u16 sublane slices must start at a multiple of 8) + 1 row of
    # in-row offset + r rows of ranks + 1 boundary row.
    return r + 10


WINDOW_ROWS = window_rows(R)


def _srl(x, n):
    return jax.lax.shift_right_logical(x, n)


def _kernel(states_ref, counts_ref, coarse_ref, dense_ref,
            words_ref, out_ref, used_ref, x_scr, pos_scr, *,
            steps_per_block, small_alpha, one_fixup, stack, octet,
            mask_split=True):
    # Grid is (N group-stacks, column blocks): the rANS states and
    # stream positions persist in scratch across a stack's column
    # blocks, so the output block stays small regardless of segment
    # length. ``stack`` independent groups ride one cell with their
    # rows concatenated: every per-step vector op then covers a
    # (stack*R, 128) tile — same issue count, stack x the symbols —
    # which is the lever on issue-rate-bound parts (groups are
    # independent streams, so nothing serializes; only the renorm
    # ladder and the window fetch need per-group handling).
    cb = pl.program_id(1)
    S = stack

    @pl.when(cb == 0)
    def _():
        x_scr[...] = states_ref[0].astype(jnp.int32)
        for g in range(S):
            pos_scr[g] = 0

    x0 = x_scr[...]                                       # (S*R,128) i32
    pos0 = tuple(pos_scr[g] for g in range(S))
    counts = counts_ref[0]                                # (S*R,128) i32
    SR = x0.shape[0]
    R = SR // S
    WROWS = window_rows(R)

    lane_col = jax.lax.broadcasted_iota(jnp.int32, (SR, LANES), 1)
    row_id = jax.lax.broadcasted_iota(jnp.int32, (SR, LANES), 0)
    # Group-local row index / per-group window-row offset (hoisted;
    # all-constant for Mosaic).
    row_mod = jax.lax.rem(row_id, R)
    gsel = [row_id < R] if S == 1 else [
        (row_id >= g * R) & (row_id < (g + 1) * R) for g in range(S)]
    gwoff = sum(jnp.where(gsel[g], g * WROWS, 0) for g in range(1, S)) \
        if S > 1 else 0
    # Upper-triangular ones for the MXU lane-prefix (values <= 128: f32
    # single-pass exact).
    triu = (jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
            ).astype(jnp.float32)
    wrow_iota = jax.lax.broadcasted_iota(jnp.int32, (SR, S * WROWS), 1)

    def lookup_coarse(idx):
        # 256-entry table as two 128-lane rows (re-read from VMEM at each
        # use: cheaper than keeping 4 more (R,128) values live).
        col = idx & 127
        lo = jnp.take_along_axis(coarse_ref[0, :, 0, :], col, axis=1)
        hi = jnp.take_along_axis(coarse_ref[0, :, 1, :], col, axis=1)
        return jnp.where(idx < 128, lo, hi)

    def lookup_dense(idx):
        if small_alpha:          # alphabet <= 128: single-row table
            return jnp.take_along_axis(dense_ref[0, :, 0, :], idx & 127,
                                       axis=1)
        col = idx & 127
        lo = jnp.take_along_axis(dense_ref[0, :, 0, :], col, axis=1)
        hi = jnp.take_along_axis(dense_ref[0, :, 1, :], col, axis=1)
        return jnp.where(idx < 128, lo, hi)

    # Hoisted activity threshold: active = s*128 + lane < counts as one
    # scalar-vector compare against counts - lane.
    cl_m = counts - lane_col

    def substep(s, x, pos, full):
        # ``pos`` is a tuple of S per-group stream cursors. ``full``
        # (static): every lane of every row is active at this step —
        # the activity compare, its AND into the renorm mask and the
        # update select drop out (the caller proves fullness from
        # min(counts); see the split loops at the bottom).
        active = None if full else (s * LANES < cl_m)
        slot = x & 4095
        if octet:
            # 8-aligned tables (quantize_freqs' unit granularity —
            # every boundary a multiple of 8): each 8-slot octet
            # belongs to ONE symbol, so the 512 octet ids pack 4-per-
            # word into a single 128-lane row and the whole
            # slot -> dense-id resolution is one lane shuffle plus a
            # per-lane variable shift (Mosaic lowers vector-vector
            # shifts) — no second table row, no select, no fixup
            # compare-increments. Foreign min-8 tables (boundaries not
            # 8-aligned) keep the coarse+fixup variants below.
            w = jnp.take_along_axis(coarse_ref[0, :, 0, :],
                                    _srl(slot, 5), axis=1)
            did = _srl(w, slot & 24) & 255
        else:
            # slot -> dense symbol id: both fixup boundaries ride in
            # the coarse entry, so one dense lookup finishes the
            # resolution.
            cp = lookup_coarse(_srl(slot, 4))
            did = cp & 255
            up0m = _srl(cp, 8) & 4095
            did = did + jnp.where(slot > up0m, 1, 0)
            if not one_fixup:
                # Only needed when some 16-slot bucket holds 3 symbols
                # (pack_device_tables reports this per table; the batch
                # selects the single-fixup variant when none does).
                up1m = _srl(cp, 20)
                did = did + jnp.where(slot > up1m, 1, 0)
        pk = lookup_dense(did)
        cum = pk & 4095
        f = _srl(pk, 12) & 4095
        val = _srl(pk, 24)
        # rANS inverse update (mod 2^32 in int32).
        if full:
            x = f * _srl(x, SCALE_BITS) + slot - cum
            need = _srl(x, 16) == 0
        else:
            x = jnp.where(active, f * _srl(x, SCALE_BITS) + slot - cum, x)
            # Renorm ranks: MXU prefix + sublane scan of row totals.
            need = active & (_srl(x, 16) == 0)
        m = need.astype(jnp.int32)
        inc = jax.lax.dot(m.astype(jnp.float32), triu,
                          preferred_element_type=jnp.float32
                          ).astype(jnp.int32)
        row_tot = jnp.broadcast_to(inc[:, 127:128], (SR, LANES))
        # Sublane ladder for the row offsets (measured faster here than
        # an extra MXU prefix matmul — the matmul ports are busy with
        # the rank + fetch dots; the encode kernel, with more VPU work
        # per step, uses the matmul form instead). The group-local row
        # index resets the running sum at each group boundary, so one
        # ladder yields every group's within-group prefix.
        run = row_tot
        k = 1
        while k < R:
            rolled = pltpu.roll(run, shift=k, axis=0)
            run = run + jnp.where(row_mod >= k, rolled, 0)
            k *= 2
        row_off = run - row_tot
        rank = (inc - m) + row_off                  # exclusive, row-major
        # Word fetch, two phases: (1) each target row's words span at
        # most two consecutive stream rows; bring those to the row with
        # one-hot MXU row-selects (u16 word values are f32-exact);
        # (2) per-lane shuffle within the two rows.
        # Window base aligned to 8 rows (u16 sublane slice constraint);
        # each group gets its own window slice, stacked sublane-wise so
        # the one-hot fetch spans all S windows in one matmul pair.
        base = [pl.multiple_of(_srl(pos[g], 10) * 8, 8) for g in range(S)]
        po_g = [pos[g] - (base[g] << 7) for g in range(S)]
        pos_off = po_g[0] if S == 1 else sum(
            jnp.where(gsel[g], po_g[g], 0) for g in range(S))
        widx = pos_off + rank
        first = pos_off + row_off                   # row's first word idx
        brow = _srl(first, 7)                       # 0 .. WROWS-2
        # The stream stays u16 in VMEM (half the block DMA); only the
        # active windows are widened in-register.
        if S == 1:
            window = words_ref[0, 0, pl.ds(base[0], WROWS), :]
        else:
            window = jnp.concatenate(
                [words_ref[0, g, pl.ds(base[g], WROWS), :]
                 for g in range(S)], axis=0)
        brow_c = (brow + gwoff)[:, 0:1]             # row-constant
        # Byte-split matmuls: u16 word values exceed bf16's mantissa,
        # but each byte half is bf16-exact, so single-pass (default
        # precision) matmuls replace HIGHEST (~6-pass emulated) ones.
        # Both row-selects ride ONE matmul per byte half: scaling the
        # second one-hot by 256 keeps entries in {0, 1, 256} (all
        # bf16-exact powers of two) and the merged sum w_row0 +
        # 256*w_row1 <= 255 + 256*255 < 2^24 unpacks exactly.
        # (Mosaic has no direct u16->f32 cast; widen to i32 first.)
        wi = window.astype(jnp.int32)
        wlo = (wi & 255).astype(jnp.float32)
        whi = _srl(wi, 8).astype(jnp.float32)
        ohc = ((wrow_iota == brow_c).astype(jnp.float32)
               + (wrow_iota == brow_c + 1).astype(jnp.float32) * 256.0)
        a = jax.lax.dot(ohc, wlo,
                        preferred_element_type=jnp.float32
                        ).astype(jnp.int32)
        b = jax.lax.dot(ohc, whi,
                        preferred_element_type=jnp.float32
                        ).astype(jnp.int32)
        w0 = (a & 255) | ((b & 255) << 8)
        w1 = _srl(a, 8) | (_srl(b, 8) << 8)
        off = widx - (brow << 7)                    # [0, 256)
        g0 = jnp.take_along_axis(w0, off & 127, axis=1)
        g1 = jnp.take_along_axis(w1, off & 127, axis=1)
        w = jnp.where(off < 128, g0, g1)
        x = jnp.where(need, (x << 16) | w, x)
        # Each group's step word total is its ladder's last row (saves
        # a full (R,128) reduction per substep).
        pos = tuple(pos[g] + run[g * R + R - 1, 0] for g in range(S))
        return x, pos, val

    def make_body(full):
        def body(s, carry):
            x, pos = carry
            x, pos, val = substep(cb * steps_per_block + s, x, pos, full)
            # Row-linear output: step s's lane j of row r is row r's
            # symbol s*128 + j, so segments come out contiguous (no
            # transpose pass).
            out_ref[0, :, pl.ds(s * LANES, LANES)] = val.astype(jnp.uint8)
            return x, pos
        return body

    # Per-group step clamp: n_steps is the batch-wide max, but a stack
    # only needs ceil(max_row_count / 128) steps — a chunk's tail group
    # (e.g. 1 live row of 32) would otherwise burn the full scan on
    # all-inactive steps. Skipped steps change nothing (inactive lanes
    # hold their state and read no words), so results stay bit-exact;
    # the skipped output columns are garbage the callers never read.
    # (Stacked groups share the max — pack similar-sized groups.)
    steps_needed = _srl(jnp.max(counts) + 127, 7)
    todo = jnp.clip(steps_needed - cb * steps_per_block, 0,
                    steps_per_block)
    # Split at the fullness boundary: step s (global) is fully active
    # iff (s+1)*128 <= min(counts); the forward scan visits those FIRST
    # — the bulk, for realistic chunk geometries — with the mask-free
    # chain, then the masked tail (bit-exact: 'full' only drops ops
    # whose masks are all-true).
    if mask_split:
        full_todo = jnp.clip(_srl(jnp.min(counts), 7)
                             - cb * steps_per_block, 0, todo)
    else:
        # A/B escape (MTSCOMP_DEC_MASKSPLIT=0): masked chain throughout.
        full_todo = jnp.int32(0)
    x, pos = jax.lax.fori_loop(0, full_todo, make_body(True), (x0, pos0))
    x, pos = jax.lax.fori_loop(full_todo, todo, make_body(False), (x, pos))
    x_scr[...] = x
    for g in range(S):
        pos_scr[g] = pos[g]
    # Stream-consumption audit: the block revisits this output each
    # column block, so the final block leaves each group's total word
    # count — callers compare it to the container's stored stream
    # length (the corruption check sequential decoders do inline).
    # Lane-broadcast rows: TPU blocks need (>=8, 128) or full-dim tiles,
    # so an (S, 128) VMEM tile stands in for the S scalars.
    u_iota = jax.lax.broadcasted_iota(jnp.int32, used_ref.shape[1:], 0)
    used = jnp.broadcast_to(pos[0], used_ref.shape[1:]).astype(jnp.int32)
    for g in range(1, S):
        used = jnp.where(u_iota == g, pos[g], used)
    used_ref[0] = used


@functools.partial(jax.jit, static_argnames=('n_steps', 'interpret',
                                             'small_alpha',
                                             'steps_per_block',
                                             'one_fixup', 'octet',
                                             'mask_split'))
def decode_groups_pallas(states, words_u16, coarse_pk, dense_pk, counts_b,
                         *, n_steps, interpret=False, small_alpha=False,
                         steps_per_block=None, one_fixup=False,
                         octet=False, mask_split=None):
    """Decode N groups on TPU.

    Returns ``(syms, words_used)``: (N, R, blocks*128) uint8 symbols and
    the (N,) int32 stream words each group consumed (callers compare to
    the stored stream length — the corruption audit). Symbols are
    row-linear: ``out[n, r]`` is segment row r's symbol stream (no
    reassembly transpose needed downstream).

    states    (N, R, 128) uint32
    words_u16 (N, WR, 128) uint16 — merged streams, row-padded, with
              >= WINDOW_ROWS rows of slack at the end
    coarse_pk (N, R, 2, 128) int32 — packed coarse tables
    dense_pk  (N, R, 2, 128) int32 — packed dense symbol tables
    counts_b  (N, R, 128) int32 — per-row symbol counts (lane-broadcast)
    small_alpha: all tables have <= 128 present symbols (single-row
              dense lookups; caller asserts)
    one_fixup: no table in the batch has a 16-slot bucket holding 3
              symbols (pack_device_tables reports this), so the slot
              lookup's second compare-increment is dropped
    octet:    every table in the batch is 8-aligned (this writer's
              quantize_freqs invariant) and ``coarse_pk[:, :, 0]``
              holds the packed octet rows from pack_device_tables —
              the slot lookup becomes one shuffle + a variable shift
    """
    return _decode_groups_call(states, words_u16, coarse_pk, dense_pk,
                               counts_b, n_steps=n_steps,
                               interpret=interpret,
                               small_alpha=small_alpha,
                               steps_per_block=steps_per_block,
                               one_fixup=one_fixup, octet=octet,
                               mask_split=mask_split)


STEPS_PER_BLOCK = 64     # output columns per grid step (64*128 symbols/row)


def _decode_groups_call(states, words_u16, coarse_pk, dense_pk,
                        counts_b, *, n_steps, interpret, small_alpha,
                        steps_per_block=None, one_fixup=False,
                        stack=None, octet=False, mask_split=None):
    interpret = interpret or force_interpret()
    if mask_split is None:
        import os
        mask_split = os.environ.get('MTSCOMP_DEC_MASKSPLIT', '1') != '0'
    if stack is None:
        # Hardware sweep (fresh processes, staged kernel GB/s): stack=1
        # 8.2, 2 10.6, 4 13.0-13.7, 8 15.2-15.5, 16 clamped to 8 by the
        # VMEM guard at the bench geometry — 8 is the measured optimum
        # (env knob kept for other attachments).
        import os
        stack = int(os.environ.get('MTSCOMP_DEC_STACK', '8'))
    N, R_in, _ = states.shape
    WR = words_u16.shape[1]
    # VMEM guard: the per-cell stream block is (stack, WR, 128) u16 and
    # Pallas double-buffers it. The pallas_call below raises the scoped
    # VMEM limit to 64 MB (the compiler's 16 MB default is far below
    # the chip's 128 MB); keep the stream blocks within ~48 MB of that
    # (leaving room for the output block and scratch) by lowering the
    # stack for very long streams. Bit-exactness does not depend on the
    # stack size.
    while stack > 1 and stack * WR * LANES * 2 * 2 > 48 << 20:
        stack //= 2
    spb = steps_per_block or min(STEPS_PER_BLOCK,
                                 max(4, -(-n_steps // 4) * 4))
    CB = -(-max(n_steps, 1) // spb)
    # Stack S groups per grid cell (see _kernel). Pad the batch to a
    # multiple of S with inert groups (counts 0 => no active lanes, no
    # stream reads), then merge each S-tuple's rows sublane-wise; the
    # row order of (N//S, S*R) matches (N, R), so outputs reshape back
    # with no data movement.
    Np = -(-N // stack) * stack
    if Np != N:
        pad = Np - N
        states = jnp.pad(states, ((0, pad), (0, 0), (0, 0)))
        counts_b = jnp.pad(counts_b, ((0, pad), (0, 0), (0, 0)))
        coarse_pk = jnp.pad(coarse_pk, ((0, pad), (0, 0), (0, 0), (0, 0)))
        dense_pk = jnp.pad(dense_pk, ((0, pad), (0, 0), (0, 0), (0, 0)))
        words_u16 = jnp.pad(words_u16, ((0, pad), (0, 0), (0, 0)))
    NS = Np // stack
    SR = stack * R_in
    out, used = pl.pallas_call(
        functools.partial(_kernel, steps_per_block=spb,
                          small_alpha=small_alpha,
                          one_fixup=one_fixup, stack=stack, octet=octet,
                          mask_split=mask_split),
        grid=(NS, CB),
        in_specs=[
            pl.BlockSpec((1, SR, LANES), lambda n, c: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SR, LANES), lambda n, c: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SR, 2, LANES), lambda n, c: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SR, 2, LANES), lambda n, c: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, stack, WR, LANES), lambda n, c: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, SR, spb * LANES), lambda n, c: (n, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, stack, LANES), lambda n, c: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NS, SR, CB * spb * LANES), jnp.uint8),
            jax.ShapeDtypeStruct((NS, stack, LANES), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((SR, LANES), jnp.int32),
                        pltpu.SMEM((stack,), jnp.int32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(states.astype(jnp.int32).reshape(NS, SR, LANES),
      counts_b.reshape(NS, SR, LANES),
      coarse_pk.reshape(NS, SR, 2, LANES),
      dense_pk.reshape(NS, SR, 2, LANES),
      words_u16.reshape(NS, stack, WR, LANES))
    return (out.reshape(Np, R_in, CB * spb * LANES)[:N],
            used[:, :, 0].reshape(Np)[:N])


def pack_device_tables(freqs):
    """Host-side packed tables from a (256,) frequency table.

    Returns ``(coarse_pk (2,128) int32, dense_pk (2,128) int32,
    needs_second_fixup bool, octet_pk (128,) int32 | None)``. A coarse
    entry packs the bucket's first
    dense id and BOTH fixup boundaries —
    ``((up1-1) << 20) | ((up0-1) << 8) | id0`` with ``upX`` the
    exclusive uppers of candidates ``id0``/``id0+1`` (4096 encodes as
    4095 via the -1; the kernel compares ``slot > upX-1``) — so the
    kernel resolves the symbol with two compare-increments and ONE
    dense lookup (min_freq 8 bounds each 16-slot bucket to 3 symbols).

    ``needs_second_fixup`` is False when no 16-slot bucket of this
    table holds 3 symbols (the common case for real tables): the
    kernel may then drop the second compare-increment (static variant
    selected per batch, zero format or ratio impact).

    ``octet_pk`` is the single-row octet table for 8-aligned tables
    (every boundary a multiple of 8 — what this writer's
    quantize_freqs emits): each 8-slot octet belongs to one symbol,
    the 512 dense ids pack 4-per-int32 into exactly 128 lanes, and the
    kernel's ``octet`` variant resolves a slot with one shuffle + one
    variable shift. None for foreign tables with unaligned boundaries
    (the batch then keeps the coarse+fixup variants).
    """
    freqs = np.asarray(freqs, dtype=np.int64)
    present = np.flatnonzero(freqs)
    f_d = freqs[present]
    upper_d = np.cumsum(f_d)
    cum_d = upper_d - f_d
    dense = np.zeros(256, dtype=np.int64)
    dense[:present.size] = (present << 24) | (f_d << 12) | cum_d
    # coarse: dense id of the symbol containing slot 16*b + uppers of
    # that symbol and the next (next-past-alphabet => 4096: never hit).
    id0 = np.searchsorted(upper_d, np.arange(256) * 16, side='right')
    up0 = upper_d[id0]
    up1 = np.where(id0 + 1 < present.size,
                   upper_d[np.minimum(id0 + 1, present.size - 1)],
                   1 << SCALE_BITS)
    coarse = ((up1 - 1) << 20) | ((up0 - 1) << 8) | id0
    # Second fixup can trigger in bucket b iff the candidate id0+1 ends
    # before the bucket does (some slot in [16b, 16b+16) maps past it).
    needs2 = bool(np.any(up1 < (np.arange(256) + 1) * 16))

    octet_pk = None
    if not np.any(f_d & 7):
        ids = np.searchsorted(upper_d, 8 * np.arange(512), side='right')
        octet_pk = (ids[0::4] | (ids[1::4] << 8) | (ids[2::4] << 16)
                    | (ids[3::4] << 24)).astype(np.uint32).view(np.int32)

    def to_i32(a):
        return a.astype(np.uint32).view(np.int32).reshape(2, 128)

    return to_i32(coarse), to_i32(dense), needs2, octet_pk
