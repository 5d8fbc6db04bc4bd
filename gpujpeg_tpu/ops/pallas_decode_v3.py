"""Segment-parallel Huffman decoder v3 (Pallas, lane-major layout).

v2 (pallas_decode.py) keeps per-segment state in (T, 1) columns; Mosaic
tiles those as (8, 128) vregs with 127/128 lanes dead, so every state op
costs as much as a full (T, 128) op (measured on-chip). v3 puts
**segments on lanes**: all state is (G, 128) with G = seg_tile/128, so
state ops touch G vregs instead of 16*G:

* **Stream fetch**: the per-segment current two words come from a
  transposed (Wcap, seg_tile) data tile by masked reduction over word
  rows — no gather, no relayout, unconditional every iteration.
* **Table lookups**: broadcast 128-entry halves + per-lane dynamic
  gather, all in the (G, 128) domain.
* **Coefficients** accumulate in a (64*G, 128) lane-major buffer
  (row k*G+g, lane l = coefficient k of segment g*128+l; k-major because
  ``pltpu.repeat`` tiles copies) updated with a repeat one-hot; the
  kernel output is reordered to scan order by one XLA transpose
  (bandwidth-bound).

Same block-synchronous structure and T.81 F.16 slow path as v2.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .pallas_decode import DecTables, QUICK_BITS, _gather128, _lane_gather

from ..runtime import pallas_call as _pcall
I32 = jnp.int32
U32 = jnp.uint32


def _bcast_lookup16(packed_table, idx, n_entries: int, h0: int = 0):
    """(G, 128) lookup in a 16-bit-packed flat table (two entries per
    i32 word) via broadcast halves + lane gather: packing halves the
    broadcast-halves scan, the dominant per-iteration cost of the
    decode loop. ``h0`` skips leading halves the caller knows no lane
    can index (one half == one 256-entry table slot): with DC slots
    ordered before AC slots, symbol B's AC-only lookups scan only the
    AC halves (round 5)."""
    G = idx.shape[0]
    n_half = n_entries // 256
    p = idx >> 1
    lo = p & 127
    out = None
    for h in range(h0, n_half):
        tbl = jnp.broadcast_to(
            packed_table[h * 128:(h + 1) * 128].reshape(1, 128), (G, 128))
        part = _lane_gather(tbl, lo)
        out = part if out is None else jnp.where((p >> 7) == h, part, out)
    return jnp.where((idx & 1) > 0, (out >> 16) & 0xFFFF, out & 0xFFFF)


def _pad1k(n: int) -> int:
    return -(-n // 1024) * 1024


def _collapse_lanes(x, G: int):
    """(R*G, 128) -> (R, G*128): collapse whole 128-lane row groups into
    the lane axis (vreg-aligned shape cast — the supported Mosaic
    reshape family; see entropy_v2._pack_rows_lanes)."""
    return x.reshape(x.shape[0] // G, G * 128)


def _delta_row(delta):
    """Pack the (n_slots, 17) value-index delta table into one 128-lane
    row at stride 18 (slot*18 + len; lane slot*18+17 stays 0 for the
    invalid s_len == 17, whose result is masked anyway), so the decode
    loop fetches delta[slot, s_len] with ONE lane gather. Traceable."""
    d = jnp.asarray(delta).astype(jnp.int32)
    n = d.shape[0]
    assert n * 18 <= 128, n     # JPEG allows at most 4 table slots
    row = jnp.pad(d, ((0, 0), (0, 1))).reshape(-1)
    return jnp.pad(row, (0, 128 - row.shape[0]))


def _pack16(table):
    """Pack a flat i32 table of <=16-bit entries two per word, padded to
    the 1024-element XLA layout tile for 1D VMEM operands. Traceable."""
    flat = jnp.asarray(table).reshape(-1).astype(jnp.int32)
    packed = flat[0::2] | (flat[1::2] << 16)
    pad = (-packed.shape[0]) % 1024
    if pad:
        packed = jnp.concatenate([packed, jnp.zeros((pad,), jnp.int32)])
    return packed


V3_OUT_BYTES = 4   # int32 coefficient output. Packing two 16-bit
# coefficients per word was built and measured in round 4 and LOST on
# chip (26.7 -> 37.4 ms at 8K Q75; an even/odd-split IDCT that avoided
# the unpack interleave still lost at 34.3): halving the 400 MB
# coefficient bytes does not pay for breaking XLA's relayout-into-
# matmul fusion, and the packed one-hot write slowed the kernel itself
# ~2-3 ms. The unpacked i32 layout is load-bearing — BENCHMARKS.md
# round-4.


def make_decode_kernel_v3(seg_tile: int, bps: int, wcap: int, n_slots: int,
                          interleaved_tpl: np.ndarray, ac_base: int = 0):
    """seg_tile must be a multiple of 128; wcap the per-segment word
    capacity (data arrives transposed as (wcap, S)).

    (A ``seg_rows_out`` variant that emitted (S, bps*64) segment rows
    via per-step in-VMEM transposes — to feed a fused Pallas decode
    tail — measured 34.5 vs 26.4 ms at 8K Q75 on chip and was deleted;
    BENCHMARKS.md round-3 table.)

    GPUJPEG_TPU_DEC_DOUBLE (bench-only, read at kernel-build time):
    comma-separated stage names whose computation runs TWICE per loop
    iteration, the duplicate folded in under a runtime-zero mask —
    output stays bit-identical while the time delta vs baseline
    measures that stage's marginal cost on chip (stubbing a stage OUT
    would corrupt decoded symbols and change the loop's iteration
    count, so ablation here must add, not remove). Stages: ``fetch``
    (the two masked-reduction word fetches), ``quick`` (the quick-table
    broadcast scans), ``slow`` (maxcode compares + delta gather +
    huffval scan), ``cf`` (the repeat one-hot coefficient write),
    ``val`` (extract_val sign extension), ``dc`` (DC-prediction plane
    selects), ``cond`` (the cross-lane loop-condition any-reduce).

    GPUJPEG_TPU_DEC_SYM1=1 (bench-only, build-time): decode ONE symbol
    per loop iteration (symbol B disabled) — output identical, ~2x the
    iterations; against the 2-symbol baseline this solves for
    fixed-per-iteration vs per-symbol cost."""
    import os
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _DBL = frozenset(filter(None, os.environ.get(
        "GPUJPEG_TPU_DEC_DOUBLE", "").split(",")))
    _SYM1 = bool(os.environ.get("GPUJPEG_TPU_DEC_SYM1"))

    G = seg_tile // 128
    uses_tpl = bool((interleaved_tpl >= 0).any())
    tpl_np = interleaved_tpl.astype(np.int32)
    SLOW_LENS = tuple(range(QUICK_BITS + 1, 17))

    NSL = len(SLOW_LENS)
    OUT_DT = jnp.int32
    # One block per grid step. The round-3 on-chip sweep measured KB>1
    # (multiple blocks per step to amortize the per-step prologue)
    # strictly slower — 26.4/27.6/30.4/35.7 ms at KB=1/2/4/8, 8K Q75 —
    # so the knob is retired and the one-block structure is the only
    # form (the bigger out block displaced double-buffered VMEM).
    KB = 1
    # The round-3 on-chip bisect (BENCHMARKS.md) settled three r02
    # formulations that had shipped unmeasured; the r01 forms below are
    # each faster because a jnp.any over ~seg_tile lanes is almost
    # always true in lockstep, so gating on it was pure overhead:
    # coefficients ride in a loop-CARRIED array with one merged one-hot
    # select per iteration (not gated out_ref range writes), the
    # >QUICK_BITS slow path runs inline (no lax.cond), and the f1 word
    # fetch is unconditional.

    def kernel(dataT_ref, segcomp_ref, segnblk_ref,
               quick_ref, maxcode_ref, dlrow_ref, huffval_ref,
               dcslot_ref, acslot_ref,
               *rest, pixels=False, n_q=0):
        if pixels:
            wq_ref, qc_ref, out_ref, bitpos, dcpred, slowsc = rest
        else:
            out_ref, bitpos, dcpred, slowsc = rest
        b = pl.program_id(1)

        @pl.when(b == 0)
        def _():
            bitpos[:] = jnp.zeros((G, 128), I32)
            dcpred[:] = jnp.zeros((4 * G, 128), I32)

        if uses_tpl:
            comp = jnp.full((G, 128), tpl_np[0], I32)
            for slot_i in range(1, len(tpl_np)):
                comp = jnp.where(b == slot_i,
                                 jnp.full((G, 128), tpl_np[slot_i], I32),
                                 comp)
        else:
            comp = segcomp_ref[:]
        dslot = jnp.zeros((G, 128), I32)
        aslot = jnp.zeros((G, 128), I32)
        for ci in range(4):
            dslot = jnp.where(comp == ci, dcslot_ref[ci], dslot)
            aslot = jnp.where(comp == ci, acslot_ref[ci], aslot)

        def build_slow_tables():
            """Per-lane slow-path maxcode thresholds (DC and AC, per code
            length): 2*n_slots selects per length. (Value-index deltas
            are NOT per-length arrays anymore: ``lookup_sym`` fetches
            delta[slot, s_len] with one lane gather from ``dlrow_ref``.)"""
            mc_dc, mc_ac = {}, {}
            for l in SLOW_LENS:
                md = jnp.zeros((G, 128), I32)
                ma = jnp.zeros((G, 128), I32)
                for t in range(n_slots):
                    md = jnp.where(dslot == t, maxcode_ref[t, l], md)
                    ma = jnp.where(aslot == t, maxcode_ref[t, l], ma)
                mc_dc[l], mc_ac[l] = md, ma
            return mc_dc, mc_ac

        if uses_tpl:
            # interleaved: slots depend on b (via the MCU template), so
            # the build runs per grid step — cheap, the selects are
            # scalar broadcasts
            mc_dc, mc_ac = build_slow_tables()
        else:
            # non-interleaved: slots are b-invariant — build once at
            # b == 0 into scratch carried across the b grid dimension
            # (re-hoisting per (tile, b) costs 2*n_slots*NSL vreg selects
            # per step, bps-fold more than needed)
            @pl.when(b == 0)
            def _():
                mcd, mca = build_slow_tables()
                for i, l in enumerate(SLOW_LENS):
                    slowsc[(0 * NSL + i) * G:(0 * NSL + i) * G + G] = mcd[l]
                    slowsc[(1 * NSL + i) * G:(1 * NSL + i) * G + G] = mca[l]

            mc_dc, mc_ac = {}, {}
            for i, l in enumerate(SLOW_LENS):
                mc_dc[l] = slowsc[(0 * NSL + i) * G:(0 * NSL + i) * G + G]
                mc_ac[l] = slowsc[(1 * NSL + i) * G:(1 * NSL + i) * G + G]

        word_iota = jax.lax.broadcasted_iota(I32, (wcap, 128), 0)

        # runtime zero for _DBL stage doubling: nblk >= 0 so the sign
        # shift is 0, but the compiler cannot prove it (runtime data),
        # so duplicated stages fold in without being CSE'd or DCE'd.
        # Full (G, 128) shape: Mosaic cannot broadcast (1, 1) across
        # both sublanes and lanes in one op (measured on chip).
        rz = segnblk_ref[:] >> 31

        def fetch1(wordpos):
            """Word [wp] per segment lane, by masked reduction over the
            transposed data rows. Runs in int32 (Mosaic cannot reduce
            unsigned ints): exactly one row is non-zero per lane, so the
            sum is an exact bit pattern. wordpos: (G, 128)."""
            outs = []
            for g in range(G):
                dat = dataT_ref[:, g * 128:(g + 1) * 128]   # (wcap, 128)
                m = word_iota == wordpos[g:g + 1, :]
                outs.append(jnp.sum(jnp.where(m, dat, 0), axis=0,
                                    keepdims=True))
            return jnp.concatenate(outs, axis=0).astype(U32)    # (G, 128)

        # k-major coefficient rows (row = pos*G + g, pos = bcur*64 + k):
        # pltpu.repeat TILES copies, so repeated (G,128) state aligns
        # with g = row % G
        nblk = segnblk_ref[:]
        active0 = (b * KB < nblk).astype(I32)        # (G,128)
        kpos = jnp.zeros((G, 128), I32)
        bcur0 = jnp.zeros((G, 128), I32)             # block within step
        # shift-register stream window: (w0, w1, w2) ride in loop state;
        # each iteration decodes TWO symbols (<= 62 bits), so the window
        # advances by at most two words and runs two masked-reduction
        # fetches — the same fetch count per symbol as one-at-a-time,
        # but half the loop/control/coefficient-write overhead
        wp0 = bitpos[:] >> 5
        w0_init = fetch1(wp0)
        w1_init = fetch1(wp0 + 1)
        w2_init = fetch1(wp0 + 2)

        def mkview(a, bvec, s):
            su = jnp.clip(s, 0, 31).astype(U32)
            return jnp.where(s > 0,
                             (a << su) | (bvec >> (jnp.uint32(32) - su)), a)

        def lookup_sym(view, is_dc, slot, h0=0):
            """One Huffman symbol from a 32-bit view: (sym, ln). The
            >QUICK_BITS slow path (T.81 F.16) runs inline every
            iteration: with ~seg_tile lanes in lockstep some lane misses
            the 8-bit lookahead nearly always, so branching on it
            (lax.cond over a cross-lane any) measured slower on chip.

            Branch-free length: the scaled maxcode boundaries are
            non-decreasing in l (build_dec_tables_v2: ``code<<(16-l)``;
            an empty length keeps the previous boundary exactly), so the
            first l with peek16 < mc[l] equals QUICK_BITS+1 + count of
            (peek16 >= mc[l]) — NSL independent compares with no select
            chain; count == NSL means invalid (s_len == 17). The
            value-index delta comes from ONE lane gather in the packed
            (slot, len) row ``dlrow_ref`` instead of an NSL-deep select
            chain per table class."""
            peek16 = (view >> jnp.uint32(16)).astype(I32)
            q_idx = slot * (1 << QUICK_BITS) + (peek16 >> (16 - QUICK_BITS))
            q = _bcast_lookup16(quick_ref[:], q_idx,
                                n_slots * (1 << QUICK_BITS), h0)
            if "quick" in _DBL:   # bench-only stage doubling
                q = q | (rz & _bcast_lookup16(
                    quick_ref[:], q_idx + rz,
                    n_slots * (1 << QUICK_BITS), h0))
            q_len = q & 31
            q_sym = q >> 5

            cnt = None
            for l in SLOW_LENS:
                mc = jnp.where(is_dc, mc_dc[l], mc_ac[l]) if is_dc \
                    is not None else mc_ac[l]
                ge = (peek16 >= mc).astype(I32)
                cnt = ge if cnt is None else cnt + ge
            s_len = (QUICK_BITS + 1) + cnt
            s_code = jax.lax.shift_right_logical(
                peek16, jnp.maximum(16 - s_len, 0))
            dlt = _gather128(dlrow_ref[:], slot * 18 + s_len)
            v_idx = jnp.clip(s_code + dlt, 0, 255)
            s_sym = _bcast_lookup16(huffval_ref[:], slot * 256 + v_idx,
                                    n_slots * 256, h0)
            if "slow" in _DBL:    # bench-only stage doubling
                cnt2 = None
                for l in SLOW_LENS:
                    mc = jnp.where(is_dc, mc_dc[l], mc_ac[l]) if is_dc \
                        is not None else mc_ac[l]
                    ge = (peek16 + rz >= mc).astype(I32)
                    cnt2 = ge if cnt2 is None else cnt2 + ge
                s_len2 = (QUICK_BITS + 1) + cnt2
                dlt2 = _gather128(dlrow_ref[:], slot * 18 + s_len2)
                v2 = jnp.clip(jax.lax.shift_right_logical(
                    peek16, jnp.maximum(16 - s_len2, 0)) + dlt2, 0, 255)
                s_sym = s_sym | (rz & _bcast_lookup16(
                    huffval_ref[:], slot * 256 + v2, n_slots * 256))

            use_quick = q_len > 0
            sym = jnp.where(use_quick, q_sym, s_sym)
            ln = jnp.where(use_quick, q_len, s_len)
            bad = ln == 17
            sym = jnp.where(bad, 0, sym)
            ln = jnp.where(bad, 1, ln)
            return sym, ln

        def extract_val(view, ln, cat):
            vraw = ((view << ln.astype(U32)) >>
                    (jnp.uint32(32) - jnp.clip(cat, 1, 16).astype(U32))
                    ).astype(I32)
            vraw = jnp.where(cat > 0, vraw, 0)
            half = jnp.where(cat > 0, 1 << jnp.maximum(cat - 1, 0), 0)
            return jnp.where((cat > 0) & (vraw < half),
                             vraw - (1 << cat) + 1, vraw)

        # r01-style merged write support: coefficient rows ride in loop
        # state (k-major row = pos*G + g over all KB*64 positions).
        # (An int16 accumulator — half the vregs of this, the largest
        # per-iteration chain — was tried in round 4: Mosaic on v5e
        # rejects i16 vector compares, "Target does not support this
        # comparison". Packing two coefficients per i32 word was ALSO
        # tried and lost 26.7 -> 34-37 ms on chip — see V3_OUT_BYTES.)
        onehot_cbase = (jax.lax.broadcasted_iota(
            I32, (KB * 64 * G, 128), 0) // G)

        def cond(st):
            act, *_ = st
            r = jnp.any(act > 0)
            if "cond" in _DBL:    # bench-only stage doubling (rz == 0)
                r = r & jnp.any((act + rz) > 0)
            return r

        def body(st):
            act_i, bcur, kp, cf, bp, dcp, w0, w1, w2 = st
            act = act_i > 0
            soff = bp & 31

            # ---- symbol A (may be the block's DC) ----
            viewA = mkview(w0, w1, soff)
            is_dc = kp == 0
            slotA = jnp.where(is_dc, dslot, aslot)
            symA, lnA = lookup_sym(viewA, is_dc, slotA)
            catA = jnp.where(is_dc, symA, symA & 15)
            runA = jnp.where(is_dc, 0, symA >> 4)
            valA = extract_val(viewA, lnA, catA)
            if "val" in _DBL:     # bench-only stage doubling
                valA = valA | (rz & extract_val(viewA, lnA + rz, catA))

            # DC prediction over 4 per-component planes
            dc_prev = jnp.zeros((G, 128), I32)
            for c in range(4):
                dc_prev = jnp.where(comp == c, dcp[c * G:(c + 1) * G],
                                    dc_prev)
            if "dc" in _DBL:      # bench-only stage doubling
                dc2 = jnp.zeros((G, 128), I32)
                for c in range(4):
                    dc2 = jnp.where(comp + rz == c,
                                    dcp[c * G:(c + 1) * G], dc2)
                dc_prev = dc_prev | (rz & dc2)
            dc_new = dc_prev + valA
            wvalA = jnp.where(is_dc, dc_new, valA)
            upd = act & is_dc
            parts = []
            for c in range(4):
                plane = dcp[c * G:(c + 1) * G]
                parts.append(jnp.where(upd & (comp == c), dc_new, plane))
            dcp = jnp.concatenate(parts, axis=0)

            wposA = jnp.where(is_dc, 0, jnp.clip(kp + runA, 0, 63))
            is_zrlA = (~is_dc) & (catA == 0) & (runA == 15)
            is_eobA = (~is_dc) & (catA == 0) & (runA != 15)
            writeA = act & (is_dc |
                            ((~is_dc) & (catA > 0) & (kp + runA <= 63)))
            kA = jnp.where(
                is_dc, 1,
                jnp.where(is_zrlA, kp + 16,
                          jnp.where(is_eobA, 64, kp + runA + 1)))
            doneA = kA >= 64
            cA = jnp.where(act, lnA + catA, 0)

            # ---- symbol B (never DC: kp == 0 only at block start) ----
            if _SYM1:             # bench-only: one symbol per iteration
                actB = act & (doneA & ~doneA)     # runtime False
                valB = jnp.zeros((G, 128), I32)
                writeB = actB
                wposB = jnp.zeros((G, 128), I32)
                kB = kA
                doneB = doneA
                cB = jnp.zeros((G, 128), I32)
            else:
                actB = act & ~doneA
                sB = soff + cA
                viewB = jnp.where(sB < 32, mkview(w0, w1, sB),
                                  mkview(w1, w2, sB - 32))
                symB, lnB = lookup_sym(viewB, None, aslot, ac_base)
                catB = symB & 15
                runB = symB >> 4
                valB = extract_val(viewB, lnB, catB)
                if "val" in _DBL:  # bench-only stage doubling
                    valB = valB | (rz & extract_val(viewB, lnB + rz,
                                                    catB))
                kpB = kA
                wposB = jnp.clip(kpB + runB, 0, 63)
                is_zrlB = (catB == 0) & (runB == 15)
                is_eobB = (catB == 0) & (runB != 15)
                writeB = actB & (catB > 0) & (kpB + runB <= 63)
                kB = jnp.where(is_zrlB, kpB + 16,
                               jnp.where(is_eobB, 64, kpB + runB + 1))
                doneB = kB >= 64
                cB = jnp.where(actB, lnB + catB, 0)

            # merged coefficient writes (one pass, B over A) into the
            # loop-carried k-major array: one repeat-one-hot select over
            # all rows per iteration. (The r02 alternative — gated
            # per-range writes through out_ref — measured slower on
            # chip: its per-range jnp.any gates are almost always true.)
            # A's and B's positions never collide (wposB >= kA > wposA),
            # so the B-over-A select order is free. Positions are
            # absolute within the step: bcur*64 + k. Write masks fold
            # into sentinel positions (127 matches no row), saving two
            # repeats and two mask ands over the full row set.
            posA = jnp.where(writeA, bcur * 64 + wposA, 127)
            wA = pltpu.repeat(posA, KB * 64, axis=0)
            vA = pltpu.repeat(wvalA, KB * 64, axis=0)
            if _SYM1:
                cf = jnp.where(onehot_cbase == wA, vA, cf)
            else:
                posB = jnp.where(writeB, bcur * 64 + wposB, 127)
                wB = pltpu.repeat(posB, KB * 64, axis=0)
                vB = pltpu.repeat(valB, KB * 64, axis=0)
                cf = jnp.where(
                    onehot_cbase == wB, vB,
                    jnp.where(onehot_cbase == wA, vA, cf))
            if "cf" in _DBL:      # bench-only stage doubling: positions
                # never collide A/B, so re-applying the identical select
                # chain reproduces cf exactly
                wA2 = pltpu.repeat(posA + rz, KB * 64, axis=0)
                vA2 = pltpu.repeat(wvalA + rz, KB * 64, axis=0)
                if _SYM1:
                    cf = jnp.where(onehot_cbase == wA2, vA2, cf)
                else:
                    wB2 = pltpu.repeat(posB + rz, KB * 64, axis=0)
                    vB2 = pltpu.repeat(valB + rz, KB * 64, axis=0)
                    cf = jnp.where(
                        onehot_cbase == wB2, vB2,
                        jnp.where(onehot_cbase == wA2, vA2, cf))

            bp_new = bp + cA + cB
            delta = (bp_new >> 5) - (bp >> 5)             # 0, 1 or 2
            wpn = bp_new >> 5
            # f2 feeds every delta>=1 lane (delta==0 lanes refetch their
            # current w2 — harmless); f1 only delta==2 lanes, but
            # skipping it behind a cross-lane any measured no faster on
            # chip (some lane needs it nearly every iteration), so both
            # run unconditionally. (A windowed dynamic-slice fetch
            # variant measured 650x SLOWER on hardware at Q95 — round-3
            # sweep — and was deleted.)
            f2 = fetch1(wpn + 2)
            f1 = fetch1(wpn + 1)
            if "fetch" in _DBL:   # bench-only stage doubling
                rzu = rz.astype(U32)
                f2 = f2 | (rzu & fetch1(wpn + 2 + rz))
                f1 = f1 | (rzu & fetch1(wpn + 1 + rz))
            w0 = jnp.where(delta == 0, w0, jnp.where(delta == 1, w1, w2))
            w1 = jnp.where(delta == 0, w1, jnp.where(delta == 1, w2, f1))
            w2 = f2
            # block completion: a lane whose block finished (via A with
            # no B, or via B) advances to the next block of this step
            # and stays active while one exists for its segment
            adv = act & (doneA | (actB & doneB))
            bcur = jnp.where(adv, bcur + 1, bcur)
            more = (bcur < KB) & ((b * KB + bcur) < nblk)
            kp = jnp.where(adv, 0, jnp.where(act, kB, kp))
            act_i = jnp.where(adv, more.astype(I32), act_i)
            return act_i, bcur, kp, cf, bp_new, dcp, w0, w1, w2

        cf0 = jnp.zeros((KB * G * 64, 128), I32)
        act, _, kp, cf_f, bp_f, dcp_f, _, _, _ = jax.lax.while_loop(
            cond, body, (active0, bcur0, kpos, cf0, bitpos[:], dcpred[:],
                         w0_init, w1_init, w2_init))
        bitpos[:] = bp_f
        dcpred[:] = dcp_f
        if pixels:
            # In-kernel fused dequant+IDCT + pixel-word pack (round 5):
            # the coefficients are ALREADY in VMEM as k-major (64*G,
            # 128) rows — collapse G row-groups into lanes and the MXU
            # contracts the coefficient dim directly: (64, 64) @ (64,
            # G*128) per grid step. One matmul per unique quant table,
            # lane-selected by component (scan boundaries can split a
            # tile); the +128/rint/clip epilogue matches
            # dct.dequant_idct_device exactly, and the 4-per-word pack
            # is sublane-strided (cheap). Output block (16, G, 128):
            # 4x less HBM write than the coefficient layouts.
            cff = _collapse_lanes(cf_f, G).astype(jnp.float32)
            qsl = jnp.zeros((G, 128), I32)
            for ci in range(4):
                qsl = jnp.where(comp == ci, qc_ref[ci], qsl)
            qrow = _collapse_lanes(qsl, G)            # (1, G*128)
            px = None
            for qi in range(n_q):
                # W rows are the (zig-zag) coefficient index k, cols the
                # pixel index p (dct.idct_operator_f32 is applied as
                # x @ W) — contract k on both sides: y[p, lane]
                y = jax.lax.dot_general(
                    wq_ref[qi], cff, (((0,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32) + 128.0
                yi = jnp.clip(jnp.rint(y), 0.0, 255.0).astype(I32)
                px = yi if px is None else jnp.where(qrow == qi, yi, px)
            # 4-per-word pack WITHOUT strided slices (Mosaic lowers
            # them via a gather that rejects): collapse groups of 4
            # rows into the lane axis (vreg-aligned), then the four
            # byte sources are contiguous static lane slices
            L = G * 128
            x4 = px.reshape(16, 4 * L)
            pw = (x4[:, 0 * L:1 * L] | (x4[:, 1 * L:2 * L] << 8)
                  | (x4[:, 2 * L:3 * L] << 16)
                  | (x4[:, 3 * L:4 * L] << 24))       # (16, G*128)
            out_ref[0] = pw.reshape(16, G, 128)
        else:
            out_ref[0, :, :] = cf_f.astype(OUT_DT)

    def run_raw(dataT, seg_comp, seg_nblk, tabs: DecTables,
                dc_slot: np.ndarray, ac_slot: np.ndarray):
        """Kernel-native coefficient output: (bps//KB, n_tiles, KB, 64,
        G, 128) with the k (coefficient) axis third-from-minor — segment
        s = (t*G + g)*128 + l, block slot = bO*KB + kb."""
        S = dataT.shape[1]
        n_tiles = S // seg_tile
        grid = (n_tiles, bps // KB)
        out_shape = jax.ShapeDtypeStruct(
            (bps // KB, n_tiles * KB * G * 64, 128), OUT_DT)
        out_spec = pl.BlockSpec((1, KB * G * 64, 128),
                                lambda i, b: (b, i, 0),
                                memory_space=pltpu.VMEM)
        out = _pcall(
            kernel,
            out_shape=out_shape,
            grid=grid,
            in_specs=[
                pl.BlockSpec((wcap, seg_tile), lambda i, b: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, 128), lambda i, b: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, 128), lambda i, b: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_pad1k(n_slots * (1 << QUICK_BITS) // 2),),
                             lambda i, b: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_slots, 18), lambda i, b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128,), lambda i, b: (0,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_pad1k(n_slots * 128),), lambda i, b: (0,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4,), lambda i, b: (0,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4,), lambda i, b: (0,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((G, 128), I32),       # bitpos
                pltpu.VMEM((4 * G, 128), I32),   # dcpred planes
                # slow-path tables; unused in the interleaved case
                # (rebuilt per b there), so keep it a dummy row
                pltpu.VMEM(((1 if uses_tpl else 2 * NSL * G), 128), I32),
            ],
        )(dataT, seg_comp, seg_nblk,
          _pack16(tabs.quick), jnp.asarray(tabs.maxcode),
          _delta_row(tabs.delta), _pack16(tabs.huffval),
          jnp.asarray(dc_slot), jnp.asarray(ac_slot))
        return out.reshape(bps // KB, n_tiles, KB, 64, G, 128)

    def run_pixels(dataT, seg_comp, seg_nblk, tabs: DecTables,
                   dc_slot: np.ndarray, ac_slot: np.ndarray,
                   Wq, q_of_comp):
        """Fused huffman+dequant+IDCT: pixel-WORD output (bps, 16,
        S_pad) — block slot b of every segment, 16 int32 words packing
        the block's 64 natural-order pixels 4-per-word LE. ``Wq``:
        (n_q, 64, 64) f32 stacked idct_operator_f32 tables;
        ``q_of_comp``: (4,) i32 component -> Wq row. The IDCT runs on
        the MXU inside the kernel (operands already in VMEM), so the
        kernel writes 4x fewer bytes than the coefficient layouts and
        no XLA pass ever sees the 400 MB coefficient array."""
        import functools
        n_q = int(Wq.shape[0])
        S = dataT.shape[1]
        n_tiles = S // seg_tile
        grid = (n_tiles, bps // KB)
        out_shape = jax.ShapeDtypeStruct(
            (bps // KB, KB * 16, n_tiles * G, 128), OUT_DT)
        out_spec = pl.BlockSpec((1, KB * 16, G, 128),
                                lambda i, b: (b, 0, i, 0),
                                memory_space=pltpu.VMEM)
        out = _pcall(
            functools.partial(kernel, pixels=True, n_q=n_q),
            out_shape=out_shape,
            grid=grid,
            in_specs=[
                pl.BlockSpec((wcap, seg_tile), lambda i, b: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, 128), lambda i, b: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, 128), lambda i, b: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_pad1k(n_slots * (1 << QUICK_BITS) // 2),),
                             lambda i, b: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_slots, 18), lambda i, b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128,), lambda i, b: (0,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_pad1k(n_slots * 128),), lambda i, b: (0,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4,), lambda i, b: (0,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4,), lambda i, b: (0,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_q, 64, 64), lambda i, b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4,), lambda i, b: (0,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((G, 128), I32),       # bitpos
                pltpu.VMEM((4 * G, 128), I32),   # dcpred planes
                pltpu.VMEM(((1 if uses_tpl else 2 * NSL * G), 128), I32),
            ],
        )(dataT, seg_comp, seg_nblk,
          _pack16(tabs.quick), jnp.asarray(tabs.maxcode),
          _delta_row(tabs.delta), _pack16(tabs.huffval),
          jnp.asarray(dc_slot), jnp.asarray(ac_slot),
          jnp.asarray(Wq), jnp.asarray(q_of_comp))
        return out.reshape(bps, 16, S)

    def run(dataT, seg_comp, seg_nblk, tabs: DecTables,
            dc_slot: np.ndarray, ac_slot: np.ndarray):
        S = dataT.shape[1]
        o = run_raw(dataT, seg_comp, seg_nblk, tabs, dc_slot, ac_slot)
        # reorder to scan rows: tile-local row (kb*64 + k)*G + g, so
        # out[bo, t*(64*KB*G) + (kb*64+k)*G + g, l]
        #   -> row ((t*G+g)*128 + l)*bps + bo*KB + kb, k
        o = jnp.transpose(o, (1, 4, 5, 0, 2, 3))   # (t, g, l, bO, kb, 64)
        return o.reshape(S * bps, 64)

    run.raw = run_raw
    run.pixels = run_pixels
    run.dims = (KB, G)
    return run
