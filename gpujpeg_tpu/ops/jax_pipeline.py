"""Device (JAX/TPU) pipeline orchestration.

Builds and caches jitted end-to-end compute functions per coder plan:

* encode: raw pixels -> preprocess -> fused DCT+quant (MXU) -> vectorized
  segment-parallel Huffman -> per-segment bytes (one device round trip for
  lengths + one compaction gather — mirroring the reference's single
  output-size sync, gpujpeg_huffman_gpu_encoder.cu:1158).
* decode: entropy bytes -> lockstep segment-parallel Huffman -> fused
  dequant+IDCT (MXU) -> postprocess -> raw pixels.

Everything inside the jit boundary has static shapes derived from the
plan; variable-length byte buffers are bucketed to powers of two so a
video stream of same-geometry frames reuses one compiled executable.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..plan import CoderPlan
from ..params import ImageParameters
from .blocks import blocks_to_plane, plane_to_blocks
from .dct import (
    dequant_idct_device,
    dequant_idct_words,
    fdct_operator_f32,
    fdct_quant_device,
    idct_operator_f32,
)
from .huffman_decode import (
    build_dec_geometry,
    build_dec_tables,
    huffman_decode_kernel,
)
from .huffman_encode import (
    build_enc_geometry,
    build_enc_tables,
    compact_segments,
    huffman_encode_kernel,
)
from .preprocess import postprocess, preprocess


def _bucket(n: int, minimum: int = 4096) -> int:
    b = minimum
    while b < n:
        b <<= 1
    return b


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------

_ENC_CACHE: dict = {}

#: sentinel from _call_with_downgrade: a runtime downgrade switched the
#: pipeline from the words input form to the flat one — re-prepare the
#: input and call again
_REPREP = object()


class _EncContext:
    """Device encoder (v2 entropy): preprocess -> MXU DCT+quant over the
    segment-uniform row layout -> gather/scatter-free entropy encode
    (Pallas per-lane table gathers on TPU, plain-XLA reference elsewhere).
    See ops/entropy_v2.py for the design rationale."""

    def __init__(self, plan: CoderPlan, quant_zz: dict, huff: dict):
        from .entropy_v2 import (
            block_byte_budget, build_packed_tables, build_uniform_geometry,
            seg_budget_for_quality)

        self.plan = plan
        self._quant_zz = quant_zz
        self._tabs = build_packed_tables(huff)
        from ..runtime import use_pallas_default
        self._use_pallas = use_pallas_default()

        # tier 1: typical-content segment budget; tier 2 (lazy): worst case
        geo_probe = build_uniform_geometry(plan)
        budget = seg_budget_for_quality(plan.params.quality, geo_probe.bps)
        self.geo = build_uniform_geometry(
            plan, cap_bytes_per_block=block_byte_budget(plan.params.quality),
            seg_byte_budget=min(budget, geo_probe.cap_seg_words * 4))
        self.cap_seg_bytes = self.geo.cap_seg_words * 4
        self.cap_out_bytes = self.geo.cap_out_bytes
        self.n_pad_segments = self.geo.n_segments
        #: kernel variants disabled at runtime after a device failure
        #: ("fused_full"/"fused"); checked by _build_fn so a downgrade
        #: sticks for this context (and, via the shared set, its tier-2
        #: sibling) without mutating process-global os.environ
        self._disabled: set = set()
        self.fn = self._build_fn(self.geo)
        self._tier2: "_EncContext | None" = None

    def tier2(self) -> "_EncContext":
        """Worst-case-capacity context, built lazily on tier-1 overflow."""
        if self._tier2 is None:
            from .entropy_v2 import build_uniform_geometry
            ctx = object.__new__(_EncContext)
            ctx.plan = self.plan
            ctx._quant_zz = self._quant_zz
            ctx._tabs = self._tabs
            ctx._use_pallas = self._use_pallas
            ctx.geo = build_uniform_geometry(self.plan)
            ctx.cap_seg_bytes = ctx.geo.cap_seg_words * 4
            ctx.cap_out_bytes = ctx.geo.cap_out_bytes
            ctx.n_pad_segments = ctx.geo.n_segments
            # share the disabled-variant set: a variant that failed on
            # the tier-1 geometry must not be rebuilt (and re-fail after
            # another multi-second compile) on the tier-2 retry
            ctx._disabled = self._disabled
            ctx.fn = ctx._build_fn(ctx.geo)
            ctx._tier2 = ctx
            self._tier2 = ctx
        return self._tier2

    def batched_fn(self, fn=None):
        """jit(vmap(fn)): B same-geometry frames in ONE device launch —
        the leading-batch-dim form of the reference's per-stream frame
        pipelining (SURVEY §2.2 row 5). Amortizes per-launch dispatch +
        small-grid underutilization, which dominates at HD sizes.
        Bit-identical per frame to fn (tested through the real kernels
        in interpreter mode). Keyed on fn identity so a runtime kernel
        downgrade that rebuilds fn invalidates the batched wrapper.
        ``fn`` selects the input form (defaults to the primary)."""
        cur = fn if fn is not None else self.fn
        ent = getattr(self, "_batched", None)
        if ent is None or ent[0] is not cur:
            ent = (cur, jax.jit(jax.vmap(cur)))
            self._batched = ent
        return ent[1]

    #: rows-per-chunk target for the lax.map-chunked encode of very large
    #: plans (16K plans otherwise materialize ~18 GB of (n_rows, ·) f32/u32
    #: intermediates at once and OOM a 16 GB chip)
    CHUNK_ROWS = 1 << 20

    def _build_fn(self, geo):
        from ..tables import dct_zigzag_operator
        from .entropy_v2 import encode_rows_arrays

        plan = self.plan
        quant_zz = self._quant_zz
        tabs = self._tabs
        use_pallas = self._use_pallas

        D64, bias64 = dct_zigzag_operator()
        D = jnp.asarray(D64.astype(np.float32))
        bias = jnp.asarray(bias64.astype(np.float32))
        n_qt = max(c.quant_table_index for c in plan.components) + 1
        n_q = max(n_qt, 2)
        qdiv_h = np.ones((n_q, 64), np.float32)
        for qi in range(n_q):
            if qi in quant_zz:
                qdiv_h[qi] = np.maximum(np.asarray(quant_zz[qi], np.float32),
                                        1.0)
        qdiv = jnp.asarray(qdiv_h)

        # two-blocks-per-row DCT: (N/2, 128) @ blockdiag(D, D) runs the
        # MXU at full lane width (measured ~25% faster than the padded
        # (N, 64) @ (64, 64) form, bit-identical)
        D2_h = np.zeros((128, 128), np.float32)
        D2_h[:64, :64] = D64
        D2_h[64:, 64:] = D64
        D2 = jnp.asarray(D2_h)
        bias2 = jnp.asarray(np.concatenate([bias64, bias64])
                            .astype(np.float32))
        q2tab = jnp.asarray(np.stack(
            [np.concatenate([qdiv_h[i], qdiv_h[j]])
             for i in range(n_q) for j in range(n_q)]))

        def dct_quant_packed(pb2, qidx, q2t):
            """pb2 (M, 128) u8 two blocks per row -> (M, 128) i32.
            q2t is a runtime ARGUMENT: quantization divides by embedded
            constants get strength-reduced by XLA, changing float
            rounding and breaking byte-identity (CLAUDE.md invariant)."""
            y = jax.lax.dot_general(
                pb2.astype(jnp.float32), D2, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32) - bias2
            return jnp.rint(y / q2t[qidx]).astype(jnp.int32)

        # uniform rows gather straight from plane-order blocks
        NB = plan.n_blocks
        spp = np.append(plan.block_plane_idx, plan.n_blocks)  # scan -> plane
        idx_plane = spp[np.minimum(geo.coeff_idx, NB)]
        idx_plane[geo.coeff_idx >= NB] = plan.n_blocks        # dummy row
        idx_plane_j = jnp.asarray(idx_plane)
        cls_rows = jnp.asarray(geo.block_cls)
        # Non-interleaved plans with segment counts that divide evenly have
        # plane order == uniform-row order; skipping the (n_rows, 64) row
        # gather (XLA can't see it's the identity) saves ~15 ms at 8K.
        identity_gather = bool(
            np.array_equal(idx_plane, np.arange(geo.n_rows, dtype=np.int64)))
        packed_dct = identity_gather and geo.n_rows % 2 == 0
        if packed_dct:
            cls_h = np.asarray(geo.block_cls).reshape(-1, 2)
            qidx_all = jnp.asarray(cls_h[:, 0] * n_q + cls_h[:, 1])

        S = geo.n_segments

        def stage_pre(raw):
            planes = preprocess(raw, plan.image, plan, jnp)
            # keep XLA from fusing the pixel chain into the 8x8 blockify
            # transpose (measured 3x blowup at 8K when fused)
            planes = jax.lax.optimization_barrier(tuple(planes))
            return jnp.concatenate([plane_to_blocks(p, jnp) for p in planes])

        # geometry tensors AND quant divisors are jit ARGUMENTS (see
        # fn_chunked note / dct_quant_packed): the staged fns receive
        # them per call from the arrays held here
        dct_args = ((qidx_all, q2tab) if packed_dct else
                    (cls_rows, qdiv) if identity_gather else
                    (idx_plane_j, cls_rows, qdiv))
        ent_args = (jnp.asarray(geo.block_cls), jnp.asarray(geo.block_valid),
                    jnp.asarray(geo.dc_dist), jnp.asarray(geo.seg_rst_marker),
                    jnp.asarray(geo.seg_has_rst))

        def stage_dct(pblocks, *args):
            if packed_dct:
                qidx_a, q2t = args
                return dct_quant_packed(
                    pblocks.reshape(-1, 128), qidx_a, q2t).reshape(-1, 64)
            if identity_gather:
                cls_r, qd = args
                x = pblocks.astype(jnp.float32)              # (n_rows, 64)
            else:
                idx_j, cls_r, qd = args
                pblocks = jnp.concatenate(
                    [pblocks, jnp.zeros((1, 64), pblocks.dtype)])
                x = pblocks[idx_j].astype(jnp.float32)
            y = jax.lax.dot_general(
                x, D, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32) - bias
            return jnp.rint(y / qd[cls_r]).astype(jnp.int32)

        def stage_entropy(rows, cls, valid, dcd, rst, hrst):
            return encode_rows_arrays(
                rows, cls, valid, dcd, rst, hrst, geo.dc_distances,
                geo.bps, geo.cap_seg_words, geo.cap_out_bytes,
                geo.words_per_block, tabs, use_pallas, geo.max_stuff)

        # per-stage jits for perf_stats mode (the reference records its
        # CUDA-event phase timers only when param.perf_stats is set,
        # gpujpeg_common_internal.h:71-120); the staged run is the real
        # pipeline split at stage boundaries
        self._stage_fns = (jax.jit(stage_pre), jax.jit(stage_dct),
                           jax.jit(stage_entropy))
        self._stage_args = (dct_args, ent_args)

        # fused-kernel eligibility: identity row order (scan order ==
        # plane order, consecutive in-segment blocks => DC distance 1)
        # and segment rows dividing the tile
        # 2048 default from the round-3 on-chip tile sweep (8K Q75:
        # 39.8/36.3/34.9/34.3 ms at 512/768/2048/4096 — diminishing past
        # 2048, and 4096 pads small images and compiles slower)
        FUSED_TILE = int(os.environ.get("GPUJPEG_TPU_FUSED_TILE", "2048"))
        seg_rows = geo.bps // 2
        # the stage-1 live set grows ~linearly with the per-block window
        # width (words_per_block): the 8K Q90 sweep point (Wb=56) asked
        # 59.7M scoped VMEM at the Q75-tuned tile vs the 16M budget —
        # compile-stopping. Scale the tile inversely with Wb (anchored
        # at the swept Wb=4 optimum), keeping segment alignment so the
        # fused variants stay eligible; explicit env overrides win.
        if (geo.words_per_block > 4
                and "GPUJPEG_TPU_FUSED_TILE" not in os.environ):
            align = max(2 * max(seg_rows, 1), 16)
            FUSED_TILE = max(align,
                             (FUSED_TILE * 4 // geo.words_per_block)
                             // align * align)
        fused_ok = (use_pallas and packed_dct and not plan.params.interleaved
                    and (seg_rows == 0 or (FUSED_TILE // 2) % max(seg_rows, 1)
                         == 0)
                    and "fused" not in self._disabled
                    and not os.environ.get("GPUJPEG_TPU_NO_FUSED_DCT"))
        if fused_ok:
            # fully fused stage 1: DCT+quant + in-kernel DC prediction +
            # static-threshold class/validity/quantizer — no narrow
            # per-row input streams, one combined output stream (each
            # narrow Pallas stream measures ~1.1 ms at 8K)
            from .entropy_v2 import (
                block_chunks_dct_fused, fused_dct_inputs, merge_and_stuff,
                split_fused_output)
            spec, D2_h, bias2_h, qrows_h = fused_dct_inputs(
                plan, quant_zz, seg_rows)
            M = geo.n_rows // 2
            Wb = geo.words_per_block
            # align the kernel's row padding with the packed merge's
            # segment padding AND the tile size, so neither a jnp.pad
            # (full-array copy) nor an output slice is ever needed:
            # S_pad % spt == 0 (merge tiles) and S_pad*bps/2 % T2 == 0
            S = geo.n_segments
            P = geo.bps * Wb
            spt = max(1, 256 * 128 // P)
            T2 = FUSED_TILE // 2
            import math
            g = math.gcd(geo.bps, 2 * T2)
            L = spt * ((2 * T2 // g) // math.gcd(spt, 2 * T2 // g))
            S_pad = -(-S // L) * L
            n_rows_pad = S_pad * geo.bps
            rst_p = jnp.asarray(np.pad(
                np.asarray(geo.seg_rst_marker), (0, S_pad - S)))
            hrst_p = jnp.asarray(np.pad(
                np.asarray(geo.seg_has_rst), (0, S_pad - S)))

            from .blocks import plane_to_blocks_u32

            barrier_mode = os.environ.get("GPUJPEG_TPU_PRE_BARRIER",
                                          "planes")

            # single-kernel variant: merge + stuff run IN the stage-1
            # kernel on 16x-fewer-vreg arrays (flagship P == 128 only),
            # removing two kernel launches and the window-array HBM
            # round trip
            full_ok = (P == 128 and geo.cap_out_bytes % 4 == 0
                       and (2 * T2) % geo.bps == 0
                       and (T2 * 2 * Wb) % 128 == 0
                       and "fused_full" not in self._disabled
                       and not os.environ.get("GPUJPEG_TPU_NO_FULL_FUSED"))
            if full_ok:
                from .entropy_v2 import band_perm_rows, encode_dct_fused_full
                # band input: the 8x8 blockify runs in-VMEM inside the
                # kernel (round-3 on-chip: the XLA blockify transpose was
                # 15.8 ms of the 34.5 ms 8K encode) — eligible when the
                # planes share one width, rows hold whole block pairs,
                # and the tile can align to whole plane 8-row bands
                widths = {c.data_width for c in plan.components}
                ppb = (plan.components[0].data_width // 16
                       if len(widths) == 1 else 0)
                band_ok = (ppb > 0
                           and plan.components[0].data_width % 16 == 0
                           and all(c.block_count % 2 == 0
                                   for c in plan.components)
                           and not os.environ.get("GPUJPEG_TPU_NO_BAND"))
                if band_ok:
                    # tile = whole bands, near the swept 2048 optimum;
                    # Mosaic block row dims must divide by 8, so the
                    # segments-per-tile count must too
                    def _kb_ok(k):
                        t2 = k * ppb
                        return ((2 * t2) % geo.bps == 0
                                and (t2 * 2 * Wb) % 128 == 0
                                and (2 * t2 // geo.bps) % 8 == 0)
                    cands = sorted(range(1, max(2, (2 * T2) // ppb + 9)),
                                   key=lambda k: abs(k * ppb - T2))
                    Kb = next((k for k in cands if _kb_ok(k)), 0)
                    T2b = Kb * ppb
                    band_ok = Kb > 0
                T2f = T2b if band_ok else T2
                spt_t = 2 * T2f // geo.bps
                S_pad_f = -(-S // spt_t) * spt_t
                Mp_f = S_pad_f * geo.bps // 2
                rst2 = jnp.asarray(np.pad(
                    np.asarray(geo.seg_rst_marker),
                    (0, S_pad_f - S)).astype(np.int32)[:, None])
                hrst2 = jnp.asarray(np.pad(
                    np.asarray(geo.seg_has_rst),
                    (0, S_pad_f - S)).astype(np.int32)[:, None])
                D2f_h = D2_h[band_perm_rows()] if band_ok else D2_h
                # (Two parked io-floor alternatives were DELETED in
                # round 5, their prize collected by the words front end
                # below: the VPACK vertical plane-word pack — XLA-side
                # win, in-VMEM un-pack loss, 51.6 vs 27.1 ms — and the
                # monolithic rgb-fused kernel, blocked by a Mosaic
                # scheduler plan-selection cliff. Full A/B record:
                # BENCHMARKS.md rounds 4-5.)

                @jax.jit
                def fn_full(raw, rst2, hrst2):
                    planes = preprocess(raw, plan.image, plan, jnp)
                    if barrier_mode == "planes":
                        planes = jax.lax.optimization_barrier(tuple(planes))
                    if band_ok:
                        # concat plane WORDS (no transpose): blockify
                        # happens in-VMEM inside the kernel
                        pw = jnp.concatenate([
                            jax.lax.bitcast_convert_type(
                                jax.lax.bitcast_convert_type(
                                    p.reshape(p.shape[0],
                                              p.shape[1] // 4, 4),
                                    jnp.uint32), jnp.int32)
                            for p in planes])
                        pad_rows = (Mp_f - M) // ppb * 8
                        if pad_rows:
                            pw = jnp.pad(pw, ((0, pad_rows), (0, 0)))
                        return encode_dct_fused_full(
                            pw, rst2, hrst2, spec, D2f_h, bias2_h,
                            qrows_h, tabs, Wb, geo.bps,
                            geo.cap_seg_words, geo.cap_out_bytes,
                            geo.max_stuff, tile=2 * T2f, band_ppb=ppb)
                    pbw = jnp.concatenate(
                        [plane_to_blocks_u32(p, jnp) for p in planes])
                    if barrier_mode == "packed":
                        pbw = jax.lax.optimization_barrier(pbw)
                    pbw = pbw.reshape(-1, 32)      # two blocks per row
                    if Mp_f > M:
                        pbw = jnp.pad(pbw, ((0, Mp_f - M), (0, 0)))
                    return encode_dct_fused_full(
                        pbw, rst2, hrst2, spec, D2f_h, bias2_h, qrows_h,
                        tabs, Wb, geo.bps, geo.cap_seg_words,
                        geo.cap_out_bytes, geo.max_stuff, tile=2 * T2f)

                self._fn_args = (rst2, hrst2)
                wrapped = lambda raw: fn_full(raw, *self._fn_args)
                wrapped.kind = "fused_full"
                # debug hook so A/B tests can assert the resolved input
                # form instead of comparing a path to itself
                wrapped.band_mode = "band" if band_ok else "packed"
                wrapped.input_form = "flat"

                # words-form front end (round-5 io-floor fix): the host
                # views the raw bytes as (H, 3W/4) i32 words for FREE
                # before upload, and the whole preprocess+pack stage
                # becomes one fused word-domain elementwise pass
                # (ops/rgbpack.py: 2.0 vs 6.1 ms standalone at 8K on
                # chip, byte-identical). Device-resident u8 inputs keep
                # the flat form above — a device-side u8->word bitcast
                # materializes a lane-padded (N/4, 4) intermediate
                # (measured RESOURCE_EXHAUSTED at 8K).
                from .rgbpack import pack_eligible, pack_consts
                use_words = (band_ok
                             and pack_eligible(plan)
                             and "fused_full_words" not in self._disabled)
                if use_words:
                    m9p, basep = pack_consts(plan)
                    from .rgbpack import pack_plane_words
                    pad_rows_w = (Mp_f - M) // ppb * 8

                    @jax.jit
                    def fn_full_w(raw_w, rst2, hrst2):
                        pw = pack_plane_words(raw_w, m9p, basep,
                                              barrier_mode)
                        if pad_rows_w:
                            pw = jnp.pad(pw, ((0, pad_rows_w), (0, 0)))
                        return encode_dct_fused_full(
                            pw, rst2, hrst2, spec, D2f_h, bias2_h,
                            qrows_h, tabs, Wb, geo.bps,
                            geo.cap_seg_words, geo.cap_out_bytes,
                            geo.max_stuff, tile=2 * T2f, band_ppb=ppb)

                    wrapped_w = lambda raw_w: fn_full_w(raw_w,
                                                        *self._fn_args)
                    wrapped_w.kind = "fused_full_words"
                    wrapped_w.band_mode = "words"
                    wrapped_w.input_form = "words"
                    wrapped_w.flat_form = wrapped
                    return wrapped_w
                return wrapped

            @jax.jit
            def fn_fused(raw, rst_p, hrst_p):
                planes = preprocess(raw, plan.image, plan, jnp)
                if barrier_mode == "planes":
                    planes = jax.lax.optimization_barrier(tuple(planes))
                pbw = jnp.concatenate(
                    [plane_to_blocks_u32(p, jnp) for p in planes])
                if barrier_mode == "packed":
                    pbw = jax.lax.optimization_barrier(pbw)
                pbw = pbw.reshape(-1, 32)          # two blocks per row
                out, Mp = block_chunks_dct_fused(
                    pbw, spec, D2_h, bias2_h, qrows_h, tabs, Wb,
                    tile=FUSED_TILE, min_rows=n_rows_pad // 2)
                words, bits = split_fused_output(out, Mp, 2 * Mp, Wb)
                return merge_and_stuff(
                    words, bits, rst_p, hrst_p, geo.bps, geo.cap_seg_words,
                    geo.cap_out_bytes, Wb, True, geo.max_stuff)

            self._fn_args = (rst_p, hrst_p)
            wrapped = lambda raw: fn_fused(raw, *self._fn_args)
            wrapped.kind = "fused"
            return wrapped

        # Very large plans only reach this point when no fused kernel
        # variant is eligible (the fused paths above returned already):
        # the flagship band/words pipeline has no full-size XLA
        # intermediates, so 16K runs single-launch there (round 5 —
        # encode was previously always chunked at 194.8 ms / 681 Mpix/s
        # vs the decode's single-launch 2243 Mpix/s on the same frame).
        # The staged XLA formulation below, by contrast, materializes
        # ~18 GB of (n_rows, .) intermediates at 16K and must chunk the
        # DCT+entropy stages over segment ranges with lax.map. Safe at
        # segment granularity: DC prediction resets at every segment
        # start (plan.py: dc_pred = -1 at idx % ri == 0).
        if geo.n_rows > 2 * self.CHUNK_ROWS and S > 1:
            segs_per_chunk = max(1, self.CHUNK_ROWS // geo.bps)
            n_chunks = -(-S // segs_per_chunk)
            S_pad = n_chunks * segs_per_chunk
            rpad = (S_pad - S) * geo.bps
            CR = segs_per_chunk * geo.bps
            idx_p = np.pad(idx_plane, (0, rpad),
                           constant_values=plan.n_blocks)
            chunks = (
                jnp.asarray(idx_p.reshape(n_chunks, CR)),
                jnp.asarray(np.pad(geo.block_cls, (0, rpad))
                            .reshape(n_chunks, CR)),
                jnp.asarray(np.pad(geo.block_valid, (0, rpad))
                            .reshape(n_chunks, CR)),
                jnp.asarray(np.pad(geo.dc_dist, (0, rpad))
                            .reshape(n_chunks, CR)),
                jnp.asarray(np.pad(geo.seg_rst_marker, (0, S_pad - S))
                            .reshape(n_chunks, segs_per_chunk)),
                jnp.asarray(np.pad(geo.seg_has_rst, (0, S_pad - S))
                            .reshape(n_chunks, segs_per_chunk)),
            )
            distances = geo.dc_distances
            bps, csw = geo.bps, geo.cap_seg_words
            cob, W = geo.cap_out_bytes, geo.words_per_block
            mstuff = geo.max_stuff
            qidx_arg = (qidx_all if packed_dct and CR % 2 == 0
                        else jnp.zeros((1,), jnp.int32))

            # geometry tensors (and the quant divisors — see
            # dct_quant_packed) are jit ARGUMENTS, not closed-over
            # constants: constants serialize into the lowered module and
            # cost minutes of host-side lowering at 8K+ (measured 250 s)
            @jax.jit
            def fn_chunked(raw, chunks, qidx_all, qdiv_a, q2tab_a):
                planes = preprocess(raw, plan.image, plan, jnp)
                planes = jax.lax.optimization_barrier(tuple(planes))
                pblocks = jnp.concatenate(
                    [plane_to_blocks(p, jnp) for p in planes])

                def tail(x, clsc, valc, dcdc, rstc, hrstc):
                    y = jax.lax.dot_general(
                        x, D, (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32) - bias
                    rows = jnp.rint(y / qdiv_a[clsc]).astype(jnp.int32)
                    return encode_rows_arrays(
                        rows, clsc, valc, dcdc, rstc, hrstc, distances,
                        bps, csw, cob, W, tabs, use_pallas, mstuff)

                if packed_dct and CR % 2 == 0:
                    pb = jnp.concatenate(
                        [pblocks, jnp.zeros((rpad, 64), pblocks.dtype)])
                    qidx_p = jnp.concatenate(
                        [qidx_all, jnp.zeros(rpad // 2, qidx_all.dtype)])
                    xs = (pb.reshape(n_chunks, CR // 2, 128),
                          qidx_p.reshape(n_chunks, CR // 2)) + tuple(chunks[1:])

                    def body(c):
                        pbc, qic, clsc, valc, dcdc, rstc, hrstc = c
                        rows = dct_quant_packed(pbc, qic,
                                                q2tab_a).reshape(-1, 64)
                        return encode_rows_arrays(
                            rows, clsc, valc, dcdc, rstc, hrstc, distances,
                            bps, csw, cob, W, tabs, use_pallas, mstuff)
                elif identity_gather:
                    pb = jnp.concatenate(
                        [pblocks, jnp.zeros((rpad, 64), pblocks.dtype)])
                    xs = (pb.reshape(n_chunks, CR, 64),) + tuple(chunks[1:])

                    def body(c):
                        pbc, clsc, valc, dcdc, rstc, hrstc = c
                        return tail(pbc.astype(jnp.float32), clsc, valc,
                                    dcdc, rstc, hrstc)
                else:
                    pb = jnp.concatenate(
                        [pblocks, jnp.zeros((1, 64), pblocks.dtype)])
                    xs = tuple(chunks)

                    def body(c):
                        idxc, clsc, valc, dcdc, rstc, hrstc = c
                        return tail(pb[idxc].astype(jnp.float32), clsc,
                                    valc, dcdc, rstc, hrstc)

                out, out_len, seg_bits, n_ff = jax.lax.map(body, xs)
                return (out.reshape(-1), out_len.reshape(-1),
                        seg_bits.reshape(-1), n_ff.reshape(-1))

            self._stage_fns = None      # no staged timing for huge plans
            self._fn_args = (chunks, qidx_arg, qdiv, q2tab)
            wrapped = lambda raw: fn_chunked(raw, *self._fn_args)
            wrapped.kind = "chunked"
            return wrapped

        @jax.jit
        def fn(raw, dct_args, ent_args):
            return stage_entropy(stage_dct(stage_pre(raw), *dct_args),
                                 *ent_args)

        self._fn_args = (dct_args, ent_args)
        wrapped = lambda raw: fn(raw, *self._fn_args)
        wrapped.kind = "staged"
        return wrapped


def _enc_context(plan: CoderPlan, quant_zz, huff) -> _EncContext:
    key = (plan.params, plan.image)
    ctx = _ENC_CACHE.get(key)
    if ctx is None:
        ctx = _EncContext(plan, quant_zz, huff)
        _ENC_CACHE[key] = ctx
    return ctx


def _run_staged(encoder, ctx, raw_j):
    """perf_stats execution: the pipeline split at stage boundaries with
    a sync after each, filling the reference's per-phase durations
    (struct gpujpeg_duration_stats, gpujpeg_common.h:315-325)."""
    import time

    def sync(a):
        leaf = jax.tree_util.tree_leaves(a)[0]
        np.asarray(leaf.reshape(-1)[:1])

    s_pre, s_dct, s_ent = ctx._stage_fns
    dct_args, ent_args = ctx._stage_args
    t0 = time.perf_counter()
    pblocks = s_pre(raw_j)
    sync(pblocks)
    t1 = time.perf_counter()
    rows = s_dct(pblocks, *dct_args)
    sync(rows)
    t2 = time.perf_counter()
    out = s_ent(rows, *ent_args)
    sync(out)
    t3 = time.perf_counter()
    encoder.stats.duration_preprocessor = (t1 - t0) * 1e3
    encoder.stats.duration_dct_quantization = (t2 - t1) * 1e3
    encoder.stats.duration_huffman_coder = (t3 - t2) * 1e3
    return out


def _call_with_downgrade(ctx, raw_j):
    """Run ctx.fn, degrading fused kernel variants on failure: a
    variant that traced fine but fails to compile for the target (e.g.
    a Mosaic limitation) must fall back to the next-simpler device
    path, not crash the encode. block_until_ready inside the try makes
    async-dispatch execution faults (delivered at materialization under
    JAX's async dispatch) downgrade too, instead of escaping to the
    caller's np.asarray. Returns None to mean 'use the host golden
    coder'. Under GPUJPEG_TPU_STRICT, failures re-raise.

    The downgrade is recorded in ctx._disabled (checked by _build_fn)
    rather than by flipping the GPUJPEG_TPU_NO_* env vars: env mutation
    is process-global and racy under concurrent encoders, and would not
    persist to the tier-2 rebuild.

    Returns _REPREP when a downgrade changed the required input form
    (words -> flat): the caller must re-prepare raw_j and retry."""
    words_in = raw_j.dtype == jnp.int32     # words-form input
    while True:
        fn = ctx.fn
        if getattr(fn, "input_form", "flat") == "words" and not words_in:
            fn = fn.flat_form               # device-resident u8 input
        elif getattr(fn, "input_form", "flat") != "words" and words_in:
            return _REPREP
        try:
            return jax.block_until_ready(fn(raw_j))
        except Exception as e:  # pragma: no cover - kernel gaps
            if os.environ.get("GPUJPEG_TPU_STRICT"):
                raise
            kind = getattr(fn, "kind", None)
            if kind not in ("fused_full_rgb", "fused_full_words",
                            "fused_full", "fused"):
                return None
            import logging
            logging.getLogger(__name__).warning(
                "device encode variant %s failed (%s); disabling it and "
                "rebuilding the next-simpler variant", kind, e)
            ctx._disabled.add(kind)
            ctx.fn = ctx._build_fn(ctx.geo)
            ctx._batched = None


def encode_segments_device(encoder, raw, plan: CoderPlan, quant_zz, huff):
    """Run the device encoder; returns (scan_bodies, seg_sizes_by_scan):
    per scan, the ready-to-emit entropy bytes (RST markers included) and
    the per-segment byte sizes (for APP13 segment-info back-patching)."""
    import time
    ctx = _enc_context(plan, quant_zz, huff)
    perf_stats = bool(getattr(plan.params, "perf_stats", False))
    t_h2d = time.perf_counter()
    # words-form front end: host inputs upload as (H, 3W/4) i32 words
    # (a free view — same bytes); device-resident u8 arrays and the
    # perf_stats staged pipeline keep the flat u8 form
    dev_words = (isinstance(raw, jax.Array) and raw.dtype == jnp.int32)
    use_words = (getattr(ctx.fn, "input_form", "flat") == "words"
                 and (dev_words or not isinstance(raw, jax.Array))
                 and not (perf_stats and getattr(ctx, "_stage_fns", None)))
    if dev_words and use_words:
        # device-resident raw WORDS (e.g. the px decode tail's
        # output_to_device array): already the words front end's input
        # — zero-copy transcode chaining
        raw_j = raw.reshape(plan.image.height, -1)
    elif dev_words:
        # words input but a flat-only context: reinterpret on host (the
        # device-side bitcast materializes a lane-padded intermediate)
        raw_j = jnp.asarray(
            np.ascontiguousarray(np.asarray(raw)).view("<u1").reshape(-1))
    elif isinstance(raw, jax.Array):
        # device-resident input: the analog of the reference's
        # GPUJPEG_ENCODER_INPUT_GPU_IMAGE / OpenGL-texture paths
        # (gpujpeg_encoder.c:353-395) — no host round trip
        raw_j = raw.reshape(-1).astype(jnp.uint8)
    elif use_words:
        from .rgbpack import host_raw_words
        raw_j = jnp.asarray(host_raw_words(raw, plan.image.height,
                                           plan.image.width))
    else:
        raw_j = jnp.asarray(np.asarray(raw, dtype=np.uint8).reshape(-1))
    if perf_stats:
        jax.block_until_ready(raw_j)   # upload excluded from in_gpu
        encoder.stats.duration_memory_to = \
            (time.perf_counter() - t_h2d) * 1e3
    t0 = time.perf_counter()
    for tier in (1, 2):
        if perf_stats and getattr(ctx, "_stage_fns", None):
            out_flat, out_len, seg_bits, n_ff = _run_staged(
                encoder, ctx, raw_j)
        else:
            res = _call_with_downgrade(ctx, raw_j)
            if res is _REPREP:      # downgrade dropped the words form
                raw_j = jnp.asarray(
                    np.asarray(raw, dtype=np.uint8).reshape(-1))
                res = _call_with_downgrade(ctx, raw_j)
            if res is None or res is _REPREP:
                return None         # host golden coder
            out_flat, out_len, seg_bits, n_ff = res
        out_len_h = np.asarray(out_len)
        if not _seg_overflow(ctx, plan, out_len_h, seg_bits, n_ff):
            break
        if tier == 1:
            ctx = ctx.tier2()   # busier content than the typical budget
        else:
            return None         # beyond worst-case caps: host golden coder
    encoder.stats.duration_in_gpu = (time.perf_counter() - t0) * 1e3
    t_d2h = time.perf_counter()
    bodies = _split_scan_bodies(plan, ctx, out_flat, out_len_h)
    if perf_stats:
        # compaction gather + D2H of the compressed bytes (the gather is
        # tiny device work; the transfer dominates)
        encoder.stats.duration_memory_from = \
            (time.perf_counter() - t_d2h) * 1e3
    return bodies


def _split_scan_bodies(plan: CoderPlan, ctx, out_flat, out_len_h):
    flat, starts = compact_segments(out_flat, out_len_h, ctx.cap_out_bytes)
    scan_bodies = []
    seg_sizes_by_scan = []
    seg = 0
    for scan in plan.scans:
        n = scan.segment_count
        body = flat[starts[seg]:starts[seg + n]]
        sizes = out_len_h[seg:seg + n]
        scan_bodies.append(body.tobytes())
        seg_sizes_by_scan.append(sizes)
        seg += n
    return scan_bodies, seg_sizes_by_scan


def _seg_overflow(ctx, plan: CoderPlan, out_len_h, seg_bits, n_ff):
    seg_bits_h = np.asarray(seg_bits)[:plan.n_segments]
    n_ff_h = np.asarray(n_ff)[:plan.n_segments]
    stuffed = ((seg_bits_h + 7) >> 3) + n_ff_h
    return bool((seg_bits_h > ctx.cap_seg_bytes * 8).any() or
                (stuffed + 2 > ctx.cap_out_bytes).any() or
                (n_ff_h > ctx.geo.max_stuff).any())


def _batch_frames_auto(raw_bytes: int) -> int:
    """Frames fused per launch: GPUJPEG_TPU_BATCH_FRAMES, or sized so a
    chunk's HBM footprint (~4x raw per frame across planes/windows/out)
    stays around 512 MB — HD gets 8 frames/launch, 4K ~5, 8K+ falls
    back to 1 (the pipelined per-frame path)."""
    env = os.environ.get("GPUJPEG_TPU_BATCH_FRAMES")
    if env:
        return max(1, int(env))
    return int(max(1, min(8, (512 << 20) // max(4 * raw_bytes, 1))))


def encode_batch_device(encoder, raws, plan: CoderPlan, quant_zz, huff,
                        depth: int = 3):
    """Pipelined batch encode: same-geometry frames are fused B-at-a-time
    into one vmapped device launch (leading batch dim — the TPU form of
    the reference's per-stream frame parallelism, gpujpeg_encoder.h:106),
    and up to ``depth`` launches are queued ahead so each chunk's D2H +
    host compaction/stream formatting overlap later chunks' device
    compute (the encode mirror of Decoder.decode_batch). Yields one
    encode_segments_device-shaped result per frame — or None for frames
    that must take the host golden coder. Rare anomalies (capacity
    overflow, deferred kernel failure) re-run that frame synchronously
    through encode_segments_device's tier/downgrade chain."""
    ctx = _enc_context(plan, quant_zz, huff)
    n = len(raws)
    if not n:
        return
    B = min(_batch_frames_auto(int(np.asarray(raws[0]).size)), n)

    # words-form front end for all-host batches (see
    # encode_segments_device); any device-resident frame keeps the
    # whole batch on the flat u8 form — mixed stacks can't share one
    # vmapped executable
    use_words = (getattr(ctx.fn, "input_form", "flat") == "words"
                 and all((not isinstance(r, jax.Array))
                         or r.dtype == jnp.int32 for r in raws))
    fn1 = ctx.fn if (use_words or getattr(ctx.fn, "input_form", "flat")
                     == "flat") else ctx.fn.flat_form

    def to_dev(raw):
        if isinstance(raw, jax.Array) and raw.dtype == jnp.int32:
            if use_words:      # device raw words: zero-copy chaining
                return raw.reshape(plan.image.height, -1)
            return jnp.asarray(np.ascontiguousarray(np.asarray(raw))
                               .view("<u1").reshape(-1))
        if isinstance(raw, jax.Array):
            return raw.reshape(-1).astype(jnp.uint8)
        if use_words:
            from .rgbpack import host_raw_words
            return jnp.asarray(host_raw_words(raw, plan.image.height,
                                              plan.image.width))
        return jnp.asarray(np.asarray(raw, dtype=np.uint8).reshape(-1))

    def launch(chunk):
        try:
            if B == 1:
                return fn1(to_dev(chunk[0]))
            arrs = [to_dev(r) for r in chunk]
            if len(arrs) < B:   # pad the tail chunk; outputs are dropped
                arrs += [arrs[-1]] * (B - len(arrs))
            return ctx.batched_fn(fn1)(jnp.stack(arrs))
        except Exception:
            if os.environ.get("GPUJPEG_TPU_STRICT"):
                raise
            return None

    chunks = [raws[i:i + B] for i in range(0, n, B)]
    pending: list = []
    ci = 0
    while ci < len(chunks) or pending:
        while ci < len(chunks) and len(pending) < depth:
            pending.append((chunks[ci], launch(chunks[ci])))
            ci += 1
        chunk, res = pending.pop(0)
        for b, raw in enumerate(chunk):
            ok = res is not None
            if ok:
                try:
                    out_flat, out_len, seg_bits, n_ff = res
                    if B > 1:
                        fo, fl = out_flat[b], out_len[b]
                        fb, fn_ = seg_bits[b], n_ff[b]
                    else:
                        fo, fl, fb, fn_ = out_flat, out_len, seg_bits, n_ff
                    out_len_h = np.asarray(fl)   # blocks on this chunk
                    ok = not _seg_overflow(ctx, plan, out_len_h, fb, fn_)
                except Exception:
                    if os.environ.get("GPUJPEG_TPU_STRICT"):
                        raise
                    ok = False
            if ok:
                yield _split_scan_bodies(plan, ctx, fo, out_len_h)
            else:
                yield encode_segments_device(encoder, raw, plan, quant_zz,
                                             huff)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

_DEC_CACHE: dict = {}


def _dec_fn(plan: CoderPlan, out_image: ImageParameters, L_pad: int,
            n_luts: int, max_iters: int):
    key = (plan.params, plan.image, out_image, L_pad, n_luts)
    cached = _DEC_CACHE.get(key)
    if cached is not None:
        return cached

    g = build_dec_geometry(plan)
    gd_dev = {
        "block_comp": jnp.asarray(g.block_comp),
        "seg_block_start": jnp.asarray(g.seg_block_start),
        "seg_block_count": jnp.asarray(g.seg_block_count),
    }
    # inverse of the scan-order gather; a jit ARGUMENT (closed-over
    # million-element constants serialize into the lowered module and
    # dominate first-call latency at 8K)
    inv = np.empty(plan.n_blocks, dtype=np.int32)
    inv[plan.block_plane_idx] = np.arange(plan.n_blocks, dtype=np.int32)
    inv_dev = jnp.asarray(inv)
    n_blocks = plan.n_blocks

    comp_slices = []
    pos = 0
    for c in plan.components:
        comp_slices.append((pos, c.block_count, c.data_height, c.data_width))
        pos += c.block_count

    @jax.jit
    def fn(data, seg_starts, dc_tab, ac_tab, luts, Ws, gd, inv_a):
        coeff_scan = huffman_decode_kernel(
            data, seg_starts, gd, luts, dc_tab, ac_tab, n_blocks, max_iters)
        coeff_plane = coeff_scan[inv_a]
        planes = []
        for (start, count, dh, dw), W in zip(comp_slices, Ws):
            blocks = dequant_idct_device(coeff_plane[start:start + count], W)
            planes.append(blocks_to_plane(blocks, dh, dw, jnp))
        planes = list(jax.lax.optimization_barrier(tuple(planes)))
        return postprocess(planes, out_image, plan, jnp)

    wrapped = (lambda data, seg_starts, dc_tab, ac_tab, luts, Ws:
               fn(data, seg_starts, dc_tab, ac_tab, luts, Ws, gd_dev,
                  inv_dev))
    _DEC_CACHE[key] = wrapped
    return wrapped


_DEC_V2_CACHE: dict = {}

#: sentinel returned by _decode_device_v2 in fused-batch collect mode
#: (the prep was appended to decoder._fuse_collect; no launch happened)
_FUSE_PENDING = object()


def _decode_device_v2(decoder, plan: CoderPlan, info, scan_data,
                      segments_by_scan, dc_by_comp, ac_by_comp,
                      out_image: ImageParameters):
    """TPU decode path: Pallas block-synchronous lockstep Huffman kernel
    (ops/pallas_decode.py) + MXU dequant/IDCT + postprocess."""
    import time
    from .pallas_decode import (
        build_dec_tables_v2, build_segment_rows_from_ranges,
        build_segment_rows_t, make_decode_kernel, segment_ranges_wcap)

    S = plan.n_segments
    bps = int(plan.max_seg_block_count)

    # unique table slots, DC tables FIRST: with every AC slot >= the
    # DC count, the kernel's AC-only symbol-B lookups skip the DC
    # halves of the packed quick/huffval scans (round 5)
    uniq: list = []
    def slot_of(t):
        for i, u in enumerate(uniq):
            if u is t:
                return i
        uniq.append(t)
        return len(uniq) - 1
    dc_slot = np.zeros(4, np.int32)
    ac_slot = np.zeros(4, np.int32)
    for c in plan.components:
        dc_slot[c.index] = slot_of(dc_by_comp[c.index])
    n_dc = len(uniq)
    for c in plan.components:
        ac_slot[c.index] = slot_of(ac_by_comp[c.index])
    n_slots = len(uniq)
    # a degenerate stream could share one table object across classes;
    # the skip is only sound when no AC slot is a DC slot
    ac_base = n_dc if all(
        int(ac_slot[c.index]) >= n_dc for c in plan.components) else 0
    tabs = build_dec_tables_v2(uniq)

    concat, lo_r, hi_r, wcap = segment_ranges_wcap(
        scan_data, segments_by_scan, plan)
    # v3 lane-major kernel handles wcap <= V3_WCAP_MAX (VMEM transposed
    # data tile); larger per-segment streams use the v2 kernel, whose
    # window refill needs the 128-multiple wcap the shared rounding
    # guarantees past the same threshold
    from .pallas_decode import V3_WCAP_MAX
    use_v3 = wcap <= V3_WCAP_MAX
    rows = None
    if not use_v3:
        rows = build_segment_rows_from_ranges(concat, lo_r, hi_r, S, wcap)
    if plan.params.interleaved and plan.image.comp_count > 1:
        tpl = np.asarray([plan.block_comp[i] for i in range(bps)], np.int32)
    else:
        tpl = np.full(bps, -1, np.int32)
    if use_v3:
        from .pallas_decode_v3 import V3_OUT_BYTES
        # data tile + double-buffered coeff out block (one block per
        # grid step) + loop state + 160 B/segment of slow-path table
        # scratch (4 arrays x 10 code lengths)
        per_seg = (wcap * 4 * 2 + 64 * V3_OUT_BYTES * 2
                   + 50 * 8 * 4 // 128 * 4 + 160)
        # 2048 measured fastest at 8K for the plan tail; the px tail's
        # out block is 4x smaller (16 pixel words vs 64 coefficients),
        # freeing VMEM for bigger tiles (8K Q75: 12.69/12.43/11.18 ms
        # at 2048/4096/8192, round 5 — fewer grid steps; the per_seg
        # divisor still shrinks the tile at content-heavy qualities)
        from .rgbpack import unpack_eligible as _upk
        bps_pre = int(plan.max_seg_block_count)
        px_possible = (not (plan.params.interleaved
                            and plan.image.comp_count > 1)
                       and all(c.data_width % (8 * bps_pre) == 0
                               and c.block_count % bps_pre == 0
                               for c in plan.components)
                       and _upk(plan, out_image)
                       and os.environ.get("GPUJPEG_TPU_DEC_PX", "1")
                       != "0")
        cap = 8192 if px_possible else 2048
        seg_tile = max(128, min(cap, (8 << 20) // max(per_seg, 1)))
        seg_tile = 1 << (seg_tile.bit_length() - 1)
        tile_env = int(os.environ.get("GPUJPEG_TPU_DEC_SEG_TILE", "0") or 0)
        if tile_env >= 128 and tile_env % 128 == 0:
            seg_tile = tile_env     # tuning/test override
    else:
        # v2: ~9 KB/segment of live (T,128) intermediates at wcap=128
        per_seg = wcap * 4 * 2 + (8 << 10)
        seg_tile = max(64, min(2048, (14 << 20) // per_seg))
        seg_tile = 1 << (seg_tile.bit_length() - 1)
    S_pad = -(-S // seg_tile) * seg_tile
    rows_pad = None
    if rows is not None:
        rows_pad = np.zeros((S_pad, wcap), np.uint32)
        rows_pad[:S] = rows

    seg_comp = np.zeros((S_pad, 1), np.int32)
    seg_nblk = np.zeros((S_pad, 1), np.int32)
    seg_nblk[:S, 0] = plan.seg_block_count
    if not (plan.params.interleaved and plan.image.comp_count > 1):
        seg_comp[:S, 0] = plan.seg_scan  # scan index == component index

    # scan-order block -> kernel output row: v3 yields seg-major rows
    # (seg*bps + slot), v2 yields slot-major (slot*S_pad + seg)
    slot_in_seg = np.arange(plan.n_blocks, dtype=np.int32) - \
        plan.seg_block_start[plan.block_segment]
    if use_v3:
        out_row = plan.block_segment.astype(np.int64) * bps + slot_in_seg
    else:
        out_row = slot_in_seg.astype(np.int64) * S_pad + plan.block_segment

    # default OFF: in isolation the Pallas un-blockify beats the XLA
    # blocks_to_plane 3.1 vs 6.7 ms/plane on chip, but INSIDE the fused
    # decode jit it measured +10 ms at 8K Q75 (36.6 vs 26.5) — the
    # opaque kernel call mid-chain forces operand materialization and
    # breaks XLA's matmul/relayout fusion. Kept as an A/B hook.
    # (A second default-off tail, the fused seg-rows kernel
    # GPUJPEG_TPU_DEC_SEG_TAIL, measured 34.5 vs 26.4 ms at 8K Q75 on
    # chip — BENCHMARKS.md round-3 — and was DELETED with its data;
    # DEC_BAND stays as the single A/B hook for the tail seam.)
    use_band = bool(os.environ.get("GPUJPEG_TPU_DEC_BAND"))
    inv = np.empty(plan.n_blocks, dtype=np.int32)
    inv[plan.block_plane_idx] = np.arange(plan.n_blocks, dtype=np.int32)
    # both reorders are identities on the common non-interleaved path
    # (scan order == plane order, padding segments at the tail); a
    # (n_blocks, 64) row gather is ~15 ms at 8K, so skip them
    nb = plan.n_blocks
    out_row_identity = bool(
        np.array_equal(out_row, np.arange(nb, dtype=np.int64)))
    inv_identity = bool(
        np.array_equal(inv, np.arange(nb, dtype=np.int32)))
    # pixel-words tail (round 5): run.pixels fuses dequant+IDCT into the
    # huffman kernel (the MXU contracts the coefficient dim on operands
    # already in VMEM — the 400 MB coefficient array never exists in
    # HBM and the kernel writes 4x fewer bytes), then ONE 2-D transpose
    # + the in-VMEM un-blockify + a lane-aligned word-domain inverse
    # transform/interleave produce the raw words directly (host views
    # them as the u8 buffer for free). Eligible on the identity
    # non-interleaved path when block rows hold whole segments and the
    # output is full-res interleaved RGB-order u8
    # (rgbpack.unpack_eligible). GPUJPEG_TPU_DEC_PX=0 opts back out.
    # (A coefficient-layout native tail was built first and measured
    # 30.1 vs 25.4 on chip — the u8 un-blockify transpose from the
    # k-seg layout costs more than the saved scan transpose;
    # BENCHMARKS.md round-5.)
    from .rgbpack import unpack_eligible
    use_px = (use_v3 and out_row_identity and inv_identity
              and not use_band
              and not (plan.params.interleaved
                       and plan.image.comp_count > 1)
              and all(c.data_width % (8 * bps) == 0
                      and c.block_count % bps == 0
                      for c in plan.components)
              and unpack_eligible(plan, out_image)
              and os.environ.get("GPUJPEG_TPU_DEC_PX", "1") != "0")
    # quant-table identity per component, deduplicated: the px tail
    # runs one in-kernel IDCT matmul per UNIQUE table (typically 2, not
    # n_comp), lane-selecting by component
    qt_keys = tuple(
        tuple(int(x) for x in info.quant_tables[
            info.components[c.index].quant_table_index])
        for c in plan.components)
    uniq_qts = tuple(dict.fromkeys(qt_keys))
    q_of_map = tuple(uniq_qts.index(k) for k in qt_keys)
    key = (plan.params, plan.image, out_image, wcap, n_slots, S_pad, use_v3,
           seg_tile, use_band, use_px, q_of_map if use_px else None,
           ac_base)
    fn = _DEC_V2_CACHE.get(key)
    if fn is None:
        # reorder indices are jit ARGUMENTS (identity on the flagship
        # path; embedded-constant lowering costs minutes when present)
        inv_j = (jnp.zeros((1,), jnp.int32) if inv_identity
                 else jnp.asarray(inv))
        out_row_j = (jnp.zeros((1,), jnp.int32) if out_row_identity
                     else jnp.asarray(out_row.astype(np.int32)))
        comp_slices = []
        pos = 0
        for c in plan.components:
            comp_slices.append((pos, c.block_count, c.data_height,
                                c.data_width))
            pos += c.block_count

        if use_v3:
            from .pallas_decode_v3 import make_decode_kernel_v3
            run = make_decode_kernel_v3(seg_tile, bps, wcap, n_slots, tpl,
                                        ac_base)
        else:
            run = make_decode_kernel(seg_tile, bps, wcap, n_slots,
                                     bps * 68 + 16, tpl, 4)

        if use_px:
            from .pallas_decode import unblockify_K, unblockify_bands
            from .rgbpack import interleave_raw_words, unpack_consts
            m9i, basei = unpack_consts(plan, out_image)
            q_of = np.zeros(4, np.int32)
            for i, c in enumerate(plan.components):
                q_of[c.index] = q_of_map[i]   # Wq rows are UNIQUE tables
            q_of_j = jnp.asarray(q_of)
            n_c = len(comp_slices)
            dh0, dw0 = comp_slices[0][2], comp_slices[0][3]

            def stage_huffman(rows_j, seg_comp_j, seg_nblk_j, quick,
                              maxcode, delta, huffval, dcs, acs, Wq):
                from . import pallas_decode as _pd
                t = _pd.DecTables(quick, maxcode, delta, huffval)
                return run.pixels(rows_j, seg_comp_j, seg_nblk_j, t,
                                  dcs, acs, Wq, q_of_j)

            def stage_idct(pxw, Ws):
                """(bps, 16, S_pad) pixel words -> plane words: ONE 2-D
                transpose (vreg-aligned merges on both sides) brings
                rows to plan block order, then the in-VMEM un-blockify
                rebuilds all components' planes in one launch."""
                Sp = pxw.shape[2]
                w2 = pxw.reshape(bps * 16, Sp).T
                w2 = w2.reshape(Sp * bps, 16)[:nb]
                pall = unblockify_bands(w2, n_c * dh0, dw0, K=unblockify_K(dw0))
                planes = [pall[i * dh0:(i + 1) * dh0]
                          for i in range(n_c)]
                return list(jax.lax.optimization_barrier(tuple(planes)))

            def stage_post(planes):
                return interleave_raw_words(planes, m9i, basei)
        else:
            def stage_huffman(rows_j, seg_comp_j, seg_nblk_j, quick,
                              maxcode, delta, huffval, dcs, acs,
                              out_row_a, inv_a):
                from . import pallas_decode as _pd
                t = _pd.DecTables(quick, maxcode, delta, huffval)
                out3 = run(rows_j, seg_comp_j, seg_nblk_j, t, dcs, acs)
                flat = out3.reshape(-1, 64)
                coeff_scan = (flat[:nb] if out_row_identity
                              else flat[out_row_a])
                return coeff_scan if inv_identity else coeff_scan[inv_a]

        def stage_idct_plan(coeff_plane, Ws):
            """Fused dequant+IDCT with the un-blockify in-VMEM: the
            plain IDCT matmul's pixels pack 4-per-word
            (``dequant_idct_words`` — identical operand chain, so XLA's
            fusion of the coefficient relayout into the matmul read is
            untouched) and the Pallas ``unblockify_bands`` kernel
            rebuilds plane rows per 8-row band, replacing the XLA
            ``blocks_to_plane`` transpose (strided HBM; a pair-matmul
            variant that reshaped coefficients to (N/2, 128) first
            measured +25 ms at 8K from the fusion break).
            ``GPUJPEG_TPU_DEC_BAND=1`` opts in (A/B aid; see the
            default-off note at the cache key)."""
            from .pallas_decode import unblockify_K, unblockify_bands
            planes = []
            for (start, count, dh, dw), W in zip(comp_slices, Ws):
                coeff = coeff_plane[start:start + count]
                if use_band:
                    words = dequant_idct_words(coeff, W)
                    pw = unblockify_bands(words, dh, dw)
                    planes.append(jax.lax.bitcast_convert_type(
                        pw, jnp.uint8).reshape(dh, dw))
                else:
                    blocks = dequant_idct_device(coeff, W)
                    planes.append(blocks_to_plane(blocks, dh, dw, jnp))
            # keep XLA from fusing the 8x8 un-blockify transpose into
            # the pixel chain (measured 73 -> 21 ms at 8K)
            return list(jax.lax.optimization_barrier(tuple(planes)))

        if not use_px:
            stage_idct = stage_idct_plan

            def stage_post(planes):
                return postprocess(planes, out_image, plan, jnp)

        @jax.jit
        def fn_j(rows_j, seg_comp_j, seg_nblk_j, quick, maxcode, delta,
                 huffval, dcs, acs, Ws, out_row_a, inv_a):
            if use_px:
                pxw = stage_huffman(rows_j, seg_comp_j, seg_nblk_j,
                                    quick, maxcode, delta, huffval,
                                    dcs, acs, jnp.stack(Ws))
            else:
                pxw = stage_huffman(rows_j, seg_comp_j, seg_nblk_j,
                                    quick, maxcode, delta, huffval,
                                    dcs, acs, out_row_a, inv_a)
            return stage_post(stage_idct(pxw, Ws))

        def fn(rows_j, seg_comp_j, seg_nblk_j, quick, maxcode, delta,
               huffval, dcs, acs, Ws):
            return fn_j(rows_j, seg_comp_j, seg_nblk_j, quick, maxcode,
                        delta, huffval, dcs, acs, Ws, out_row_j, inv_j)

        s_huff_j = jax.jit(stage_huffman)

        if use_px:
            def s_huff(*args):     # perf_stats passes Ws as the tail arg
                *a, Ws_ = args
                return s_huff_j(*a, jnp.stack(Ws_))
        else:
            def s_huff(*args):
                return s_huff_j(*args, out_row_j, inv_j)

        # per-stage jits for perf_stats mode: the reference reports
        # huffman/idct/postprocess splits (gpujpeg_common.h:315-325)
        fn.stages = (s_huff, jax.jit(stage_idct), jax.jit(stage_post))
        # fused-batch form: B same-geometry frames in one launch (rows
        # batched; tables/geometry broadcast) — see Decoder.decode_batch
        fn.batched = jax.jit(jax.vmap(
            fn_j, in_axes=(0,) + (None,) * 11))
        fn.reorders = (out_row_j, inv_j)
        fn.px_tail = fn.words_out = use_px
        _DEC_V2_CACHE[key] = fn

    # device copies of the IDCT operators cached per quant-table set
    # (another stream-family constant; a fresh upload per call costs
    # tunnel round-trips). The px tail takes the UNIQUE tables (its
    # in-kernel matmul count); the plan tail zips per component.
    ws_src = uniq_qts if use_px else qt_keys
    ws_key = (ws_src, use_px)
    ws_cached = getattr(decoder, "_dev_ws_cache", None)
    if ws_cached is None or ws_cached[0] != ws_key:
        Ws = tuple(jnp.asarray(idct_operator_f32(k)) for k in ws_src)
        decoder._dev_ws_cache = (ws_key, Ws)
    else:
        Ws = ws_cached[1]
    if use_v3:
        # host-built transposed rows: the on-chip destuff alternative
        # (raw scan-body upload + cumsum/sort relayout) measured SLOWER
        # end-to-end even on the ~100 MB/s tunnel (281 vs 238 ms wall,
        # round-3 sweep) — the device sort cost more than the saved H2D
        # bytes — and was deleted
        data_in = build_segment_rows_t(concat, lo_r, hi_r, plan, wcap,
                                       S_pad)
        if data_in is None:  # no native lib: NumPy rows + transpose
            rows = build_segment_rows_from_ranges(concat, lo_r, hi_r, S,
                                                  wcap)
            rows_pad = np.zeros((S_pad, wcap), np.uint32)
            rows_pad[:S] = rows
            data_in = np.ascontiguousarray(rows_pad.T).view(np.int32)
        sc_in = seg_comp.reshape(S_pad // 128, 128)
        sn_in = seg_nblk.reshape(S_pad // 128, 128)
    else:
        data_in, sc_in, sn_in = rows_pad, seg_comp, seg_nblk
    fuse = getattr(decoder, "_fuse_collect", None)
    if fuse is not None:
        # fused batch decode (Decoder.decode_batch): hand the host-side
        # prep to the caller, which stacks same-geometry frames' rows
        # into ONE vmapped launch (shared tables ride once)
        fuse.append({
            "fn": fn, "data_in": data_in, "sc_in": sc_in, "sn_in": sn_in,
            "tabs": tabs, "dc_slot": dc_slot, "ac_slot": ac_slot,
            "Ws": Ws, "key": key,
            "qts": tuple(tuple(int(x) for x in info.quant_tables[
                info.components[c.index].quant_table_index])
                for c in plan.components),
        })
        return _FUSE_PENDING

    t_h2d = time.perf_counter()
    # per-call device uploads are the per-frame DATA only: the Huffman
    # tables, class slots and segment maps are stream-family constants,
    # so their device copies are cached on the decoder (each extra
    # jnp.asarray costs a tunnel round-trip; the reference's analog
    # uploads tables once at init, gpujpeg_table.c). Keyed by the
    # geometry key + table bytes so a DHT change refreshes them.
    tab_key = (key, tabs.quick.tobytes(), tabs.maxcode.tobytes(),
               tabs.delta.tobytes(), tabs.huffval.tobytes(),
               dc_slot.tobytes(), ac_slot.tobytes())
    cached = getattr(decoder, "_dev_const_cache", None)
    const_fresh = cached is None or cached[0] != tab_key
    if const_fresh:
        const_dev = (jnp.asarray(sc_in), jnp.asarray(sn_in),
                     jnp.asarray(tabs.quick), jnp.asarray(tabs.maxcode),
                     jnp.asarray(tabs.delta), jnp.asarray(tabs.huffval),
                     jnp.asarray(dc_slot), jnp.asarray(ac_slot))
        decoder._dev_const_cache = (tab_key, const_dev)
    else:
        const_dev = cached[1]
    args_dev = (jnp.asarray(data_in),) + const_dev
    if getattr(decoder, "capture_device_call", False):
        # first-class bench hook (Decoder.capture_device_call): expose
        # the compiled device fn + this stream's device-resident args so
        # benchmarks can time pipelined device-only iterations without
        # monkeypatching the fn cache
        decoder.last_device_call = (fn, args_dev + (Ws,))
    # bytes actually transferred this call: the cached stream-family
    # constants cost nothing after their first upload
    decoder.stats.bytes_memory_to = int(
        args_dev[0].nbytes + (sum(a.nbytes for a in const_dev)
                              if const_fresh else 0))
    if getattr(decoder, "perf_stats", False):
        jax.block_until_ready(args_dev)  # uploads excluded from in_gpu
        decoder.stats.duration_memory_to = \
            (time.perf_counter() - t_h2d) * 1e3

    def sync(a):
        leaf = jax.tree_util.tree_leaves(a)[0]
        np.asarray(jax.device_get(leaf.reshape(-1)[:1]))

    t0 = time.perf_counter()
    if getattr(decoder, "_defer_sync", False):
        # pipelined batch decode (Decoder.decode_batch): launch only —
        # the caller syncs after queueing the following frames, so the
        # host parse/row-build of frame i+1 overlaps this frame's device
        # work via async dispatch (perf_stats staging would sync here
        # and serialize the pipeline, so it is bypassed)
        return fn(*args_dev, Ws)
    if getattr(decoder, "perf_stats", False):
        s_huff, s_idct, s_post = fn.stages
        huff_args = args_dev + ((Ws,) if getattr(fn, "px_tail", False)
                                else ())
        coeff_plane = s_huff(*huff_args)
        sync(coeff_plane)
        t1 = time.perf_counter()
        planes = s_idct(coeff_plane, Ws)
        sync(planes)
        t2 = time.perf_counter()
        raw = s_post(planes)
        sync(raw)
        t3 = time.perf_counter()
        decoder.stats.duration_huffman_coder = (t1 - t0) * 1e3
        decoder.stats.duration_dct_quantization = (t2 - t1) * 1e3
        decoder.stats.duration_postprocessor = (t3 - t2) * 1e3
    else:
        raw = fn(*args_dev, Ws)
        # sync() both blocks and fetches one element — block_until_ready
        # alone is unreliable over the tunneled backend (BENCHMARKS.md),
        # and running both would add a redundant RTT per call
        sync(raw)
    decoder.stats.duration_in_gpu = (time.perf_counter() - t0) * 1e3
    if not getattr(decoder, "output_to_device", False):
        t_d2h = time.perf_counter()
        raw = np.asarray(raw)   # D2H (the reference's default output path)
        if raw.dtype == np.int32:
            # words-tail output (fn.words_out): same bytes as the u8
            # raw buffer — a free host-side view (decode mirror of the
            # encode words front end)
            raw = raw.view("<u1").reshape(-1)
        decoder.stats.duration_memory_from = \
            (time.perf_counter() - t_d2h) * 1e3
    return raw


def decode_device(decoder, plan: CoderPlan, info, scan_data,
                  segments_by_scan, dc_by_comp, ac_by_comp,
                  out_image: ImageParameters):
    import time
    from ..runtime import use_pallas_default
    if use_pallas_default():
        try:
            return _decode_device_v2(decoder, plan, info, scan_data,
                                     segments_by_scan, dc_by_comp,
                                     ac_by_comp, out_image)
        except Exception as e:  # pragma: no cover - kernel gaps
            if os.environ.get("GPUJPEG_TPU_STRICT"):
                raise   # tests set this: a silent fallback would mask
                        # kernel breakage behind a still-green suite
            import logging
            logging.getLogger(__name__).warning(
                "pallas decode path failed (%s); using XLA fallback", e)
    # concatenate all scans' entropy bytes; segment starts in plan order
    scan_base = []
    base = 0
    for sd in scan_data:
        scan_base.append(base)
        base += int(sd.size)
    concat = (np.concatenate([np.asarray(s, np.uint8) for s in scan_data])
              if base else np.zeros(1, np.uint8))

    seg_starts = np.zeros(plan.n_segments, np.int32)
    for s in range(plan.n_segments):
        scan_id = int(plan.seg_scan[s])
        seg_idx = int(plan.seg_scan_index[s])
        seg_list = segments_by_scan[scan_id]
        if seg_idx < len(seg_list):
            seg_starts[s] = scan_base[scan_id] + seg_list[seg_idx][0]

    L_pad = _bucket(concat.size)
    data = np.zeros(L_pad, np.uint8)
    data[:concat.size] = concat

    luts, dc_tab, ac_tab = build_dec_tables(dc_by_comp, ac_by_comp)
    g = build_dec_geometry(plan)
    fn = _dec_fn(plan, out_image, L_pad, luts.shape[0], g.max_iters)

    Ws = tuple(
        jnp.asarray(idct_operator_f32(
            tuple(int(x) for x in info.quant_tables[
                info.components[c.index].quant_table_index])))
        for c in plan.components
    )

    args_dev = (jnp.asarray(data), jnp.asarray(seg_starts),
                jnp.asarray(dc_tab), jnp.asarray(ac_tab),
                jnp.asarray(luts), Ws)
    if getattr(decoder, "capture_device_call", False):
        decoder.last_device_call = (fn, args_dev)   # bench hook (see v2)
    t0 = time.perf_counter()
    raw = np.asarray(fn(*args_dev))
    decoder.stats.duration_in_gpu = (time.perf_counter() - t0) * 1e3
    return raw
