"""Multi-chip sharded JPEG encode over a ``jax.sharding.Mesh``.

This is the capability the reference does NOT have (SURVEY §2.3: GPUJPEG is
single-process/single-GPU; multi-GPU only via one coder per device,
reference: gpujpeg_common.c:192-260). The TPU build makes distribution a
first-class axis:

* **Band sharding ('seg' mesh axis)** — one huge image is split into
  horizontal *bands* of whole MCU rows. JPEG makes this embarrassingly
  parallel: 8x8 blocks are independent through DCT+quant, and restart
  markers make entropy segments independent too (DC prediction resets at
  every RST, reference: gpujpeg_huffman_gpu_encoder.cu:326-337). Each
  device runs the full pixel+entropy pipeline on its band; the only
  cross-device work is assembling the variable-length per-segment byte
  ranges — per-segment byte counts come back to the host (the analog of
  the reference's single output-size D2H sync,
  gpujpeg_huffman_gpu_encoder.cu:1158) and the bitstream is compacted with
  one vectorized gather.

* **Frame sharding ('frame' mesh axis)** — a video batch dimension; frames
  are dealt across the other mesh axis (per-host frame sharding for Y4M
  streams, BASELINE.json config 5).

Alignment rules (validated by :func:`plan_bands`):

* pixel rows per band must be a multiple of the MCU pixel height
  (8 * max vertical sampling), so bands contain whole MCU rows;
* the restart interval must divide every component's per-band MCU count,
  so band boundaries coincide with segment boundaries and every
  non-final segment is exactly ``restart_interval`` MCUs as DRI promises.
  :func:`choose_restart_interval` picks the largest conforming interval
  at or below the single-chip heuristic
  (reference: gpujpeg_encoder_suggest_restart_interval,
  gpujpeg_encoder.c:256-283).
"""
from __future__ import annotations

import dataclasses
import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX >= 0.4.35 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older JAX
    from jax.experimental.shard_map import shard_map as _shard_map

from ..params import ImageParameters, Parameters, suggest_restart_interval
from ..plan import CoderPlan, make_plan
from ..stream.writer import HeaderType, JpegWriter
from ..tables import default_huffman_table, quant_table_zz
from ..types import ComponentType, HuffmanType, PixelFormat, PIXEL_FORMAT_DESC
from ..ops.blocks import plane_to_blocks
from ..ops.dct import fdct_operator_f32  # noqa: F401 (legacy path)
from ..ops.huffman_encode import (
    build_enc_geometry,
    build_enc_tables,
    huffman_encode_kernel,
)
from ..ops.preprocess import preprocess


@dataclasses.dataclass(frozen=True)
class BandLayout:
    """Static description of how an image splits into per-device bands."""

    n_bands: int
    rows_per_band: int
    band_image: ImageParameters
    plan: CoderPlan           # per-band coder plan (identical for all bands)
    band_raw_bytes: int

    @property
    def segs_per_band(self) -> int:
        return self.plan.n_segments


def _mcu_pixel_height(params: Parameters, comp_count: int) -> int:
    if comp_count == 1:
        return 8
    max_v = max(s.vertical for s in params.sampling_factor[:comp_count])
    return 8 * max_v


def choose_restart_interval(params: Parameters, image: ImageParameters,
                            n_bands: int) -> int:
    """Largest restart interval <= the single-chip suggestion that divides
    every component's per-band MCU count (so all bands' segments are full)."""
    rows = image.height // n_bands
    subsampled = any(s != params.sampling_factor[0]
                     for s in params.sampling_factor[:image.comp_count])
    want = suggest_restart_interval(image, subsampled, params.interleaved,
                                    pow2=True, quality=params.quality)
    band_image = dataclasses.replace(image, height=rows)
    plan = make_plan(dataclasses.replace(params, restart_interval=0), band_image)
    if params.interleaved and image.comp_count > 1:
        counts = [plan.scans[0].mcu_count]
    else:
        counts = [c.mcu_count for c in plan.components]
    for ri in range(min(want, min(counts)), 0, -1):
        if all(cnt % ri == 0 for cnt in counts):
            return ri
    return 1


def plan_bands(params: Parameters, image: ImageParameters,
               n_bands: int) -> BandLayout:
    """Split the image into ``n_bands`` equal horizontal bands of whole MCU
    rows and build the per-band coder plan."""
    mcu_h = _mcu_pixel_height(params, image.comp_count)
    if params.restart_interval <= 0 and n_bands > 1:
        raise ValueError("sharded encode requires restart markers "
                         "(restart_interval > 0): segments are the unit of "
                         "cross-device independence")
    if image.height % n_bands != 0:
        raise ValueError(
            f"image height {image.height} not divisible into {n_bands} bands")
    rows = image.height // n_bands
    if rows % mcu_h != 0:
        raise ValueError(
            f"band height {rows} is not a multiple of the MCU height {mcu_h}")
    band_image = dataclasses.replace(image, height=rows)
    plan = make_plan(params, band_image)
    # every band but the last must end exactly on a segment boundary, i.e.
    # the restart interval divides each scan's per-band MCU count
    if n_bands > 1:
        if params.interleaved and image.comp_count > 1:
            counts = {0: plan.scans[0].mcu_count}
        else:
            counts = {c.index: c.mcu_count for c in plan.components}
        for idx, cnt in counts.items():
            if cnt % params.restart_interval != 0:
                raise ValueError(
                    f"restart interval {params.restart_interval} does not "
                    f"divide scan {idx}'s per-band MCU count {cnt}; use "
                    "choose_restart_interval()")
    from ..types import image_calculate_size
    return BandLayout(
        n_bands=n_bands, rows_per_band=rows, band_image=band_image,
        plan=plan,
        band_raw_bytes=image_calculate_size(image.width, rows,
                                            image.pixel_format),
    )


def split_raw_bands(raw, image: ImageParameters, layout: BandLayout) -> np.ndarray:
    """Reshape a raw frame into (n_bands, band_raw_bytes) — contiguous for
    packed formats, a per-component row-slice shuffle for planar ones."""
    raw = np.asarray(raw, dtype=np.uint8).reshape(-1)
    desc = PIXEL_FORMAT_DESC[PixelFormat(image.pixel_format)]
    n, rows = layout.n_bands, layout.rows_per_band
    if not desc.planar:
        return raw.reshape(n, rows * image.width * desc.bpp)
    # planar: slice each component's plane by rows, re-concat per band
    sf0 = desc.sampling[0]
    parts = []
    pos = 0
    for c in range(desc.comp_count):
        sfc = desc.sampling[c]
        cw = -(-image.width * sfc.horizontal // sf0.horizontal)
        ch = -(-image.height * sfc.vertical // sf0.vertical)
        plane = raw[pos:pos + cw * ch].reshape(ch, cw)
        pos += cw * ch
        parts.append(plane.reshape(n, ch // n * cw))
    return np.concatenate(parts, axis=1)


def _global_rst_arrays(layout: BandLayout) -> tuple[np.ndarray, np.ndarray]:
    """Per-band RST markers / has-RST flags with *global* scan numbering.

    Within one scan, segment i gets RST(i % 8) after it, except the very
    last segment of the scan (reference: gpujpeg_encoder.c:479-537). Bands
    concatenate in order inside each scan, so band b's local segment j of
    scan s has global index b * segs_per_band(s) + j.
    """
    plan = layout.plan
    n = layout.n_bands
    S = plan.n_segments
    rst = np.zeros((n, S), np.int32)
    has = np.ones((n, S), np.int32)
    for s in range(S):
        scan_id = int(plan.seg_scan[s])
        local_idx = int(plan.seg_scan_index[s])
        spb = plan.scans[scan_id].segment_count
        for b in range(n):
            g = b * spb + local_idx
            rst[b, s] = 0xD0 + (g % 8)
            if b == n - 1 and local_idx == spb - 1:
                has[b, s] = 0
    return rst, has


class _V3Unroutable(Exception):
    """The stream's geometry is outside the v3 decode kernel's regime
    (wcap beyond V3_WCAP_MAX) — route to the XLA formulation; this is
    expected routing, not kernel breakage, so STRICT must not raise."""


@dataclasses.dataclass
class _DeferredBands:
    """Un-fetched per-band device output (ShardedDecoder.decode_batch
    pipelining): the device_get + stitch run at collect time."""
    out: object
    out_image: ImageParameters
    layout: "BandLayout"


class ShardedDecoder:
    """Decoder that deals restart segments to devices band by band.

    The decode mirror of :class:`ShardedEncoder`: the host parses markers
    and splits the scan into segments (O(1) with APP13 segment info,
    reference: gpujpeg_reader.c:1058-1126), deals each band's segments to
    its device, and every device runs Huffman decode -> dequant+IDCT ->
    postprocess on its band. The host stitches the raw bands back
    together. Requires every scan's segment count to divide evenly into
    bands (true for streams produced by :class:`ShardedEncoder` and for
    any stream whose per-scan MCU count is band-aligned)."""

    def __init__(self, mesh: Mesh | None = None):
        if mesh is None:
            devs = np.array(jax.devices())
            mesh = Mesh(devs.reshape(1, -1), ("frame", "seg"))
        if "seg" not in mesh.axis_names:
            raise ValueError("mesh must have a 'seg' axis")
        self.mesh = mesh
        self.n_seg = mesh.shape["seg"]
        self._cache: dict = {}

    # ------------------------------------------------------------------
    def decode(self, data: bytes) -> tuple[np.ndarray, ImageParameters]:
        from ..stream import reader as stream_reader
        from ..models.decoder import Decoder
        from ..types import ColorSpace

        info = stream_reader.read_image(data)
        n = self.n_seg
        # feasibility: height splits into whole-MCU-row bands and every
        # scan's segments divide across bands
        try:
            params, image, plan_full = self._plan_params(info)
            layout = plan_bands(params, image, n)
        except ValueError:
            dec = Decoder(backend="jax")
            return dec.decode(data)
        for scan in layout.plan.scans:
            full = plan_full.scans[scan.index].segment_count
            if full != scan.segment_count * n:
                dec = Decoder(backend="jax")
                return dec.decode(data)

        out_image = ImageParameters(
            width=info.width, height=info.height,
            color_space=ColorSpace.RGB,
            pixel_format=info.deduce_pixel_format())
        raw_bands = self._decode_bands(info, layout, out_image)
        if not isinstance(raw_bands, np.ndarray):
            # deferred device fetch (decode_batch pipelining)
            return _DeferredBands(raw_bands, out_image, layout)
        raw = self._stitch(raw_bands, out_image, layout)
        return raw, out_image

    def decode_batch(self, streams, window: int = 3) -> list:
        """Pipelined decode of a frame sequence: each frame's host work
        (parse, per-band row build) runs while earlier frames' bands
        decode on the devices; band fetch + stitch happen at collect
        time (the sharded mirror of Decoder.decode_batch). At most
        ``window`` frames' band outputs are in flight at once so long
        sequences run in bounded device memory."""
        outs = []
        pending = []   # (decode() result, stream bytes) in launch order

        def collect_one():
            item, s = pending.pop(0)
            if not isinstance(item, _DeferredBands):
                outs.append(item)
                return
            try:
                bands = np.asarray(jax.device_get(item.out))
                if bands.dtype == np.int32:
                    # px-tail bands: raw words — identical bytes
                    bands = bands.view("<u1").reshape(bands.shape[0], -1)
            except Exception:
                import os
                if os.environ.get("GPUJPEG_TPU_STRICT"):
                    raise
                # deferred kernel failure: re-decode synchronously
                # (normal fallback chain applies)
                defer = self._defer_get
                self._defer_get = False
                try:
                    outs.append(self.decode(s))
                finally:
                    self._defer_get = defer
                return
            outs.append((self._stitch(bands, item.out_image,
                                       item.layout), item.out_image))

        self._defer_get = True
        try:
            for s in streams:
                pending.append((self.decode(s), s))
                if len(pending) > window:
                    collect_one()
        finally:
            self._defer_get = False
        while pending:
            collect_one()
        return outs

    # ------------------------------------------------------------------
    def _plan_params(self, info):
        from ..types import ColorSpace, SamplingFactor
        sampling = tuple(c.sampling for c in info.components)
        sampling = sampling + (SamplingFactor(1, 1),) * (4 - len(sampling))
        params = Parameters(
            restart_interval=info.restart_interval,
            interleaved=info.interleaved,
            color_space_internal=info.color_space,
            sampling_factor=sampling,
        )
        image = ImageParameters(
            width=info.width, height=info.height,
            color_space=ColorSpace.RGB,
            pixel_format=info.deduce_pixel_format(),
        )
        return params, image, make_plan(params, image)

    def _decode_bands(self, info, layout: BandLayout, out_image):
        from ..ops.huffman_decode import (
            build_dec_geometry, build_dec_tables, huffman_decode_kernel)
        from ..ops.blocks import blocks_to_plane
        from ..ops.dct import idct_operator_f32
        from ..ops.preprocess import postprocess
        from ..tables import HuffmanTable

        plan = layout.plan
        n = layout.n_bands
        band_out = dataclasses.replace(out_image, height=layout.rows_per_band)

        from ..models.decoder import huffman_maps
        dc_by_comp, ac_by_comp = huffman_maps(info)

        from ..runtime import use_pallas_default
        if use_pallas_default():
            try:
                return self._decode_bands_v3(info, layout, band_out,
                                             dc_by_comp, ac_by_comp)
            except _V3Unroutable:
                pass   # legitimate routing (wcap beyond the v3 regime),
                       # not kernel breakage: XLA fallback even under STRICT
            except Exception as e:  # pragma: no cover - kernel gaps
                import os
                if os.environ.get("GPUJPEG_TPU_STRICT"):
                    raise   # tests set this: a silent fallback would mask
                            # sharded kernel breakage behind the slow path
                import logging
                logging.getLogger(__name__).warning(
                    "sharded pallas decode failed (%s); XLA fallback", e)
        luts, dc_tab, ac_tab = build_dec_tables(dc_by_comp, ac_by_comp)
        g = build_dec_geometry(plan)

        # deal each band its segments' bytes: band b of plan-scan s gets
        # global segments [b*spb, (b+1)*spb) of that scan
        spb = {s.index: s.segment_count for s in plan.scans}
        # per band: concatenated per-scan data slices + local seg starts
        band_blobs, band_starts = [], []
        for b in range(n):
            parts, starts = [], np.zeros(plan.n_segments, np.int64)
            base = 0
            for scan in plan.scans:
                stream_scan = info.scans[0] if info.interleaved \
                    else next(sc for sc in info.scans
                              if sc.components[0].comp_index == scan.index)
                segs = np.asarray(stream_scan.segments, np.int64)
                lo_seg = b * spb[scan.index]
                hi_seg = lo_seg + spb[scan.index]
                lo = int(segs[lo_seg, 0])
                hi = int(segs[hi_seg - 1, 1])
                part = np.asarray(stream_scan.data[lo:hi], np.uint8)
                sel = plan.seg_scan == scan.index
                starts[sel] = base + (segs[lo_seg:hi_seg, 0] - lo)
                parts.append(part)
                base += part.size
            band_blobs.append(np.concatenate(parts) if parts
                              else np.zeros(1, np.uint8))
            band_starts.append(starts)
        L_pad = max(1024, 1 << int(np.ceil(np.log2(
            max(max(bb.size for bb in band_blobs), 1)))))
        datab = np.zeros((n, L_pad), np.uint8)
        for b, bb in enumerate(band_blobs):
            datab[b, :bb.size] = bb
        startsb = np.stack(band_starts).astype(np.int32)

        # cache the jitted shard_map per (geometry, stream tables) — the
        # same per-call jit(closure) retrace bug as the v3 path
        qts = tuple(
            tuple(int(x) for x in info.quant_tables[
                info.components[c.index].quant_table_index])
            for c in plan.components)
        # geometry tensors and decode tables are runtime ARGUMENTS
        # (CLAUDE.md invariant), so the cache key only needs their shapes
        key = ("dec_v1", plan.params, plan.image, band_out, n, L_pad,
               np.asarray(luts).shape, qts)
        inv = np.empty(plan.n_blocks, dtype=np.int32)
        inv[plan.block_plane_idx] = np.arange(plan.n_blocks, dtype=np.int32)
        fn = self._cache.get(key)
        if fn is None:
            Ws = tuple(jnp.asarray(idct_operator_f32(q)) for q in qts)
            comp_slices = []
            pos = 0
            for c in plan.components:
                comp_slices.append((pos, c.block_count, c.data_height,
                                    c.data_width))
                pos += c.block_count
            n_blocks, max_iters = plan.n_blocks, g.max_iters

            from ..ops.dct import dequant_idct_device

            def local_fn(db, sb, inv_a, bc_a, sbs_a, sbc_a, luts_a,
                         dc_a, ac_a):
                gd2 = {"block_comp": bc_a, "seg_block_start": sbs_a,
                       "seg_block_count": sbc_a}

                def one(dbb, sbb):
                    coeff = huffman_decode_kernel(
                        dbb, sbb, gd2, luts_a, dc_a, ac_a, n_blocks,
                        max_iters)
                    coeff = coeff[inv_a]
                    planes = []
                    for (start, count, dh, dw), W in zip(comp_slices, Ws):
                        blocks = dequant_idct_device(
                            coeff[start:start + count], W)
                        planes.append(blocks_to_plane(blocks, dh, dw, jnp))
                    return postprocess(planes, band_out, plan, jnp)
                return jax.vmap(one)(db, sb)

            fn = jax.jit(_shard_map(
                local_fn, mesh=self.mesh,
                in_specs=(P("seg", None), P("seg", None)) + (P(),) * 7,
                out_specs=P("seg", None),
                check_vma=False,   # see the encoder shard_map note
            ))
            self._cache[key] = fn
        out = fn(jnp.asarray(datab), jnp.asarray(startsb), jnp.asarray(inv),
                 jnp.asarray(g.block_comp), jnp.asarray(g.seg_block_start),
                 jnp.asarray(g.seg_block_count), jnp.asarray(luts),
                 jnp.asarray(dc_tab), jnp.asarray(ac_tab))
        if getattr(self, "_defer_get", False):
            return out          # decode_batch fetches at collect time
        return np.asarray(jax.device_get(out))

    def _decode_bands_v3(self, info, layout: BandLayout, band_out,
                         dc_by_comp, ac_by_comp):
        """Pallas v3 lockstep decode per band under shard_map — sharded
        decode inherits the single-chip kernel's performance (round-1
        verdict item 6; the XLA scatter formulation below is the
        correctness fallback only)."""
        from ..ops.blocks import blocks_to_plane
        from ..ops.dct import dequant_idct_device, idct_operator_f32
        from ..ops.preprocess import postprocess
        from ..ops.pallas_decode import V3_WCAP_MAX, build_dec_tables_v2
        from ..ops.pallas_decode_v3 import make_decode_kernel_v3

        plan = layout.plan
        n = layout.n_bands
        S = plan.n_segments
        bps = int(plan.max_seg_block_count)

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
        ac_base = n_dc if all(
            int(ac_slot[c.index]) >= n_dc for c in plan.components) else 0
        tabs = build_dec_tables_v2(uniq)

        # per-band destuffed word rows; common Wcap across bands
        from ..ops.pallas_decode import segment_ranges_wcap
        spb = {s.index: s.segment_count for s in plan.scans}
        band_ranges = []
        wcap = 0
        for b in range(n):
            scan_data_b, segs_b = [], []
            for scan in plan.scans:
                stream_scan = info.scans[0] if info.interleaved \
                    else next(sc for sc in info.scans
                              if sc.components[0].comp_index == scan.index)
                lo_seg = b * spb[scan.index]
                segs_b.append(stream_scan.segments[
                    lo_seg:lo_seg + spb[scan.index]])
                scan_data_b.append(stream_scan.data)
            concat_b, lo_b, hi_b, w_b = segment_ranges_wcap(
                scan_data_b, segs_b, plan)
            band_ranges.append((concat_b, lo_b, hi_b))
            wcap = max(wcap, w_b)
        if wcap > V3_WCAP_MAX:   # single source: the v2/v3 route threshold
            raise _V3Unroutable("per-segment stream too large for v3 kernel")

        if plan.params.interleaved and plan.image.comp_count > 1:
            tpl0 = np.asarray([plan.block_comp[i] for i in range(bps)],
                              np.int32)
        else:
            tpl0 = np.full(bps, -1, np.int32)
        # same VMEM-budget sizing as jax_pipeline._decode_device_v2
        from ..ops.pallas_decode_v3 import V3_OUT_BYTES
        per_seg = (wcap * 4 * 2 + 64 * V3_OUT_BYTES * 2
                   + 50 * 8 * 4 // 128 * 4 + 160)
        seg_tile = max(128, min(2048, (8 << 20) // max(per_seg, 1)))
        seg_tile = 1 << (seg_tile.bit_length() - 1)
        import os
        tile_env = int(os.environ.get("GPUJPEG_TPU_DEC_SEG_TILE", "0") or 0)
        if tile_env >= 128 and tile_env % 128 == 0:
            seg_tile = tile_env     # tuning/test override
        S_pad = -(-S // seg_tile) * seg_tile
        # native column-major builder per band (no NumPy destuff loop or
        # (S, wcap) transpose — the single-chip path's host-prep win
        # applied per band); NumPy fallback without the native lib
        from ..ops.pallas_decode import (
            build_segment_rows_from_ranges, build_segment_rows_t)
        dataT = np.zeros((n, wcap, S_pad), np.int32)
        for b, (concat_b, lo_b, hi_b) in enumerate(band_ranges):
            rT = build_segment_rows_t(concat_b, lo_b, hi_b, plan, wcap,
                                      S_pad)
            if rT is None:
                rows_b = build_segment_rows_from_ranges(
                    concat_b, lo_b, hi_b, S, wcap)
                r = np.zeros((S_pad, wcap), np.uint32)
                r[:S] = rows_b
                rT = np.ascontiguousarray(r.T).view(np.int32)
            dataT[b] = rT

        seg_comp = np.zeros((S_pad, 1), np.int32)
        seg_nblk = np.zeros((S_pad, 1), np.int32)
        tpl = tpl0
        seg_nblk[:S, 0] = plan.seg_block_count
        if not (plan.params.interleaved and plan.image.comp_count > 1):
            seg_comp[:S, 0] = plan.seg_scan
        sc_in = np.broadcast_to(
            seg_comp.reshape(1, S_pad // 128, 128), (n, S_pad // 128, 128))
        sn_in = np.broadcast_to(
            seg_nblk.reshape(1, S_pad // 128, 128), (n, S_pad // 128, 128))

        # cache the jitted shard_map per (geometry, stream tables): a
        # fresh jit(closure) per call would miss jit's identity-keyed
        # cache and retrace/recompile EVERY frame of a video stream
        import hashlib
        qts = tuple(
            tuple(int(x) for x in info.quant_tables[
                info.components[c.index].quant_table_index])
            for c in plan.components)
        th = hashlib.sha1(b"".join(
            (tabs.quick.tobytes(), tabs.maxcode.tobytes(),
             tabs.delta.tobytes(), tabs.huffval.tobytes()))).hexdigest()
        nb = plan.n_blocks
        slot_in_seg = np.arange(nb, dtype=np.int32) - \
            plan.seg_block_start[plan.block_segment]
        out_row = (plan.block_segment.astype(np.int64) * bps
                   + slot_in_seg).astype(np.int32)
        out_row_identity = bool(
            np.array_equal(out_row, np.arange(nb, dtype=np.int32)))
        inv = np.empty(nb, dtype=np.int32)
        inv[plan.block_plane_idx] = np.arange(nb, dtype=np.int32)
        inv_identity = bool(
            np.array_equal(inv, np.arange(nb, dtype=np.int32)))
        # geometry-sized reorder maps ride as replicated runtime ARGUMENTS
        # (CLAUDE.md invariant: embedded million-element constants
        # serialize into the lowered module — minutes of lowering at 8K+)
        geo_args = ([] if out_row_identity else [out_row]) + \
            ([] if inv_identity else [inv])
        # per-band px tail (round 5): bands inherit the single-chip
        # fused pixel-words tail — in-kernel MXU dequant+IDCT, 2-D
        # transpose, in-VMEM un-blockify, word-domain inverse
        # transform/interleave (jax_pipeline._decode_device_v2 notes);
        # the band output is then raw WORDS, viewed as bytes at stitch
        from ..ops.rgbpack import unpack_consts, unpack_eligible
        use_px = (out_row_identity and inv_identity
                  and not (plan.params.interleaved
                           and plan.image.comp_count > 1)
                  and all(c.data_width % (8 * bps) == 0
                          and c.block_count % bps == 0
                          for c in plan.components)
                  and unpack_eligible(plan, band_out)
                  and os.environ.get("GPUJPEG_TPU_DEC_PX", "1") != "0")
        key = ("dec_v3", plan.params, plan.image, band_out, n, wcap,
               S_pad, seg_tile, n_slots, ac_base,
               tuple(int(v) for v in dc_slot),
               tuple(int(v) for v in ac_slot), th, qts, use_px,
               bool(os.environ.get("GPUJPEG_TPU_DEC_BAND")))
        fn = self._cache.get(key)
        if fn is None:
            run = make_decode_kernel_v3(seg_tile, bps, wcap, n_slots, tpl,
                                        ac_base)

            comp_slices = []
            pos = 0
            for c in plan.components:
                comp_slices.append((pos, c.block_count, c.data_height,
                                    c.data_width))
                pos += c.block_count
            # banded tail (Pallas in-VMEM un-blockify) per band —
            # default OFF like the single-chip path (the opaque kernel
            # call mid-chain broke XLA fusion for +10 ms at 8K;
            # ops/jax_pipeline._decode_device_v2 has the full note)
            from ..ops.dct import dequant_idct_words
            use_band = bool(os.environ.get("GPUJPEG_TPU_DEC_BAND"))
            Ws = tuple(jnp.asarray(idct_operator_f32(q)) for q in qts)

            if use_px:
                from ..ops.pallas_decode import unblockify_K, unblockify_bands
                from ..ops.rgbpack import interleave_raw_words
                m9i, basei = unpack_consts(plan, band_out)
                q_of = np.zeros(4, np.int32)
                for i, c in enumerate(plan.components):
                    q_of[c.index] = i
                q_of_j = jnp.asarray(q_of)
                Wq = jnp.stack(Ws)          # keyed by qts in self._cache
                n_c = len(comp_slices)
                dh0, dw0 = comp_slices[0][2], comp_slices[0][3]

                def local_fn(dT, sc, sn, *geo):
                    def one(d, c_, n_):
                        pxw = run.pixels(d, c_, n_, tabs, dc_slot,
                                         ac_slot, Wq, q_of_j)
                        Sp = pxw.shape[2]
                        w2 = pxw.reshape(bps * 16, Sp).T
                        w2 = w2.reshape(Sp * bps, 16)[:nb]
                        pall = unblockify_bands(w2, n_c * dh0, dw0,
                                                K=unblockify_K(dw0))
                        planes = [pall[i * dh0:(i + 1) * dh0]
                                  for i in range(n_c)]
                        planes = list(
                            jax.lax.optimization_barrier(tuple(planes)))
                        return interleave_raw_words(planes, m9i, basei)
                    if dT.shape[0] == 1:
                        # one band per device (the common mesh): skip
                        # the vmap — a vmapped pallas_call gains a batch
                        # grid dim that costs real per-step overhead
                        return one(dT[0], sc[0], sn[0])[None]
                    return jax.vmap(one)(dT, sc, sn)

                fn = jax.jit(_shard_map(
                    local_fn, mesh=self.mesh,
                    in_specs=(P("seg", None, None), P("seg", None, None),
                              P("seg", None, None)) + (P(),) * len(geo_args),
                    out_specs=P("seg", None, None),
                    check_vma=False,
                ))
                self._cache[key] = fn
                return self._run_dec_v3(fn, dataT, sc_in, sn_in, geo_args)

            # small decode tables ride as captured constants (replicated)
            def local_fn(dT, sc, sn, *geo):
                gi = iter(geo)
                out_row_a = None if out_row_identity else next(gi)
                inv_a = None if inv_identity else next(gi)

                def one(d, c_, n_):
                    out3 = run(d, c_, n_, tabs, dc_slot, ac_slot)
                    flat = out3.reshape(-1, 64)
                    coeff = (flat[:nb] if out_row_identity
                             else flat[out_row_a])
                    coeff = coeff if inv_identity else coeff[inv_a]
                    # banded tail: fused dequant+IDCT pair matmul in the
                    # decode band byte order + Pallas un-blockify (the
                    # XLA blocks_to_plane transpose this replaces was
                    # half the single-chip decode tail, BENCHMARKS.md)
                    from ..ops.blocks import blocks_to_plane
                    from ..ops.pallas_decode import unblockify_K, unblockify_bands
                    planes = []
                    for (start, count, dh, dw), W in zip(comp_slices, Ws):
                        cs = coeff[start:start + count]
                        if use_band:
                            words = dequant_idct_words(cs, W)
                            pw = unblockify_bands(words, dh, dw)
                            planes.append(jax.lax.bitcast_convert_type(
                                pw, jnp.uint8).reshape(dh, dw))
                        else:
                            blocks = dequant_idct_device(cs, W)
                            planes.append(
                                blocks_to_plane(blocks, dh, dw, jnp))
                    planes = list(
                        jax.lax.optimization_barrier(tuple(planes)))
                    return postprocess(planes, band_out, plan, jnp)
                return jax.vmap(one)(dT, sc, sn)

            fn = jax.jit(_shard_map(
                local_fn, mesh=self.mesh,
                in_specs=(P("seg", None, None), P("seg", None, None),
                          P("seg", None, None)) + (P(),) * len(geo_args),
                out_specs=P("seg", None),
                check_vma=False,   # pallas_call out_shapes carry no vma
            ))
            self._cache[key] = fn
        return self._run_dec_v3(fn, dataT, sc_in, sn_in, geo_args)

    def _run_dec_v3(self, fn, dataT, sc_in, sn_in, geo_args):
        dev_args = (jnp.asarray(dataT),
                    jnp.asarray(np.ascontiguousarray(sc_in)),
                    jnp.asarray(np.ascontiguousarray(sn_in)),
                    *(jnp.asarray(a) for a in geo_args))
        # bench hook (mirrors Decoder.capture_device_call)
        self.last_device_call = (fn, dev_args)
        out = fn(*dev_args)
        if getattr(self, "_defer_get", False):
            return out          # decode_batch fetches at collect time
        out_h = np.asarray(jax.device_get(out))
        if out_h.dtype == np.int32:
            # px-tail bands emit raw words — identical bytes, free view
            out_h = out_h.view("<u1").reshape(out_h.shape[0], -1)
        return out_h

    @staticmethod
    def _stitch(raw_bands: np.ndarray, out_image: ImageParameters,
                layout: BandLayout) -> np.ndarray:
        """Inverse of split_raw_bands: per-band raw buffers -> one frame."""
        desc = PIXEL_FORMAT_DESC[PixelFormat(out_image.pixel_format)]
        if not desc.planar:
            return raw_bands.reshape(-1)
        n = layout.n_bands
        H, W = out_image.height, out_image.width
        sf0 = desc.sampling[0]
        parts = []
        pos = 0
        for c in range(desc.comp_count):
            sfc = desc.sampling[c]
            cw = -(-W * sfc.horizontal // sf0.horizontal)
            ch = -(-H * sfc.vertical // sf0.vertical)
            rows_band = ch // n
            parts.append(raw_bands[:, pos:pos + rows_band * cw].reshape(-1))
            pos += rows_band * cw
        return np.concatenate(parts)


@dataclasses.dataclass
class _ShardedBuild:
    """Cached per-(params, image) sharded-encode state with lazy tier-2."""
    layout: BandLayout
    quant_zz: dict
    huff: dict
    rst_np: np.ndarray
    has_np: np.ndarray
    plan: CoderPlan
    geo1: object
    geo2: object
    make_fn: object
    fn1: object = None
    fn2: object = None

    def tier2(self):
        """Worst-case-capacity variant, built lazily on tier-1 overflow
        (mirror of the single-chip encode_segments_device tier loop)."""
        if self.fn2 is None:
            from ..ops.entropy_v2 import build_uniform_geometry
            self.geo2 = build_uniform_geometry(self.plan)
            self.fn2 = self.make_fn(self.geo2)
        return self.geo2, self.fn2


class ShardedEncoder:
    """Encoder that shards one image's MCU-row bands across the 'seg' mesh
    axis and (optionally) a frame batch across the 'frame' axis."""

    def __init__(self, mesh: Mesh | None = None):
        if mesh is None:
            devs = np.array(jax.devices())
            mesh = Mesh(devs.reshape(1, -1), ("frame", "seg"))
        if "seg" not in mesh.axis_names:
            raise ValueError("mesh must have a 'seg' axis")
        self.mesh = mesh
        self.n_seg = mesh.shape["seg"]
        self.n_frame = mesh.shape.get("frame", 1)
        self._cache: dict = {}

    # ------------------------------------------------------------------
    def _build(self, params: Parameters, image: ImageParameters):
        key = (params, image)
        hit = self._cache.get(key)
        if hit is not None:
            return hit

        from ..ops.entropy_v2 import (
            block_byte_budget, build_packed_tables, build_uniform_geometry,
            seg_budget_for_quality)

        layout = plan_bands(params, image, self.n_seg)
        plan = layout.plan
        quant_zz = {
            0: quant_table_zz(ComponentType.LUMINANCE, params.quality),
            1: quant_table_zz(ComponentType.CHROMINANCE, params.quality),
        }
        huff = {
            (ct, ht): default_huffman_table(ct, ht)
            for ct in (ComponentType.LUMINANCE, ComponentType.CHROMINANCE)
            for ht in (HuffmanType.DC, HuffmanType.AC)
        }
        tabs = build_packed_tables(huff)
        rst_np, has_np = _global_rst_arrays(layout)
        geo_probe = build_uniform_geometry(plan)
        budget = seg_budget_for_quality(params.quality, geo_probe.bps)
        from ..runtime import use_pallas_default
        use_pallas = use_pallas_default()

        from ..tables import dct_zigzag_operator
        D64, bias64 = dct_zigzag_operator()
        D = jnp.asarray(D64.astype(np.float32))
        bias = jnp.asarray(bias64.astype(np.float32))
        qdiv = jnp.asarray(np.maximum(np.stack([
            np.asarray(quant_zz[0], np.float32),
            np.asarray(quant_zz[1], np.float32)]), 1.0))
        # row layout (coeff_idx / block_cls) is capacity-independent:
        # geo_probe, tier-1 and tier-2 share it
        NB = plan.n_blocks
        spp = np.append(plan.block_plane_idx, NB)
        idx_plane = spp[np.minimum(geo_probe.coeff_idx, NB)]
        idx_plane[geo_probe.coeff_idx >= NB] = NB
        idx_plane_j = jnp.asarray(idx_plane)
        cls_rows = jnp.asarray(geo_probe.block_cls)
        band_image = layout.band_image

        # band geometry tensors are jit ARGUMENTS (replicated across the
        # mesh), not closed-over constants: embedded-constant lowering
        # costs minutes at scale, and the runtime-arg form keeps the
        # quant divide numerically identical to the single-chip
        # encoder's (XLA strength-reduces divides by embedded constants,
        # which changes float rounding and breaks byte-identity)
        valid_rows = jnp.asarray(geo_probe.block_valid)
        dcd_rows = jnp.asarray(geo_probe.dc_dist)
        from ..ops.entropy_v2 import encode_rows_arrays
        geo_args = (idx_plane_j, cls_rows, valid_rows, dcd_rows, qdiv)

        identity_gather = bool(np.array_equal(
            idx_plane, np.arange(geo_probe.n_rows, dtype=np.int64)))

        def _fused_band_ctx(geo_t):
            """Flagship single-kernel eligibility for the band plan —
            mirrors jax_pipeline._build_fn's full_ok/band_ok so each
            band runs the same band-input ``encode_dct_fused_full``
            kernel as the single-chip encoder (round-3 verdict: the
            sharded encoder was one kernel generation behind)."""
            from ..ops.entropy_v2 import band_perm_rows, fused_dct_inputs
            Wb = geo_t.words_per_block
            bps = geo_t.bps
            if not (use_pallas and identity_gather
                    and geo_probe.n_rows % 2 == 0
                    and not params.interleaved
                    and bps * Wb == 128 and geo_t.cap_out_bytes % 4 == 0
                    and not os.environ.get("GPUJPEG_TPU_NO_FULL_FUSED")):
                return None
            T2 = int(os.environ.get("GPUJPEG_TPU_FUSED_TILE", "2048")) // 2
            seg_rows = bps // 2
            spec, D2_h, bias2_h, qrows_h = fused_dct_inputs(
                plan, quant_zz, seg_rows)
            widths = {c.data_width for c in plan.components}
            ppb = (plan.components[0].data_width // 16
                   if len(widths) == 1 else 0)
            band_ok = (ppb > 0
                       and plan.components[0].data_width % 16 == 0
                       and all(c.block_count % 2 == 0
                               for c in plan.components)
                       and not os.environ.get("GPUJPEG_TPU_NO_BAND"))

            def _kb_ok(k):
                t2 = k * ppb
                return ((2 * t2) % bps == 0 and (t2 * 2 * Wb) % 128 == 0
                        and (2 * t2 // bps) % 8 == 0)

            if band_ok:
                cands = sorted(range(1, max(2, (2 * T2) // ppb + 9)),
                               key=lambda k: abs(k * ppb - T2))
                Kb = next((k for k in cands if _kb_ok(k)), 0)
                band_ok = Kb > 0
                if band_ok:
                    T2f = Kb * ppb
            if not band_ok:
                T2f = T2
                if (2 * T2f) % bps or (T2f * 2 * Wb) % 128:
                    return None
            spt_t = 2 * T2f // bps
            S = plan.n_segments
            S_pad = -(-S // spt_t) * spt_t
            M = geo_probe.n_rows // 2
            if band_ok and ((S_pad - S) * bps // 2) % ppb:
                band_ok = False     # band row padding must be whole bands
                T2f = T2
                spt_t = 2 * T2f // bps
                S_pad = -(-S // spt_t) * spt_t
                if (2 * T2f) % bps or (T2f * 2 * Wb) % 128:
                    return None
            return dict(spec=spec, bias2_h=bias2_h, qrows_h=qrows_h,
                        D2f_h=(D2_h[band_perm_rows()] if band_ok
                               else D2_h),
                        T2f=T2f, ppb=ppb, band_ok=band_ok,
                        S_pad=S_pad, M=M, Wb=Wb)

        def make_fn(geo_t):
            fc = _fused_band_ctx(geo_t)
            # words front end per band (round 5): the host views the
            # band's raw bytes as i32 words for free and the whole
            # preprocess+pack stage becomes one lane-aligned word pass
            # (ops/rgbpack.py; the single-chip encoder's io-floor fix)
            from ..ops.rgbpack import pack_consts, pack_eligible
            words_mode = bool(fc and fc["band_ok"] and pack_eligible(plan))
            if words_mode:
                m9p, basep = pack_consts(plan)

            def encode_band_fused(raw_band, rst, has_rst):
                from ..ops.blocks import plane_to_blocks_u32
                from ..ops.entropy_v2 import encode_dct_fused_full
                from ..ops.rgbpack import pack_plane_words
                S = plan.n_segments
                S_pad, M, T2f, ppb = (fc["S_pad"], fc["M"], fc["T2f"],
                                      fc["ppb"])
                Mp_f = S_pad * geo_t.bps // 2
                if not words_mode:
                    planes = preprocess(raw_band, band_image, plan, jnp)
                    planes = jax.lax.optimization_barrier(tuple(planes))
                rst2 = jnp.pad(rst.astype(jnp.int32),
                               (0, S_pad - S))[:, None]
                hrst2 = jnp.pad(has_rst.astype(jnp.int32),
                                (0, S_pad - S))[:, None]
                if words_mode:
                    raw_w = raw_band.reshape(band_image.height, -1)
                    pw = pack_plane_words(raw_w, m9p, basep, "planes")
                    pad_rows = (Mp_f - M) // ppb * 8
                    if pad_rows:
                        pw = jnp.pad(pw, ((0, pad_rows), (0, 0)))
                    out, out_len, seg_bits, n_ff = encode_dct_fused_full(
                        pw, rst2, hrst2, fc["spec"], fc["D2f_h"],
                        fc["bias2_h"], fc["qrows_h"], tabs, fc["Wb"],
                        geo_t.bps, geo_t.cap_seg_words,
                        geo_t.cap_out_bytes, geo_t.max_stuff,
                        tile=2 * T2f, band_ppb=ppb)
                elif fc["band_ok"]:
                    pw = jnp.concatenate([
                        jax.lax.bitcast_convert_type(
                            jax.lax.bitcast_convert_type(
                                p.reshape(p.shape[0], p.shape[1] // 4, 4),
                                jnp.uint32), jnp.int32)
                        for p in planes])
                    pad_rows = (Mp_f - M) // ppb * 8
                    if pad_rows:
                        pw = jnp.pad(pw, ((0, pad_rows), (0, 0)))
                    out, out_len, seg_bits, n_ff = encode_dct_fused_full(
                        pw, rst2, hrst2, fc["spec"], fc["D2f_h"],
                        fc["bias2_h"], fc["qrows_h"], tabs, fc["Wb"],
                        geo_t.bps, geo_t.cap_seg_words,
                        geo_t.cap_out_bytes, geo_t.max_stuff,
                        tile=2 * T2f, band_ppb=ppb)
                else:
                    pbw = jnp.concatenate(
                        [plane_to_blocks_u32(p, jnp) for p in planes])
                    pbw = pbw.reshape(-1, 32)
                    if Mp_f > M:
                        pbw = jnp.pad(pbw, ((0, Mp_f - M), (0, 0)))
                    out, out_len, seg_bits, n_ff = encode_dct_fused_full(
                        pbw, rst2, hrst2, fc["spec"], fc["D2f_h"],
                        fc["bias2_h"], fc["qrows_h"], tabs, fc["Wb"],
                        geo_t.bps, geo_t.cap_seg_words,
                        geo_t.cap_out_bytes, geo_t.max_stuff,
                        tile=2 * T2f)
                WO4 = geo_t.cap_out_bytes // 4
                out = out.reshape(S_pad, WO4)[:S].reshape(-1)
                return out, out_len[:S], seg_bits[:S], n_ff[:S]

            def encode_band(raw_band, rst, has_rst, idxp, clsr, validr,
                            dcdr, qd):
                if fc is not None:
                    return encode_band_fused(raw_band, rst, has_rst)
                planes = preprocess(raw_band, band_image, plan, jnp)
                planes = jax.lax.optimization_barrier(tuple(planes))
                pblocks = jnp.concatenate(
                    [plane_to_blocks(p, jnp) for p in planes])
                pblocks = jnp.concatenate(
                    [pblocks, jnp.zeros((1, 64), pblocks.dtype)])
                x = pblocks[idxp].astype(jnp.float32)
                y = jax.lax.dot_general(
                    x, D, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32) - bias
                rows = jnp.rint(y / qd[clsr]).astype(jnp.int32)
                return encode_rows_arrays(
                    rows, clsr, validr, dcdr, rst, has_rst,
                    geo_t.dc_distances, geo_t.bps, geo_t.cap_seg_words,
                    geo_t.cap_out_bytes, geo_t.words_per_block, tabs,
                    use_pallas, geo_t.max_stuff)

            def local_fn(raw, rst, has_rst, idxp, clsr, validr, dcdr, qd):
                # raw: (B_local, 1, band_bytes); rst/has: (1, S_local)
                out, out_len, seg_bits, n_ff = jax.vmap(
                    lambda r: encode_band(r, rst[0], has_rst[0], idxp,
                                          clsr, validr, dcdr, qd))(raw[:, 0])
                return (out[:, None], out_len[:, None],
                        seg_bits[:, None], n_ff[:, None])

            fspec = "frame" if "frame" in self.mesh.axis_names else None
            jfn = jax.jit(_shard_map(
                local_fn, mesh=self.mesh,
                in_specs=(P(fspec, "seg", None), P("seg", None),
                          P("seg", None), P(None), P(None), P(None),
                          P(None), P(None, None)),
                out_specs=(P(fspec, "seg", None), P(fspec, "seg", None),
                           P(fspec, "seg", None), P(fspec, "seg", None)),
                check_vma=False,   # pallas_call out_shapes carry no vma:
                                   # the Pallas entropy kernels inside
                                   # otherwise fail shard_map's vma check
                                   # (the on-chip multi-device path; the
                                   # CPU suite's XLA fallback hid this)
            ))
            wrapped = lambda bands, rst, has: jfn(bands, rst, has,
                                                 *geo_args)
            wrapped.input_form = "words" if words_mode else "flat"
            return wrapped

        built = _ShardedBuild(
            layout=layout, quant_zz=quant_zz, huff=huff,
            rst_np=rst_np, has_np=has_np, plan=plan,
            geo1=build_uniform_geometry(
                plan, cap_bytes_per_block=block_byte_budget(params.quality),
                seg_byte_budget=min(budget, geo_probe.cap_seg_words * 4)),
            geo2=None, make_fn=make_fn)
        built.fn1 = make_fn(built.geo1)
        self._cache[key] = built
        return built

    # ------------------------------------------------------------------
    def encode(self, raw, params: Parameters, image: ImageParameters) -> bytes:
        """Encode one frame sharded across the 'seg' axis."""
        return self.encode_batch([raw], params, image)[0]

    def encode_batch(self, raws, params: Parameters,
                     image: ImageParameters) -> list[bytes]:
        """Encode a batch of same-geometry frames: frames sharded over the
        'frame' axis, each frame's bands over the 'seg' axis. Tier-1
        typical-content capacity overflow reruns on the tier-2 worst-case
        geometry; pathological content beyond that falls back to the host
        golden coder per frame (mirrors encode_segments_device's loop)."""
        b = self._build(params, image)
        layout = b.layout
        B = len(raws)
        # pad the batch to a multiple of the frame axis
        Bp = -(-B // self.n_frame) * self.n_frame
        bands = np.stack([
            split_raw_bands(raws[min(i, B - 1)], image, layout)
            for i in range(Bp)
        ])  # (Bp, n_bands, band_bytes)
        rst_j, has_j = jnp.asarray(b.rst_np), jnp.asarray(b.has_np)
        bands_cache: dict = {}

        def bands_for(form):
            # words form: free host view of the same bytes (the
            # single-chip encoder's round-5 io-floor trick, per band)
            if form not in bands_cache:
                bands_cache[form] = jnp.asarray(
                    bands.view("<i4") if form == "words" else bands)
            return bands_cache[form]

        for tier in (1, 2):
            geo, fn = (b.geo1, b.fn1) if tier == 1 else b.tier2()
            bands_j = bands_for(getattr(fn, "input_form", "flat"))
            # bench hook (mirrors Decoder.capture_device_call): the
            # compiled sharded jit + this batch's device args, so perf
            # scripts can time pipelined device-only iterations
            self.last_device_call = (fn, (bands_j, rst_j, has_j))
            out, out_len, seg_bits, n_ff = fn(bands_j, rst_j, has_j)
            len_h = np.asarray(jax.device_get(out_len))
            bits_h = np.asarray(jax.device_get(seg_bits))
            nff_h = np.asarray(jax.device_get(n_ff))
            stuffed = ((bits_h + 7) >> 3) + nff_h
            overflow = (bits_h > geo.cap_seg_words * 4 * 8).any() or \
                (stuffed + 2 > geo.cap_out_bytes).any() or \
                (nff_h > geo.max_stuff).any()
            if not overflow:
                out_h = np.asarray(jax.device_get(out))
                if out_h.dtype == np.uint32:  # pallas stuffing packs words
                    out_h = np.ascontiguousarray(out_h).view(np.uint8)
                return [self._assemble(layout, b.quant_zz, b.huff,
                                       out_h[f], len_h[f], params, image)
                        for f in range(B)]

        # beyond worst-case caps: host golden coder (last resort)
        from ..models.encoder import Encoder
        enc = Encoder(backend="golden")
        return [enc.encode(np.asarray(r), params, image) for r in raws]

    # ------------------------------------------------------------------
    def _assemble(self, layout: BandLayout, quant_zz, huff,
                  out_f: np.ndarray, len_f: np.ndarray,
                  params: Parameters, image: ImageParameters) -> bytes:
        """Host-side stream formatting: concatenate per-band segment bytes in
        global scan order (reference: gpujpeg_encoder.c:479-537)."""
        plan = layout.plan
        n, S = layout.n_bands, plan.n_segments
        cap = out_f.shape[-1] // S
        regions = out_f.reshape(n * S, cap)
        lens = len_f.reshape(n * S)

        # full-image plan for the header (correct total height)
        full_plan = make_plan(params, image)
        w = JpegWriter()
        w.write_header(full_plan, quant_zz, huff, HeaderType.DEFAULT)
        for scan in plan.scans:
            local_ids = np.nonzero(plan.seg_scan == scan.index)[0]
            order = (np.arange(n)[:, None] * S + local_ids[None, :]).reshape(-1)
            slens = lens[order]
            starts = np.concatenate([[0], np.cumsum(slens)])
            total = int(starts[-1])
            seg_of_byte = np.repeat(np.arange(order.size), slens)
            off_of_byte = np.arange(total) - np.repeat(starts[:-1], slens)
            body = regions[order[seg_of_byte], off_of_byte]
            w.write_scan_header(full_plan, scan.index)
            w.emit_bytes(body)
            w.patch_segment_info(starts)
        w.write_eoi()
        return w.tobytes()
