"""Decoder orchestrator — the analog of ``gpujpeg_decoder_decode``
(reference: src/gpujpeg_decoder.c:206-402).

Pipeline: parse -> segment-parallel Huffman decode -> fused dequant+IDCT ->
postprocess -> raw output. Uses the host golden path or JAX device path;
like the reference, tiny segment counts fall back to the host decoder
(gpujpeg_decoder.c:238-252).
"""
from __future__ import annotations

import dataclasses
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


class DecoderStats:
    def __init__(self) -> None:
        self.duration_stream = 0.0
        self.duration_huffman_coder = 0.0
        self.duration_dct_quantization = 0.0
        self.duration_postprocessor = 0.0
        self.duration_in_gpu = 0.0

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
        self._jax_ctx = None

    def init(self, params, image) -> None:
        """Pre-initialize for a known stream geometry so the first real
        decode skips compile/alloc (reference: gpujpeg_decoder_init,
        gpujpeg_decoder.c:158-202). Encodes and decodes a synthetic
        frame of that geometry; the device executables are cached by
        (params, image, output format, stream-capacity bucket), and the
        synthetic frame lands in the same bucket as typical content."""
        import numpy as np
        from .encoder import Encoder
        from ..types import image_calculate_size
        size = image_calculate_size(image.width, image.height,
                                    image.pixel_format)
        data = Encoder(backend=self.backend).encode(
            np.zeros(size, np.uint8), params, image)
        self.decode(data)

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
        frame."""
        out = []
        pending = []   # (raw, out_image, jpeg_bytes) in launch order

        def collect_one():
            raw, oi, d = pending.pop(0)
            if isinstance(raw, np.ndarray):
                out.append((raw, oi))
                return
            try:
                if getattr(self, "output_to_device", False):
                    # materialize one element: surfaces a deferred kernel
                    # failure now (so the fallback below can run) without
                    # a full-frame D2H; later frames' queued device work
                    # proceeds under this tiny transfer
                    np.asarray(raw.reshape(-1)[:1])
                    arr = raw
                else:
                    arr = np.asarray(raw)
            except Exception:
                # a deferred kernel failure surfaces at sync time, after
                # the launch-time fallback in decode_device has already
                # passed — re-decode this frame on the synchronous path
                # (which applies the normal downgrade/fallback chain)
                defer = self._defer_sync
                self._defer_sync = False
                try:
                    arr, oi = self.decode(d)
                finally:
                    self._defer_sync = defer
            out.append((arr, oi))

        self._defer_sync = True
        try:
            for d in datas:
                raw, oi = self.decode(d)
                pending.append((raw, oi, d))
                if len(pending) > window:
                    collect_one()
        finally:
            self._defer_sync = False
        while pending:
            collect_one()
        return out

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
            color_space=self.output_color_space or ColorSpace.RGB,
            pixel_format=self.output_format or info.deduce_pixel_format(),
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
