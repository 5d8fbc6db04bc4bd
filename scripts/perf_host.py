"""Host-side phase timings at 8K — chip-independent (pure CPU work).

Measures the pieces of the single-call walls that do NOT run on the
device: the stream parse (with and without APP13 segment info), the
decode row build (native + NumPy fallback), and the encode stream
assembly. These bound the decode single-call wall target
(VERDICT round 2: <= 60 ms at 8K with seginfo) independently of the
device kernel time.

Run: JAX_PLATFORMS=cpu python -u scripts/perf_host.py [H W]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from gpujpeg_tpu.models.encoder import Encoder
from gpujpeg_tpu.params import ImageParameters, Parameters
from gpujpeg_tpu.plan import make_plan
from gpujpeg_tpu.stream.reader import read_image
from gpujpeg_tpu.types import ColorSpace, PixelFormat


def make_rgb(h, w, seed=7):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([128 + 90 * np.sin(x / 23.0) * np.cos(y / 17.0),
                    128 + 80 * np.cos(x / 31.0 + 1.0) * np.sin(y / 11.0),
                    128 + 70 * np.sin((x + y) / 41.0)], axis=-1)
    img += rng.normal(0, 3.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def t(label, fn, iters=5):
    fn()  # warm
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        times.append((time.perf_counter() - t0) * 1e3)
    print(f"  {label:44s} min {min(times):8.2f} ms   "
          f"mean {np.mean(times):8.2f} ms")
    return out


def main():
    H = int(sys.argv[1]) if len(sys.argv) > 2 else 4320
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 7680
    image = ImageParameters(width=W, height=H, color_space=ColorSpace.RGB,
                            pixel_format=PixelFormat.PF_444_U8_P012)
    img = make_rgb(H, W)
    enc = Encoder(backend="golden")

    for seginfo in (True, False):
        params = Parameters(quality=75, restart_interval=32,
                            segment_info=seginfo, interleaved=False)
        plan = make_plan(params, image)
        print(f"\n=== {W}x{H} Q75 ri=32 segment_info={seginfo} "
              f"({plan.n_segments} segments) ===")
        t0 = time.perf_counter()
        data = enc.encode(img.reshape(-1), params, image)
        print(f"  golden encode (one-time setup)              "
              f"{(time.perf_counter()-t0)*1e3:10.0f} ms   "
              f"{len(data)/1e6:.1f} MB stream")

        # --- encode host side: stream assembly from scan bodies ---
        quant_zz, huff = enc._tables(params)
        seg_bytes = enc._encode_segments_golden(img.reshape(-1), plan,
                                                quant_zz, huff)
        bodies = t("encode: scan bodies from segment bytes",
                   lambda: enc._to_scan_bodies(plan, seg_bytes))
        t("encode: _assemble (writer + seginfo patch)",
          lambda: enc._assemble(plan, quant_zz, huff, *bodies))

        # --- decode host side ---
        from gpujpeg_tpu.models.decoder import Decoder
        info = t("decode: read_image (marker parse + scan split)",
                 lambda: read_image(data))
        dec = Decoder(backend="golden")
        dplan, scan_data, segments_by_scan = t(
            "decode: plan + scan tables from info",
            lambda: dec._plan_from_info(info))
        from gpujpeg_tpu.ops.pallas_decode import (
            build_segment_rows_from_ranges, build_segment_rows_t,
            segment_ranges_wcap)
        concat, lo_r, hi_r, wcap = t(
            "decode: segment ranges + concat",
            lambda: segment_ranges_wcap(scan_data, segments_by_scan, dplan))
        S = dplan.n_segments
        S_pad = -(-S // 128) * 128
        rows_t = t("decode: native row build (transposed)",
                   lambda: build_segment_rows_t(concat, lo_r, hi_r, dplan,
                                                wcap, S_pad))
        if rows_t is None:
            print("  (native lib unavailable: transposed build skipped)")
        t("decode: NumPy row build (fallback)",
          lambda: build_segment_rows_from_ranges(concat, lo_r, hi_r, S,
                                                 wcap), iters=2)
        print(f"  row payload: S={S} wcap={wcap} "
              f"-> {S_pad * wcap * 4 / 1e6:.1f} MB H2D "
              f"(raw scan body {sum(s.size for s in scan_data)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
