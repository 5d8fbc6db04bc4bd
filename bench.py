#!/usr/bin/env python
"""Headline benchmark: 8K (7680x4320, 33 Mpix) RGB encode at Q75,
non-interleaved, restart markers — the reference's flagship number
(GTX 3080: 6.20 ms encode, BASELINE.md).

Prints ONE JSON line:
  {"metric": "encode_8k_q75_ms", "value": <ms>, "unit": "ms",
   "vs_baseline": <6.20 / ms>}   (>1.0 = faster than the GTX 3080)

Extra diagnostics (decode time, throughput, per-stage stats) go to stderr.
"""
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_image(H, W, seed=7):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:H, 0:W]
    img = np.stack([
        128 + 90 * np.sin(x / 23.0) * np.cos(y / 17.0),
        128 + 80 * np.cos(x / 31.0 + 1.0) * np.sin(y / 11.0),
        128 + 70 * np.sin((x + y) / 41.0),
    ], axis=-1)
    img += rng.normal(0, 3.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_gpujpeg_tpu")
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from gpujpeg_tpu.models.encoder import Encoder
    from gpujpeg_tpu.models.decoder import Decoder
    from gpujpeg_tpu.params import ImageParameters, Parameters, \
        suggest_restart_interval
    from gpujpeg_tpu.types import ColorSpace, PixelFormat

    H, W = 4320, 7680
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    log(f"devices: {jax.devices()}")
    log(f"image: {W}x{H} ({W*H/1e6:.1f} Mpix), Q75 non-interleaved, {iters} iters")

    img = make_image(H, W)
    image = ImageParameters(width=W, height=H, color_space=ColorSpace.RGB,
                            pixel_format=PixelFormat.PF_444_U8_P012)
    ri = suggest_restart_interval(image, subsampled=False, interleaved=False)
    params = Parameters(quality=75, restart_interval=ri, interleaved=False)
    log(f"restart interval: {ri}")

    enc = Encoder(backend="jax")
    t0 = time.perf_counter()
    out = enc.encode(img, params, image)
    log(f"first-iteration (compile+alloc): {(time.perf_counter()-t0)*1e3:.1f} ms, "
        f"{len(out)/1e6:.2f} MB jpeg")

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = enc.encode(img, params, image)
        times.append((time.perf_counter() - t0) * 1e3)
    enc_ms = float(np.mean(times))
    log(f"encode: mean {enc_ms:.2f} ms  min {min(times):.2f}  max {max(times):.2f}")
    log(f"encode stats: {enc.stats.asdict()}")
    log(f"encode throughput: {W*H/1e6/enc_ms*1e3:.0f} Mpix/s "
        f"(baseline GTX3080: 5320 Mpix/s)")

    # decode side (diagnostic; baseline 6.76 ms)
    dec = Decoder(backend="jax")
    dec.decode(out)
    dtimes = []
    for _ in range(max(iters // 2, 3)):
        t0 = time.perf_counter()
        raw, _ = dec.decode(out)
        dtimes.append((time.perf_counter() - t0) * 1e3)
    dec_ms = float(np.mean(dtimes))
    log(f"decode: mean {dec_ms:.2f} ms  (baseline 6.76 ms)")

    mse = np.mean((raw.reshape(H, W, 3).astype(np.float64) - img) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    log(f"round-trip PSNR: {psnr:.2f} dB")

    print(json.dumps({
        "metric": "encode_8k_q75_ms",
        "value": round(enc_ms, 3),
        "unit": "ms",
        "vs_baseline": round(6.20 / enc_ms, 4),
    }))


if __name__ == "__main__":
    main()
