"""Decode perf at 8K: device pipeline timing + profiler trace.

Run: python -u scripts/perf_decode.py [--trace]
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from gpujpeg_tpu.models.decoder import Decoder
from gpujpeg_tpu.models.encoder import Encoder
from gpujpeg_tpu.params import ImageParameters, Parameters
from gpujpeg_tpu.types import ColorSpace, PixelFormat


def make_rgb(h, w, seed=7):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    r = 128 + 90 * np.sin(x / 23.0) * np.cos(y / 17.0)
    g = 128 + 80 * np.cos(x / 31.0 + 1.0) * np.sin(y / 11.0)
    b = 128 + 70 * np.sin((x + y) / 41.0)
    img = np.stack([r, g, b], axis=-1)
    img += rng.normal(0, 3.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    trace = "--trace" in sys.argv
    H, W = 4320, 7680
    params = Parameters(quality=75, restart_interval=32, segment_info=True)
    image = ImageParameters(width=W, height=H, color_space=ColorSpace.RGB,
                            pixel_format=PixelFormat.PF_444_U8_P012)
    img = make_rgb(H, W)
    t0 = time.perf_counter()
    data = Encoder(backend="golden").encode(img.reshape(-1), params, image)
    print(f"encode (host golden): {time.perf_counter()-t0:.1f} s, "
          f"{len(data)/1e6:.2f} MB")

    dec = Decoder(backend="jax")
    dec.set_output_format(ColorSpace.RGB, PixelFormat.PF_444_U8_P012)

    # single-call wall (incl host parse + row build + upload + D2H)
    t0 = time.perf_counter()
    raw, oi = dec.decode(data)
    wall1 = time.perf_counter() - t0
    print(f"first call wall (compile+run): {wall1*1e3:.0f} ms")
    walls = []
    for _ in range(5):
        t0 = time.perf_counter()
        raw, oi = dec.decode(data)
        walls.append(time.perf_counter() - t0)
    print(f"single-call wall: min {min(walls)*1e3:.1f} ms  "
          f"mean {np.mean(walls)*1e3:.1f} ms  "
          f"(in_gpu stat {dec.stats.duration_in_gpu:.1f} ms)")

    if trace:
        with jax.profiler.trace("/tmp/jaxtrace_dec"):
            for _ in range(3):
                raw, _ = dec.decode(data)
        print("trace in /tmp/jaxtrace_dec")


if __name__ == "__main__":
    main()
