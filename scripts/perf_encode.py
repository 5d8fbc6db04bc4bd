"""Device-pipeline encode timing at 8K through the real encoder context.

Measures ctx.fn (the full fused device pipeline) with pipelined
dispatches, mirroring bench.py's device-pipeline methodology.
Run: python -u scripts/perf_encode.py [iters]
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from gpujpeg_tpu.models.encoder import Encoder
from gpujpeg_tpu.params import ImageParameters, Parameters
from gpujpeg_tpu.plan import make_plan
from gpujpeg_tpu.types import ColorSpace, PixelFormat
from gpujpeg_tpu.ops.jax_pipeline import _enc_context


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
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    H, W = 4320, 7680
    params = Parameters(quality=75, restart_interval=32)
    image = ImageParameters(width=W, height=H, color_space=ColorSpace.RGB,
                            pixel_format=PixelFormat.PF_444_U8_P012)
    plan = make_plan(params, image)
    quant_zz, huff = Encoder()._tables(params)
    t0 = time.perf_counter()
    ctx = _enc_context(plan, quant_zz, huff)
    img = make_rgb(H, W)
    raw_j = jnp.asarray(img.reshape(-1))
    r = ctx.fn(raw_j)
    jax.block_until_ready(r)
    np.asarray(jax.device_get(r[0].reshape(-1)[:1]))
    print(f"first call (compile/cache load): "
          f"{time.perf_counter() - t0:.1f} s")

    t0 = time.perf_counter()
    for _ in range(iters):
        r = ctx.fn(raw_j)
    np.asarray(jax.device_get(r[0].reshape(-1)[:1]))
    dt = (time.perf_counter() - t0) / iters * 1e3
    mpix = H * W / 1e6
    print(f"device pipeline: {dt:.2f} ms/frame ({mpix / dt * 1e3:.0f} "
          f"Mpix/s)  [vs r01: 43.48 ms]")
    # sanity: stream decodes
    out_len = np.asarray(r[1])
    print(f"total entropy bytes: {int(out_len.sum())}")


if __name__ == "__main__":
    main()
