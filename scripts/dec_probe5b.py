#!/usr/bin/env python
"""On-chip A/B of the fused pixel-words decode tail vs the plan tail at
8K Q75: pipelined device decode + per-stage split, outputs compared
bit-exactly. Run: python -u scripts/dec_probe5b.py [iters]"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_cache_gpujpeg_tpu")
import jax                                                    # noqa: E402

from gpujpeg_tpu.models.decoder import Decoder                # noqa: E402
from gpujpeg_tpu.models.encoder import Encoder                # noqa: E402
from gpujpeg_tpu.params import ImageParameters, Parameters    # noqa: E402
from gpujpeg_tpu.types import ColorSpace, PixelFormat         # noqa: E402

H, W = 4320, 7680
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def make_rgb(h, w, seed=7):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([128 + 90 * np.sin(x / 23.0) * np.cos(y / 17.0),
                    128 + 80 * np.cos(x / 31.0 + 1.0) * np.sin(y / 11.0),
                    128 + 70 * np.sin((x + y) / 41.0)], axis=-1)
    img += rng.normal(0, 3.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    img = make_rgb(H, W)
    params = Parameters(quality=75, restart_interval=32, segment_info=True)
    image = ImageParameters(width=W, height=H, color_space=ColorSpace.RGB,
                            pixel_format=PixelFormat.PF_444_U8_P012)
    data = Encoder(backend="jax").encode(img, params, image)
    print(f"stream: {len(data)/1e6:.2f} MB", flush=True)

    def sync(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(leaf.reshape(-1)[:1])

    def timeit(name, f, *args):
        o = f(*args)
        sync(o)
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(ITERS)]
        sync(outs[-1])
        ms = (time.perf_counter() - t0) * 1e3 / ITERS
        print(f"{name:26s} {ms:7.2f} ms", flush=True)
        return outs[-1]

    results = {}
    for native, form in ((0, ""), (1, "px")):
        os.environ["GPUJPEG_TPU_DEC_PX"] = str(native)
        dec = Decoder(backend="jax")
        dec.set_output_format(ColorSpace.RGB, PixelFormat.PF_444_U8_P012)
        dec.output_to_device = True
        dec.capture_device_call = True
        dec.decode(data)
        fn, dargs = dec.last_device_call
        tag = "px" if native else "plan"
        out = np.asarray(timeit(f"full decode [{tag}]", fn, *dargs))
        if out.dtype == np.int32:
            out = out.view("<u1").reshape(-1)   # words tail: same bytes
        results[tag] = out.reshape(-1)
        hargs = dargs[:-1] + ((dargs[-1],) if getattr(fn, "px_tail", False)
                              else ())
        coeff = timeit(f"huffman [{tag}]", fn.stages[0], *hargs)
        planes = timeit(f"idct tail [{tag}]", fn.stages[1], coeff,
                        dargs[-1])
        timeit(f"post [{tag}]", fn.stages[2], planes)
    for tag, r in results.items():
        if tag == "plan":
            continue
        eq = np.array_equal(results["plan"], r)
        print(f"pixels identical [{tag}]: {eq}", flush=True)
        if not eq:
            d = np.abs(results["plan"].astype(int) - r.astype(int))
            print(f"  max diff {d.max()}  ndiff {(d > 0).sum()} of {d.size}",
                  flush=True)


if __name__ == "__main__":
    main()
