"""Measure ctx-build / trace / lower times of the encode pipeline
without compiling. Usage: python scripts/lower_probe.py [WxH]"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax

sys.path.insert(0, ".")
from gpujpeg_tpu.models.encoder import Encoder
from gpujpeg_tpu.params import ImageParameters, Parameters
from gpujpeg_tpu.plan import make_plan
from gpujpeg_tpu.types import ColorSpace, PixelFormat
import gpujpeg_tpu.ops.jax_pipeline as jp


def log(msg):
    print(msg, flush=True)
    with open("/tmp/lower_probe.log", "a") as f:
        f.write(msg + "\n")


def main():
    wh = sys.argv[1] if len(sys.argv) > 1 else "7680x4320"
    W, H = (int(x) for x in wh.split("x"))
    params = Parameters(quality=75, restart_interval=32)
    image = ImageParameters(width=W, height=H, color_space=ColorSpace.RGB,
                            pixel_format=PixelFormat.PF_444_U8_P012)
    plan = make_plan(params, image)
    quant_zz, huff = Encoder()._tables(params)
    t0 = time.perf_counter()
    ctx = jp._enc_context(plan, quant_zz, huff)
    log(f"[{wh}] ctx: {time.perf_counter()-t0:.2f}s")
    inner = None
    for cell in (ctx.fn.__closure__ or ()):
        v = cell.cell_contents
        if hasattr(v, "trace"):
            inner = v
    if inner is None:
        log("no inner jit found")
        return
    args = ctx._fn_args
    shapes = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), args)
    t0 = time.perf_counter()
    tr = inner.trace(jax.ShapeDtypeStruct((H * W * 3,), np.uint8), *shapes)
    log(f"[{wh}] trace: {time.perf_counter()-t0:.2f}s")
    t0 = time.perf_counter()
    lo = tr.lower()
    log(f"[{wh}] lower: {time.perf_counter()-t0:.2f}s")
    if "--compile" in sys.argv:
        t0 = time.perf_counter()
        lo.compile()
        log(f"[{wh}] compile: {time.perf_counter()-t0:.2f}s")


if __name__ == "__main__":
    main()
