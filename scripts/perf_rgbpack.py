#!/usr/bin/env python
"""Round-2 pack probe: input is the raw RGB bytes ALREADY viewed as
(H, 3W/4) int32 horizontal words (a free host-side view before upload —
the encode path controls the upload, and device-pipeline timing excludes
it). Variants must match the XLA io reference exactly.

  xla_io     — production io path (preprocess + barrier + word pack),
               reads the flat u8 raw (the thing to beat)
  xw         — pure XLA: stride-3 i32 slices + lane-aligned shuffle +
               fixed-point transform + concat
  xw_b       — xw with an optimization_barrier after the slices
  pk_slice   — Pallas kernel, in-VMEM strided value slice
  pk_refsl   — Pallas kernel, strided ref read
  pk_gather  — Pallas kernel, full-width take_along_axis + static slice
  copy_i32   — (H,3W/4) i32 -> +0 copy floor
"""
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_cache_gpujpeg_tpu")
import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402
from jax.experimental import pallas as pl                     # noqa: E402
from jax.experimental.pallas import tpu as pltpu              # noqa: E402

from gpujpeg_tpu.ops.rgbpack import (                         # noqa: E402
    _shuffle_transform, pack_consts)
from gpujpeg_tpu.ops.preprocess import preprocess             # noqa: E402
from gpujpeg_tpu.params import ImageParameters, Parameters    # noqa: E402
from gpujpeg_tpu.plan import make_plan                        # noqa: E402
from gpujpeg_tpu.types import ColorSpace, PixelFormat         # noqa: E402
from gpujpeg_tpu.runtime import pallas_call as _pcall         # noqa: E402

I32 = jnp.int32
H = int(os.environ.get("PACK_H", "4320"))
W = int(os.environ.get("PACK_W", "7680"))
QW, RW = W // 4, 3 * W // 4
ITERS = int(os.environ.get("PACK_ITERS", "30"))


def pk(body, T):
    @jax.jit
    def f(raw_w):
        return _pcall(
            body,
            out_shape=jax.ShapeDtypeStruct((3, H, QW), jnp.int32),
            grid=(H // T,),
            in_specs=[pl.BlockSpec((T, RW), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((3, T, QW), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
        )(raw_w).reshape(3 * H, QW)
    return f


def main():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    img[0, :5] = 255
    image = ImageParameters(width=W, height=H, color_space=ColorSpace.RGB,
                            pixel_format=PixelFormat.PF_444_U8_P012)
    params = Parameters(quality=75, restart_interval=32, interleaved=False)
    plan = make_plan(params, image)
    m9, base = pack_consts(plan)
    print(f"devices: {jax.devices()}  {W}x{H}", flush=True)

    raw_flat = jnp.asarray(img.reshape(-1))
    raw_w = jnp.asarray(img.reshape(H, RW, 4).view("<i4")[..., 0])
    jax.block_until_ready((raw_flat, raw_w))

    @jax.jit
    def xla_io(raw):
        planes = preprocess(raw, image, plan, jnp)
        planes = jax.lax.optimization_barrier(tuple(planes))
        return jnp.concatenate([
            jax.lax.bitcast_convert_type(
                jax.lax.bitcast_convert_type(
                    p.reshape(p.shape[0], p.shape[1] // 4, 4), jnp.uint32),
                jnp.int32)
            for p in planes])

    def xw(barrier):
        @jax.jit
        def f(w):
            sl = (w[:, 0::3], w[:, 1::3], w[:, 2::3])
            if barrier:
                sl = jax.lax.optimization_barrier(sl)
            y, cb, cr = _shuffle_transform(*sl, m9, base)
            return jnp.concatenate([y, cb, cr])
        return f

    def body_slice(raw_ref, out_ref):
        w = raw_ref[:]
        y, cb, cr = _shuffle_transform(w[:, 0::3], w[:, 1::3], w[:, 2::3],
                                       m9, base)
        out_ref[0], out_ref[1], out_ref[2] = y, cb, cr

    def body_refsl(raw_ref, out_ref):
        y, cb, cr = _shuffle_transform(
            raw_ref[:, 0::3], raw_ref[:, 1::3], raw_ref[:, 2::3], m9, base)
        out_ref[0], out_ref[1], out_ref[2] = y, cb, cr

    def body_gather(raw_ref, out_ref):
        w = raw_ref[:]
        T = w.shape[0]
        lane = jax.lax.broadcasted_iota(I32, (T, RW), 1)
        cols = [jnp.take_along_axis(
            w, jnp.minimum(lane * 3 + c, RW - 1), axis=1)[:, :QW]
            for c in range(3)]
        y, cb, cr = _shuffle_transform(*cols, m9, base)
        out_ref[0], out_ref[1], out_ref[2] = y, cb, cr

    ref = xla_io(raw_flat)
    jax.block_until_ready(ref)
    ref_h = np.asarray(ref)

    def timeit(name, f, arg):
        try:
            o = f(arg)
            jax.block_until_ready(o)
        except Exception as e:
            msg = str(e).splitlines() or [type(e).__name__]
            print(f"{name:14s} FAIL: {msg[0][:160]}", flush=True)
            if os.environ.get("PACK_TB"):
                traceback.print_exc()
            return None
        ok = np.array_equal(np.asarray(o), ref_h)
        t0 = time.perf_counter()
        outs = [f(arg) for _ in range(ITERS)]
        jax.block_until_ready(outs[-1])
        ms = (time.perf_counter() - t0) * 1e3 / ITERS
        print(f"{name:14s} {ms:7.2f} ms   identical={ok}", flush=True)
        return ms

    timeit("xla_io", xla_io, raw_flat)
    timeit("copy_i32", jax.jit(lambda w: (w + 0)), raw_w)
    timeit("xw", xw(False), raw_w)
    timeit("xw_b", xw(True), raw_w)
    for T in (int(t) for t in os.environ.get("PACK_TILES",
                                             "96").split(",")):
        timeit(f"pk_slice[{T}]", pk(body_slice, T), raw_w)
        timeit(f"pk_refsl[{T}]", pk(body_refsl, T), raw_w)
        timeit(f"pk_gather[{T}]", pk(body_gather, T), raw_w)


if __name__ == "__main__":
    main()
