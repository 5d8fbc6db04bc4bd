#!/usr/bin/env python
"""Round-5 decode probes (VERDICT item 2c: measure before building).

(a) Fresh stage split at 8K Q75: huffman kernel / idct+post tail out of
    the fused pipeline, pipelined device timing.
(b) Grid-step-count scaling: kernel-only time at DEC_SEG_TILE
    512/1024/2048 — same total work, 4x/2x/1x the grid steps; the slope
    is the per-step fixed cost.
(c) Lockstep iteration model from the decoded coefficients: per-block
    Huffman symbol counts -> per-(tile, b) lockstep max, vs the
    sorted-by-segment-size counterfactual (the win available from
    host-side segment sorting, which is free — sizes are known at parse
    time).

Run: python -u scripts/dec_probe5.py [iters]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_cache_gpujpeg_tpu")
import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402

from gpujpeg_tpu.models.decoder import Decoder                # noqa: E402
from gpujpeg_tpu.models.encoder import Encoder                # noqa: E402
from gpujpeg_tpu.params import ImageParameters, Parameters    # noqa: E402
from gpujpeg_tpu.plan import make_plan                        # noqa: E402
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


def sym_counts(coeff):
    """Per-block Huffman symbol count from zigzag-ordered quantized
    coefficients (N, 64): 1 DC + per-nonzero-AC (1 + zero_run//16 ZRLs)
    + EOB when the last nonzero sits before k=63."""
    N = coeff.shape[0]
    syms = np.ones(N, np.int64)
    run = np.zeros(N, np.int64)
    last_nz = np.zeros(N, np.int64)
    for k in range(1, 64):
        nz = coeff[:, k] != 0
        syms += np.where(nz, 1 + run // 16, 0)
        run = np.where(nz, 0, run + 1)
        last_nz = np.where(nz, k, last_nz)
    syms += (last_nz < 63)
    return syms


def main():
    img = make_rgb(H, W)
    params = Parameters(quality=75, restart_interval=32, segment_info=True)
    image = ImageParameters(width=W, height=H, color_space=ColorSpace.RGB,
                            pixel_format=PixelFormat.PF_444_U8_P012)
    t0 = time.perf_counter()
    data = Encoder(backend="jax").encode(img, params, image)
    print(f"encode: {time.perf_counter()-t0:.1f} s, {len(data)/1e6:.2f} MB",
          flush=True)

    def capture(tile=None):
        if tile:
            os.environ["GPUJPEG_TPU_DEC_SEG_TILE"] = str(tile)
        else:
            os.environ.pop("GPUJPEG_TPU_DEC_SEG_TILE", None)
        dec = Decoder(backend="jax")
        dec.set_output_format(ColorSpace.RGB, PixelFormat.PF_444_U8_P012)
        dec.output_to_device = True
        dec.capture_device_call = True
        dec.decode(data)
        return dec.last_device_call

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
        return ms, outs[-1]

    # ---- (a) stage split at the default tile ----
    fn, dargs = capture()
    args_huff, Ws = dargs[:-1], dargs[-1]
    timeit("full decode", fn, *dargs)
    _, coeff = timeit("huffman kernel", fn.stages[0], *args_huff)
    _, planes = timeit("idct tail", fn.stages[1], coeff, Ws)
    timeit("postprocess", fn.stages[2], planes)

    # ---- (b) grid-step scaling (kernel only; G >= 8 needs tile >= 1024)
    steps = {}
    for tile in (2048, 1024):
        fn_t, dargs_t = capture(tile)
        if not hasattr(fn_t, "stages"):
            print(f"tile={tile}: kernel ineligible (fallback)", flush=True)
            continue
        ms, _ = timeit(f"kernel tile={tile}", fn_t.stages[0], *dargs_t[:-1])
        steps[tile] = ms
    if 2048 in steps and 1024 in steps:
        plan = make_plan(params, image)
        S = plan.n_segments
        bps = int(plan.max_seg_block_count)
        n2048 = -(-S // 2048) * bps
        n1024 = -(-S // 1024) * bps
        print(f"per-step fixed cost ~ "
              f"{(steps[1024]-steps[2048])/(n1024-n2048)*1e3:.2f} us "
              f"({n2048} steps at tile 2048)", flush=True)

    # ---- (c) lockstep iteration model ----
    plan = make_plan(params, image)
    S = plan.n_segments
    bps = int(plan.max_seg_block_count)
    coeff_h = np.asarray(coeff)[:plan.n_blocks]
    syms = sym_counts(coeff_h)
    # v3 layout: lane s handles block s*bps + b at grid step (t, b)
    pad = (-S) % 2048
    sym_sb = np.zeros((S + pad, bps), np.int64)
    sym_sb[:S] = syms.reshape(S, bps)
    iters_sb = -(-sym_sb // 2)
    n_tiles = (S + pad) // 2048

    def total_iters(order):
        o = iters_sb[order].reshape(n_tiles, 2048, bps)
        return int(o.max(axis=1).sum())

    ident = np.arange(S + pad)
    cur = total_iters(ident)
    # sort by segment total symbols (proxy: host knows byte sizes;
    # correlation with symbols is near-1)
    seg_sz = sym_sb.sum(axis=1)
    by_size = np.argsort(seg_sz, kind="stable")
    srt = total_iters(by_size)
    ideal = int(-(-iters_sb.sum() // 2048))  # perfect balance
    avg_max = cur / (n_tiles * bps)
    print(f"iterations: current {cur} (avg max/step {avg_max:.1f}), "
          f"sorted-by-size {srt} ({srt/cur:.2%}), "
          f"perfect-balance {ideal} ({ideal/cur:.2%})", flush=True)
    print(f"sym/block: mean {syms.mean():.1f} p50 "
          f"{np.percentile(syms, 50):.0f} p99 {np.percentile(syms, 99):.0f} "
          f"max {syms.max()}", flush=True)


if __name__ == "__main__":
    main()
