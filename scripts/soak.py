#!/usr/bin/env python
"""Randomized round-trip soak over the REAL kernels (interpret mode on
CPU): random geometries / qualities / restart intervals / pixel formats
through encode+decode with golden cross-checks, plus corrupt-stream
robustness. Exercises the round-5 words front end and px decode tail
across eligibility boundaries (odd sizes, W8 % bps != 0, subsampling).

Run: GPUJPEG_TPU_PALLAS_INTERPRET=1 JAX_PLATFORMS=cpu \
         python scripts/soak.py [seconds] [seed]
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("GPUJPEG_TPU_PALLAS_INTERPRET", "1")
os.environ.setdefault("GPUJPEG_TPU_STRICT", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_cache_gpujpeg_tpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# The axon site hook imports jax AND initializes its backend before
# this script's in-process env/config pins can stick (this soak once
# crashed the shared TPU worker that way) — verify the backend and
# re-exec with the env var set at interpreter start if needed
import jax                                                    # noqa: E402
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
if jax.default_backend() != "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.execv(sys.executable, [sys.executable] + sys.argv)

import gpujpeg_tpu as gj                                      # noqa: E402
import gpujpeg_tpu.models.decoder as dmod                     # noqa: E402


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def main():
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 600
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    rng = np.random.default_rng(seed)
    t_end = time.time() + budget
    n = fails = 0
    dmod.CPU_SEGMENT_THRESHOLD = 0      # force device paths everywhere
    while time.time() < t_end:
        n += 1
        h = int(rng.integers(1, 23)) * 8
        w = int(rng.integers(1, 40)) * 8
        q = int(rng.choice([10, 50, 75, 80, 85, 92, 97, 100]))
        ri = int(rng.choice([0, 1, 2, 4, 8, 16, 32]))
        interleaved = bool(rng.integers(0, 2))
        sub = int(rng.choice([444, 422, 420]))
        y, x = np.mgrid[0:h, 0:w]
        base = (128 + 80 * np.sin(x / (3 + rng.integers(40)))
                * np.cos(y / (3 + rng.integers(40))))[..., None]
        img = np.clip(base + rng.normal(0, rng.integers(1, 30), (h, w, 3)),
                      0, 255).astype(np.uint8)
        params = gj.Parameters(quality=q, restart_interval=ri,
                               interleaved=interleaved)
        if sub != 444:
            params = params.with_chroma_subsampling(sub)
        image = gj.ImageParameters(
            width=w, height=h, color_space=gj.ColorSpace.RGB,
            pixel_format=gj.PixelFormat.PF_444_U8_P012)
        tag = f"{w}x{h} q{q} ri{ri} il={int(interleaved)} {sub}"
        try:
            data = gj.Encoder(backend="jax").encode(img, params, image)
            gold = gj.Encoder(backend="golden").encode(img, params, image)
            dec = gj.Decoder(backend="jax")
            dec.set_output_format(gj.ColorSpace.RGB,
                                  gj.PixelFormat.PF_444_U8_P012)
            raw, oi_dbg = dec.decode(data)
            raw_arr = np.asarray(raw)
            if raw_arr.size != h * w * 3:
                fails += 1
                print(f"FAIL size {tag}: got {raw_arr.size} expect "
                      f"{h*w*3}; oi.pf={int(oi_dbg.pixel_format)} "
                      f"oi.cs={int(oi_dbg.color_space)} "
                      f"dtype={raw_arr.dtype}", flush=True)
                continue
            raw = raw_arr.reshape(h, w, 3)
            gdec = gj.Decoder(backend="golden")
            gdec.set_output_format(gj.ColorSpace.RGB,
                                   gj.PixelFormat.PF_444_U8_P012)
            graw, _ = gdec.decode(data)
            graw = np.asarray(graw).reshape(h, w, 3)
            # device stream must parse + decode close to the golden
            # decode of the same stream (f32/f64 tie scope: tiny diffs)
            d = np.abs(raw.astype(int) - graw.astype(int))
            if d.max() > 4 or (d > 0).mean() > 1e-3:
                fails += 1
                print(f"FAIL pixels {tag}: max {d.max()} "
                      f"frac {(d > 0).mean():.2e}", flush=True)
            if data != gold and abs(len(data) - len(gold)) > \
                    max(64, len(gold) // 100):
                fails += 1
                print(f"FAIL stream-length {tag}: {len(data)} vs "
                      f"{len(gold)}", flush=True)
            # corrupt-stream robustness: truncation + byte flips must
            # raise or return, never crash
            cut = bytes(data[:int(rng.integers(2, max(3, len(data))))])
            flip = bytearray(data)
            for _ in range(int(rng.integers(1, 8))):
                flip[int(rng.integers(len(flip)))] ^= 0xFF
            for bad in (cut, bytes(flip)):
                try:
                    gj.Decoder(backend="jax").decode(bad)
                except Exception:
                    pass
        except Exception as e:
            fails += 1
            print(f"FAIL exception {tag}: {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)
            if "reshape" in str(e):
                try:
                    d2 = gj.Decoder(backend="jax")
                    d2.set_output_format(gj.ColorSpace.RGB,
                                         gj.PixelFormat.PF_444_U8_P012)
                    r2, o2 = d2.decode(data)
                    print(f"  retry: size {np.asarray(r2).size} "
                          f"pf {int(o2.pixel_format)} "
                          f"of {d2.output_format!r} "
                          f"oc {d2.output_color_space!r}", flush=True)
                except Exception as e2:
                    print(f"  retry failed: {e2}", flush=True)
    print(f"soak: {n} cases, {fails} failures", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
