#!/usr/bin/env python
"""Full benchmark suite (manual / judge use; `bench.py` stays the
driver's one-line headline).

Covers the BASELINE.json configs measurable on one chip:
  - HD / 4K / 8K / 16K encode + decode, Q75 non-interleaved, restart
    markers (reference README.md:95-97,127-129 conditions)
  - Y4M-style video batch: same-geometry frames through one cached
    executable (the reference's `-n` iteration mode)
  - optional quality sweep Q10..Q100 at 8K (--sweep; each quality is a
    new geometry, so expect one compile per quality on a cold cache)

Methodology: device-resident input, N back-to-back iterations, one
final sync — the reference's "w/o PCIe xfers" rows — because this
environment reaches its TPU through a network tunnel whose transfer
cost (~100 MB/s) is not representative of a production-attached host.
Decode times the jitted pipeline with device-resident stream rows.

Prints a table to stdout and one JSON line per config to stderr.
"""
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_gpujpeg_tpu")
import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from gpujpeg_tpu.models.decoder import Decoder                # noqa: E402
from gpujpeg_tpu.models.encoder import Encoder                # noqa: E402
from gpujpeg_tpu.params import (                              # noqa: E402
    ImageParameters, Parameters, suggest_restart_interval)
from gpujpeg_tpu.plan import make_plan                        # noqa: E402
from gpujpeg_tpu.types import ColorSpace, PixelFormat         # noqa: E402
from gpujpeg_tpu.ops.jax_pipeline import _enc_context, _DEC_V2_CACHE  # noqa: E402

# GTX 3080 w/o PCIe transfers (reference README.md:113,145); 16K encode
# extrapolated from the with-PCIe ratio
BASE_ENC = {"HD": 0.21, "4K": 0.75, "8K": 2.30, "16K": 9.2}
BASE_DEC = {"HD": 0.25, "4K": 0.85, "8K": 2.38, "16K": 11.1}
RES = {"HD": (1080, 1920), "4K": (2160, 3840), "8K": (4320, 7680),
       "16K": (8640, 15360)}


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


def enc_input(ctx, img, H, W):
    """Device-resident input in the context's form (i32 words for the
    round-5 flagship front end — same bytes, free host view)."""
    if getattr(ctx.fn, "input_form", "flat") == "words":
        from gpujpeg_tpu.ops.rgbpack import host_raw_words
        return jnp.asarray(host_raw_words(img, H, W))
    return jnp.asarray(img.reshape(-1))


def bench_res(name, iters):
    H, W = RES[name]
    img = make_image(H, W)
    image = ImageParameters(width=W, height=H, color_space=ColorSpace.RGB,
                            pixel_format=PixelFormat.PF_444_U8_P012)
    ri = suggest_restart_interval(image, subsampled=False, interleaved=False, pow2=True)
    params = Parameters(quality=75, restart_interval=ri, interleaved=False)

    enc = Encoder(backend="jax")
    out = enc.encode(img, params, image)                     # compile

    plan = make_plan(params, image)
    quant_zz, huff = enc._tables(params)
    ctx = _enc_context(plan, quant_zz, huff)
    raw_dev = enc_input(ctx, img, H, W)

    def sync(o):
        np.asarray(jax.lax.slice(o[1], (0,), (1,)))

    sync(ctx.fn(raw_dev))
    t0 = time.perf_counter()
    outs = [ctx.fn(raw_dev) for _ in range(iters)]
    sync(outs[-1])
    enc_ms = (time.perf_counter() - t0) * 1e3 / iters

    dec = Decoder(backend="jax")
    dec.output_to_device = True
    dec.capture_device_call = True
    raw, _ = dec.decode(out)                                 # compile
    dfn, dargs = dec.last_device_call
    def dsync(r):
        # block_until_ready does not reliably block on the tunneled
        # backend; force a 1-element D2H instead
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(leaf.reshape(-1)[:1])
    dsync(dargs)
    dsync(dfn(*dargs))
    t0 = time.perf_counter()
    rs = [dfn(*dargs) for _ in range(iters)]
    dsync(rs[-1])
    dec_ms = (time.perf_counter() - t0) * 1e3 / iters

    mpix = W * H / 1e6
    row = dict(config=name, mpix=round(mpix, 1),
               encode_device_ms=round(enc_ms, 2),
               decode_device_ms=round(dec_ms, 2),
               encode_mpix_s=round(mpix / enc_ms * 1e3),
               decode_mpix_s=round(mpix / dec_ms * 1e3),
               jpeg_mb=round(len(out) / 1e6, 2),
               vs_3080_encode=round(BASE_ENC[name] / enc_ms, 4),
               vs_3080_decode=round(BASE_DEC[name] / dec_ms, 4))
    print(json.dumps(row), file=sys.stderr, flush=True)
    return row


def bench_video(iters=100):
    """Same-geometry frame stream through one cached executable — the
    Y4M batch case (reference `-n 100`)."""
    H, W = RES["HD"]
    image = ImageParameters(width=W, height=H, color_space=ColorSpace.RGB,
                            pixel_format=PixelFormat.PF_444_U8_P012)
    ri = suggest_restart_interval(image, subsampled=False, interleaved=False, pow2=True)
    params = Parameters(quality=75, restart_interval=ri, interleaved=False)
    enc = Encoder(backend="jax")
    frames = [make_image(H, W, seed=s) for s in range(4)]
    enc.encode(frames[0], params, image)
    plan = make_plan(params, image)
    ctx = _enc_context(plan, *enc._tables(params))
    devs = [enc_input(ctx, f, H, W) for f in frames]
    outs = [ctx.fn(devs[0])]
    np.asarray(jax.lax.slice(outs[0][1], (0,), (1,)))
    t0 = time.perf_counter()
    outs = [ctx.fn(devs[i % 4]) for i in range(iters)]
    np.asarray(jax.lax.slice(outs[-1][1], (0,), (1,)))
    dt = time.perf_counter() - t0
    row = dict(config=f"video_{iters}xHD", fps=round(iters / dt, 1),
               mpix_s=round(iters * W * H / 1e6 / dt))

    # end-to-end batch walls: encode_batch / decode_batch pipeline host
    # prep + stream formatting under neighboring frames' device work
    # (these INCLUDE host work + tunnel transfers, unlike the
    # device-pipeline rows above)
    n_enc = max(10, iters // 4)
    enc.encode(frames[0], params, image)     # warm
    t0 = time.perf_counter()
    streams_n = enc.encode_batch([frames[i % 4] for i in range(n_enc)],
                                 params, image)
    dt_e = time.perf_counter() - t0
    row.update(encode_e2e_fps=round(n_enc / dt_e, 1),
               encode_e2e_mpix_s=round(n_enc * W * H / 1e6 / dt_e))
    del streams_n
    streams = [enc.encode(f, params, image) for f in frames]
    dec = Decoder(backend="jax")
    dec.output_to_device = True     # skip the raw-frame D2H (tunnel)
    dec.decode(streams[0])          # compile/warm
    n_dec = max(10, iters // 4)
    t0 = time.perf_counter()
    outs_d = dec.decode_batch([streams[i % 4] for i in range(n_dec)])
    np.asarray(outs_d[-1][0].reshape(-1)[:1])   # final sync
    dt_d = time.perf_counter() - t0
    row.update(decode_fps=round(n_dec / dt_d, 1),
               decode_mpix_s=round(n_dec * W * H / 1e6 / dt_d))
    print(json.dumps(row), file=sys.stderr, flush=True)
    return row


def main():
    do_sweep = "--sweep" in sys.argv or "--sweep-only" in sys.argv
    do_res = "--sweep-only" not in sys.argv
    do_16k = "--no-16k" not in sys.argv
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    print(f"devices: {jax.devices()}", file=sys.stderr)

    rows = []
    if do_res:
        # iteration depth scales inversely with size: the ~0.5-1 ms
        # per-call tunnel dispatch floor (measured round 5) dominates
        # small configs at shallow pipelines — HD measured 2.81 ms at
        # 20 iters vs 1.74 at 100
        depth = {"HD": 5 * iters, "4K": 2 * iters, "8K": iters, "16K": 3}
        for name in ("HD", "4K", "8K") + (("16K",) if do_16k else ()):
            rows.append(bench_res(name, depth[name]))
        rows.append(bench_video())

    if do_sweep:
        H, W = RES["8K"]
        img = make_image(H, W)
        image = ImageParameters(width=W, height=H,
                                color_space=ColorSpace.RGB,
                                pixel_format=PixelFormat.PF_444_U8_P012)
        for q in range(10, 101, 10):
            # quality-aware: keeps the flagship kernel eligible at
            # Q80-97 (the tier-1 word budget doubles there; ri halves)
            ri = suggest_restart_interval(image, subsampled=False,
                                          pow2=True, interleaved=False,
                                          quality=q)
            params = Parameters(quality=q, restart_interval=ri,
                                interleaved=False)
            enc = Encoder(backend="jax")
            out = enc.encode(img, params, image)
            plan = make_plan(params, image)
            ctx = _enc_context(plan, *enc._tables(params))
            raw_dev = enc_input(ctx, img, H, W)
            # settle variant downgrades first (a high-quality geometry
            # may exhaust every device variant and fall back to the
            # host coder — timing ctx.fn directly would then crash on
            # the failed compile)
            from gpujpeg_tpu.ops.jax_pipeline import (
                _REPREP, _call_with_downgrade)
            row = dict(config=f"8K_Q{q}", jpeg_mb=round(len(out) / 1e6, 2),
                       variant=getattr(ctx.fn, "kind", "?"))
            res = _call_with_downgrade(ctx, raw_dev)
            if res is _REPREP:      # words form downgraded away
                raw_dev = jnp.asarray(img.reshape(-1))
                res = _call_with_downgrade(ctx, raw_dev)
            if res is None or res is _REPREP:
                row["encode_device_ms"] = None     # host-coder fallback
                row["variant"] = "host"
            else:
                row["variant"] = getattr(ctx.fn, "kind", "?")
                o = ctx.fn(raw_dev)
                np.asarray(jax.lax.slice(o[1], (0,), (1,)))
                t0 = time.perf_counter()
                outs = [ctx.fn(raw_dev) for _ in range(8)]
                np.asarray(jax.lax.slice(outs[-1][1], (0,), (1,)))
                row["encode_device_ms"] = round(
                    (time.perf_counter() - t0) * 1e3 / 8, 2)
            # decode at the same quality (reference README.md:140-144
            # publishes the full decode Q sweep too)
            try:
                dec = Decoder(backend="jax")
                dec.output_to_device = True
                dec.capture_device_call = True
                dec.decode(out)
                dfn, dargs = dec.last_device_call
                leaf = lambda r: np.asarray(
                    jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
                leaf(dfn(*dargs))
                t0 = time.perf_counter()
                rs = [dfn(*dargs) for _ in range(8)]
                leaf(rs[-1])
                row["decode_device_ms"] = round(
                    (time.perf_counter() - t0) * 1e3 / 8, 2)
            except Exception as e:
                row["decode_device_ms"] = None
                row["decode_err"] = str(e)[:80]
            print(json.dumps(row), file=sys.stderr, flush=True)

    hdr = ("config", "mpix", "encode_device_ms", "decode_device_ms",
           "encode_mpix_s", "decode_mpix_s")
    print("\t".join(hdr))
    for r in rows:
        print("\t".join(str(r.get(k, "")) for k in hdr))


if __name__ == "__main__":
    main()
