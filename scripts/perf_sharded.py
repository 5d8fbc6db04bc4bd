"""Sharded encoder/decoder per-band device timing on a 1-device mesh
(the single real chip): bounds shard_map + band-plan overhead against
the single-chip flagship kernel (round-4 VERDICT item: the one axis
where this build claims to exceed the reference had no number at all).

With mesh=(1 band) the sharded encoder runs the SAME band-input
fused_full kernel as the single-chip context on the same pixels, so
(sharded per-band ms) / (single-chip ms) isolates the sharding tax:
shard_map dispatch, the band halo/layout glue, and the per-band
RST/geometry argument plumbing.

Run: python -u scripts/perf_sharded.py [iters]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from perf_sweep import make_image, H, W  # noqa: E402


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from gpujpeg_tpu.models.encoder import Encoder
    from gpujpeg_tpu.params import ImageParameters, Parameters, \
        suggest_restart_interval
    from gpujpeg_tpu.plan import make_plan
    from gpujpeg_tpu.types import ColorSpace, PixelFormat
    from gpujpeg_tpu.parallel import ShardedEncoder, ShardedDecoder
    from gpujpeg_tpu.ops.jax_pipeline import _enc_context

    img = make_image()
    image = ImageParameters(width=W, height=H, color_space=ColorSpace.RGB,
                            pixel_format=PixelFormat.PF_444_U8_P012)
    ri = suggest_restart_interval(image, subsampled=False,
                                  interleaved=False, pow2=True)
    params = Parameters(quality=75, restart_interval=ri)

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(jax.device_get(leaf.reshape(-1)[:1]))

    # ---- single-chip flagship context (the comparison floor) ----
    plan = make_plan(params, image)
    quant_zz, huff = Encoder()._tables(params)
    ctx = _enc_context(plan, quant_zz, huff)
    if getattr(ctx.fn, "input_form", "flat") == "words":
        from gpujpeg_tpu.ops.rgbpack import host_raw_words
        raw_j = jnp.asarray(host_raw_words(img, H, W))
    else:
        raw_j = jnp.asarray(img.reshape(-1))
    sync(ctx.fn(raw_j))
    t0 = time.perf_counter()
    outs = [ctx.fn(raw_j) for _ in range(iters)]
    sync(outs[-1])
    single_ms = (time.perf_counter() - t0) * 1e3 / iters
    print(f"single-chip device encode: {single_ms:.2f} ms "
          f"(variant {getattr(ctx.fn, 'kind', '?')})", flush=True)

    # ---- sharded encoder, 1-device mesh ----
    devs = np.array(jax.devices()[:1])
    mesh = Mesh(devs.reshape(1, 1), ("frame", "seg"))
    enc = ShardedEncoder(mesh)
    out = enc.encode(img, params, image)       # compile + correctness
    want = Encoder(backend="jax").encode(img, params, image)
    print(f"byte-identical to single-chip stream: {out == want}",
          flush=True)

    # device-only timing: capture the sharded jit + device args
    fn, args = enc.last_device_call
    sync(args)
    sync(fn(*args))
    t0 = time.perf_counter()
    rs = [fn(*args) for _ in range(iters)]
    sync(rs[-1])
    shard_ms = (time.perf_counter() - t0) * 1e3 / iters
    print(f"sharded device encode (1-band mesh): {shard_ms:.2f} ms "
          f"({shard_ms / single_ms * 100 - 100:+.1f}% vs single-chip)",
          flush=True)

    # ---- single-chip decode floor ----
    from gpujpeg_tpu.models.decoder import Decoder
    d1 = Decoder(backend="jax")
    d1.output_to_device = True
    d1.capture_device_call = True
    d1.decode(want)
    fn1, args1 = d1.last_device_call
    sync(fn1(*args1))
    t0 = time.perf_counter()
    rs = [fn1(*args1) for _ in range(iters)]
    sync(rs[-1])
    dsingle_ms = (time.perf_counter() - t0) * 1e3 / iters
    print(f"single-chip device decode: {dsingle_ms:.2f} ms", flush=True)

    # ---- sharded decoder, 1-device mesh ----
    dec = ShardedDecoder(mesh)
    raw, _ = dec.decode(want)
    fnd, argsd = dec.last_device_call
    sync(argsd)
    sync(fnd(*argsd))
    t0 = time.perf_counter()
    rs = [fnd(*argsd) for _ in range(iters)]
    sync(rs[-1])
    dshard_ms = (time.perf_counter() - t0) * 1e3 / iters
    print(f"sharded device decode (1-band mesh): {dshard_ms:.2f} ms "
          f"({dshard_ms / dsingle_ms * 100 - 100:+.1f}% vs single-chip)",
          flush=True)
    same = np.array_equal(
        np.asarray(raw).reshape(-1).view(np.uint8),
        np.asarray(d1.decode(want)[0]).reshape(-1).view(np.uint8))
    print(f"sharded decode bytes == single-chip: {same}", flush=True)


if __name__ == "__main__":
    main()
