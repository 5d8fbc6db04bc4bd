"""Microbenchmark the PRODUCTION stage kernels at the 8K flagship
geometry: block_chunks_dct_fused (tile x vmem-limit sweep),
merge_stuff_packed, and the preprocess+blockify front end.

Run:  [GPUJPEG_TPU_VMEM_LIMIT=...] python scripts/perf_fused.py [which ...]
which in {fused, mergestuff, pre, pipe}.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from gpujpeg_tpu.params import ImageParameters, Parameters
from gpujpeg_tpu.plan import make_plan
from gpujpeg_tpu.types import ColorSpace, PixelFormat
from gpujpeg_tpu.models.encoder import Encoder
from gpujpeg_tpu.ops import entropy_v2 as ev2
from gpujpeg_tpu.ops.jax_pipeline import _enc_context, _ENC_CACHE


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))
    return (time.perf_counter() - t0) / iters * 1e3, r


def main():
    which = set(sys.argv[1:]) or {"fused", "mergestuff", "pre"}
    H, W = 4320, 7680
    params = Parameters(quality=75, restart_interval=32)
    image = ImageParameters(width=W, height=H, color_space=ColorSpace.RGB,
                            pixel_format=PixelFormat.PF_444_U8_P012)
    plan = make_plan(params, image)
    quant_zz, huff = Encoder()._tables(params)
    tabs = ev2.build_packed_tables(huff)
    geo_probe = ev2.build_uniform_geometry(plan)
    budget = ev2.seg_budget_for_quality(params.quality, geo_probe.bps)
    geo = ev2.build_uniform_geometry(
        plan, cap_bytes_per_block=ev2.block_byte_budget(params.quality),
        seg_byte_budget=min(budget, geo_probe.cap_seg_words * 4))
    Wb = geo.words_per_block
    print(f"bps={geo.bps} W={Wb} cap_seg_words={geo.cap_seg_words} "
          f"cap_out={geo.cap_out_bytes} vmem_limit="
          f"{os.environ.get('GPUJPEG_TPU_VMEM_LIMIT', 'default')}")

    spec, D2_h, bias2_h, qrows_h = ev2.fused_dct_inputs(
        plan, quant_zz, geo.bps // 2)
    M = geo.n_rows // 2
    rng = np.random.default_rng(0)
    pbw = jnp.asarray(rng.integers(0, 2**31, (M, 32)).astype(np.int32))

    if "fused" in which:
        for tile in (512, 768, 1024, 1536, 2048, 3072):
            if (tile // 2) % max(geo.bps // 2, 1):
                continue
            fn = jax.jit(lambda p, t=tile: ev2.block_chunks_dct_fused(
                p, spec, D2_h, bias2_h, qrows_h, tabs, Wb, tile=t)[0])
            try:
                ms, _ = timeit(fn, pbw)
                steps = -(-M // (tile // 2))
                print(f"fused tile={tile}: {ms:.2f} ms  ({steps} steps, "
                      f"{ms*1e3/steps:.2f} us/step)", flush=True)
            except Exception as e:
                print(f"fused tile={tile}: FAIL {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)

    if "mergestuff" in which:
        out, Mp = jax.jit(lambda p: ev2.block_chunks_dct_fused(
            p, spec, D2_h, bias2_h, qrows_h, tabs, Wb, tile=768),
            static_argnums=())(pbw), None
        out = out[0] if isinstance(out, tuple) else out
        Mp = out.shape[0]
        words, bits = ev2.split_fused_output(out, Mp, 2 * Mp, Wb)
        words = jax.block_until_ready(words)
        bits = jax.block_until_ready(bits)
        S_pad = 2 * Mp // geo.bps
        rst = jnp.asarray(np.pad(np.asarray(geo.seg_rst_marker),
                                 (0, S_pad - geo.n_segments)))
        hr = jnp.asarray(np.pad(np.asarray(geo.seg_has_rst),
                                (0, S_pad - geo.n_segments)))
        for st in (128, 256, 512, 1024):
            fn = jax.jit(lambda w, b, s=st: ev2.merge_stuff_packed(
                w, b, rst, hr, geo.bps, Wb, geo.cap_seg_words,
                geo.cap_out_bytes, geo.max_stuff, seg_tile=s))
            try:
                ms, _ = timeit(fn, words, bits)
                print(f"mergestuff seg_tile={st}: {ms:.2f} ms", flush=True)
            except Exception as e:
                print(f"mergestuff seg_tile={st}: FAIL {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)

    if "pre" in which:
        from gpujpeg_tpu.ops.preprocess import preprocess
        from gpujpeg_tpu.ops.blocks import plane_to_blocks_u32
        raw = jnp.asarray(rng.integers(0, 255, H * W * 3).astype(np.uint8))

        @jax.jit
        def fnp(raw):
            planes = preprocess(raw, plan.image, plan, jnp)
            planes = jax.lax.optimization_barrier(tuple(planes))
            return jnp.concatenate(
                [plane_to_blocks_u32(p, jnp) for p in planes])
        ms, _ = timeit(fnp, raw)
        print(f"preprocess+blockify_u32: {ms:.2f} ms", flush=True)

    if "pipe" in which:
        ctx = _enc_context(plan, quant_zz, huff)
        raw = jnp.asarray(rng.integers(0, 255, H * W * 3).astype(np.uint8))
        ms, _ = timeit(ctx.fn, raw)
        print(f"full pipeline: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
