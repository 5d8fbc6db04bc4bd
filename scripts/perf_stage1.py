"""Microbenchmark: encode stage kernels in isolation at 8K geometry.

Measures (on the real chip):
  - null-kernel per-grid-step fixed cost at various tile sizes
  - block_chunks_dct_pallas (fused DCT+stage-1) at various tiles
  - merge_segments_packed
  - stuff_and_rst_pallas
Run:  python scripts/perf_stage1.py [stage ...]
"""
from __future__ import annotations

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


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    # force a real D2H sync (block_until_ready unreliable on tunnel)
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3, r


def main():
    which = set(sys.argv[1:]) or {"null", "stage1", "merge", "stuff"}
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
    print(f"n_blocks={plan.n_blocks} n_segments={plan.n_segments} "
          f"bps={geo.bps} W={geo.words_per_block} "
          f"cap_seg_words={geo.cap_seg_words} cap_out={geo.cap_out_bytes}")

    N = geo.n_rows
    rng = np.random.default_rng(0)
    # realistic-ish coefficient stats: mostly sparse
    coeff = (rng.integers(-40, 40, (N, 64)) *
             (rng.random((N, 64)) < 0.15)).astype(np.int32)
    coeff[:, 0] = rng.integers(-200, 200, N)
    Wb = geo.words_per_block

    if "null" in which:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        x = jnp.asarray(rng.integers(0, 255, (N // 2, 128)).astype(np.uint8))
        for tile in (256, 512, 768, 1024, 2048, 4096):
            T2 = tile // 2

            def nullk(x_ref, o_ref):
                o_ref[:] = x_ref[:]

            @jax.jit
            def run(x):
                return pl.pallas_call(
                    nullk,
                    out_shape=jax.ShapeDtypeStruct((N // 2, 128), jnp.uint8),
                    grid=((N // 2) // T2,),
                    in_specs=[pl.BlockSpec((T2, 128), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((T2, 128), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                )(x)
            try:
                ms, _ = timeit(run, x)
                steps = (N // 2) // T2
                print(f"null tile={tile}: {ms:.2f} ms  "
                      f"({steps} steps, {ms*1e3/steps:.2f} us/step)")
            except Exception as e:
                print(f"null tile={tile}: FAIL {type(e).__name__}: {e}")

    if "stage1" in which:
        # fused DCT variant inputs
        from gpujpeg_tpu.tables import dct_zigzag_operator
        D64, bias64 = dct_zigzag_operator()
        n_q = 2
        qdiv_h = np.ones((n_q, 64), np.float32)
        for qi in range(n_q):
            if qi in quant_zz:
                qdiv_h[qi] = np.maximum(
                    np.asarray(quant_zz[qi], np.float32), 1.0)
        D2_h = np.zeros((128, 128), np.float32)
        D2_h[:64, :64] = D64
        D2_h[64:, 64:] = D64
        bias2_h = np.concatenate([bias64, bias64]).astype(np.float32)
        q2tab_h = np.stack([np.concatenate([qdiv_h[i], qdiv_h[j]])
                            for i in range(n_q) for j in range(n_q)]
                           ).astype(np.float32)
        pb2 = jnp.asarray(
            rng.integers(0, 255, (N // 2, 128)).astype(np.uint8))
        diff2 = jnp.asarray(coeff[:, 0].reshape(-1, 2))
        cls2 = jnp.asarray(np.asarray(geo.block_cls).reshape(-1, 2))
        val2 = jnp.asarray(np.asarray(geo.block_valid).reshape(-1, 2))
        cls_h = np.asarray(geo.block_cls).reshape(-1, 2)
        qidx = jnp.asarray((cls_h[:, 0] * n_q + cls_h[:, 1])[:, None])
        for tile in (512, 768, 1024, 1536, 2048):
            fn = jax.jit(lambda pb2, diff2, cls2, val2, qidx, t=tile:
                         ev2.block_chunks_dct_pallas(
                             pb2, diff2, cls2, val2, qidx, D2_h, bias2_h,
                             q2tab_h, tabs, Wb, tile=t))
            try:
                ms, _ = timeit(fn, pb2, diff2, cls2, val2, qidx)
                steps = -(-(N // 2) // (tile // 2))
                print(f"stage1 tile={tile}: {ms:.2f} ms  "
                      f"({steps} steps, {ms*1e3/steps:.2f} us/step)")
            except Exception as e:
                print(f"stage1 tile={tile}: FAIL {type(e).__name__}: "
                      f"{str(e)[:200]}")

    # build real words/bits once for merge/stuff
    wb = None
    if "merge" in which or "stuff" in which:
        cj = jnp.asarray(coeff)
        dj = jnp.asarray(coeff[:, 0:1])
        clsj = jnp.asarray(geo.block_cls)
        valj = jnp.asarray(geo.block_valid)
        fn = jax.jit(lambda c, d, cl, v: ev2.block_chunks_pallas(
            c, d, cl, v, tabs, Wb))
        words, bits = fn(cj, dj, clsj, valj)
        jax.block_until_ready((words, bits))
        wb = (words, bits)

    if "merge" in which:
        words, bits = wb
        for st in (128, 256, 512, 1024):
            fn = jax.jit(lambda w, b, s=st: ev2.merge_segments_packed(
                w, b, geo.bps, Wb, geo.cap_seg_words, seg_tile=s))
            try:
                ms, r = timeit(fn, words, bits)
                print(f"merge seg_tile={st}: {ms:.2f} ms")
            except Exception as e:
                print(f"merge seg_tile={st}: FAIL {type(e).__name__}: "
                      f"{str(e)[:160]}")

    if "stuff" in which:
        words, bits = wb
        fnm = jax.jit(lambda w, b: ev2.merge_segments_packed(
            w, b, geo.bps, Wb, geo.cap_seg_words))
        seg_words, seg_bits = fnm(words, bits)
        jax.block_until_ready((seg_words, seg_bits))
        rstj = jnp.asarray(geo.seg_rst_marker)
        hrj = jnp.asarray(geo.seg_has_rst)
        for tile in (256, 512, 1024):
            fn = jax.jit(lambda sw, sb, t=tile: ev2.stuff_and_rst_pallas(
                sw, sb, rstj, hrj, geo.cap_out_bytes, geo.max_stuff,
                tile=t))
            try:
                ms, _ = timeit(fn, seg_words, seg_bits)
                print(f"stuff tile={tile}: {ms:.2f} ms")
            except Exception as e:
                print(f"stuff tile={tile}: FAIL {type(e).__name__}: "
                      f"{str(e)[:160]}")


if __name__ == "__main__":
    main()
