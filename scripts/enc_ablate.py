"""On-chip ablation of the fused_full encode kernel at 8K Q75.

Times the production kernel with successive stages knocked out (wrong
results, same shapes) to budget where the ~34 ms actually goes:

  io      — kernel body replaced by a constant store (pure grid/DMA)
  unpack  — pixel-byte unpack only
  dct     — unpack + MXU DCT + quant (rint divide)
  sym     — + symbol synthesis (lookups, scans), no window assembly
  win     — + window assembly (full stage 1), merge/stuff zeroed
  full    — production kernel

Run: python scripts/enc_ablate.py [iters] [tile]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

H, W = 4320, 7680


def make_image():
    rng = np.random.default_rng(7)
    y, x = np.mgrid[0:H, 0:W]
    img = np.stack([
        128 + 90 * np.sin(x / 23.0) * np.cos(y / 17.0),
        128 + 80 * np.cos(x / 31.0 + 1.0) * np.sin(y / 11.0),
        128 + 70 * np.sin((x + y) / 41.0),
    ], axis=-1)
    img += rng.normal(0, 3.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    os.environ["GPUJPEG_TPU_FUSED_TILE"] = str(tile)

    import jax
    import jax.numpy as jnp
    from gpujpeg_tpu.models.encoder import Encoder
    from gpujpeg_tpu.params import ImageParameters, Parameters, \
        suggest_restart_interval
    from gpujpeg_tpu.plan import make_plan
    from gpujpeg_tpu.types import ColorSpace, PixelFormat
    import gpujpeg_tpu.ops.jax_pipeline as jp
    import gpujpeg_tpu.ops.entropy_v2 as ev

    img = make_image()
    image = ImageParameters(width=W, height=H, color_space=ColorSpace.RGB,
                            pixel_format=PixelFormat.PF_444_U8_P012)
    ri = suggest_restart_interval(image, subsampled=False,
                                  interleaved=False, pow2=True)
    params = Parameters(quality=75, restart_interval=ri)
    plan = make_plan(params, image)
    quant_zz, huff = Encoder()._tables(params)
    raw_dev = jnp.asarray(img.reshape(-1))   # replaced post-ctx if words
    I32 = jnp.int32

    def sync(o):
        np.asarray(jax.lax.slice(o[1], (0,), (1,)))

    orig_stage1 = ev._stage1_dct_tile
    orig_merge = ev._merge_stuff_core
    orig_chunks = ev._chunk_planes_lanes

    def chunks_ablate(c, diff, cls, valid, t, Wb, mode):
        """_chunk_planes_lanes with the window-assembly tail optional."""
        T2 = c.shape[0]
        lane = jax.lax.broadcasted_iota(I32, (T2, 128), 1)
        k = lane & 63

        def shift_r(x, s, fill=0):
            return jnp.concatenate(
                [jnp.full((T2, s), fill, x.dtype), x[:, :-s]], axis=1)

        is_dc = k == 0
        v = jnp.where(is_dc, diff, c)
        nz = (v != 0) & (~is_dc)
        av = jnp.abs(v)
        cat = 32 - t["clz"](av)
        vbits = jnp.where(v >= 0, v, v + (1 << cat) - 1) & ((1 << cat) - 1)
        tv = jnp.where(nz | is_dc, lane, 0)
        s = 1
        while s < 64:
            tv = jnp.maximum(tv, shift_r(tv, s))
            s <<= 1
        prev = shift_r(tv, 1)
        d = lane - prev
        run = jnp.where(nz, d - 1, 0)
        sym = ((run & 15) << 4) | cat
        entry_ac = t["lookup512"](cls * 256 + sym)
        entry_dc = t["lookup64"](cls * 32 + jnp.minimum(cat, 15))
        entry = jnp.where(is_dc, entry_dc, entry_ac)
        code = entry >> 5
        clen = entry & 31
        emit = is_dc | nz
        ln0 = jnp.where(emit, clen + cat, 0) * valid
        val = jnp.where(emit, (code << cat) | vbits, 0)
        zc = jnp.where(cls > 0, t["zrl_c"][0], t["zrl_l"][0])
        zl = jnp.where(cls > 0, t["zrl_c"][1], t["zrl_l"][1])
        cand = ((~is_dc) & (~nz) & (d >= 16) & ((d & 15) == 0) & (valid > 0))
        combo = ln0 + (nz.astype(I32) << 12) + (cand.astype(I32) << 19)
        s = 1
        while s < 64:
            combo = combo + jnp.where(k >= s, shift_r(combo, s), 0)
            s <<= 1
        bidx = jnp.where(lane < 64, 63, 127)
        tot = jnp.take_along_axis(combo, bidx, axis=1)
        base_bits = (tot & 0xFFF)
        bits = jnp.concatenate(
            [base_bits[:, 63:64], base_bits[:, 127:128]], axis=1)
        if mode == "sym":
            # consume everything without assembling windows
            mix = (val ^ combo ^ prev).astype(I32)
            words = jnp.broadcast_to(
                mix[:, 0:1], (T2, 2 * Wb)).astype(jnp.uint32)
            return words, bits
        return orig_chunks(c, diff, cls, valid, t, Wb)

    def make_stage1(mode):
        def stage1(pb_ref, d2_ref, bq_ref, ac_ref, dc_ref, spec, tabs,
                   Wb, T2, seg_rows, n_comp, row0=None):
            from jax.experimental import pallas as pl
            if row0 is None:
                row0 = pl.program_id(0) * T2
            lane = jax.lax.broadcasted_iota(I32, (T2, 128), 1)
            if mode == "io":
                return (jnp.zeros((T2, 2 * Wb), jnp.uint32),
                        jnp.zeros((T2, 2), I32))
            from gpujpeg_tpu.ops.entropy_v2 import _srl, _pallas_helpers
            xw = jnp.pad(pb_ref[:], ((0, 0), (0, 96)))
            g = jnp.take_along_axis(xw, _srl(lane, 2), axis=1)
            xb = _srl(g, (lane & 3) * 8) & 255
            if mode == "unpack":
                return (jnp.broadcast_to(xb[:, 0:1], (T2, 2 * Wb))
                        .astype(jnp.uint32), xb[:, :2])
            xf = xb.astype(jnp.float32)
            y = jax.lax.dot_general(
                xf, d2_ref[:], (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32) - bq_ref[0:1, :]
            rowi = jax.lax.broadcasted_iota(I32, (T2, 128), 0)
            blk = 2 * (row0 + rowi) + (lane >= 64).astype(I32)
            cls = jnp.full((T2, 128), spec.comp_cls[0], I32)
            qv = jnp.broadcast_to(bq_ref[1 + spec.comp_q[0]:
                                         2 + spec.comp_q[0], :], y.shape)
            for i in range(1, n_comp):
                past = blk >= spec.comp_starts[i]
                if spec.comp_cls[i] != spec.comp_cls[i - 1]:
                    cls = jnp.where(past, spec.comp_cls[i], cls)
                if spec.comp_q[i] != spec.comp_q[i - 1]:
                    qv = jnp.where(past, jnp.broadcast_to(
                        bq_ref[1 + spec.comp_q[i]:2 + spec.comp_q[i], :],
                        y.shape), qv)
            valid = (blk < spec.n_real_blocks).astype(I32)
            rows = jnp.rint(y / qv).astype(I32)
            if mode == "dct":
                return (jnp.broadcast_to(rows[:, 0:1], (T2, 2 * Wb))
                        .astype(jnp.uint32), rows[:, :2])
            from jax.experimental.pallas import tpu as pltpu
            dc_l = rows[:, 0:1]
            dc_r = rows[:, 64:65]
            if seg_rows == 0:
                diff_l, diff_r = dc_l, dc_r
            else:
                prev_l = pltpu.roll(dc_r, 1, axis=0)
                rstart = ((row0 + rowi[:, 0:1]) % seg_rows) == 0
                diff_l = dc_l - jnp.where(rstart, 0, prev_l)
                diff_r = dc_r - dc_l
            diff = jnp.where(lane < 64, diff_l, diff_r)
            t = _pallas_helpers(ac_ref[:], dc_ref[:], tabs)
            words, bits = chunks_ablate(rows, diff, cls, valid, t, Wb, mode)
            bits = bits + jnp.where(bits > Wb * 32, 1 << 20, 0)
            return words, bits
        return stage1

    def zero_merge(x, b2, rmark, hrst, Wb, cap_words, WO, max_stuff):
        T = x.shape[0]
        mix = (x[:, 0:1].astype(I32) ^ b2[:, 0:1])
        return (jnp.broadcast_to(mix, (T, WO)).astype(jnp.uint32),
                jnp.concatenate(
                    [b2[:, 0:1], jnp.zeros((T, 7), I32)], axis=1))

    results = {}
    for mode in ("io", "unpack", "dct", "sym", "win", "full"):
        ev._stage1_dct_tile = (orig_stage1 if mode == "full"
                               else make_stage1(mode))
        ev._merge_stuff_core = (orig_merge if mode in ("full",)
                                else zero_merge if mode != "win"
                                else zero_merge)
        if mode == "win":
            ev._stage1_dct_tile = orig_stage1   # full stage 1
        jp._ENC_CACHE.clear()
        try:
            ctx = jp._enc_context(plan, quant_zz, huff)
            if getattr(ctx.fn, "input_form", "flat") == "words":
                from gpujpeg_tpu.ops.rgbpack import host_raw_words
                arg = jnp.asarray(host_raw_words(img, H, W))
            else:
                arg = raw_dev
            t0 = time.perf_counter()
            sync(ctx.fn(arg))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            outs = [ctx.fn(arg) for _ in range(iters)]
            sync(outs[-1])
            ms = (time.perf_counter() - t0) * 1e3 / iters
            results[mode] = ms
            print(f"enc ablate {mode:7s} [{getattr(ctx.fn, 'kind', '?')}] "
                  f"tile={tile}: {ms:8.2f} ms (compile {compile_s:.0f} s)",
                  flush=True)
        except Exception as e:
            print(f"enc ablate {mode}: FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
    ev._stage1_dct_tile = orig_stage1
    ev._merge_stuff_core = orig_merge
    if "full" in results:
        prev = 0.0
        print("--- stage deltas ---", flush=True)
        for mode in ("io", "unpack", "dct", "sym", "win", "full"):
            if mode in results:
                print(f"{mode:7s}: {results[mode]:7.2f} ms "
                      f"(+{results[mode] - prev:6.2f})", flush=True)
                prev = results[mode]


if __name__ == "__main__":
    main()
