"""Ablation harness for the fused stage-1 entropy kernel (scratch copy).

Each mode removes one stage of the v3 kernel to expose its marginal cost
at 8K geometry. Not part of the library — measurement only.
Run: python -u scripts/ablate_stage1.py [mode ...]
modes: full dct synth scans lookups windows io
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from gpujpeg_tpu.ops import entropy_v2 as ev2
from gpujpeg_tpu.models.encoder import Encoder
from gpujpeg_tpu.params import Parameters
from gpujpeg_tpu.tables import dct_zigzag_operator

I32 = jnp.int32
U32 = jnp.uint32
_srl = ev2._srl


def kernel_body(c, diff2, cls2, valid2, t, W, mode):
    T2 = c.shape[0]
    lane = jax.lax.broadcasted_iota(I32, (T2, 128), 1)
    k = lane & 63
    left = lane < 64

    def expand(a2):
        return jnp.where(left, a2[:, 0:1], a2[:, 1:2])

    def shift_r(x, s, fill=0):
        return jnp.concatenate(
            [jnp.full((T2, s), fill, x.dtype), x[:, :-s]], axis=1)

    diff = expand(diff2)
    cls = expand(cls2)
    valid = expand(valid2)

    is_dc = k == 0
    v = jnp.where(is_dc, diff, c)
    nz = (v != 0) & (~is_dc)
    av = jnp.abs(v)
    cat = 32 - t["clz"](av)
    vbits = jnp.where(v >= 0, v, v + (1 << cat) - 1) & ((1 << cat) - 1)

    if mode == "synth":       # stop after symbol synthesis
        return (vbits + cat).astype(U32)[:, :8], cat[:, :2]

    tv = jnp.where(nz | is_dc, lane, 0)
    s = 1
    while s < 64:
        tv = jnp.maximum(tv, shift_r(tv, s))
        s <<= 1
    prev = shift_r(tv, 1)
    d = lane - prev
    run = jnp.where(nz, d - 1, 0)

    sym = ((run & 15) << 4) | cat
    if mode == "lookups":     # replace table gathers with cheap math
        entry = sym * 3 + cls
    else:
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

    if mode == "scans":       # skip the fused prefix scan
        off = ln0 * 2
        base_bits = ln0
        combo = ln0
        real = cand
        eob_len = jnp.zeros_like(ln0)
        ln = ln0
    else:
        combo = ln0 + (nz.astype(I32) << 12) + (cand.astype(I32) << 19)
        s = 1
        while s < 64:
            combo = combo + jnp.where(k >= s, shift_r(combo, s), 0)
            s <<= 1
        csum_ln = combo & 0xFFF
        cnz = (combo >> 12) & 0x7F
        ccand = combo >> 19
        bidx = jnp.where(left, 63, 127)
        tot = jnp.take_along_axis(combo, bidx, axis=1)
        tot_nz = (tot >> 12) & 0x7F
        real = cand & (cnz < tot_nz)
        ln = jnp.where(real, zl, ln0)
        val = jnp.where(real, zc, val)
        off = (csum_ln - ln0) + zl * (ccand - cand.astype(I32))
        is63 = k == 63
        czero63 = (c == 0) & is63 & (valid > 0)
        ec = jnp.where(cls > 0, t["eob_c"][0], t["eob_l"][0])
        el = jnp.where(cls > 0, t["eob_c"][1], t["eob_l"][1])
        fake = jnp.where(czero63, d >> 4, 0)
        real_tot = (tot >> 19) - jnp.take_along_axis(fake, bidx, axis=1)
        base_bits = (tot & 0xFFF) + zl * real_tot
        ln = jnp.where(czero63, el, ln)
        val = jnp.where(czero63, ec, val)
        off = jnp.where(czero63, base_bits, off)
        eob_len = jnp.where(czero63, el, 0)

    if mode == "windows":     # skip window assembly
        words = jnp.pad(val[:, :4].astype(U32), ((0, 0), (0, 4)))
        bsum = base_bits + eob_len
        bits = jnp.concatenate([bsum[:, 63:64], bsum[:, 127:128]], axis=1)
        return words, bits

    r = off & 31
    j = _srl(off, 5)
    s0 = 32 - r - ln
    part0 = jnp.where(s0 >= 0, val << jnp.clip(s0, 0, 31),
                      _srl(val, jnp.clip(-s0, 0, 31)))
    part0 = jnp.where(ln > 0, part0, 0)
    part1 = jnp.where((s0 < 0) & (ln > 0),
                      val << jnp.clip(32 + s0, 0, 31), 0)
    if mode == "wmm":
        # 16-bit halves reduced on the MXU: sums of disjoint-bit masks
        # over a 64-lane half stay < 2^16, exact in f32
        halves = []
        for w in range(W):
            contrib = jnp.where(j == w, part0, 0)
            if w > 0:
                contrib = contrib | jnp.where(j == w - 1, part1, 0)
            halves.append((contrib & 0xFFFF).astype(jnp.float32))
            halves.append(_srl(contrib, 16).astype(jnp.float32))
        A = jnp.concatenate(halves, axis=0)            # (2W*T2, 128)
        lane = jax.lax.broadcasted_iota(I32, (128, 8), 0)
        B = jnp.where(lane < 64,
                      jnp.where(jax.lax.broadcasted_iota(I32, (128, 8), 1)
                                == 0, 1.0, 0.0),
                      jnp.where(jax.lax.broadcasted_iota(I32, (128, 8), 1)
                                == 1, 1.0, 0.0)).astype(jnp.float32)
        sums = jax.lax.dot_general(
            A, B, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)        # (2W*T2, 8)
        cols_l, cols_r = [], []
        for w in range(W):
            lo = sums[2 * w * T2:(2 * w + 1) * T2]
            hi = sums[(2 * w + 1) * T2:(2 * w + 2) * T2]
            cols_l.append(lo[:, 0:1].astype(I32) |
                          (hi[:, 0:1].astype(I32) << 16))
            cols_r.append(lo[:, 1:2].astype(I32) |
                          (hi[:, 1:2].astype(I32) << 16))
        words = jnp.concatenate(cols_l + cols_r, axis=1).astype(U32)
        bsum = base_bits + eob_len
        bits = jnp.concatenate([bsum[:, 63:64], bsum[:, 127:128]], axis=1)
        return words, bits
    cols_l, cols_r = [], []
    for w in range(W):
        contrib = jnp.where(j == w, part0, 0)
        if w > 0:
            contrib = contrib | jnp.where(j == w - 1, part1, 0)
        s = 1
        while s < 64:
            contrib = contrib | jnp.concatenate(
                [contrib[:, s:], jnp.zeros((T2, s), I32)], axis=1)
            s <<= 1
        cols_l.append(contrib[:, 0:1])
        cols_r.append(contrib[:, 64:65])
    words = jnp.concatenate(cols_l + cols_r, axis=1).astype(U32)
    bsum = base_bits + eob_len
    bits = jnp.concatenate([bsum[:, 63:64], bsum[:, 127:128]], axis=1)
    return words, bits


def build(mode, tile, tabs, W, n_q, D2_h, bias2_h, q2tab_h):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T2 = tile // 2
    n_q2 = q2tab_h.shape[0]
    ac512 = jnp.asarray(tabs.ac512)
    dc128 = jnp.asarray(np.concatenate([tabs.dc64, np.zeros(64, np.int32)]))
    D2 = jnp.asarray(D2_h)
    bq = jnp.asarray(np.concatenate([bias2_h[None, :], q2tab_h], axis=0)
                     .astype(np.float32))

    def kernel(pb_ref, diff_ref, cls_ref, valid_ref, qi_ref, d2_ref, bq_ref,
               ac_ref, dc_ref, words_ref, bits_ref):
        if mode == "io":
            words_ref[:] = jnp.zeros_like(words_ref) + pb_ref[0, 0].astype(U32)
            bits_ref[:] = jnp.zeros_like(bits_ref) + diff_ref[0, 0]
            return
        xf = pb_ref[:].astype(jnp.int32).astype(jnp.float32)
        if mode == "passthru":
            words_ref[:] = xf[:, :8].astype(I32).astype(U32)
            bits_ref[:] = xf[:, :2].astype(I32)
            return
        prec = jax.lax.Precision.DEFAULT if mode in ("dctfast",) \
            else jax.lax.Precision.HIGHEST
        y = jax.lax.dot_general(
            xf, d2_ref[:], (((1,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32) - bq_ref[0:1, :]
        if mode == "dctonly":
            words_ref[:] = y[:, :8].astype(I32).astype(U32)
            bits_ref[:] = y[:, :2].astype(I32)
            return
        qi = qi_ref[:]
        qv = jnp.broadcast_to(bq_ref[1:2, :], y.shape)
        for i in range(1, n_q2):
            qv = jnp.where(qi == i,
                           jnp.broadcast_to(bq_ref[1 + i:2 + i, :], y.shape),
                           qv)
        if mode == "dctmul":
            rows = jnp.rint(y * qv).astype(I32)
        else:
            rows = jnp.rint(y / qv).astype(I32)
        if mode in ("dct", "dctfast", "dctmul"):
            words_ref[:] = rows[:, :8].astype(U32)
            bits_ref[:] = rows[:, :2]
            return
        t = ev2._pallas_helpers(ac_ref[:], dc_ref[:], tabs)
        w, b = kernel_body(rows, diff_ref[:], cls_ref[:], valid_ref[:], t,
                           W, mode)
        words_ref[:] = w[:, :2 * W].astype(U32)
        bits_ref[:] = b[:, :2]

    def run(pb2, diff2, cls2, val2, qidx):
        M = pb2.shape[0]
        return pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((M, 2 * W), jnp.uint32),
                       jax.ShapeDtypeStruct((M, 2), jnp.int32)),
            grid=(M // T2,),
            in_specs=[
                pl.BlockSpec((T2, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T2, 2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T2, 2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T2, 2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T2, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1 + n_q2, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((512,), lambda i: (0,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128,), lambda i: (0,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((T2, 2 * W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T2, 2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
        )(pb2, diff2, cls2, val2, qidx, D2, bq, ac512, dc128)
    return jax.jit(run)


def main():
    modes = sys.argv[1:] or ["io", "dct", "synth", "lookups", "scans",
                             "windows", "full"]
    tile = 768
    from gpujpeg_tpu.plan import make_plan
    from gpujpeg_tpu.params import ImageParameters
    from gpujpeg_tpu.types import ColorSpace, PixelFormat
    H, Wd = 4320, 7680
    params = Parameters(quality=75, restart_interval=32)
    image = ImageParameters(width=Wd, height=H, color_space=ColorSpace.RGB,
                            pixel_format=PixelFormat.PF_444_U8_P012)
    plan = make_plan(params, image)
    quant_zz, huff = Encoder()._tables(params)
    tabs = ev2.build_packed_tables(huff)
    geo_probe = ev2.build_uniform_geometry(plan)
    budget = ev2.seg_budget_for_quality(params.quality, geo_probe.bps)
    geo = ev2.build_uniform_geometry(
        plan, cap_bytes_per_block=ev2.block_byte_budget(params.quality),
        seg_byte_budget=min(budget, geo_probe.cap_seg_words * 4))
    W = geo.words_per_block
    N = geo.n_rows
    M = N // 2
    T2 = tile // 2
    Mp = -(-M // T2) * T2

    D64, bias64 = dct_zigzag_operator()
    n_q = 2
    qdiv_h = np.ones((n_q, 64), np.float32)
    for qi in range(n_q):
        if qi in quant_zz:
            qdiv_h[qi] = np.maximum(np.asarray(quant_zz[qi], np.float32), 1.0)
    D2_h = np.zeros((128, 128), np.float32)
    D2_h[:64, :64] = D64
    D2_h[64:, 64:] = D64
    bias2_h = np.concatenate([bias64, bias64]).astype(np.float32)
    q2tab_h = np.stack([np.concatenate([qdiv_h[i], qdiv_h[j]])
                        for i in range(n_q) for j in range(n_q)]
                       ).astype(np.float32)

    rng = np.random.default_rng(0)
    pb2 = jnp.asarray(rng.integers(0, 255, (Mp, 128)).astype(np.uint8))
    diff2 = jnp.asarray(rng.integers(-200, 200, (Mp, 2)).astype(np.int32))
    cls_h = np.zeros((Mp, 2), np.int32)
    cls_h[:M] = np.asarray(geo.block_cls).reshape(-1, 2)
    cls2 = jnp.asarray(cls_h)
    val_h = np.zeros((Mp, 2), np.int32)
    val_h[:M] = np.asarray(geo.block_valid).reshape(-1, 2)
    val2 = jnp.asarray(val_h)
    qidx = jnp.asarray((cls_h[:, 0] * n_q + cls_h[:, 1])[:, None])

    def timeit(fn, *args, iters=20):
        r = fn(*args)
        jax.block_until_ready(r)
        np.asarray(jax.device_get(r[0].reshape(-1)[:1]))
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        np.asarray(jax.device_get(r[0].reshape(-1)[:1]))
        return (time.perf_counter() - t0) / iters * 1e3

    for mode in modes:
        fn = build(mode, tile, tabs, W, n_q, D2_h, bias2_h, q2tab_h)
        try:
            ms = timeit(fn, pb2, diff2, cls2, val2, qidx)
            print(f"{mode:8s}: {ms:.2f} ms")
        except Exception as e:
            print(f"{mode:8s}: FAIL {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
