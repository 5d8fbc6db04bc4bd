"""Sweep (FUSED_TILE x VMEM_LIMIT) over the production encode pipeline
and the decode pipeline at the 8K flagship geometry.

The stage-1 grid at tile=768 runs ~2000 steps at 8K; per-step fixed cost
(DMA sync without double-buffering once the live set fills scoped VMEM)
is the calibrated overhead lead from round 1. Bigger tiles need a larger
scoped-VMEM budget: the sweep raises GPUJPEG_TPU_VMEM_LIMIT together
with GPUJPEG_TPU_FUSED_TILE.

Run:  python scripts/perf_sweep.py [enc|dec|both] [iters]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

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


def run_enc(iters: int):
    import jax
    import jax.numpy as jnp
    from gpujpeg_tpu.models.encoder import Encoder
    from gpujpeg_tpu.params import ImageParameters, Parameters, \
        suggest_restart_interval
    from gpujpeg_tpu.plan import make_plan
    from gpujpeg_tpu.types import ColorSpace, PixelFormat
    import gpujpeg_tpu.ops.jax_pipeline as jp

    img = make_image()
    image = ImageParameters(width=W, height=H, color_space=ColorSpace.RGB,
                            pixel_format=PixelFormat.PF_444_U8_P012)
    ri = suggest_restart_interval(image, subsampled=False,
                                  interleaved=False, pow2=True)
    params = Parameters(quality=75, restart_interval=ri)
    plan = make_plan(params, image)
    quant_zz, huff = Encoder()._tables(params)
    raw_dev = jnp.asarray(img.reshape(-1))

    def sync(o):
        np.asarray(jax.lax.slice(o[1], (0,), (1,)))

    def measure(label):
        jp._ENC_CACHE.clear()
        try:
            ctx = jp._enc_context(plan, quant_zz, huff)
            t0 = time.perf_counter()
            sync(ctx.fn(raw_dev))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            outs = [ctx.fn(raw_dev) for _ in range(iters)]
            sync(outs[-1])
            ms = (time.perf_counter() - t0) * 1e3 / iters
            print(f"enc {label} [{getattr(ctx.fn, 'kind', '?')}]: "
                  f"{ms:8.2f} ms  "
                  f"(compile {compile_s:.0f} s)", flush=True)
        except Exception as e:
            print(f"enc {label}: FAIL {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)

    def set_knobs(tile, vmem):
        os.environ["GPUJPEG_TPU_FUSED_TILE"] = str(tile)
        if vmem is None:
            os.environ.pop("GPUJPEG_TPU_VMEM_LIMIT", None)
        else:
            os.environ["GPUJPEG_TPU_VMEM_LIMIT"] = str(vmem)

    base_t = int(os.environ.get("GPUJPEG_TPU_FUSED_TILE", "768"))
    tiles = [base_t] if os.environ.get("SWEEP_ONE") else \
        [512, 768, 1024, 1536, 2048, 3072, 4096]
    vmems = [None, 32 << 20, 64 << 20, 100 << 20]
    for tile in tiles:
        for vmem in vmems:
            set_knobs(tile, vmem)
            measure(f"tile={tile} vmem={vmem and vmem >> 20 or 'dflt'}M")

    # preprocess fusion-fence A/B at default knobs: where the XLA fence
    # between the pixel chain and the blockify transpose sits
    if not os.environ.get("SWEEP_ONE"):
        set_knobs(base_t, None)
        for bm in ("packed", "none"):
            os.environ["GPUJPEG_TPU_PRE_BARRIER"] = bm
            measure(f"pre_barrier={bm} tile={base_t}")
        os.environ.pop("GPUJPEG_TPU_PRE_BARRIER", None)

    # kernel-variant axis at a trimmed tile set: the single-kernel
    # fused_full is the default; "fused" (separate merge+stuff kernels)
    # and "staged" (separate DCT) have SMALLER per-kernel live sets, so
    # a larger tile may double-buffer where fused_full's cannot — the
    # round-1 calibration's other branch
    if not os.environ.get("SWEEP_ONE"):
        for var_env, var_name in (("GPUJPEG_TPU_NO_FULL_FUSED", "fused"),
                                  ("GPUJPEG_TPU_NO_FUSED_DCT", "staged")):
            os.environ[var_env] = "1"
            for tile in (768, 1536, 3072):
                for vmem in (None, 64 << 20):
                    set_knobs(tile, vmem)
                    measure(f"variant={var_name} tile={tile} "
                            f"vmem={vmem and vmem >> 20 or 'dflt'}M")
            os.environ.pop(var_env, None)


def run_dec(iters: int):
    """Sweep the decode kernel knobs (KB blocks/step x i16 output x
    over the pipelined 8K device decode. Uses the decoder's
    capture_device_call hook to time the jitted pipeline with
    device-resident args."""
    import jax
    from gpujpeg_tpu.models.encoder import Encoder
    from gpujpeg_tpu.models.decoder import Decoder
    from gpujpeg_tpu.params import ImageParameters, Parameters, \
        suggest_restart_interval
    from gpujpeg_tpu.types import ColorSpace, PixelFormat
    import gpujpeg_tpu.ops.jax_pipeline as jp

    img = make_image()
    image = ImageParameters(width=W, height=H, color_space=ColorSpace.RGB,
                            pixel_format=PixelFormat.PF_444_U8_P012)
    ri = suggest_restart_interval(image, subsampled=False,
                                  interleaved=False, pow2=True)
    params = Parameters(quality=75, restart_interval=ri)
    data = Encoder(backend="jax").encode(img, params, image)
    print(f"stream: {len(data)/1e6:.2f} MB", flush=True)

    def dsync(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(leaf.reshape(-1)[:1])

    golden = None
    # losing knobs from earlier sweeps (DEC_KB, DEC_PACKED_IDCT,
    # DEC_I16, DEC_DEVICE_ROWS, DEC_NATIVE_IDCT, DEC_WINDOW) are
    # deleted, not swept; what remains is the flagship Q75 timing and
    # a high-quality point (bigger segments exercise the wcap axis)
    combos = [75, 95] if not os.environ.get("SWEEP_ONE") else [75]
    data_by_q = {}
    for q in combos:
        if q not in data_by_q:
            data_by_q[q] = (Encoder(backend="jax").encode(
                img, Parameters(quality=q, restart_interval=ri), image)
                if q != 75 else data)
        data_q = data_by_q[q]
        label = f"q={q}"
        jp._DEC_V2_CACHE.clear()
        dec = Decoder(backend="jax")
        dec.output_to_device = True
        dec.capture_device_call = True
        try:
            t0 = time.perf_counter()
            raw, _ = dec.decode(data_q)             # compile/warm
            dsync(raw)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            raw, _ = dec.decode(data_q)
            dsync(raw)
            wall_ms = (time.perf_counter() - t0) * 1e3
            # pipelined device-only decode on the captured fn + args
            dfn, dargs = dec.last_device_call
            dsync(dargs)
            dsync(dfn(*dargs))
            t0 = time.perf_counter()
            rs = [dfn(*dargs) for _ in range(iters)]
            dsync(rs[-1])
            ms = (time.perf_counter() - t0) * 1e3 / iters
            out = np.asarray(raw)
            if golden is None:
                golden = {}
            if q not in golden:
                golden[q] = out
                ok = "ref"
            else:
                ok = "ok" if np.array_equal(out, golden[q]) else "MISMATCH"
            print(f"dec {label}: {ms:8.2f} ms dev, wall {wall_ms:6.1f} ms "
                  f"(compile {compile_s:.0f} s) {ok}", flush=True)
        except Exception as e:
            print(f"dec {label}: FAIL {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "enc"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    if which in ("enc", "both"):
        run_enc(iters)
    if which in ("dec", "both"):
        run_dec(iters)


if __name__ == "__main__":
    main()
