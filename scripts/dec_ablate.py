"""On-chip ablation of the v3 decode Huffman kernel at 8K Q75 via
stage DOUBLING (GPUJPEG_TPU_DEC_DOUBLE, pallas_decode_v3.py): each
stage runs twice per loop iteration with the duplicate folded in under
a runtime-zero mask, so the output stays bit-identical and the time
delta vs baseline is that stage's marginal cost. (Stubbing a stage OUT
would corrupt decoded symbols and change the loop's iteration count —
doubling is the only honest in-place probe.)

Stages: fetch (two masked-reduction word fetches), quick (quick-table
broadcast scans), slow (maxcode compares + delta gather + huffval
scan), cf (repeat one-hot coefficient write).

Run: python -u scripts/dec_ablate.py [iters]
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
    t0 = time.perf_counter()
    data = Encoder(backend="jax").encode(img, params, image)
    print(f"stream: {len(data)/1e6:.2f} MB "
          f"(encode {time.perf_counter()-t0:.0f} s)", flush=True)

    def dsync(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(leaf.reshape(-1)[:1])

    def build_and_capture():
        """Fresh decode fn for the current env; returns (dfn, dargs)."""
        jp._DEC_V2_CACHE.clear()
        dec = Decoder(backend="jax")
        dec.output_to_device = True
        raw, _ = dec.decode(data)
        dsync(raw)
        key, dfn = next(iter(jp._DEC_V2_CACHE.items()))
        cap = {}

        def spy(*a):
            cap["a"] = a
            return dfn(*a)
        jp._DEC_V2_CACHE[key] = spy
        dec.decode(data)
        jp._DEC_V2_CACHE[key] = dfn
        dargs = jax.tree_util.tree_map(
            lambda x: (jax.device_put(np.asarray(x))
                       if hasattr(x, "shape") else x), cap["a"])
        dsync(dargs)
        return dfn, dargs, np.asarray(raw)

    def timeit(label, f, a):
        r = f(*a)
        dsync(r)
        t0 = time.perf_counter()
        rs = [f(*a) for _ in range(iters)]
        dsync(rs[-1])
        ms = (time.perf_counter() - t0) * 1e3 / iters
        print(f"{label:>10}: {ms:8.2f} ms", flush=True)
        return ms

    os.environ.pop("GPUJPEG_TPU_DEC_DOUBLE", None)
    dfn, dargs, raw0 = build_and_capture()
    base = timeit("baseline", dfn, dargs)

    for stage in ("fetch", "quick", "slow", "cf", "val", "dc", "cond"):
        os.environ["GPUJPEG_TPU_DEC_DOUBLE"] = stage
        t0 = time.perf_counter()
        dfn, dargs, raw = build_and_capture()
        ok = np.array_equal(raw, raw0)
        ms = timeit(f"2x {stage}", dfn, dargs)
        print(f"           -> marginal {ms - base:+.2f} ms  "
              f"pixels identical: {ok}  "
              f"(build {time.perf_counter()-t0:.0f} s)", flush=True)
    os.environ.pop("GPUJPEG_TPU_DEC_DOUBLE", None)

    # one-symbol-per-iteration variant: ~2x iterations at lower
    # per-iteration cost; with the baseline solves T = I*(F + 2S)
    # vs T1 = 2I*(F + S) for fixed-per-iteration F and per-symbol S
    os.environ["GPUJPEG_TPU_DEC_SYM1"] = "1"
    t0 = time.perf_counter()
    dfn, dargs, raw = build_and_capture()
    ok = np.array_equal(raw, raw0)
    ms1 = timeit("1 sym/iter", dfn, dargs)
    print(f"           -> pixels identical: {ok}  "
          f"(build {time.perf_counter()-t0:.0f} s)", flush=True)
    os.environ.pop("GPUJPEG_TPU_DEC_SYM1", None)
    # T2 = I(F+2S), T1 = 2I(F+S) -> F*I = T1 - T2... solve:
    # S*I = T1 - T2? No: T1-T2 = I*F; per-iter split printed raw
    F_I = ms1 - base          # fixed cost x I (baseline iteration count)
    S_I = base - F_I          # 2S x I
    print(f"implied: fixed-per-iteration total {F_I:.2f} ms, "
          f"per-symbol total (2 syms) {S_I:.2f} ms of {base:.2f} ms "
          f"kernel+tail", flush=True)


if __name__ == "__main__":
    main()
