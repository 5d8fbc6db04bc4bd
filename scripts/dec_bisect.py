"""On-chip A/B of the round-2 decode-kernel changes (regression hunt).

BENCH_r01 decode was 24.71 ms at 8K Q75; BENCH_r02 measured 44.67 ms
after kernel changes landed unmeasured. Three of them gate work on
jnp.any over ~seg_tile lanes (slow-path skip, gated RW-range coefficient
writes, conditional f1 fetch) — with ~2048 lanes in lockstep those
conditions are nearly always true, so each may be pure overhead.

Toggles (see ops/pallas_decode_v3.py):
  GPUJPEG_TPU_DEC_CSLOW=0  inline slow path (r01)
  GPUJPEG_TPU_DEC_CF1=0    unconditional f1 fetch (r01)
  GPUJPEG_TPU_DEC_GW=0     loop-carried coefficient array (r01)

Run:  python scripts/dec_bisect.py [iters]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

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
          f"(encode+compile {time.perf_counter()-t0:.0f} s)", flush=True)

    def dsync(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(leaf.reshape(-1)[:1])

    golden = None
    # (cslow, cf1, gw): r02 default, full r01 revert, then isolate each
    combos = [(1, 1, 1), (0, 0, 0), (0, 1, 1), (1, 0, 1), (1, 1, 0),
              (0, 0, 1), (0, 1, 0)]
    for cs, cf1, gw in combos:
        os.environ["GPUJPEG_TPU_DEC_CSLOW"] = str(cs)
        os.environ["GPUJPEG_TPU_DEC_CF1"] = str(cf1)
        os.environ["GPUJPEG_TPU_DEC_GW"] = str(gw)
        label = f"cslow={cs} cf1={cf1} gw={gw}"
        jp._DEC_V2_CACHE.clear()
        dec = Decoder(backend="jax")
        dec.output_to_device = True
        try:
            t0 = time.perf_counter()
            raw, _ = dec.decode(data)
            dsync(raw)
            compile_s = time.perf_counter() - t0
            key, dfn = next(iter(jp._DEC_V2_CACHE.items()))
            cap = {}

            def spy(*a, dfn=dfn, cap=cap):
                cap["a"] = a
                return dfn(*a)
            jp._DEC_V2_CACHE[key] = spy
            raw, _ = dec.decode(data)
            jp._DEC_V2_CACHE[key] = dfn
            dargs = jax.tree_util.tree_map(
                lambda x: (jax.device_put(np.asarray(x))
                           if hasattr(x, "shape") else x), cap["a"])
            dsync(dargs)
            dsync(dfn(*dargs))
            t0 = time.perf_counter()
            rs = [dfn(*dargs) for _ in range(iters)]
            dsync(rs[-1])
            ms = (time.perf_counter() - t0) * 1e3 / iters
            out = np.asarray(raw)
            if golden is None:
                golden = out
                ok = "ref"
            else:
                ok = "ok" if np.array_equal(out, golden) else "MISMATCH"
            print(f"dec {label}: {ms:8.2f} ms dev "
                  f"(compile {compile_s:.0f} s) {ok}", flush=True)
        except Exception as e:
            print(f"dec {label}: FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
