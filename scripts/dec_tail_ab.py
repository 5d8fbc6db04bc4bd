"""On-chip A/B of the decode TAIL variants at 8K Q75 (regression hunt,
part 2): stage timing showed the r02 tail (packed u32 un-blockify +
extra fusion fences) costs ~29 ms where the r01 one-jit simple tail fit
in ~9. Crosses tail x kernel-output x gated-write toggles.

Run:  python scripts/dec_tail_ab.py [iters]
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
          f"(encode {time.perf_counter()-t0:.0f} s)", flush=True)

    def dsync(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(leaf.reshape(-1)[:1])

    golden = None
    # (tail, native, i16, gw) — gw=0 also implies cslow=0 (both small
    # wins in the kernel bisect)
    combos = [
        ("packed", 0, "", 1),     # r02 default (reference point)
        ("simple", 0, "", 1),
        ("simple", 0, "", 0),
        ("packed", 1, "", 1),     # native-axis IDCT
        ("packed", 1, "1", 1),    # native + i16
        ("simple", 0, "1", 0),
    ]
    for tail, native, i16, gw in combos:
        os.environ["GPUJPEG_TPU_DEC_TAIL"] = tail
        if native:
            os.environ["GPUJPEG_TPU_DEC_NATIVE_IDCT"] = "1"
        else:
            os.environ.pop("GPUJPEG_TPU_DEC_NATIVE_IDCT", None)
        if i16:
            os.environ["GPUJPEG_TPU_DEC_I16"] = i16
        else:
            os.environ.pop("GPUJPEG_TPU_DEC_I16", None)
        os.environ["GPUJPEG_TPU_DEC_GW"] = str(gw)
        os.environ["GPUJPEG_TPU_DEC_CSLOW"] = str(gw)
        label = f"tail={tail} native={native} i16={i16 or 0} gw={gw}"
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
                dmax = int(np.abs(out.astype(np.int32)
                                  - golden.astype(np.int32)).max())
                ok = ("ok" if dmax == 0 else
                      f"maxdiff={dmax}" + ("" if dmax <= 1 else " MISMATCH"))
            # per-stage split for this variant
            *hargs, Ws = dargs
            s_huff, s_idct, s_post = dfn.stages
            coeff = s_huff(*hargs)
            dsync(coeff)
            t0 = time.perf_counter()
            cs = [s_huff(*hargs) for _ in range(iters)]
            dsync(cs[-1])
            h_ms = (time.perf_counter() - t0) * 1e3 / iters
            print(f"dec {label}: {ms:8.2f} ms dev (huff {h_ms:.1f} + "
                  f"tail {ms - h_ms:.1f}) (compile {compile_s:.0f} s) {ok}",
                  flush=True)
        except Exception as e:
            print(f"dec {label}: FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
