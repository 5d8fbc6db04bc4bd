"""Per-stage decode timing at 8K Q75 on the real chip: huffman kernel /
IDCT / postprocess, plus the whole fused fn — locates the r02 regression
(kernel vs tail).

Run:  python scripts/dec_stages.py [iters]
Honors GPUJPEG_TPU_DEC_* env toggles.
"""
from __future__ import annotations

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

    def timeit(label, f, *a):
        r = f(*a)
        dsync(r)
        t0 = time.perf_counter()
        rs = [f(*a) for _ in range(iters)]
        dsync(rs[-1])
        ms = (time.perf_counter() - t0) * 1e3 / iters
        print(f"{label:>28}: {ms:8.2f} ms", flush=True)
        return r

    *hargs, Ws = dargs
    timeit("whole fn", dfn, *dargs)
    s_huff, s_idct, s_post = dfn.stages
    coeff = timeit("stage huffman (kernel+glue)", s_huff, *hargs)
    coeff = jax.device_put(np.asarray(coeff))
    planes = timeit("stage idct", s_idct, coeff, Ws)
    planes = jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x)), planes)
    timeit("stage post", s_post, planes)

    # kernel-only: the raw pallas v3 launch without the scan-order
    # relayout (isolates kernel vs glue inside stage_huffman)
    import inspect
    print("fn kind:", getattr(dfn, "kind", "?"),
          "native:", getattr(dfn, "native", "?"), flush=True)


if __name__ == "__main__":
    main()
