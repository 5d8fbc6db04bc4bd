"""On-chip A/B of the banded decode tail (Pallas in-VMEM un-blockify)
vs the XLA ``blocks_to_plane`` transpose, at 8K Q75 + Q95.

Run: python -u scripts/dec_band_ab.py [iters]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def make_image(H, W):
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
    import jax
    from gpujpeg_tpu.models.decoder import Decoder
    from gpujpeg_tpu.models.encoder import Encoder
    from gpujpeg_tpu.params import ImageParameters, Parameters, \
        suggest_restart_interval
    from gpujpeg_tpu.types import ColorSpace, PixelFormat
    import gpujpeg_tpu.ops.jax_pipeline as jp

    H, W = 4320, 7680
    img = make_image(H, W)
    image = ImageParameters(width=W, height=H, color_space=ColorSpace.RGB,
                            pixel_format=PixelFormat.PF_444_U8_P012)
    ri = suggest_restart_interval(image, subsampled=False,
                                  interleaved=False, pow2=True)

    def dsync(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(leaf.reshape(-1)[:1])

    for q in (75, 95):
        params = Parameters(quality=q, restart_interval=ri)
        data = Encoder(backend="jax").encode(img, params, image)
        golden = None
        for label, env in (("noband", None), ("band", "1")):
            if env:
                os.environ["GPUJPEG_TPU_DEC_BAND"] = env
            else:
                os.environ.pop("GPUJPEG_TPU_DEC_BAND", None)
            dec = Decoder(backend="jax")
            dec.output_to_device = True
            dec.capture_device_call = True
            try:
                t0 = time.perf_counter()
                raw, _ = dec.decode(data)
                dsync(raw)
                compile_s = time.perf_counter() - t0
                dfn, dargs = dec.last_device_call
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
                    ok = ("ok" if np.array_equal(out, golden)
                          else "MISMATCH")
                print(f"dec q={q} {label}: {ms:8.2f} ms dev "
                      f"(compile {compile_s:.0f} s) {ok}", flush=True)
            except Exception as e:
                print(f"dec q={q} {label}: FAIL {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
    os.environ.pop("GPUJPEG_TPU_DEC_BAND", None)


if __name__ == "__main__":
    main()
