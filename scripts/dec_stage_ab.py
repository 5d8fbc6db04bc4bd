"""Per-stage decode timing (huffman / idct / postprocess) in band vs
noband modes, via Decoder.perf_stats, 8K Q75 on chip.

Run: python -u scripts/dec_stage_ab.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from gpujpeg_tpu.models.decoder import Decoder
    from gpujpeg_tpu.models.encoder import Encoder
    from gpujpeg_tpu.params import ImageParameters, Parameters, \
        suggest_restart_interval
    from gpujpeg_tpu.types import ColorSpace, PixelFormat
    from scripts.dec_band_ab import make_image

    H, W = 4320, 7680
    img = make_image(H, W)
    image = ImageParameters(width=W, height=H, color_space=ColorSpace.RGB,
                            pixel_format=PixelFormat.PF_444_U8_P012)
    ri = suggest_restart_interval(image, subsampled=False,
                                  interleaved=False, pow2=True)
    params = Parameters(quality=75, restart_interval=ri)
    data = Encoder(backend="jax").encode(img, params, image)

    for label, env in (("segtail", "1"), ("xla-tail", None)):
        if env:
            os.environ["GPUJPEG_TPU_DEC_SEG_TAIL"] = env
        else:
            os.environ.pop("GPUJPEG_TPU_DEC_SEG_TAIL", None)
        dec = Decoder(backend="jax")
        dec.output_to_device = True
        dec.perf_stats = True
        dec.decode(data)          # compile
        hs, is_, ps = [], [], []
        for _ in range(5):
            dec.decode(data)
            hs.append(dec.stats.duration_huffman_coder)
            is_.append(dec.stats.duration_dct_quantization)
            ps.append(dec.stats.duration_postprocessor)
        print(f"{label}: huff {min(hs):6.2f}  idct+unblk {min(is_):6.2f}  "
              f"post {min(ps):6.2f} ms", flush=True)
    os.environ.pop("GPUJPEG_TPU_DEC_SEG_TAIL", None)


if __name__ == "__main__":
    main()
