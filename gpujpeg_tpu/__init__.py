"""gpujpeg_tpu — a TPU-native baseline JPEG (ITU-T T.81) encoder/decoder.

A from-scratch JAX/Pallas re-design of the capabilities of GPUJPEG
(reference: /root/reference): the pixel pipeline (color transform,
subsampling, fused 8x8 DCT+quantization) runs on the MXU, restart-marker
segments make Huffman entropy coding data-parallel on device, and the
stream layer (JFIF/SPIFF/Adobe markers, PNM/PAM/Y4M I/O) runs on host.
Unlike the single-GPU reference, images shard across TPU meshes by MCU
rows / restart segments with collective bitstream assembly.
"""
from __future__ import annotations

from .runtime import enable_compilation_cache as _enable_compilation_cache

_enable_compilation_cache()

from .params import ImageParameters, Parameters, suggest_restart_interval
from .models.decoder import Decoder
from .models.encoder import Encoder
from . import parallel  # noqa: F401  (ShardedEncoder / ShardedDecoder)
from .stream.reader import JpegParseError, get_image_info, read_image
from .types import (
    ColorSpace,
    ComponentType,
    GpujpegError,
    HuffmanType,
    PixelFormat,
    SamplingFactor,
    SUBSAMPLING_420,
    SUBSAMPLING_422,
    SUBSAMPLING_444,
    YCBCR_JPEG,
)

__version__ = "0.1.0"

__all__ = [
    "ColorSpace", "ComponentType", "Decoder", "Encoder", "GpujpegError",
    "HuffmanType", "ImageParameters", "JpegParseError", "Parameters",
    "PixelFormat",
    "SamplingFactor", "SUBSAMPLING_420", "SUBSAMPLING_422", "SUBSAMPLING_444",
    "YCBCR_JPEG", "get_image_info", "read_image", "suggest_restart_interval",
]
