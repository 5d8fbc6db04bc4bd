"""Device DCT/IDCT as MXU matmuls.

TPU-first redesign of the reference's warp-butterfly AAN kernels
(reference: src/gpujpeg_dct_gpu.cu:180-294 forward, :472-618 inverse):
instead of an 8-point butterfly per thread, the whole 2-D 8x8 DCT is one
(64, 64) linear operator (the Kronecker square of the 1-D DCT-II matrix)
applied to flattened blocks — a single (N, 64) @ (64, 64) matmul that the
MXU executes at full tilt. Quantization (division by the quality-scaled
table) folds into the operator's columns exactly like the reference
pre-divides its table (gpujpeg_table.c:112-120); the -128 level shift
folds into a bias; the zig-zag permutation folds into the row order so
coefficients come out entropy-ready with no gather.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..tables import fdct_quant_matrix, idct_dequant_matrix


def fdct_quant_device(blocks_u8: jax.Array, M: jax.Array, bias: jax.Array) -> jax.Array:
    """(N, 64) uint8 pixels -> (N, 64) int32 quantized zig-zag coeffs.

    ``M``/``bias`` come from :func:`gpujpeg_tpu.tables.fdct_quant_matrix`
    (float32). Uses HIGHEST precision so the f32 matmul tracks the float64
    golden path; coefficients land on integers well clear of 0.5 boundaries
    for all realistic quant tables.
    """
    x = blocks_u8.astype(jnp.float32)
    y = jax.lax.dot_general(
        x, M, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ) - bias
    return jnp.rint(y).astype(jnp.int32)


def dequant_idct_device(coeff: jax.Array, W: jax.Array) -> jax.Array:
    """(N, 64) int coeffs (zig-zag) -> (N, 64) uint8 pixels (natural order).

    ``W`` from :func:`gpujpeg_tpu.tables.idct_dequant_matrix` (float32)."""
    x = coeff.astype(jnp.float32)
    y = jax.lax.dot_general(
        x, W, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ) + 128.0
    return jnp.clip(jnp.rint(y), 0.0, 255.0).astype(jnp.uint8)


def dequant_idct_words(coeff: jax.Array, W: jax.Array) -> jax.Array:
    """(N, 64) int coeffs (zig-zag) -> (N, 16) int32 words: the plain
    :func:`dequant_idct_device` pixels packed 4-per-word little-endian.

    No operator permutation and no row pairing: a block's natural
    row-major byte order packed 4-per-word is ALREADY r-major in the
    high word bits (word ``w`` holds pixels of row ``w>>1``), which is
    exactly what the decode un-blockify kernel's Mosaic row-collapse
    needs (``pallas_decode.unblockify_bands``) — and keeping the matmul
    operand chain identical to the plain tail lets XLA fuse the
    coefficient relayout into the matmul read unchanged (a pair-reshape
    variant measured +25 ms at 8K from exactly that fusion break).
    Pixels are bit-identical to :func:`dequant_idct_device`."""
    px = dequant_idct_device(coeff, W)
    return jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(
            px.reshape(px.shape[0], 16, 4), jnp.uint32), jnp.int32)


@functools.lru_cache(maxsize=16)
def fdct_operator_f32(quant_zz_key: tuple) -> tuple[np.ndarray, np.ndarray]:
    quant_zz = np.array(quant_zz_key, dtype=np.int32)
    M, bias = fdct_quant_matrix(quant_zz)
    return M.astype(np.float32), bias.astype(np.float32)


@functools.lru_cache(maxsize=16)
def idct_operator_f32(quant_zz_key: tuple) -> np.ndarray:
    quant_zz = np.array(quant_zz_key, dtype=np.int32)
    return idct_dequant_matrix(quant_zz).astype(np.float32)
