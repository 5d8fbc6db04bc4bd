"""Word-domain raw->plane-words pack (the encode io-floor fix).

The flagship band-input encode kernel (ops/entropy_v2.py
``encode_dct_fused_full``) consumes per-plane "horizontal words": each
int32 packs 4 row-adjacent pixel bytes LE, planes concatenated along
rows — ``pw = concat([bitcast(plane, i32) for plane in Y,Cb,Cr])`` of
shape ``(3H, W/4)``. Producing that through the u8-domain XLA
preprocess (stride-3 byte de-interleave + integer color transform + u8
planes + word bitcast) measured 6.1 ms standalone on chip — ~4-5 ms of
it layout tax vs a 1.3 ms plain i32 copy (BENCHMARKS.md rounds 4-5).

This module replaces that stage with ONE fused elementwise pass in the
int32 WORD domain. Key observation: view the raw interleaved RGB bytes
as int32 words (``(H, 3W/4)`` — a FREE host-side ``.view('<i4')``
before upload, same bytes) and take the three stride-3 word columns

    w0 = w[:, 0::3]   w1 = w[:, 1::3]   w2 = w[:, 2::3]

then output plane word ``x`` of every component needs bytes ONLY from
``w0[x], w1[x], w2[x]`` — the de-interleave reduces to one stride-3
lane compaction (which XLA lowers at near copy speed on i32), after
which the byte shuffle, the fixed-point color transform and the output
repack are all LANE-ALIGNED elementwise ops. Measured on chip at 8K:
2.01 ms vs 6.09 for the u8-domain path (copy floor 1.27) — and byte-
identical. A Pallas form was probed and is unnecessary: the XLA pass
already sits within 0.74 ms of the copy floor.

Byte map per output byte t of word x (raw bytes 12x .. 12x+11, LE):

    R: t0=(w0,b0) t1=(w0,b3) t2=(w1,b2) t3=(w2,b1)
    G: t0=(w0,b1) t1=(w1,b0) t2=(w1,b3) t3=(w2,b2)
    B: t0=(w0,b2) t1=(w1,b1) t2=(w2,b0) t3=(w2,b3)

The color transform replicates ops/colorspace.py exactly (reference
semantics, gpujpeg_colorspace.h:52-104): r = c + (c == 255) (== the
(c*256)//255 expand for 0..255), out = clip(((m.r + 128) >> 8) + base).
Byte-identity with the u8-domain preprocess is enforced by
tests/test_rgbpack.py — exact integer equality, not approximate.

The device-resident-u8 input path CANNOT use this (a device-side
u8->word bitcast materializes a lane-padded (N/4, 4) intermediate —
measured RESOURCE_EXHAUSTED at 8K); callers keep the u8-domain pipeline
for that case (ops/jax_pipeline.py builds both forms).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

I32 = jnp.int32


def _byte(w, pos: int):
    """Extract byte ``pos`` (0..3, LE) of each int32 lane as 0..255."""
    return jax.lax.shift_right_logical(w, 8 * pos) & 255


#: (channel, t) -> (word index 0..2, byte pos 0..3); see module docstring
_BYTE_MAP = (
    ((0, 0), (0, 3), (1, 2), (2, 1)),   # R
    ((0, 1), (1, 0), (1, 3), (2, 2)),   # G
    ((0, 2), (1, 1), (2, 0), (2, 3)),   # B
)


def _shuffle_transform(w0, w1, w2, m9, base):
    """(w0, w1, w2) stride-3 word columns -> 3 plane-word arrays.

    All lane-aligned elementwise ops. ``m9``/``base`` are the static
    fixed-point matrix/base from ops/colorspace.py MATRIX_TO (or None
    for the identity transform, e.g. RGB-internal)."""
    ws = (w0, w1, w2)
    outs = []
    for c in range(3):
        acc = None
        for t in range(4):
            if m9 is None:
                v = _byte(ws[_BYTE_MAP[c][t][0]], _BYTE_MAP[c][t][1])
            else:
                chan = [None, None, None]
                for ci in range(3):
                    wi, bp = _BYTE_MAP[ci][t]
                    cv = _byte(ws[wi], bp)
                    chan[ci] = cv + (cv == 255).astype(I32)
                acc_t = (m9[3 * c] * chan[0] + m9[3 * c + 1] * chan[1]
                         + m9[3 * c + 2] * chan[2] + 128)
                # arithmetic >> 8 (acc may be negative) then clamp —
                # exactly colorspace._transform_to
                v = jnp.clip((acc_t >> 8) + base[c], 0, 255)
            acc = v if t == 0 else acc | (v << (8 * t))
        outs.append(acc)
    return outs


def pack_plane_words(raw_w, m9, base, barrier: str = "planes"):
    """(H, 3W/4) int32 raw words -> (3H, W/4) int32 plane words (Y, Cb,
    Cr row blocks — the band-input kernel's exact input layout).

    ``barrier``: the encode fusion-fence placement (the
    GPUJPEG_TPU_PRE_BARRIER axis) — "planes" fences the stride-3
    slices, "packed" fences the final array, "none" lets XLA fuse
    freely."""
    sl = (raw_w[:, 0::3], raw_w[:, 1::3], raw_w[:, 2::3])
    if barrier == "planes":
        sl = jax.lax.optimization_barrier(sl)
    y, cb, cr = _shuffle_transform(*sl, m9, base)
    pw = jnp.concatenate([y, cb, cr])
    if barrier == "packed":
        pw = jax.lax.optimization_barrier(pw)
    return pw


def host_raw_words(raw, H: int, W: int) -> np.ndarray:
    """Free host-side reinterpretation of a raw interleaved RGB buffer
    as (H, 3W/4) little-endian int32 words (the upload format for the
    words-form encode)."""
    a = np.ascontiguousarray(np.asarray(raw, dtype=np.uint8).reshape(H, 3 * W))
    return a.view("<i4")


def pack_consts(plan):
    """(m9, base) static tuples for :func:`pack_plane_words` from the
    plan's color pair; (None, None) for identity; None when the pair is
    not a single forward RGB matrix (caller falls back to the u8-domain
    preprocess). Mirrors entropy_v2.rgb_transform_consts."""
    from .entropy_v2 import rgb_transform_consts
    xf = rgb_transform_consts(plan.image.color_space,
                              plan.params.color_space_internal)
    if xf is None:
        return None
    if xf == ():
        return (None, None)
    m9, base = xf
    return (tuple(int(v) for v in m9), tuple(int(v) for v in base))


def _expand_signed(c):
    """(c)*256/255 with C truncation toward zero (colorspace semantics
    for possibly-negative operands)."""
    q = c * 256
    return jnp.sign(q) * (jnp.abs(q) // 255)


def interleave_raw_words(planes, m9, base):
    """Decode mirror of :func:`pack_plane_words`: 3 (H, W/4) int32
    plane-word arrays -> (H, 3W/4) int32 raw interleaved words, with
    the inverse fixed-point color transform (ops/colorspace.py
    ``_transform_from`` semantics, exact) applied per byte lane-aligned
    and the stride-3 word interleave done as one minor-dim stack+reshape
    (measured at copy speed on chip). ``m9``/``base`` from
    colorspace.MATRIX_FROM, or None/None for identity."""
    H, QW = planes[0].shape
    # out[t][ci] = output channel ci of pixel byte t
    chans = []
    for t in range(4):
        if m9 is None:
            chans.append([_byte(planes[ci], t) for ci in range(3)])
            continue
        r = [_expand_signed(_byte(planes[ci], t) - base[ci])
             for ci in range(3)]
        chans.append([
            jnp.clip((m9[3 * i] * r[0] + m9[3 * i + 1] * r[1]
                      + m9[3 * i + 2] * r[2] + 128) >> 8, 0, 255)
            for i in range(3)])
    # inverse byte map: raw word wi byte bp holds channel ci of pixel t
    # where _BYTE_MAP[ci][t] == (wi, bp)
    words = [None, None, None]
    for ci in range(3):
        for t in range(4):
            wi, bp = _BYTE_MAP[ci][t]
            v = chans[t][ci] << (8 * bp) if bp else chans[t][ci]
            words[wi] = v if words[wi] is None else words[wi] | v
    return jnp.stack(words, axis=-1).reshape(H, 3 * QW)


def unpack_consts(plan, out_image):
    """(m9, base) for :func:`interleave_raw_words` from the decode
    color pair; (None, None) for identity; None when the pair is not a
    single inverse-RGB matrix (caller keeps the u8-domain
    postprocess)."""
    from ..types import ColorSpace
    from .colorspace import MATRIX_FROM
    cs_from = ColorSpace(plan.params.color_space_internal)
    cs_to = ColorSpace(out_image.color_space)
    if cs_from in (cs_to, ColorSpace.NONE) or cs_to == ColorSpace.NONE:
        return (None, None)
    if cs_to == ColorSpace.RGB and cs_from in MATRIX_FROM:
        m9, base = MATRIX_FROM[cs_from]
        return (tuple(int(v) for v in m9), tuple(int(v) for v in base))
    return None


def unpack_eligible(plan, out_image) -> bool:
    """True when the word-domain decode tail can produce this output:
    interleaved 3-byte RGB-order raw at full resolution from three
    equal full-res components, word-divisible width, expressible
    inverse transform."""
    from ..types import PixelFormat as _PF
    img = plan.image
    comps = plan.components
    if os.environ.get("GPUJPEG_TPU_NO_WORD_PACK"):
        return False
    return (
        _PF(out_image.pixel_format) == _PF.PF_444_U8_P012
        and out_image.width == img.width
        and out_image.height == img.height
        and len(comps) == 3
        and all(c.index == i for i, c in enumerate(comps))
        and all(c.width == img.width and c.height == img.height
                and c.data_width == img.width
                and c.data_height == img.height for c in comps)
        and img.width % 4 == 0
        and unpack_consts(plan, out_image) is not None
    )


def pack_eligible(plan) -> bool:
    """True when the word-domain pack can feed the band-input encode
    for this plan: interleaved 3-byte RGB-order raw, three
    full-resolution components in index order with no MCU padding,
    word-divisible width, and an expressible forward transform."""
    from ..types import PixelFormat as _PF
    img = plan.image
    comps = plan.components
    if os.environ.get("GPUJPEG_TPU_NO_WORD_PACK"):
        return False
    return (
        _PF(img.pixel_format) == _PF.PF_444_U8_P012
        and len(comps) == 3
        and all(c.index == i for i, c in enumerate(comps))
        and all(c.width == img.width and c.height == img.height
                and c.data_width == img.width
                and c.data_height == img.height for c in comps)
        and img.width % 4 == 0
        and pack_consts(plan) is not None
    )
