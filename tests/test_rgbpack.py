"""Word-domain pack front end (ops/rgbpack.py): exact equality with the
u8-domain preprocess, and full-encode byte identity between the words
and flat input forms (the round-5 io-floor fix must not change a single
stream byte)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpujpeg_tpu.models.encoder import Encoder
from gpujpeg_tpu.ops.jax_pipeline import _enc_context
from gpujpeg_tpu.ops.preprocess import preprocess
from gpujpeg_tpu.ops.rgbpack import (
    host_raw_words, pack_consts, pack_eligible, pack_plane_words)
from gpujpeg_tpu.params import ImageParameters, Parameters
from gpujpeg_tpu.plan import make_plan
from gpujpeg_tpu.types import ColorSpace, PixelFormat


def _image(H, W, seed=0, with_255=True):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    if with_255:
        img[0, :7] = 255    # exercise the c*256//255 expand boundary
    return img


def _params(H, W, ri=8, quality=75, cs=ColorSpace.RGB):
    image = ImageParameters(width=W, height=H, color_space=cs,
                            pixel_format=PixelFormat.PF_444_U8_P012)
    return Parameters(quality=quality, restart_interval=ri,
                      interleaved=False), image


def test_pack_words_equals_u8_preprocess():
    """pack_plane_words == the u8-domain preprocess + horizontal word
    pack, exact integer equality (includes the 255-expand boundary and
    negative-accumulator >> 8 rounding)."""
    H, W = 64, 256
    img = _image(H, W)
    params, image = _params(H, W)
    plan = make_plan(params, image)
    assert pack_eligible(plan)
    m9, base = pack_consts(plan)

    planes = preprocess(img.reshape(-1), image, plan, jnp)
    pw_ref = jnp.concatenate([
        jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(
                p.reshape(p.shape[0], p.shape[1] // 4, 4), jnp.uint32),
            jnp.int32)
        for p in planes])

    raw_w = jnp.asarray(host_raw_words(img, H, W))
    for barrier in ("planes", "packed", "none"):
        pw = pack_plane_words(raw_w, m9, base, barrier)
        assert np.array_equal(np.asarray(pw), np.asarray(pw_ref)), barrier


def test_pack_identity_transform():
    """Identity color pair (RGB internal): pure de-interleave."""
    H, W = 16, 64
    img = _image(H, W)
    raw_w = jnp.asarray(host_raw_words(img, H, W))
    y, cb, cr = np.split(np.asarray(
        pack_plane_words(raw_w, None, None, "none")), 3)
    for c, plane in enumerate((y, cb, cr)):
        want = np.ascontiguousarray(
            img[:, :, c]).reshape(H, W // 4, 4).view("<i4")[..., 0]
        assert np.array_equal(plane, want)


def test_encode_words_vs_flat_byte_identity(monkeypatch):
    """The full device encode through the words form produces the
    byte-identical stream to the flat (u8 preprocess) form, running the
    REAL fused kernel under the Pallas interpreter. ri=32 at Q75 gives
    bps*W == 128 — the flagship fused_full geometry. (128x320 is unique
    to this test: _ENC_CACHE is keyed by geometry and other tests build
    contexts without interpret mode.)"""
    monkeypatch.setenv("GPUJPEG_TPU_PALLAS_INTERPRET", "1")
    H, W = 128, 320
    img = _image(H, W, seed=3)
    params, image = _params(H, W, ri=32)
    plan = make_plan(params, image)
    enc = Encoder(backend="jax")
    quant_zz, huff = enc._tables(params)
    ctx = _enc_context(plan, quant_zz, huff)
    assert ctx.fn.kind == "fused_full_words"
    raw_w = jnp.asarray(host_raw_words(img, H, W))
    out_w = jax.block_until_ready(ctx.fn(raw_w))
    out_f = jax.block_until_ready(
        ctx.fn.flat_form(jnp.asarray(img.reshape(-1))))
    for a, b in zip(out_w, out_f):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_encode_words_stream_matches_golden():
    """End-to-end: the public encode (which now takes the words path)
    stays byte-identical to the host golden coder."""
    H, W = 64, 128
    img = _image(H, W, seed=5)
    params, image = _params(H, W, ri=8)
    out_dev = Encoder(backend="jax").encode(img, params, image)
    out_gold = Encoder(backend="golden").encode(img, params, image)
    assert out_dev == out_gold


def test_pack_ineligible_formats():
    """Non-RGB-interleaved input or MCU padding keeps the flat form."""
    # width not divisible by 4 blocks padding-free eligibility
    params, image = _params(64, 100)
    plan = make_plan(params, image)
    assert not pack_eligible(plan)
    # grayscale
    image = ImageParameters(width=128, height=64,
                            color_space=ColorSpace.YCBCR_BT601_256LVLS,
                            pixel_format=PixelFormat.U8)
    plan = make_plan(Parameters(quality=75, restart_interval=8,
                                interleaved=False), image)
    assert not pack_eligible(plan)


def test_pack_ineligible_env(monkeypatch):
    monkeypatch.setenv("GPUJPEG_TPU_NO_WORD_PACK", "1")
    params, image = _params(64, 128)
    plan = make_plan(params, image)
    assert not pack_eligible(plan)
