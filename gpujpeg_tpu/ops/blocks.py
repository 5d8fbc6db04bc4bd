"""Plane <-> 8x8 block layout conversions (backend-generic)."""
from __future__ import annotations


def plane_to_blocks(plane, xp):
    """(H, W) -> (H/8*W/8, 64); blocks in raster order, pixels in natural
    (row-major) order within each block."""
    h, w = plane.shape
    assert h % 8 == 0 and w % 8 == 0, (h, w)
    return (plane.reshape(h // 8, 8, w // 8, 8)
                 .transpose(0, 2, 1, 3)
                 .reshape(h // 8 * (w // 8), 64))


def blocks_to_plane(blocks, h: int, w: int, xp):
    """(H/8*W/8, 64) -> (H, W)."""
    return (blocks.reshape(h // 8, w // 8, 8, 8)
                  .transpose(0, 2, 1, 3)
                  .reshape(h, w))


def plane_to_blocks_u32(plane, xp, lax=None):
    """(H, W) u8 -> (H/8*W/8, 16) int32: each row is one block's 64
    bytes packed 4-per-word (little-endian). The blockify transpose runs
    on 4x fewer elements than the u8 form — the u8 transpose is ~2/3 of
    the whole 8K encode glue cost (measured via profiler); consumers
    unpack bytes in-kernel."""
    import jax
    h, w = plane.shape
    words = jax.lax.bitcast_convert_type(
        plane.reshape(h, w // 4, 4), xp.uint32)
    out = (words.reshape(h // 8, 8, w // 8, 2)
                .transpose(0, 2, 1, 3)
                .reshape(h // 8 * (w // 8), 16))
    return jax.lax.bitcast_convert_type(out, xp.int32)


