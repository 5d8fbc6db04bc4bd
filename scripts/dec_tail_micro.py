"""Micro-bench the decode-tail pieces on chip at 8K-luma scale:
reshape pairing, banded IDCT matmul, Pallas unblockify, XLA
blocks_to_plane, plain IDCT matmul. 10 iters each, device-resident.

Run: python -u scripts/dec_tail_micro.py
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from gpujpeg_tpu.ops.dct import (dequant_idct_device, idct_operator_f32,
                                 dequant_idct_pairs_banded,
                                 idct_pair_operator_banded)
from gpujpeg_tpu.ops.blocks import blocks_to_plane
from gpujpeg_tpu.ops.pallas_decode import unblockify_bands
from gpujpeg_tpu.tables import quant_table_zz
from gpujpeg_tpu.types import ComponentType


def bench(fn, *args, iters=10):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[0].reshape(-1)[:1])
    return (time.perf_counter() - t0) * 1e3 / iters


def main():
    dh, dw = 4320, 7680
    N = dh // 8 * (dw // 8)
    rng = np.random.default_rng(0)
    coeff = rng.integers(-256, 256, (N, 64)).astype(np.int32)
    qzz = tuple(int(x) for x in quant_table_zz(ComponentType.LUMINANCE, 75))
    W = jnp.asarray(idct_operator_f32(qzz))
    W2p = jnp.asarray(idct_pair_operator_banded(qzz))
    c_dev = jnp.asarray(coeff)
    ppb = dw // 16

    print(f"luma 8K: N={N} blocks", flush=True)

    f_resh = jax.jit(lambda c: c.reshape(N // 2, 128) + 1)
    print(f"reshape (N,64)->(N/2,128) [+1]: {bench(f_resh, c_dev):7.2f} ms",
          flush=True)

    f_idct = jax.jit(lambda c: dequant_idct_device(c, W))
    print(f"plain IDCT matmul (N,64):       {bench(f_idct, c_dev):7.2f} ms",
          flush=True)

    f_band = jax.jit(lambda c: dequant_idct_pairs_banded(c, W2p))
    print(f"banded pair matmul (N/2,128):   {bench(f_band, c_dev):7.2f} ms",
          flush=True)

    words = jax.block_until_ready(f_band(c_dev))
    f_unb = jax.jit(lambda w: unblockify_bands(w, dh, ppb))
    print(f"pallas unblockify:              {bench(f_unb, words):7.2f} ms",
          flush=True)

    blocks = jax.block_until_ready(f_idct(c_dev))
    f_b2p = jax.jit(lambda b: blocks_to_plane(b, dh, dw, jnp))
    print(f"XLA blocks_to_plane (u8):       {bench(f_b2p, blocks):7.2f} ms",
          flush=True)

    f_full_band = jax.jit(lambda c: unblockify_bands(
        dequant_idct_pairs_banded(c, W2p), dh, ppb))
    print(f"banded full tail:               "
          f"{bench(f_full_band, c_dev):7.2f} ms", flush=True)

    f_full_xla = jax.jit(lambda c: blocks_to_plane(
        dequant_idct_device(c, W), dh, dw, jnp))
    print(f"XLA full tail:                  "
          f"{bench(f_full_xla, c_dev):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
