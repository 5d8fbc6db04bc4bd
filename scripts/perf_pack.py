#!/usr/bin/env python
"""On-chip A/B of the encode kernel's input-pack formulations (round-4
io-floor attack; BENCHMARKS.md round-4 measured the current horizontal
plane-words materialization at 6.4 ms vs 2.55 ms for a plain copy).

The horizontal pack (word = 4 lane-adjacent pixels of one row) is a
cross-LANE byte shuffle; TPU u8 arrays are (32,128)-tiled with 4
sublane-adjacent bytes sharing one 32-bit register element, so a
VERTICAL pack (word = 4 row-adjacent pixels of one column) coincides
with the native layout and should cost ~a copy. If that holds, the
band-input kernel's blockify can absorb the byte-order change in its
permuted DCT operator (band_perm_rows) and the XLA side drops ~4 ms.

Variants (all consume the 3 materialized 8K planes behind a barrier):
  copy    — i32 copy of the same bytes (floor)
  horiz   — current: bitcast (H, W/4, 4)u8 -> (H, W/4)i32, concat
  vert_t  — reshape (H/4, 4, W) -> transpose -> bitcast -> (H/4, W)i32
  vert_s  — shift-OR of 4 sublane-strided slices (same result)
Run on the real chip; also checks vert_t == vert_s bytes.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_cache_gpujpeg_tpu")
import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402

H, W = 4320, 7680
ITERS = int(os.environ.get("PACK_ITERS", "30"))


def horiz(ps):
    return jnp.concatenate([
        jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(
                p.reshape(p.shape[0], p.shape[1] // 4, 4), jnp.uint32),
            jnp.int32)
        for p in ps])


def vert_t(ps):
    return jnp.concatenate([
        jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(
                p.reshape(p.shape[0] // 4, 4, p.shape[1])
                 .transpose(0, 2, 1), jnp.uint32), jnp.int32)
        for p in ps])


def vert_s(ps):
    def one(p):
        q = p.astype(jnp.uint32)
        w = (q[0::4] | (q[1::4] << 8) | (q[2::4] << 16) | (q[3::4] << 24))
        return jax.lax.bitcast_convert_type(w, jnp.int32)
    return jnp.concatenate([one(p) for p in ps])


def copy32(ps):
    return jnp.concatenate([
        jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(
                p.reshape(p.shape[0], p.shape[1] // 4, 4), jnp.uint32),
            jnp.int32) + 0
        for p in ps])[:1]    # not used; placeholder


def main():
    rng = np.random.default_rng(0)
    planes = [jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
              for _ in range(3)]
    jax.block_until_ready(planes)
    print(f"devices: {jax.devices()}", flush=True)

    # correctness (tiny, on host)
    a = np.asarray(rng.integers(0, 256, (8, 16), dtype=np.uint8))
    vt = np.asarray(jax.jit(vert_t)([jnp.asarray(a)]))
    vs = np.asarray(jax.jit(vert_s)([jnp.asarray(a)]))
    assert np.array_equal(vt, vs), "vertical formulations disagree"
    want = (a[0::4].astype(np.uint32) | (a[1::4].astype(np.uint32) << 8)
            | (a[2::4].astype(np.uint32) << 16)
            | (a[3::4].astype(np.uint32) << 24)).astype(np.int32)
    assert np.array_equal(vt, want), "vertical pack semantics wrong"
    print("vertical pack semantics verified (vert_t == vert_s == numpy)")

    pw0 = jax.jit(horiz)(planes)
    jax.block_until_ready(pw0)

    def timeit(name, fn, args):
        f = jax.jit(fn)
        o = f(args)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        outs = [f(args) for _ in range(ITERS)]
        jax.block_until_ready(outs[-1])
        ms = (time.perf_counter() - t0) * 1e3 / ITERS
        print(f"{name:8s} {ms:7.2f} ms", flush=True)
        return ms

    timeit("copy", lambda x: x + 0, pw0)          # i32 copy floor
    timeit("horiz", horiz, planes)
    timeit("vert_t", vert_t, planes)
    timeit("vert_s", vert_s, planes)
    # u8 copy of a plane-shaped buffer (relayout-free baseline)
    timeit("u8copy", lambda ps: [p ^ jnp.uint8(0) for p in ps], planes)


if __name__ == "__main__":
    main()
