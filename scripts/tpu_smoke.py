"""On-chip perf/regression gate (run on real TPU hardware).

Asserts, at the flagship 8K Q75 geometry:
  (a) the encode context serves the flagship kernel variant — not a
      silent downgrade — now `fused_full_words` (round 2 shipped that failure mode:
      Mosaic rejected the fused kernel on hardware while the interpreter
      accepted it, and the bench silently measured the fallback);
  (b) pipelined device encode and decode ms have not regressed more
      than GATE_PCT (default 10%) over the checked-in numbers below.

Exit 0 = pass; exit 1 = downgrade or regression (turns the bench red).
Update EXPECT after a deliberate, measured improvement.

Run:  python scripts/tpu_smoke.py [iters]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# checked-in steady-state expectations, ms at 8K Q75 ri=32 pow2
# (TPU v5 lite via the dev tunnel; see BENCHMARKS.md round-3 table)
EXPECT = {
    "encode_ms": 23.0,   # round-5 final (21.6-24.9 measured tunnel-session band)
    "decode_ms": 13.0,   # round-5 px tail + tile 8192 + deduped Wq (11.2-13.9 swing)
}
GATE_PCT = float(os.environ.get("GPUJPEG_TPU_GATE_PCT", "10"))

H, W = 4320, 7680


def make_image():
    rng = np.random.default_rng(7)
    y, x = np.mgrid[0:H, 0:W]
    img = np.stack([
        128 + 90 * np.sin(x / 23.0) * np.cos(y / 17.0),
        128 + 80 * np.cos(x / 31.0 + 1.0) * np.sin(y / 11.0),
        128 + 70 * np.sin((x + y) / 41.0),
    ], axis=-1)
    img += rng.normal(0, 3.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def main() -> int:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    import jax
    import jax.numpy as jnp
    from gpujpeg_tpu.models.encoder import Encoder
    from gpujpeg_tpu.models.decoder import Decoder
    from gpujpeg_tpu.params import ImageParameters, Parameters, \
        suggest_restart_interval
    from gpujpeg_tpu.plan import make_plan
    from gpujpeg_tpu.types import ColorSpace, PixelFormat
    import gpujpeg_tpu.ops.jax_pipeline as jp

    failures = []
    img = make_image()
    image = ImageParameters(width=W, height=H, color_space=ColorSpace.RGB,
                            pixel_format=PixelFormat.PF_444_U8_P012)
    ri = suggest_restart_interval(image, subsampled=False,
                                  interleaved=False, pow2=True)
    params = Parameters(quality=75, restart_interval=ri)

    # ---- encode: variant gate + pipelined ms ----
    enc = Encoder(backend="jax")
    plan = make_plan(params, image)
    quant_zz, huff = enc._tables(params)
    ctx = jp._enc_context(plan, quant_zz, huff)
    if getattr(ctx.fn, "input_form", "flat") == "words":
        from gpujpeg_tpu.ops.rgbpack import host_raw_words
        raw_dev = jnp.asarray(host_raw_words(img, H, W))
    else:
        raw_dev = jnp.asarray(img.reshape(-1))

    def esync(o):
        np.asarray(jax.lax.slice(o[1], (0,), (1,)))

    esync(ctx.fn(raw_dev))                 # warm (compile + any downgrade)
    kind = getattr(ctx.fn, "kind", "?")
    print(f"encode variant: {kind}", flush=True)
    if kind != "fused_full_words":
        failures.append(f"encode variant downgraded to {kind!r} "
                        f"(expected fused_full_words)")
    t0 = time.perf_counter()
    outs = [ctx.fn(raw_dev) for _ in range(iters)]
    esync(outs[-1])
    enc_ms = (time.perf_counter() - t0) * 1e3 / iters
    print(f"encode: {enc_ms:.2f} ms (expect <= "
          f"{EXPECT['encode_ms'] * (1 + GATE_PCT / 100):.2f})", flush=True)
    if enc_ms > EXPECT["encode_ms"] * (1 + GATE_PCT / 100):
        failures.append(f"encode {enc_ms:.2f} ms regressed >{GATE_PCT}% "
                        f"over {EXPECT['encode_ms']} ms")

    # ---- decode: pipelined ms via the captured device fn ----
    data = enc.encode(img, params, image)
    dec = Decoder(backend="jax")
    dec.output_to_device = True
    dec.capture_device_call = True

    def dsync(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(leaf.reshape(-1)[:1])

    raw, _ = dec.decode(data)
    dsync(raw)
    dfn, dargs = dec.last_device_call
    dsync(dargs)
    dsync(dfn(*dargs))
    t0 = time.perf_counter()
    rs = [dfn(*dargs) for _ in range(iters)]
    dsync(rs[-1])
    dec_ms = (time.perf_counter() - t0) * 1e3 / iters
    print(f"decode: {dec_ms:.2f} ms (expect <= "
          f"{EXPECT['decode_ms'] * (1 + GATE_PCT / 100):.2f})", flush=True)
    if dec_ms > EXPECT["decode_ms"] * (1 + GATE_PCT / 100):
        failures.append(f"decode {dec_ms:.2f} ms regressed >{GATE_PCT}% "
                        f"over {EXPECT['decode_ms']} ms")

    if failures:
        for f in failures:
            print(f"SMOKE FAIL: {f}", flush=True)
        return 1
    print("SMOKE PASS", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
