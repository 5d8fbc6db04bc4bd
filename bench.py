#!/usr/bin/env python
"""Headline benchmark: 8K (7680x4320, 33 Mpix) RGB encode at Q75,
non-interleaved, restart markers — the reference's flagship configuration.

Methodology: the device pipeline (preprocess -> MXU DCT+quant ->
segment-parallel Huffman) runs N iterations back-to-back with
device-resident input and one final sync, matching the reference's
published "w/o PCIe xfers" row (GTX 3080: 2.30 ms at 8K Q75,
reference README.md:113) — the right comparison here because this
environment reaches its TPU through a network tunnel whose per-call
round-trip (~3 ms) would otherwise swamp device time; production TPU
hosts are directly attached.

Prints ONE JSON line:
  {"metric": "encode_8k_q75_device_ms", "value": <ms>, "unit": "ms",
   "vs_baseline": <2.30 / ms>}   (>1.0 = faster than the GTX 3080)

End-to-end wall times (incl. tunnel transfers + host stream assembly),
decode timing, and PSNR go to stderr.
"""
import json
import os
import sys
import time

import numpy as np

BASELINE_DEVICE_MS = 2.30   # GTX 3080, 8K Q75 encode w/o PCIe (README.md:113)
BASELINE_E2E_MS = 6.20      # GTX 3080, 8K Q75 encode incl. PCIe (README.md:97)

# regression gate (b): checked-in best measured steady-state device ms
# at 8K Q75 (BENCH_r03.json); a >GATE_PCT regression turns the bench
# red. Ratchet DOWN after a deliberate, measured improvement — never up.
EXPECT = {
    "encode_ms": 23.0,   # round-5 final (21.6-24.9 measured tunnel-session band)
    "decode_ms": 13.0,   # round-5 px tail + tile 8192 + deduped Wq (11.2-13.9 swing)
    # single-call decode WALL incl. host parse + tunnel H2D + dispatch:
    # 238-265 ms typical this tunnel but spikes past 400 on tunnel
    # variance (measured back-to-back 264 -> 403) — the gate is sized
    # to catch gross regressions only
    "decode_wall_ms": 450.0,
    # warm-cache first iteration, measured in a FRESH SUBPROCESS right
    # after this process finished compiling (so the persistent cache is
    # seeded for the exact current source no matter what ran before):
    # 10.9 s fully converged; a cold compile is ~120-180 s and MUST
    # fail loudly here
    "first_iteration_s": 40.0,
}
GATE_PCT = float(os.environ.get("GPUJPEG_TPU_GATE_PCT", "10"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_image(H, W, seed=7):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:H, 0:W]
    img = np.stack([
        128 + 90 * np.sin(x / 23.0) * np.cos(y / 17.0),
        128 + 80 * np.cos(x / 31.0 + 1.0) * np.sin(y / 11.0),
        128 + 70 * np.sin((x + y) / 41.0),
    ], axis=-1)
    img += rng.normal(0, 3.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def wait_for_backend():
    """Probe backend init AND a real compute in subprocesses with a
    bounded timeout: a wedged device tunnel can list devices yet hang
    every execution (observed after a worker crash, round 5), and would
    otherwise hang the bench with no output at all. Retries for up to
    GPUJPEG_BENCH_INIT_WAIT seconds (default 2400 — a crashed tunnel
    worker was observed taking hours to come back), then exits non-zero
    with a clear message."""
    import subprocess
    deadline = time.time() + float(
        os.environ.get("GPUJPEG_BENCH_INIT_WAIT", "2400"))
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import numpy, jax, jax.numpy as jnp; jax.devices(); "
                 "numpy.asarray(jnp.ones((8, 128)).sum()); print('ok')"],
                timeout=180, capture_output=True, text=True)
            if r.returncode == 0 and "ok" in r.stdout:
                return
            err = (r.stderr or "").strip().splitlines()
            log(f"backend probe attempt {attempt} failed: "
                f"{err[-1] if err else 'unknown'}")
        except subprocess.TimeoutExpired:
            log(f"backend probe attempt {attempt} timed out (180 s)")
        if time.time() > deadline:
            log("device backend unavailable; aborting bench")
            sys.exit(3)
        time.sleep(60)


class _CacheCounter(__import__("logging").Handler):
    """Counts JAX persistent-compilation-cache hits/misses (the round-3
    first-iteration regression shipped with no record of whether the
    cache ever hit in the driver environment)."""
    hits = 0
    misses = 0

    def emit(self, record):
        msg = record.getMessage()
        if "Persistent compilation cache hit" in msg:
            _CacheCounter.hits += 1
        elif "PERSISTENT COMPILATION CACHE MISS" in msg:
            _CacheCounter.misses += 1


def _wire_cache_counter():
    import logging
    h = _CacheCounter()
    for name in ("jax._src.compiler", "jax._src.interpreters.pxla"):
        lg = logging.getLogger(name)
        lg.addHandler(h)
        if lg.level > logging.DEBUG or lg.level == 0:
            lg.setLevel(logging.DEBUG)


def main():
    import jax
    import jax.numpy as jnp
    _wire_cache_counter()
    # the library enables the persistent compilation cache (per-user
    # ~/.cache/gpujpeg_tpu/jax_cache) at import; a cold process re-running
    # a previously seen geometry pays a cache load, not a compile
    from gpujpeg_tpu.models.encoder import Encoder
    from gpujpeg_tpu.models.decoder import Decoder
    from gpujpeg_tpu.params import ImageParameters, Parameters, \
        suggest_restart_interval
    from gpujpeg_tpu.plan import make_plan
    from gpujpeg_tpu.types import ColorSpace, PixelFormat
    from gpujpeg_tpu.ops.jax_pipeline import _enc_context

    H, W = 4320, 7680
    iters = int(os.environ.get("BENCH_ITERS", "30"))
    log(f"devices: {jax.devices()}")
    log(f"image: {W}x{H} ({W*H/1e6:.1f} Mpix), Q75 non-interleaved, {iters} iters")

    img = make_image(H, W)
    image = ImageParameters(width=W, height=H, color_space=ColorSpace.RGB,
                            pixel_format=PixelFormat.PF_444_U8_P012)
    ri = suggest_restart_interval(image, subsampled=False, interleaved=False,
                                  pow2=True)
    params = Parameters(quality=75, restart_interval=ri, interleaved=False)
    log(f"restart interval: {ri}")

    enc = Encoder(backend="jax")

    # ---- end-to-end first (also compiles everything) ----
    t0 = time.perf_counter()
    out = enc.encode(img, params, image)
    first_iter_s = time.perf_counter() - t0
    log(f"first-iteration (compile+alloc): {first_iter_s*1e3:.1f} ms, "
        f"{len(out)/1e6:.2f} MB jpeg")
    log(f"persistent compile cache: {_CacheCounter.hits} hits, "
        f"{_CacheCounter.misses} misses "
        f"(cold-miss autopsy: BENCHMARKS.md round-4 'first-iteration')")
    e2e = []
    for _ in range(max(3, iters // 6)):
        t0 = time.perf_counter()
        out = enc.encode(img, params, image)
        e2e.append((time.perf_counter() - t0) * 1e3)
    log(f"encode end-to-end (incl. tunnel xfers + host assembly): "
        f"min {min(e2e):.2f} ms  mean {np.mean(e2e):.2f} ms  "
        f"(baseline incl. PCIe: {BASELINE_E2E_MS} ms)")

    # ---- device pipeline, pipelined N-deep ----
    plan = make_plan(params, image)
    quant_zz, huff = enc._tables(params)
    ctx = _enc_context(plan, quant_zz, huff)
    if getattr(ctx.fn, "input_form", "flat") == "words":
        # round-5 words front end: the host views the raw bytes as i32
        # words for free; device-resident input is those same bytes
        from gpujpeg_tpu.ops.rgbpack import host_raw_words
        raw_dev = jnp.asarray(host_raw_words(img, H, W))
    else:
        raw_dev = jnp.asarray(img.reshape(-1))

    def sync(o):
        np.asarray(jax.lax.slice(o[1], (0,), (1,)))

    sync(ctx.fn(raw_dev))  # warm
    # regression gate (a): the flagship kernel variant must actually be
    # serving — round 2 shipped a silent Mosaic-compile downgrade that
    # the bench measured as if it were the fused kernel
    kind = getattr(ctx.fn, "kind", "?")
    log(f"encode variant: {kind}")
    downgraded = kind != "fused_full_words"
    if downgraded:
        log("BENCH FAIL: encode variant downgraded (expected "
            "fused_full_words); see scripts/tpu_smoke.py")
    t0 = time.perf_counter()
    outs = [ctx.fn(raw_dev) for _ in range(iters)]
    sync(outs[-1])
    dev_ms = (time.perf_counter() - t0) * 1e3 / iters
    log(f"device pipeline: {dev_ms:.3f} ms/frame  "
        f"({W*H/1e6/dev_ms*1e3:.0f} Mpix/s; baseline device-only: "
        f"{BASELINE_DEVICE_MS} ms / 14400 Mpix/s)")

    # ---- decode diagnostic ----
    dec = Decoder(backend="jax")
    dec.output_to_device = True      # skip the 100 MB raw D2H (tunnel)
    dec.capture_device_call = True   # first-class bench hook
    raw, _ = dec.decode(out)
    t0 = time.perf_counter()
    raw, _ = dec.decode(out)
    np.asarray(jax.lax.slice(raw.reshape(-1), (0,), (1,)))
    dwall = (time.perf_counter() - t0) * 1e3
    # pipelined device-only decode on the captured compiled fn + args
    dfn, dargs = dec.last_device_call

    def dsync(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(leaf.reshape(-1)[:1])
    dsync(dargs)
    dsync(dfn(*dargs))
    t0 = time.perf_counter()
    rs = [dfn(*dargs) for _ in range(iters)]
    dsync(rs[-1])
    dms = (time.perf_counter() - t0) * 1e3 / iters
    log(f"decode: device pipeline {dms:.2f} ms/frame "
        f"({W*H/1e6/dms*1e3:.0f} Mpix/s), single-call wall incl. host "
        f"parse+prep {dwall:.0f} ms "
        f"(baseline incl. PCIe 6.76 ms, device-only 2.38 ms)")
    raw = np.asarray(raw)
    if raw.dtype == np.int32:
        # px-tail device output: raw words — same bytes, free view
        raw = raw.view("<u1").reshape(-1)

    def psnr_of(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))

    psnr = psnr_of(raw.reshape(H, W, 3), img)
    log(f"round-trip PSNR: {psnr:.2f} dB")
    # libjpeg cross-check: (a) an independent decoder reads OUR stream,
    # (b) libjpeg encoding the same frame at the same quality/sampling
    # scores about the same PSNR — quant/rounding drift in our pipeline
    # would show up as a gap here while self-round-trips stay green
    try:
        import io
        from PIL import Image
        pil_ours = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
        psnr_pil_ours = psnr_of(pil_ours, img)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", quality=75,
                                  subsampling=0)      # 4:4:4, like ours
        pil_ref = np.asarray(Image.open(buf).convert("RGB"))
        psnr_libjpeg = psnr_of(pil_ref, img)
        log(f"cross-check: libjpeg-decode-of-ours {psnr_pil_ours:.2f} dB, "
            f"libjpeg-own-roundtrip {psnr_libjpeg:.2f} dB")
        if psnr_pil_ours < psnr_libjpeg - 0.5:
            log(f"BENCH WARN: our Q75 stream scores "
                f"{psnr_libjpeg - psnr_pil_ours:.2f} dB below libjpeg at "
                f"the same settings — check quant/rounding drift")
    except Exception as e:  # pragma: no cover - PIL optional
        log(f"cross-check skipped: {e}")

    # regression gate (b): the driver runs THIS file, so the gate must
    # live here (tpu_smoke.py has one too, but nothing ran it)
    # ---- warm-cache first iteration, in a fresh subprocess ----
    # The in-process first_iter_s above may have PAID the compile (e.g.
    # after a source change); this process seeded the persistent cache
    # for the exact current source, so a fresh process now measures the
    # true cold-process/warm-cache first call (what a user's second
    # session sees; reference README.md:103 reports 233 ms on CUDA).
    import subprocess
    warm_src = (
        "import time, numpy as np\n"
        "from gpujpeg_tpu.models.encoder import Encoder\n"
        "from gpujpeg_tpu.params import ImageParameters, Parameters, "
        "suggest_restart_interval\n"
        "from gpujpeg_tpu.types import ColorSpace, PixelFormat\n"
        "H, W = 4320, 7680\n"
        "rng = np.random.default_rng(7)\n"
        "y, x = np.mgrid[0:H, 0:W]\n"
        "img = np.clip(np.stack([128+90*np.sin(x/23.0)*np.cos(y/17.0),"
        "128+80*np.cos(x/31.0+1.0)*np.sin(y/11.0),"
        "128+70*np.sin((x+y)/41.0)],-1)+rng.normal(0,3.0,(H,W,3)),"
        "0,255).astype(np.uint8)\n"
        "image = ImageParameters(width=W, height=H,"
        " color_space=ColorSpace.RGB,"
        " pixel_format=PixelFormat.PF_444_U8_P012)\n"
        "ri = suggest_restart_interval(image, False, False, pow2=True)\n"
        "params = Parameters(quality=75, restart_interval=ri,"
        " interleaved=False)\n"
        "enc = Encoder(backend='jax')\n"
        "t0 = time.perf_counter()\n"
        "enc.encode(img, params, image)\n"
        "print('FIRST_ITER_S', time.perf_counter() - t0)\n")
    # Two back-to-back subprocess runs: the axon tunnel presents a
    # fresh compile-cache key universe per backend session (keys are
    # stable on CPU and across processes seconds apart, but rotate
    # between sessions minutes apart — measured round 5), so run A
    # seeds the CURRENT universe and run B measures the true warm
    # first call.
    warm_first_s = first_iter_s
    vals = []
    for tag in ("seed", "warm"):
        # per-run guard: a seed run timing out (e.g. a degraded tunnel
        # paying a fresh-universe compile) must not skip the warm run —
        # whatever the seed DID compile is cached for it
        try:
            r = subprocess.run([sys.executable, "-c", warm_src],
                               timeout=600, capture_output=True, text=True)
            for line in r.stdout.splitlines():
                if line.startswith("FIRST_ITER_S"):
                    vals.append(float(line.split()[1]))
        except Exception as e:  # pragma: no cover
            log(f"warm first-iteration {tag} run failed: "
                f"{type(e).__name__}")
    if vals:
        warm_first_s = vals[-1]
    log(f"warm-cache first iteration (subprocess seed/warm): "
        f"{'/'.join(f'{v:.2f}' for v in vals)} s "
        f"(in-process was {first_iter_s:.2f} s)")

    gate_fail = False
    for name, meas in (("encode_ms", dev_ms), ("decode_ms", dms),
                       ("decode_wall_ms", dwall),
                       ("first_iteration_s", warm_first_s)):
        lim = EXPECT[name] * (1 + GATE_PCT / 100.0)
        if meas > lim:
            unit = "s" if name.endswith("_s") else "ms"
            log(f"BENCH FAIL: {name} {meas:.2f} {unit} regressed past "
                f"{lim:.2f} {unit} (checked-in best {EXPECT[name]} "
                f"+{GATE_PCT:.0f}%)")
            gate_fail = True

    print(json.dumps({
        "metric": "encode_8k_q75_device_ms",
        "value": round(dev_ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_DEVICE_MS / dev_ms, 4),
        # secondary tracked metrics (VERDICT r4 items 3/7): recorded in
        # the parsed line so the driver archives them every round
        "decode_device_ms": round(dms, 3),
        "decode_wall_ms": round(dwall, 1),
        "first_iteration_s": round(warm_first_s, 2),
        "first_iteration_inproc_s": round(first_iter_s, 2),
        "cache_hits": _CacheCounter.hits,
        "cache_misses": _CacheCounter.misses,
    }))
    if downgraded or gate_fail:
        sys.exit(1)   # red bench: downgrade/regression must not ship


if __name__ == "__main__":
    if os.environ.get("JAX_PLATFORMS", "") not in ("cpu",):
        wait_for_backend()
    main()
