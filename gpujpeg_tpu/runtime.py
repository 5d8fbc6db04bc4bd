"""Runtime/session services: persistent compilation cache + cache dirs.

The reference's first-iteration cost is ~233 ms (lazy buffer allocation,
/root/reference/README.md:103, FAQ.md:14-19); on TPU the analogous cost
is XLA compilation of the per-geometry executables, which can run to
minutes for the Pallas entropy kernels. The library therefore enables
JAX's persistent compilation cache by default at import, so a cold
process re-encoding a previously seen geometry pays a cache *lookup*
(hundreds of ms) instead of a compile.

Users can override via the standard JAX env vars / config knobs; setting
``GPUJPEG_TPU_NO_COMPILE_CACHE=1`` disables the default entirely.
"""
from __future__ import annotations

import logging
import os
import stat

log = logging.getLogger(__name__)


def user_cache_dir() -> str:
    """Per-user cache root (0700), safe on multi-user hosts."""
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    path = os.path.join(base, "gpujpeg_tpu")
    os.makedirs(path, mode=0o700, exist_ok=True)
    return path


def verify_private_dir(path: str) -> bool:
    """True when `path` is owned by us and not writable by others —
    guard before loading executable artifacts (.so) from it."""
    try:
        st = os.stat(path)
    except OSError:
        return False
    if hasattr(os, "getuid") and st.st_uid != os.getuid():
        return False
    return not (st.st_mode & (stat.S_IWGRP | stat.S_IWOTH))


_CACHE_WIRED = False
_PLATFORMS_WIRED = False


def honor_env_platforms() -> None:
    """Honor JAX_PLATFORMS even when a site hook (e.g. a hosted-TPU
    plugin) pre-imported jax and pinned another platform — the env var
    is the user's explicit choice for this process. (The CLI re-asserts
    it too; doing it here covers library imports, examples and
    scripts/smoke.sh uniformly.) Independent of the compilation-cache
    default so GPUJPEG_TPU_NO_COMPILE_CACHE=1 doesn't disable it."""
    global _PLATFORMS_WIRED
    if _PLATFORMS_WIRED:
        return
    _PLATFORMS_WIRED = True
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        try:
            import jax
            jax.config.update("jax_platforms", env_platforms)
        except Exception:  # pragma: no cover - best effort
            pass


def enable_compilation_cache() -> None:
    """Idempotently point JAX's persistent compilation cache at the
    per-user cache dir (unless the user already configured one)."""
    global _CACHE_WIRED
    honor_env_platforms()
    if _CACHE_WIRED or os.environ.get("GPUJPEG_TPU_NO_COMPILE_CACHE"):
        return
    _CACHE_WIRED = True
    try:
        import jax
        if (os.environ.get("JAX_COMPILATION_CACHE_DIR")
                or jax.config.jax_compilation_cache_dir):
            return  # user/test harness already configured a cache
        cache = os.path.join(user_cache_dir(), "jax_cache")
        os.makedirs(cache, mode=0o700, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        # the entropy kernels are exactly the executables worth caching;
        # default thresholds (1s / small-entry skip) would drop the small
        # staged jits that still cost hundreds of ms each
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # pragma: no cover - best effort
        log.debug("compilation cache setup skipped: %s", e)


def pallas_interpret() -> bool:
    """True when GPUJPEG_TPU_PALLAS_INTERPRET is set: run every Pallas
    kernel in interpreter mode so the real TPU kernels (not the XLA
    fallbacks) are testable on the CPU backend."""
    return bool(os.environ.get("GPUJPEG_TPU_PALLAS_INTERPRET"))


def use_pallas_default() -> bool:
    """Device kernels use Pallas on real accelerators, or anywhere when
    interpret mode is forced."""
    import jax
    return jax.devices()[0].platform not in ("cpu",) or pallas_interpret()


def pallas_call(*args, **kw):
    """pl.pallas_call wrapper honoring :func:`pallas_interpret` and the
    GPUJPEG_TPU_VMEM_LIMIT override (bytes; Mosaic's scoped-VMEM budget
    caps kernel tile sizes — the entropy kernels are tuned against it)."""
    from jax.experimental import pallas as pl
    if pallas_interpret():
        kw.setdefault("interpret", True)
    lim = os.environ.get("GPUJPEG_TPU_VMEM_LIMIT")
    if lim and "compiler_params" not in kw and not kw.get("interpret"):
        from jax.experimental.pallas import tpu as pltpu
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(lim))
    return pl.pallas_call(*args, **kw)
