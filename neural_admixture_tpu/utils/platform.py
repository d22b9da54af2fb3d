"""JAX platform/runtime configuration helpers."""
import os

_CACHE_SET = False


def sync_platform_from_env() -> None:
    """Make the JAX_PLATFORMS env var authoritative.

    Some environments register a TPU PJRT plugin via sitecustomize and set
    ``jax_platforms`` programmatically, which silently overrides a user's
    ``JAX_PLATFORMS=cpu``. Re-assert the env var (no-op if the backend is
    already initialized)."""
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    import jax
    try:
        if jax.config.jax_platforms != env:
            jax.config.update("jax_platforms", env)
    except Exception:
        pass


def enable_compile_cache(path: str = "") -> None:
    """Enable JAX's persistent compilation cache.

    First-time XLA compiles (especially through a remote TPU tunnel) can take
    tens of seconds; the persistent cache makes every subsequent process
    reuse them. Safe to call multiple times; must run before first backend use
    to cover all compiles (later calls still help subsequent ones).
    """
    global _CACHE_SET
    if _CACHE_SET:
        return
    import jax

    cache_dir = path or os.environ.get(
        "NA_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "na_tpu_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _CACHE_SET = True
