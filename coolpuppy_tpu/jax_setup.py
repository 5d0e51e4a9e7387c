"""Process-level JAX configuration shared by every entry point.

The pallas pileup kernel costs ~40s of Mosaic compile per shape; the
persistent compilation cache makes that a once-per-machine cost instead of
once-per-process (CLI runs are short-lived processes, so without this every
`coolpup-tpu` invocation pays the full compile)."""

import os
import tempfile

_done = False


def ensure_jax_cache():
    """Enable the persistent compilation cache (idempotent, safe pre-init).

    Override the location with COOLPUPPY_TPU_JAX_CACHE; set it empty to
    disable."""
    global _done
    if _done:
        return
    _done = True
    cache_dir = os.environ.get(
        "COOLPUPPY_TPU_JAX_CACHE",
        os.path.join(tempfile.gettempdir(), "coolpuppy-tpu-jaxcache"),
    )
    if not cache_dir:
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:  # pragma: no cover - older jax or read-only fs
        pass


def honor_platform_env():
    """Apply JAX_PLATFORMS through the config API.

    Some jax builds with out-of-tree accelerator plugins register the plugin
    regardless of the env var, so `JAX_PLATFORMS=cpu coolpup-tpu ...` would
    silently run on (and block waiting for) the accelerator. The CLIs call
    this before first backend use; a no-op when the env var is unset."""
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        try:
            import jax

            jax.config.update("jax_platforms", want)
        except Exception:  # pragma: no cover
            pass
