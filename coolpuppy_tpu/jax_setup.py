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
