"""Persistent XLA compile-cache setup, shared by every entry point.

On tunneled/remote TPU backends the client-visible ``backend.compile()``
returns in well under a second (the MLIR is shipped off and the real
XLA/Mosaic compile happens terminal-side at first use, costing minutes per
program). JAX's default ``jax_persistent_cache_min_compile_time_secs`` (1.0)
therefore REFUSES to cache exactly the programs that are the most expensive:
it sees a 0.7s "compile" and skips the write, and every fresh process pays
the full terminal-side compile again. Threshold 0 caches everything; cached
entries load push-only (sub-second), so a warmed cache turns engine init
from minutes into seconds on such backends. On direct PJRT backends the
threshold is simply "cache everything", which is also what we want — tiny
entries cost KBs.
"""

from __future__ import annotations

import os
import tempfile


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir`` (default:
    ``$EPA_NG_TPU_COMPILE_CACHE`` or ``<tmp>/epa_ng_tpu_jax_cache``) and
    cache every compile regardless of client-visible compile time.

    Honors ``EPA_NG_TPU_NO_COMPILE_CACHE=1`` as an opt-out. Returns the
    cache dir in use, or None when disabled.
    """
    if os.environ.get("EPA_NG_TPU_NO_COMPILE_CACHE"):
        return None
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "EPA_NG_TPU_COMPILE_CACHE",
            os.path.join(tempfile.gettempdir(), "epa_ng_tpu_jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return cache_dir
