"""Per-platform persistent XLA compile cache setup.

One shared cache directory for every backend is a trap in this environment:
the axon (tunneled TPU) backend compiles on a REMOTE server, and entries it
writes can embed XLA:CPU AOT blobs compiled for the REMOTE host's CPU
("Compile machine features" with +prefer-no-scatter etc.).  A local XLA:CPU
process that later loads such an entry heap-corrupts and dies (observed:
cpu_aot_loader "Target machine feature ... is not supported on the host
machine" followed by SIGSEGV / free(): invalid size).  The same failure
appears when the driver migrates the repo between hosts with different CPU
feature sets.

Keeping the cache keyed by platform (and letting each platform's dir be
poisoned only by its own kind) makes both failure modes harmless.
"""

from __future__ import annotations


def setup_compile_cache(platform: str) -> str:
    """Point jax's persistent compile cache at a per-platform directory.

    ``platform``: "cpu" or "tpu" (any short token; used as a dir suffix).
    Call AFTER deciding the backend (e.g. after the --cpu flag is parsed)
    and before the first compilation.  Returns the directory used.
    """
    import jax

    path = f"/tmp/ilqr_tpu_jax_cache_{platform}"
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
