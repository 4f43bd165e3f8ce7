"""Persistent compiled-program cache via ``jax.export``.

The reference *intended* to cache its compiled derivative methods to disk but
never shipped it (JLD2/Scratch imported unused; "TODO: option to load/save
methods", reference src/costs.jl:18, src/dynamics.jl:17 — SURVEY.md "quirks").
This is the TPU-native realization at whole-program granularity: the fully
lowered StableHLO of a jitted solve is serialized once and reloaded in later
processes, skipping Python tracing/lowering entirely (which dominates cold
start: on the tunneled TPU backend in this environment, lowering the acrobot
T=101 batched solve takes ~350s while XLA compilation takes ~3s and is already
covered by JAX's persistent compilation cache).

Usage:

    fn = cached_program(make_fn, key, example_args, cache_dir=...)
    out = fn(*args)

``make_fn`` is only called (and the program only lowered) on a cache miss.
The cache key should encode everything that shapes the program: problem spec
fingerprint, options, shapes/dtypes, batch size.  jax version, backend
platform and device count are appended automatically.
"""

from __future__ import annotations

import hashlib
import os
import pathlib
from typing import Callable, Optional, Sequence

import jax
from jax import export as jexport

DEFAULT_CACHE_DIR = os.environ.get(
    "ILQR_TPU_PROGRAM_CACHE", "/tmp/ilqr_tpu_program_cache"
)

_registered = False


def _ensure_serialization_registered():
    """Register our output pytree types for export serialization."""
    global _registered
    if _registered:
        return
    from ..core.solve import Solution
    from ..core.solve_sl import _SLCarry
    from ..parallel.batch import BatchStats

    try:
        jexport.register_pytree_node_serialization(
            Solution,
            serialized_name="iterativelqr_tpu.core.solve.Solution",
            serialize_auxdata=lambda aux: b"",
            deserialize_auxdata=lambda b: None,
            from_children=lambda aux, children: Solution(*children),
        )
    except ValueError:
        pass  # already registered
    for nt, name in (
        (BatchStats, "iterativelqr_tpu.parallel.batch.BatchStats"),
        (_SLCarry, "iterativelqr_tpu.core.solve_sl._SLCarry"),
    ):
        try:
            jexport.register_namedtuple_serialization(nt, serialized_name=name)
        except ValueError:
            pass
    _registered = True


def _cache_path(key: str, cache_dir: str) -> pathlib.Path:
    backend = jax.default_backend()
    full = f"{key}|jax={jax.__version__}|backend={backend}|ndev={jax.device_count()}"
    digest = hashlib.sha256(full.encode()).hexdigest()[:16]
    safe = "".join(ch if ch.isalnum() or ch in "-_." else "_" for ch in key)[:80]
    return pathlib.Path(cache_dir) / f"{safe}.{digest}.jaxprog"


def cached_program(
    make_fn: Callable[[], Callable],
    key: str,
    example_args: Sequence,
    cache_dir: Optional[str] = None,
    verbose: bool = False,
) -> Callable:
    """Return a jit-compiled callable, loading its lowered program from disk
    when available.

    On miss: ``make_fn()`` is called, the function is jitted, exported for the
    current backend, serialized to ``cache_dir`` and returned.  On hit: the
    serialized program is deserialized and re-jitted (XLA compilation is then
    served by JAX's persistent compilation cache when configured).
    """
    _ensure_serialization_registered()
    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    path = _cache_path(key, cache_dir)
    if path.exists():
        if verbose:
            print(f"[program_cache] hit: {path}")
        exp = jexport.deserialize(path.read_bytes())
        return jax.jit(exp.call)
    if verbose:
        print(f"[program_cache] miss: lowering for key {key!r}")
    fn = make_fn()
    jitted = fn if isinstance(fn, jax.stages.Wrapped) else jax.jit(fn)
    # Lower with an EXPLICIT platform target: export() then never consults
    # the backend, so the whole lowering runs locally even when the default
    # backend is the tunneled TPU (where backend-bound lowering pays one
    # tunnel round trip per query — measured ~15 min/program vs ~6 s local
    # for the same batched-solve program).  The axon plugin reports its
    # devices as platform "tpu", which is exactly the lowering target name;
    # jax.default_backend() reports "gpu" on CUDA/ROCm hosts, which is NOT a
    # valid export target — canonicalize via the device platform (ADVICE r4).
    platform = jax.default_backend()
    if platform == "gpu":
        pv = getattr(jax.devices()[0].client, "platform_version", "")
        platform = "rocm" if "rocm" in pv.lower() else "cuda"
    exp = jexport.export(jitted, platforms=[platform])(
        *example_args
    )
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp")
    tmp.write_bytes(exp.serialize())
    os.replace(tmp, path)
    return jax.jit(exp.call)
