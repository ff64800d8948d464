"""Persistent XLA compilation cache for CLI cold starts.

The reference's tools are one-shot CLI processes; on TPU stacks the first
compile of the fused plate/tiled programs costs 60-300s per process
(BASELINE.md "Cold-process numbers"), which dwarfs warm compute. Wiring
jax's persistent compilation cache means the SECOND process run of any
tool skips straight to execution for every program whose (HLO, flags,
topology) key matches.

Honest scope note: on backends whose compiler runs remotely and ignores
the local cache (the axon-tunnel dev stack here), this only caches the
local-compile portion; on standard TPU/CPU PJRT runtimes it eliminates
recompilation entirely (asserted by tests/test_compile_cache.py via
jax's cache-hit monitoring events on the CPU backend).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

_ENABLED = False


def enable_persistent_cache(cache_dir: Optional[str] = None) -> str:
    """Idempotently enable jax's persistent compilation cache.

    Priority for the location: explicit argument, JAX_COMPILATION_CACHE_DIR
    (honored by jax itself, recorded here for symmetry), then
    ``<base_dir>/.xla_cache`` next to the configured model/config tree so
    `tmat-tpu configure` relocates it with everything else.
    """
    global _ENABLED
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache_dir is None:
        from tmat_tpu.core import defs

        cache_dir = str(Path(defs.BASE_DIR) / ".xla_cache")
    if not _ENABLED:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache even fast compiles: CLI tools compile dozens of small
        # programs whose dispatch-compile latency adds up through a
        # remote-compile tunnel
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _ENABLED = True
    return cache_dir
