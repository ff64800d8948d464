"""Persistent compilation cache: populated on first process, hit on second.

VERDICT r2 next-round #3: CLI cold starts recompiled every program per
process. core/compile_cache.py wires jax's persistent cache into every
tool main; this test proves the cross-process behavior on the CPU
backend using jax's own cache-hit monitoring events.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

_CHILD = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from jax._src import monitoring

events = []
monitoring.register_event_listener(lambda name, **kw: events.append(name))

from tmat_tpu.core.compile_cache import enable_persistent_cache
cache_dir = enable_persistent_cache(sys.argv[1])
# the production threshold (0.1s) skips this test's trivial jit
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

@jax.jit
def f(x):
    return jnp.tanh(x @ x.T).sum()

out = float(f(jnp.arange(64.0).reshape(8, 8)))
print(json.dumps({
    "out": out,
    "cache_dir": cache_dir,
    "hits": sum("cache_hit" in e for e in events),
    "n_entries": len(list(os.scandir(cache_dir))),
}))
"""


def _run_child(cache_dir: Path) -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(Path(__file__).resolve().parent.parent) + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, str(cache_dir)],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_cache_populated_then_hit(tmp_path):
    cache_dir = tmp_path / "xla_cache"
    first = _run_child(cache_dir)
    assert first["n_entries"] >= 1, "first run must write cache entries"
    assert first["hits"] == 0

    second = _run_child(cache_dir)
    assert second["hits"] >= 1, "second process must hit the persistent cache"
    assert second["out"] == first["out"]


def test_enable_is_idempotent_and_env_respected(tmp_path, monkeypatch):
    from tmat_tpu.core import compile_cache

    monkeypatch.setattr(compile_cache, "_ENABLED", False)
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "envcache"))
    d1 = compile_cache.enable_persistent_cache()
    assert d1 == str(tmp_path / "envcache")
    assert Path(d1).is_dir()
    # second call is a no-op returning a consistent location
    d2 = compile_cache.enable_persistent_cache()
    assert Path(d2).is_dir()
