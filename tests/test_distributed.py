"""Multi-host (multi-process) distribution tests.

SURVEY §5 names the TPU-native distributed backend: JAX collectives over
ICI within a slice / DCN across slices, wired with
``jax.distributed.initialize`` + Mesh/NamedSharding. These tests
validate that wiring for real in this environment as 2 local processes
x 4 virtual CPU devices coordinating over localhost (gloo collectives
standing in for DCN) — the same multi-controller code path a multi-host
TPU pod takes — and assert the plate pipeline's results on the
cross-process mesh equal the single-process mesh results (the same
discipline test_parallel.py applies to single-process sharding).
"""

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tmat_tpu.parallel import distributed as dist
from tmat_tpu.parallel.mesh import make_mesh
from tmat_tpu.parallel.validation import (
    launch_multihost_workers,
    make_demo_plate,
    run_demo_plate,
)


def test_single_process_helpers_are_passthrough():
    """put_global == device_put and fetch == np.asarray on local meshes."""
    mesh = make_mesh(axis_names=("data",))
    sharding = NamedSharding(mesh, P("data"))
    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    g = dist.put_global(x, sharding)
    assert g.sharding == sharding
    np.testing.assert_array_equal(dist.fetch(g), x)
    # numpy passthrough
    np.testing.assert_array_equal(dist.fetch(x), x)
    assert dist.process_count() == 1
    assert dist.is_primary()
    assert not dist.is_multiprocess()
    dist.sync_processes()  # no-op single-process


def test_maybe_initialize_noop_without_env(monkeypatch):
    monkeypatch.delenv("TMAT_TPU_COORDINATOR", raising=False)
    assert dist.maybe_initialize_from_env() is False
    assert jax.process_count() == 1


@pytest.mark.slow
def test_two_process_plate_matches_single_process():
    """The full plate pipeline on a mesh spanning 2 processes.

    2 workers x 4 virtual CPU devices coordinate over localhost (via the
    shared launch_multihost_workers scaffolding, which also asserts both
    processes report identical results); each runs the shared demo plate
    (12 wells -> TWO chunks on the 8-device mesh, exercising the lockstep
    multi-chunk dispatch plus tail-chunk padding) through run_plate on
    the global mesh. Asserts the result matches the single-process
    8-device run computed in THIS process (exact branch counts; float
    fields to tolerance).
    """
    n_processes, n_local = 2, 4
    n_wells = 12

    # single-process reference on this process's virtual 8-device mesh
    ref = run_demo_plate(make_mesh(axis_names=("data",)), n_wells)
    assert all(b > 0 for b in ref["total_branches"]), ref["total_branches"]

    results = launch_multihost_workers(
        n_processes, n_local, n_wells=n_wells, timeout=600
    )

    got = results[0]
    assert got["well_id"] == ref["well_id"]
    assert got["total_branches"] == ref["total_branches"]
    np.testing.assert_allclose(
        got["total_branch_length_um"], ref["total_branch_length_um"], rtol=1e-4
    )
    np.testing.assert_allclose(
        got["avg_branch_length_um"], ref["avg_branch_length_um"], rtol=1e-4
    )
    np.testing.assert_allclose(
        got["area_pct"], ref["area_pct"], rtol=1e-5, atol=1e-6
    )


def test_demo_plate_deterministic():
    """The shared validation workload is reproducible in (n, seed)."""
    p1, ids1 = make_demo_plate(4, seed=7)
    p2, ids2 = make_demo_plate(4, seed=7)
    np.testing.assert_array_equal(p1, p2)
    assert ids1 == ids2 == ["W0", "W1", "W2", "W3"]
    p3, _ = make_demo_plate(4, seed=8)
    assert not np.array_equal(p1, p3)


@pytest.mark.slow
def test_validate_outputs_accepts_global_arrays_two_process():
    """AOT first-call validation must not misread global arrays as poisoned.

    On a pod, a deserialized executable's outputs are GLOBAL arrays whose
    shards span other processes; ``np.asarray`` on those raises a
    spans-non-addressable-devices error, which the old validation treated
    as a lazily-failing entry — every warm multi-process load was
    unlinked and recompiled, silently defeating the pod-aware warmup.
    Asserts, inside a real 2-process job: (a) the np.asarray failure mode
    exists (if JAX ever lifts it, the shard-wise workaround can go), and
    (b) aot_cache.validate_outputs accepts the same array by
    materializing only the process's own shards.
    """
    from tmat_tpu.parallel.validation import run_coordinated_workers

    code = """
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from tmat_tpu.parallel.distributed import maybe_initialize_from_env, put_global
assert maybe_initialize_from_env()
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from tmat_tpu.core.aot_cache import validate_outputs

mesh = Mesh(np.array(jax.devices()), ("data",))
sh = NamedSharding(mesh, P("data"))
fn = jax.jit(lambda x: x * 2 + 1, in_shardings=(sh,), out_shardings=sh)
out = fn(put_global(np.arange(8, dtype=np.float32), sh))
assert not out.is_fully_addressable
try:
    np.asarray(out)
except RuntimeError:
    pass
else:
    raise AssertionError(
        "np.asarray on a non-addressable global array no longer raises; "
        "validate_outputs' shard-wise path may be removable"
    )
validate_outputs(out)  # must NOT raise
validate_outputs({"a": out, "b": np.float32(1.0)})  # pytree + host leaf
print("VALIDATE_OK")
"""
    outs = run_coordinated_workers(["-c", code], n_processes=2, n_local=4)
    assert all("VALIDATE_OK" in o for o in outs)
