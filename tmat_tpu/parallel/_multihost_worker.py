"""Multi-host validation worker: one process of an N-process demo-plate run.

Launched as ``python -m tmat_tpu.parallel._multihost_worker`` by
``validation.launch_multihost_workers`` (the single scaffolding shared by
tests/test_distributed.py and __graft_entry__.dryrun_multichip) with
TMAT_TPU_COORDINATOR / TMAT_TPU_NUM_PROCESSES / TMAT_TPU_PROCESS_ID set,
plus a virtual-CPU XLA device-count flag. Joins the ``jax.distributed``
job, runs the shared demo plate on a mesh spanning every process's
devices, and prints the results as one ``WORKER_RESULT`` JSON line.

Env knobs (set by the launcher):
  TMAT_TPU_TEST_GLOBAL_DEVICES  expected global device count (asserted)
  TMAT_TPU_TEST_WELLS           demo plate size (default: device count)
  TMAT_TPU_TEST_CHECK_LOCAL     "1": ALSO run the plate on a local
      single-device mesh and assert the global-mesh result equals it, so
      the gate discriminates real cross-process sharding bugs instead of
      just "it didn't crash" (used by the driver dryrun, where no outer
      single-process reference run exists).
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from tmat_tpu.parallel.distributed import (  # noqa: E402
    is_primary,
    maybe_initialize_from_env,
)

assert maybe_initialize_from_env(), "worker env did not request multi-process"

n_processes = int(os.environ["TMAT_TPU_NUM_PROCESSES"])
n_devices = int(os.environ["TMAT_TPU_TEST_GLOBAL_DEVICES"])
assert jax.process_count() == n_processes, jax.process_count()
assert len(jax.devices()) == n_devices, len(jax.devices())
assert len(jax.local_devices()) == n_devices // n_processes
assert is_primary() == (int(os.environ["TMAT_TPU_PROCESS_ID"]) == 0)

from tmat_tpu.parallel.mesh import make_mesh  # noqa: E402
from tmat_tpu.parallel.validation import run_demo_plate  # noqa: E402

# more wells than devices -> multiple chunks, so the run exercises the
# serialized (lockstep) multi-chunk dispatch path, not just one program
n_wells = int(os.environ.get("TMAT_TPU_TEST_WELLS", n_devices))
res = run_demo_plate(make_mesh(axis_names=("data",)), n_wells)

if os.environ.get("TMAT_TPU_TEST_CHECK_LOCAL") == "1":
    from jax.sharding import Mesh

    local = Mesh(np.array(jax.local_devices()[:1]), ("data",))
    res_local = run_demo_plate(local, n_wells)
    assert res["total_branches"] == res_local["total_branches"], (
        res,
        res_local,
    )
    np.testing.assert_allclose(
        res["total_branch_length_um"],
        res_local["total_branch_length_um"],
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        res["area_pct"], res_local["area_pct"], rtol=1e-5, atol=1e-6
    )
    assert all(b > 0 for b in res["total_branches"]), res["total_branches"]

print("WORKER_RESULT " + json.dumps(res))
sys.stdout.flush()
