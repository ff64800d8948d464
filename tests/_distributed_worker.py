"""Worker process for tests/test_distributed.py.

Launched N times with TMAT_TPU_COORDINATOR / TMAT_TPU_NUM_PROCESSES /
TMAT_TPU_PROCESS_ID set (plus a virtual-CPU-device XLA flag); joins the
jax.distributed job, runs the shared demo plate on a mesh spanning every
process's devices, and prints the results as one JSON line.
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

from tmat_tpu.parallel.distributed import (  # noqa: E402
    is_primary,
    maybe_initialize_from_env,
)

assert maybe_initialize_from_env(), "worker env did not request multi-process"

n_processes = int(os.environ["TMAT_TPU_NUM_PROCESSES"])
n_devices = int(os.environ["TMAT_TPU_TEST_GLOBAL_DEVICES"])
assert jax.process_count() == n_processes, jax.process_count()
assert len(jax.devices()) == n_devices, len(jax.devices())
assert is_primary() == (int(os.environ["TMAT_TPU_PROCESS_ID"]) == 0)

from tmat_tpu.parallel.mesh import make_mesh  # noqa: E402
from tmat_tpu.parallel.validation import run_demo_plate  # noqa: E402

# more wells than devices -> multiple chunks, so the run exercises the
# serialized (lockstep) multi-chunk dispatch path, not just one program
n_wells = int(os.environ.get("TMAT_TPU_TEST_WELLS", n_devices))
res = run_demo_plate(make_mesh(axis_names=("data",)), n_wells)
print("WORKER_RESULT " + json.dumps(res))
sys.stdout.flush()
