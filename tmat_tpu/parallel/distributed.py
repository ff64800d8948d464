"""Multi-host (multi-process) distribution: ``jax.distributed`` wiring.

The reference has no inter-process communication at all (SURVEY §2.5 —
its only IPC is the CLI's ``subprocess.run``); the TPU-native equivalent
named in SURVEY §5 is JAX's built-in collectives over ICI (within a
slice) / DCN (across slices) via ``jax.distributed.initialize`` +
``Mesh``/``NamedSharding``. This module is that wiring:

- ``initialize()`` / ``maybe_initialize_from_env()``: idempotent,
  env/flag-driven ``jax.distributed.initialize`` (coordinator address,
  process count, process id). On a real TPU pod slice all three are
  auto-detected by JAX from the TPU runtime; on CPU/GPU or in tests they
  come from ``TMAT_TPU_COORDINATOR`` / ``TMAT_TPU_NUM_PROCESSES`` /
  ``TMAT_TPU_PROCESS_ID``.
- ``put_global()`` / ``fetch()``: host<->device movement that works
  identically for single-process meshes and meshes spanning every
  process's devices (fetch rides ``process_allgather`` when shards live
  on non-addressable devices).
- ``is_primary()``: exactly one process writes user-facing outputs
  (CSV/PNG) in a multi-controller run.

Multi-controller discipline: every process must execute the SAME
sequence of sharded programs in the same order. The plate scheduler
(tools/plate_pipeline.py) therefore drops to one dispatch thread when
``jax.process_count() > 1`` — pool-thread interleaving would let two
processes enqueue chunk programs in different orders and deadlock the
collectives.

Validated in this repo as 2 local processes x 4 virtual CPU devices
coordinating over localhost (tests/test_distributed.py,
__graft_entry__.dryrun_multichip's multihost leg) — the same
``jax.distributed`` code path a multi-host TPU pod uses, with gloo
standing in for DCN.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

_INITIALIZED = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Idempotent ``jax.distributed.initialize``.

    Must run before any other jax API touches the backend (jax raises
    otherwise). Arguments default to the TMAT_TPU_* environment (below)
    and fall through to JAX's own auto-detection, which fills all three
    on a real multi-host TPU slice.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "TMAT_TPU_COORDINATOR"
    )
    if num_processes is None and "TMAT_TPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["TMAT_TPU_NUM_PROCESSES"])
    if process_id is None and "TMAT_TPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["TMAT_TPU_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _INITIALIZED = True


def maybe_initialize_from_env() -> bool:
    """Initialize the multi-process runtime iff the environment asks for it.

    Tool mains call this first thing: a single-process run (no
    TMAT_TPU_COORDINATOR) is a no-op, so the CLI surface is identical on
    one chip and on a pod. Returns True when multi-process init ran.
    """
    if "TMAT_TPU_COORDINATOR" not in os.environ:
        return False
    initialize()
    return True


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def is_multiprocess() -> bool:
    return process_count() > 1


def is_primary() -> bool:
    """True on the one process that owns user-facing side effects."""
    return process_index() == 0


def put_global(host_array, sharding):
    """Place a host array onto a sharding that may span other processes.

    Every process passes the SAME full host value (the plate scheduler
    feeds all processes the same chunk stream); each process materializes
    only its addressable shards. ``jax.device_put`` handles the
    replicated-host -> global-sharded case directly; the callback path is
    the fallback for jax builds where it does not.
    """
    import jax

    try:
        return jax.device_put(host_array, sharding)
    except ValueError:
        host_array = np.asarray(host_array)
        return jax.make_array_from_callback(
            host_array.shape, sharding, lambda idx: host_array[idx]
        )


def fetch(arr) -> np.ndarray:
    """Full host value of a global array, on every process.

    Single-process (or fully-addressable) arrays fetch directly; arrays
    sharded across processes are assembled with an all-gather over the
    distributed backend, so every process sees the complete result (the
    plate host tail — component filter, Morse stats — then runs
    identically everywhere, keeping the program sequence in lockstep).
    """
    if isinstance(arr, np.ndarray):
        return arr
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


def sync_processes(name: str = "barrier") -> None:
    """Cross-process barrier (no-op single-process)."""
    if not is_multiprocess():
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def stripe(items):
    """This process's round-robin share of a work list (``items[i::P]``).

    The four per-image tools scale out across processes by striping their
    image list: process i owns images i, i+P, i+2P, ... — round-robin
    keeps stripe sizes within 1 of each other for any list length. Every
    process must call this on the SAME ordered list (the tools' input
    discovery is deterministic). Single-process: the full list.
    """
    seq = list(items)
    if not is_multiprocess():
        return seq
    return seq[process_index() :: process_count()]


def merge_striped_rows(rows: list, error: "Optional[str]" = None):
    """Combine every process's striped result rows; propagate failures.

    Each process passes its ``(global_index, ...)`` row tuples plus an
    optional error string (a failure it caught instead of exiting, so
    its peers are not left blocking in this collective). Returns
    ``(merged_rows, errors)``: rows from ALL processes sorted by their
    global index (stable — intra-image row order survives), and the
    list of reported error strings. Callers must treat a non-empty
    ``errors`` as a coordinated failure: every process sees the same
    list, so all can exit together instead of one dying mid-run and the
    rest hanging in the next collective. Single-process: the caller's
    own rows and error.
    """
    parts = gather_objects({"rows": list(rows), "error": error})
    errors = [p["error"] for p in parts if p["error"]]
    merged = sorted(
        (r for p in parts for r in p["rows"]), key=lambda r: r[0]
    )
    return merged, errors


def gather_objects(obj) -> list:
    """All-gather one picklable object per process.

    Returns ``[obj_from_process_0, ..., obj_from_process_{P-1}]`` on
    EVERY process (single-process: ``[obj]``). Used by the striped tools
    to assemble their shared CSVs on the primary process: each process
    contributes its stripe's rows, so the write works even when the
    output directory is NOT shared storage (the primary holds every row).

    Implementation: pickle to bytes, equalize lengths with one
    all-gather of sizes (``process_allgather`` requires equal shapes),
    then all-gather the padded byte buffers. The channel is the job's
    own collective fabric — the same trust domain as the arrays.
    """
    if not is_multiprocess():
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    blob = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(np.int64(blob.size))
    sizes = np.asarray(sizes).reshape(-1)
    padded = np.zeros(int(sizes.max()), np.uint8)
    padded[: blob.size] = blob
    blobs = np.asarray(multihost_utils.process_allgather(padded))
    return [
        pickle.loads(blobs[i, : int(sizes[i])].tobytes())
        for i in range(blobs.shape[0])
    ]
