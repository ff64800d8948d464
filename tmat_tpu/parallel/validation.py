"""Shared mesh-validation workload: a tiny deterministic plate.

Used by the driver's multi-chip dryrun (__graft_entry__), the virtual
8-device mesh tests (tests/test_parallel.py) and the 2-process
multi-host tests (tests/test_distributed.py) so every validation layer
runs the SAME wells and can assert result equality across single-device,
single-process-sharded and multi-process-sharded executions.

The wells are textured vessel crosses: the segmentor used with them is
an identity pass-through (the tiled blend reconstructs its input exactly
— tests/test_tiled.py identity-reconstruction), so the crosses survive
to the Morse stage and every well's branch count is provably NONZERO —
a sharding regression that zeroes or perturbs branch stats fails the
equality gate instead of comparing zero-to-zero.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np


def make_demo_plate(
    n_wells: int, z: int = 3, hw: int = 48, seed: int = 0
) -> Tuple[np.ndarray, List[str]]:
    """(n_wells, z, hw, hw) uint8 plate of textured vessel crosses + ids.

    The noise texture creates the saddle/max critical pairs the
    discrete-Morse graph needs (a flat plateau ridge has none).
    """
    rng = np.random.RandomState(seed)
    plate = (rng.rand(n_wells, z, hw, hw) * 30).astype(np.uint8)
    mid, hwid = hw // 2, 3
    bar = slice(mid - hwid, mid + hwid)
    vessel = np.zeros((hw, hw), bool)
    vessel[bar, 4:-4] = True  # horizontal bar of a thick cross
    vessel[4:-4, bar] = True  # vertical bar
    for i in range(n_wells):
        tex = (160 + rng.rand(hw, hw) * 90).astype(np.uint8)
        plate[i, 1][vessel] = tex[vessel]
    return plate, [f"W{i}" for i in range(n_wells)]


def identity_segmentor(patch_size: int = 16):
    """A UNetXceptionPatchSegmentor whose forward is the identity."""
    from tmat_tpu.models.unet import UNetXceptionPatchSegmentor

    seg = UNetXceptionPatchSegmentor.__new__(UNetXceptionPatchSegmentor)
    seg.patch_size = patch_size
    seg.channels = 1
    seg.norm_mean = seg.norm_std = None
    seg.ds_ratio = 1.0
    seg.model = seg.variables = None
    seg._pred_fn = lambda b: b
    return seg


def run_demo_plate(mesh, n_wells: int, seed: int = 0) -> dict:
    """Run the demo plate through the production plate pipeline on ``mesh``.

    Returns the run_plate results dict (timer popped). Deterministic in
    (n_wells, seed), so results from different meshes / process counts
    are directly comparable.
    """
    from tmat_tpu.tools.plate_pipeline import run_plate

    plate, ids = make_demo_plate(n_wells, seed=seed)
    res = run_plate(
        plate,
        ids,
        identity_segmentor(),
        {"image_width_microns": 800.0},
        mesh=mesh,
        sd_coef=-1.0,
    )
    res.pop("_timer")
    return res


def multihost_worker_env(
    pid: int, n_processes: int, n_local: int, port: int
) -> dict:
    """Env for one ``_multihost_worker`` subprocess: a clean virtual-CPU
    backend with ``n_local`` devices, joined to a localhost coordinator."""
    env = os.environ.copy()
    env["JAX_PLATFORMS"] = "cpu"
    flags = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={n_local}"
    ).strip()
    env["TMAT_TPU_COORDINATOR"] = f"localhost:{port}"
    env["TMAT_TPU_NUM_PROCESSES"] = str(n_processes)
    env["TMAT_TPU_PROCESS_ID"] = str(pid)
    env["TMAT_TPU_TEST_GLOBAL_DEVICES"] = str(n_processes * n_local)
    # launcher-owned knobs must not leak in from an outer shell (a stray
    # TMAT_TPU_TEST_CHECK_LOCAL=1 would silently double every worker's
    # work); the launcher re-sets the ones it wants
    for k in ("TMAT_TPU_TEST_WELLS", "TMAT_TPU_TEST_CHECK_LOCAL"):
        env.pop(k, None)
    # make the package importable for `python -m` regardless of install
    repo_root = str(Path(__file__).resolve().parents[2])
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


# stderr markers of a distributed-INIT infrastructure failure (port
# collision, coordinator unreachable) — the only failures worth a retry;
# a worker that died on its own assertions is a real bug and is not
class _InfraFailure(RuntimeError):
    pass


_INFRA_MARKERS = (
    "coordinat",  # coordinator / coordination service
    "bind",
    "UNAVAILABLE",
    "DEADLINE",
    "failed to connect",
)


def run_coordinated_workers(
    argv_tail: List[str],
    n_processes: int,
    n_local: int = 1,
    extra_env: Optional[dict] = None,
    per_pid_env=None,
    timeout: float = 900.0,
):
    """Spawn N coordinated subprocesses over a fresh localhost port.

    The ONE spawn/reap loop for every multi-process validation path
    (driver dryrun, distributed tests, distributed tool tests):
    ``argv_tail`` follows ``sys.executable`` (e.g. ``["-m", module]`` or
    ``["-c", code]``). ALL workers are reaped before returning or
    raising — an early failure must not leak live workers into a
    retry's CPU budget. Raises ``_InfraFailure`` for failures that smell
    like distributed-init infrastructure (port TOCTOU, coordinator
    timeouts), plain ``RuntimeError`` otherwise. Returns each worker's
    stdout, in pid order.
    """
    port = _free_port()
    procs = []
    for pid in range(n_processes):
        env = multihost_worker_env(pid, n_processes, n_local, port)
        if extra_env:
            env.update(extra_env)
        if per_pid_env:
            env.update(per_pid_env(pid))
        procs.append(
            subprocess.Popen(
                [sys.executable] + list(argv_tail),
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outcomes = []
    timed_out = False
    for proc in procs:
        try:
            out, err = proc.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            timed_out = True
            for p in procs:
                p.kill()
            out, err = proc.communicate()
        outcomes.append((proc.returncode, out, err))
    # every worker is reaped past this point
    if timed_out:
        raise _InfraFailure(
            f"coordinated workers timed out after {timeout}s; stderr tails:\n"
            + "\n".join(err[-500:] for _, _, err in outcomes)
        )
    for pid, (rc, out, err) in enumerate(outcomes):
        if rc != 0:
            msg = (
                f"coordinated worker {pid} failed (rc={rc}); "
                f"stderr tail:\n{err[-3000:]}"
            )
            if any(m in err for m in _INFRA_MARKERS):
                raise _InfraFailure(msg)
            raise RuntimeError(msg)
    return [out for _, out, _ in outcomes]


def launch_multihost_workers(
    n_processes: int,
    n_local: int,
    n_wells: int | None = None,
    check_local: bool = False,
    timeout: float = 900.0,
) -> List[dict]:
    """Run the demo plate across ``n_processes`` coordinated subprocesses.

    The one multi-host validation scaffolding (used by the driver dryrun
    in __graft_entry__ AND tests/test_distributed.py): spawns N
    ``_multihost_worker`` processes of ``n_local`` virtual CPU devices
    each over a localhost coordinator, collects each worker's
    WORKER_RESULT line, asserts every process reported the identical
    result, and returns the result dicts (one per process).

    Retried once on a fresh port — but ONLY for infrastructure failures
    (the free-port probe is inherently TOCTOU-racy: the probe socket
    closes before worker 0's coordinator binds). A worker that died on
    its own assertions (a real sharding bug) raises immediately, and
    result-disagreement AssertionErrors are never retried.
    """
    extra = {}
    if n_wells is not None:
        extra["TMAT_TPU_TEST_WELLS"] = str(n_wells)
    if check_local:
        extra["TMAT_TPU_TEST_CHECK_LOCAL"] = "1"
    argv_tail = ["-m", "tmat_tpu.parallel._multihost_worker"]
    try:
        outs = run_coordinated_workers(
            argv_tail, n_processes, n_local, extra, timeout=timeout
        )
    except _InfraFailure:
        outs = run_coordinated_workers(
            argv_tail, n_processes, n_local, extra, timeout=timeout
        )
    results = []
    for pid, out in enumerate(outs):
        lines = [
            l for l in out.splitlines() if l.startswith("WORKER_RESULT ")
        ]
        if not lines:
            raise RuntimeError(
                f"multihost worker {pid} printed no result:\n{out[-1000:]}"
            )
        results.append(json.loads(lines[-1].split(" ", 1)[1]))
    assert all(r == results[0] for r in results[1:]), (
        f"processes disagree: {results}"
    )
    return results
