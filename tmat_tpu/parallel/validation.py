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

from typing import List, Tuple

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
