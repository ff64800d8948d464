"""Ablation profile of the plate stage1 device program (per-well chunk,
matching the streaming pipeline's 1-well-per-device dispatch).

Round-3 findings (v5e): stage1 FULL 103.0 ms/well; with a dummy pred_func
11.5 ms/well (=> tiled UNet 91.5 ms); resize/rescale, GMM threshold and
median+skeletonize each individually sub-RTT (< a few ms); plate_stage2
also sub-RTT. The plate pipeline is UNet-bound; remaining headline gains
come from batch-size ramp amortization, not from the auxiliary ops.

Isolates the non-UNet device time: full stage1 vs stage1 with a dummy
pred_func, plus each non-UNet component as its own program. Value-fetch
synced, dispatch round trip subtracted, distinct input sets per rep.

Usage: python benchmarks/stage1_ablation.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

# the streaming pipeline dispatches one chunk of n_dev wells per program;
# on a single chip that is 1 well per stage1 call (plate_pipeline.py)
N_WELLS, IMG, TARGET = 1, 1024, (640, 640)


def fetch(out):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))


def rtt_measure():
    tiny = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8,), jnp.float32)
    fetch(tiny(z))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        fetch(tiny(z))
        best = min(best, time.perf_counter() - t0)
    return best


def timeit(fn, sets, rtt, repeats=3):
    fetch(fn(*sets[0]))
    best = float("inf")
    for r in range(repeats):
        s = sets[(r + 1) % len(sets)]
        t0 = time.perf_counter()
        fetch(fn(*s))
        best = min(best, time.perf_counter() - t0 - rtt)
    return best


def main():
    from tmat_tpu.core import defs
    from tmat_tpu.models.unet import UNetXceptionPatchSegmentor
    from tmat_tpu.ops import morphology as morph
    from tmat_tpu.ops.rescale import rescale_intensity
    from tmat_tpu.ops.resize import resize
    from tmat_tpu.ops.threshold import exec_threshold
    from tmat_tpu.parallel.mesh import make_mesh
    from tmat_tpu.parallel.plate import plate_stage1
    from tmat_tpu.topo.transforms import _median_filter_disk2_batch

    print(f"device={jax.devices()[0].device_kind}", flush=True)
    mesh = make_mesh(devices=jax.devices()[:1])
    rtt = rtt_measure()
    print(f"rtt ~{rtt * 1e3:.1f} ms", flush=True)

    ckpt = defs.model_training_path(
        "binary_segmentation/checkpoints/checkpoint_1.msgpack"
    )
    seg = UNetXceptionPatchSegmentor(
        320, ckpt if Path(ckpt).is_file() else None, (64, 128, 256, 512),
        ds_ratio=0.625, dtype=jnp.bfloat16,
    )

    rngs = [np.random.RandomState(100 + i) for i in range(3)]

    def mk_projs(r):
        return (jnp.asarray(r.rand(N_WELLS, IMG, IMG) * 255, jnp.float32),)

    def mk_small(r):
        return (jnp.asarray(r.rand(N_WELLS, *TARGET), jnp.float32),)

    def mk_masks(r):
        return (jnp.asarray(r.rand(N_WELLS, *TARGET) > 0.7),)

    wm = jnp.ones((N_WELLS, *TARGET), jnp.float32)
    zc = jnp.full((N_WELLS,), 8, jnp.int32)

    def stage1_full(projs):
        return plate_stage1(
            mesh, projs, seg._pred_fn, 320, 2, TARGET, 0.0,
            wm_small=None, pre_projected=True, z_counts=zc,
        )

    def dummy_pred(batch):
        return jax.nn.sigmoid(jnp.mean(batch, axis=-1, keepdims=True))

    def stage1_dummy(projs):
        return plate_stage1(
            mesh, projs, dummy_pred, 320, 2, TARGET, 0.0,
            wm_small=None, pre_projected=True, z_counts=zc,
        )

    # individual components
    @jax.jit
    def comp_resize_rescale(projs):
        small = resize(projs, TARGET, "lanczos")
        return rescale_intensity(small, out_range=(0, 1))

    @jax.jit
    def comp_threshold(projs):
        def one(p):
            s = rescale_intensity(p, out_range=(0, 1))
            return (exec_threshold(s, jnp.ones_like(p), 0.0) > 0).astype(
                jnp.float32
            ).mean()
        return jax.vmap(one)(projs)

    @jax.jit
    def comp_median_skel(masks):
        filtered = _median_filter_disk2_batch(masks.astype(jnp.float32)) > 0.5
        return jax.vmap(morph.skeletonize)(filtered)

    cases = [
        (f"stage1 FULL ({N_WELLS} well/prog)", stage1_full, mk_projs),
        ("stage1 dummy-pred", stage1_dummy, mk_projs),
        ("resize+rescale 1024->640", comp_resize_rescale, mk_projs),
        ("GMM threshold @1024", comp_threshold, mk_projs),
        ("median+skeletonize @640", comp_median_skel, mk_masks),
    ]
    for name, fn, mk in cases:
        sets = [mk(r) for r in rngs]
        for s in sets:
            for a in s:
                fetch(a)
        t = timeit(fn, sets, rtt)
        print(f"{name:28s} {t * 1e3:8.1f} ms ({t / N_WELLS * 1e3:6.1f} ms/well)",
              flush=True)


if __name__ == "__main__":
    main()
