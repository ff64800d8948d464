"""Per-tool benchmark matrix (VERDICT r1 item 4 / ROADMAP item 7).

Measures each tool's hot path in isolation, plus the end-to-end headline
(bench.py's workload), and prints one JSON line per metric:

  zproj_fs            stacks/sec   focus-stack a (B, Z, 1024, 1024) plate,
                                   including H2D of the uint8 stacks
  cell_area_threshold imgs/sec     rescale + GMM-EM threshold at the
                                   tool's dsamp_size=512
  inv_depth           slices/sec   preprocessing + 3-member ResNet50-TL
                                   ensemble forward at 256px
  branches_per_well   wells/sec    tiled-UNet seg (patch 320, 8x TTA) +
                                   postprocess + native Morse per well
  plate_end_to_end    wells/sec    the headline (same as bench.py)

Usage:
  python bench_matrix.py                  # run matrix on default backend
  python bench_matrix.py --pin-cpu-baseline
      # measure the FULL plate pipeline on the CPU backend (1 well,
      # compile excluded) and record cpu_full_pipeline_wells_per_sec in
      # BASELINE_CPU.json, making bench.py's vs_baseline defensible
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", str(Path.home() / ".cache" / "jax_bench")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
# measure the SHIPPED artifacts regardless of a developer's package.cfg
# (see bench.py: a scratch base dir's checkpoint_1.msgpack would shadow
# the production one and fail to load into the big template)
if "TMAT_TPU_BASE_DIR" not in os.environ:
    # stable per-user path under the user's own home (NOT a predictable
    # /tmp path another local user could pre-create and seed with rogue
    # package.cfg/checkpoints); repeated runs must not accumulate leaked
    # directories; concurrent runs share it harmlessly (config-copy
    # bootstrap writes identical content). Duplicated in bench.py /
    # __graft_entry__.py because it must run BEFORE any tmat_tpu import.
    _base = os.path.join(
        os.path.expanduser("~"), ".cache", "tmat_tpu", "neutral_base"
    )
    os.makedirs(_base, mode=0o700, exist_ok=True)
    os.environ["TMAT_TPU_BASE_DIR"] = _base

_BASELINE_FILE = Path(__file__).parent / "BASELINE_CPU.json"


def _emit(metric, value, unit, vs_baseline=None, **extra):
    row = {
        "metric": metric,
        "value": round(float(value), 4),
        "unit": unit,
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }
    row.update({k: v for k, v in extra.items() if v is not None})
    print(json.dumps(row), flush=True)


# peak dense-matmul FLOP/s per chip for MFU accounting (bf16 MXU peak;
# public TPU spec sheets). CPU backend -> no meaningful peak, MFU omitted.
_TPU_PEAK_FLOPS = {
    "v6e": 918e12,
    "v5p": 459e12,
    "v5e": 197e12,
    "v5litepod": 197e12,
    "v4": 275e12,
}


def _peak_flops():
    import jax

    d = jax.devices()[0]
    if d.platform == "cpu":
        return None
    kind = (getattr(d, "device_kind", "") or "").lower().replace(" ", "")
    for key, val in _TPU_PEAK_FLOPS.items():
        if key in kind:
            return val
    # axon tunnel reports a generic kind; the pool is v5e here
    if os.environ.get("PALLAS_AXON_TPU_GEN", "").lower() in ("v5e", "v5litepod"):
        return _TPU_PEAK_FLOPS["v5e"]
    return None


def _compiled_flops(jitted, *args):
    """FLOPs of a compiled program from XLA's cost analysis, or None."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else None
        if not ca:
            return None
        flops = float(ca.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def _mfu(flops, seconds):
    """Model FLOPs utilization vs the chip's bf16 peak, or None off-TPU."""
    peak = _peak_flops()
    if peak is None or flops is None or not seconds:
        return None
    return round(flops / seconds / peak, 4)


def _timeit(fn, repeats=3):
    fn()  # warm (compile)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_zproj(rng):
    import jax
    import jax.numpy as jnp

    from tmat_tpu.ops.zproj import proj_focus_stacking_batch

    stacks = (rng.rand(8, 8, 1024, 1024) * 255).astype(np.uint8)

    def run():
        out = proj_focus_stacking_batch(jnp.asarray(stacks))
        jax.block_until_ready(out)

    dt = _timeit(run)
    _emit("zproj_fs", 8 / dt, "stacks/sec (Z=8 1024px incl. H2D)")


def bench_cell_area(rng):
    import jax
    import jax.numpy as jnp

    from tmat_tpu.ops.rescale import rescale_intensity
    from tmat_tpu.ops.threshold import exec_threshold

    imgs = rng.normal(60, 15, size=(16, 512, 512)).astype(np.float32)
    imgs[:, 100:300, 100:300] += 120

    @jax.jit
    def batch(x):
        def one(img):
            scaled = rescale_intensity(img, (0, 1))
            return exec_threshold(scaled, None, 0.0)

        return jax.vmap(one)(x)

    def run():
        jax.block_until_ready(batch(jnp.asarray(imgs)))

    dt = _timeit(run)
    _emit("cell_area_threshold", 16 / dt, "imgs/sec (512px GMM threshold)")


def bench_inv_depth(rng):
    import jax

    from tmat_tpu.core import defs
    from tmat_tpu.models.preprocess import prep_inv_depth_imgs_hybrid
    from tmat_tpu.models.params_io import load_params
    from tmat_tpu.models.resnet import (
        build_resnet50_tl,
        make_ensemble_apply,
        stack_ensemble_variables,
    )

    from tmat_tpu.models import default_infer_dtype

    n_members, n_slices = 3, 16
    infer_dtype = default_infer_dtype()
    model, template = build_resnet50_tl(
        1, (256, 256, 3), base_last_layer="conv4_block6_out", dtype=infer_dtype
    )
    ens_dir = Path(defs.model_training_path("best_ensemble"))
    member_vars = []
    for i in range(n_members):
        ckpt = ens_dir / f"best_finetune_weights_{i}.msgpack"
        member_vars.append(
            load_params(ckpt, template) if ckpt.is_file() else template
        )
    stacked = stack_ensemble_variables(member_vars)
    ensemble_apply = make_ensemble_apply(model)
    stack = (rng.rand(n_slices, 700, 700) * 255).astype(np.uint8)

    def _fetch(out):
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))

    def run():
        x = prep_inv_depth_imgs_hybrid(stack, (256, 256))
        _fetch(ensemble_apply(stacked, x))

    x_example = prep_inv_depth_imgs_hybrid(stack, (256, 256))
    flops = _compiled_flops(ensemble_apply, stacked, x_example)
    dt = _timeit(run)
    # phase attribution (best of 2): this row swings 4x between sessions
    # purely on tunnel H2D/round-trip weather — the split makes a slow
    # number diagnosable (host prep vs transfer+tail vs forward)
    phases = []
    for _ in range(2):
        t0 = time.perf_counter()
        x = prep_inv_depth_imgs_hybrid(stack, (256, 256))
        t1 = time.perf_counter()
        _fetch(x)
        t2 = time.perf_counter()
        _fetch(ensemble_apply(stacked, x))
        t3 = time.perf_counter()
        phases.append((t1 - t0, t2 - t1, t3 - t2))
    prep, h2d, ens = (min(p[i] for p in phases) for i in range(3))
    _emit(
        "inv_depth",
        n_slices / dt,
        f"slices/sec (host-lanczos4 prep + {n_members}-member ResNet ensemble, 256px)",
        mfu=_mfu(flops, dt),
        prep_ms=round(prep * 1e3, 1),
        h2d_tail_ms=round(h2d * 1e3, 1),
        ensemble_ms=round(ens * 1e3, 1),
    )


def bench_unet_forward(rng):
    """Isolated production UNet forward (patch 320, filters 64-512) at
    batch 200 — the single hottest kernel of the plate pipeline; reports
    MFU vs the chip's bf16 peak (VERDICT r2 weak #2)."""
    import jax
    import jax.numpy as jnp

    from tmat_tpu.models import default_infer_dtype
    from tmat_tpu.models.unet import build_unet_xception

    dtype = default_infer_dtype()
    batch, patch = 200, 320
    model, variables = build_unet_xception(
        1, (patch, patch), channels=1, filter_counts=(64, 128, 256, 512),
        dtype=dtype,
    )

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    xs = [
        jnp.asarray(rng.rand(batch, patch, patch, 1), jnp.float32)
        for _ in range(4)
    ]
    flops = _compiled_flops(fwd, variables, xs[0])

    def _fetch(out):
        np.asarray(jax.device_get(out.ravel()[0]))

    _fetch(fwd(variables, xs[0]))  # compile + warm (value-fetch sync:
    # this runtime's block_until_ready is not a reliable barrier)
    tiny = jax.jit(lambda x: x + 1.0)
    _fetch(tiny(xs[0][0, 0]))
    t0 = time.perf_counter()
    _fetch(tiny(xs[0][0, 0]))
    rtt = time.perf_counter() - t0  # dispatch+fetch round trip to subtract
    reps = 3
    t0 = time.perf_counter()
    outs = [fwd(variables, xs[1 + i]) for i in range(reps)]
    _fetch(outs[-1])  # programs on one core retire in dispatch order
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / reps
    _emit(
        "unet_forward",
        batch / dt,
        "imgs/sec (UNet fwd, patch 320, filters 64-512, batch 200)",
        mfu=_mfu(flops, dt),
        flops_per_batch=flops,
    )


def bench_train_step(rng):
    """Production UNet training throughput: weighted-BCE step (fwd + bwd +
    optax update + BN stats) at the shipped geometry (patch 320, filters
    64-512), batch 16 — the train_binary_segmentation recipe's batch."""
    import jax
    import jax.numpy as jnp
    import optax

    from tmat_tpu.models import default_infer_dtype
    from tmat_tpu.models.train import init_train_state, make_unet_train_step
    from tmat_tpu.models.unet import build_unet_xception

    dtype = default_infer_dtype()
    batch, patch = 16, 320
    model, variables = build_unet_xception(
        1, (patch, patch), channels=1, filter_counts=(64, 128, 256, 512),
        dtype=dtype,
    )
    tx = optax.adamw(1e-3)
    state = init_train_state(variables, tx)
    step = make_unet_train_step(model, tx)
    xs = [
        jnp.asarray(rng.rand(batch, patch, patch, 1), jnp.float32)
        for _ in range(4)
    ]
    y = jnp.asarray(rng.rand(batch, patch, patch, 1) > 0.5, jnp.float32)

    flops = _compiled_flops(step, state, xs[0], y)
    state, _ = step(state, xs[0], y)  # compile
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        state, metrics = step(state, xs[1 + i], y)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / reps
    _emit(
        "unet_train_step",
        batch / dt,
        "imgs/sec (weighted-BCE fwd+bwd+adamw+BN, patch 320, batch 16)",
        mfu=_mfu(flops, dt),
    )


def bench_branches_3d(rng):
    """3-D Sato path of compute_branches (vesselness + postprocess +
    native Morse, --no-vis fast path), one (8, 512, 512) z-stack."""
    import shutil
    import tempfile

    from PIL import Image

    from tmat_tpu.tools import compute_branches as cb

    z, hw = 8, 512
    stack = (rng.rand(z, hw, hw) * 20).astype(np.uint8)
    rr, cc = np.mgrid[0:hw, 0:hw]
    for k in range(3):
        ring = np.abs(np.sqrt((rr - hw / 2) ** 2 + (cc - hw / 2) ** 2) - (60 + 60 * k)) < 3
        stack[z // 2][ring] = 200
    stack[z // 2, hw // 2 - 2 : hw // 2 + 2, 40:-40] = 180

    tmp = Path(tempfile.mkdtemp(prefix="bench3d_"))
    try:
        frames = [Image.fromarray(s) for s in stack]
        path = tmp / "stack.tif"
        frames[0].save(path, save_all=True, append_images=frames[1:])
        (tmp / "out").mkdir()
        config = {"image_width_microns": 1000.0, "save_vis": False}

        def run():
            cb.analyze_img(
                "bench", str(path), None, tmp / "out", config, set()
            )

        dt = _timeit(run, repeats=3)
        _emit(
            "branches_3d",
            1.0 / dt,
            "stacks/sec (Sato 10 scales + canny/medial/expand + native Morse, 8x512px)",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_plate(n_wells=6, dtype=None, emit_branches=True):
    import bench as headline

    throughput = headline.run_plate_workload(n_wells, dtype)["median"]
    baseline = None
    if _BASELINE_FILE.is_file():
        data = json.loads(_BASELINE_FILE.read_text())
        cpu = data.get("cpu_full_pipeline_wells_per_sec") or data.get(
            "cpu_wells_per_sec"
        )
        if cpu:
            baseline = throughput / cpu
    _emit(
        "plate_end_to_end",
        throughput,
        "wells/sec (zproj+area+UNet-seg+morse, 1024px, Z=8)",
        baseline,
    )
    return throughput


def pin_cpu_baseline():
    """Measure the full plate pipeline on the CPU backend and record it."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import bench as headline

    # one rep: a full-pipeline CPU well is minutes, and the pin is a
    # one-time anchor, not a weather-sensitive headline
    throughput = headline.run_plate_workload(1, n_reps=1)["median"]
    data = (
        json.loads(_BASELINE_FILE.read_text()) if _BASELINE_FILE.is_file() else {}
    )
    data["cpu_full_pipeline_wells_per_sec"] = round(throughput, 6)
    data["cpu_full_pipeline_method"] = (
        "bench.py plate workload (ALL stages: zproj, GMM area, tiled UNet "
        "patch 320 filters 64-512 8x TTA, native Morse) on the CPU backend, "
        "1 well, compile excluded via same-shape warmup"
    )
    _BASELINE_FILE.write_text(json.dumps(data, indent=1))
    _emit("cpu_full_pipeline_pin", throughput, "wells/sec (CPU backend)")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pin-cpu-baseline", action="store_true")
    p.add_argument("--skip", nargs="*", default=[])
    args = p.parse_args()

    if args.pin_cpu_baseline:
        pin_cpu_baseline()
        return

    rng = np.random.RandomState(0)
    if "zproj" not in args.skip:
        bench_zproj(rng)
    if "cell_area" not in args.skip:
        bench_cell_area(rng)
    if "inv_depth" not in args.skip:
        bench_inv_depth(rng)
    if "branches_3d" not in args.skip:
        bench_branches_3d(rng)
    if "unet_forward" not in args.skip:
        bench_unet_forward(rng)
    if "train" not in args.skip:
        bench_train_step(rng)
    if "plate" not in args.skip:
        bench_plate()


if __name__ == "__main__":
    main()
