"""Multi-host (multi-process) runs of the per-image CLI tools.

Round-5 review finding: only process_plate was multi-host aware; N
processes of the other tools with TMAT_TPU_COORDINATOR set would have
run N duplicated jobs racing on the same output files. The tools now
stripe their image list across processes (parallel/distributed.stripe),
write per-image files from the owning process, and assemble shared CSVs
on the primary via gather_objects. These tests validate that for real:
2 coordinated subprocesses over localhost on a shared tmp dir, asserting
the merged outputs are byte-identical to a single-process run.
"""

import numpy as np
import pytest
from PIL import Image

from tmat_tpu.parallel.distributed import gather_objects, stripe
from tmat_tpu.parallel.validation import (
    _InfraFailure,
    run_coordinated_workers,
)


def _make_imgs(d, n=5):
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        img = (rng.rand(48, 48) * 60).astype(np.uint8)
        img[10:30, 10:30] = 240  # bright block -> stable nonzero area
        Image.fromarray(img).save(d / f"img{i}.tif")


def _run_workers(code, n_processes, extra_env, timeout=420):
    """Shared coordinated-spawn scaffolding, one port-collision retry."""
    try:
        return run_coordinated_workers(
            ["-c", code], n_processes, 1, extra_env, timeout=timeout
        )
    except _InfraFailure:
        return run_coordinated_workers(
            ["-c", code], n_processes, 1, extra_env, timeout=timeout
        )


def test_stripe_and_gather_single_process_passthrough():
    assert stripe([1, 2, 3]) == [1, 2, 3]
    assert gather_objects({"a": 1}) == [{"a": 1}]


@pytest.mark.slow
def test_two_process_gather_objects_unequal_sizes():
    """gather_objects pads pickle buffers to the max size across
    processes; wildly unequal payloads must round-trip exactly, in pid
    order, on BOTH processes."""
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from tmat_tpu.parallel.distributed import (\n"
        "    gather_objects, maybe_initialize_from_env, process_index)\n"
        "assert maybe_initialize_from_env()\n"
        "pid = process_index()\n"
        "payload = {'pid': pid, 'blob': 'x' * (10 if pid == 0 else 100_000)}\n"
        "got = gather_objects(payload)\n"
        "assert [g['pid'] for g in got] == [0, 1], got\n"
        "assert len(got[0]['blob']) == 10 and len(got[1]['blob']) == 100_000\n"
        "print('GATHER_OK')\n"
    )
    outs = _run_workers(code, 2, {}, timeout=180)
    assert all("GATHER_OK" in o for o in outs)


@pytest.mark.slow
def test_two_process_cell_area_matches_single_process(tmp_path):
    in_dir = tmp_path / "in"
    _make_imgs(in_dir, n=5)
    out_single = tmp_path / "out_single"
    out_multi = tmp_path / "out_multi"
    out_single.mkdir()
    out_multi.mkdir()

    # single-process reference, in this test process
    from tmat_tpu.tools import compute_cell_area

    compute_cell_area.main(argv=[str(in_dir), str(out_single)])
    ref_csv = (out_single / "calculations" / "cell_area.csv").read_bytes()

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from tmat_tpu.tools import compute_cell_area\n"
        f"compute_cell_area.main(argv=[{str(in_dir)!r}, {str(out_multi)!r}])\n"
    )
    _run_workers(code, 2, {"TMAT_TPU_BASE_DIR": str(tmp_path / "base")})

    got_csv = (out_multi / "calculations" / "cell_area.csv").read_bytes()
    assert got_csv == ref_csv, (
        "merged 2-process CSV must be byte-identical to single-process"
    )
    # exactly one CSV (the primary wrote once; no -2 sibling from a racing
    # second process)
    assert len(list((out_multi / "calculations").glob("*.csv"))) == 1
    # every image's thresholded PNG exists exactly once (each written by
    # its owning process, shared storage)
    pngs = sorted(p.name for p in (out_multi / "thresholded").glob("*.png"))
    ref_pngs = sorted(p.name for p in (out_single / "thresholded").glob("*.png"))
    assert pngs == ref_pngs


@pytest.mark.slow
def test_two_process_cell_area_bad_file_fails_coordinated(tmp_path):
    """One unreadable image must fail the WHOLE multi-process run promptly:
    the owning process records the error instead of sys.exit(1)ing alone
    (its peer would hang in the row gather), and every process exits
    nonzero after the merge reports it."""
    in_dir = tmp_path / "in"
    _make_imgs(in_dir, n=4)
    (in_dir / "img1.tif").write_bytes(b"not a tiff at all")
    out = tmp_path / "out"
    out.mkdir()

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from tmat_tpu.tools import compute_cell_area\n"
        f"compute_cell_area.main(argv=[{str(in_dir)!r}, {str(out)!r}])\n"
    )
    with pytest.raises(RuntimeError) as exc_info:
        # 120s: a hung peer would hit the timeout path and raise
        # _InfraFailure instead of the prompt rc!=0 RuntimeError
        _run_workers(
            code, 2, {"TMAT_TPU_BASE_DIR": str(tmp_path / "base")}, timeout=120
        )
    assert not isinstance(exc_info.value, _InfraFailure), (
        f"run hung instead of failing coordinated: {exc_info.value}"
    )
    assert "rc=1" in str(exc_info.value)
    # the failed run must not have published a CSV
    assert not (out / "calculations" / "cell_area.csv").exists()


@pytest.mark.slow
def test_two_process_zproj_area_chain_matches_single_process(tmp_path):
    """compute_zproj --area across 2 processes: striped projections, a
    barrier before the chained area tool re-discovers the shared out dir,
    then the striped area pass with a primary-written CSV."""
    in_dir = tmp_path / "in"
    rng = np.random.RandomState(1)
    in_dir.mkdir()
    for i in range(3):
        stack_dir = in_dir / f"well{i}"
        stack_dir.mkdir()
        for z in range(3):
            img = (rng.rand(40, 40) * 50).astype(np.uint8)
            img[8:24, 8:24] = 200 + z * 10
            Image.fromarray(img).save(stack_dir / f"s_z{z}.tif")

    out_single = tmp_path / "out_single"
    out_multi = tmp_path / "out_multi"
    out_single.mkdir()
    out_multi.mkdir()

    from tmat_tpu.tools import compute_zproj

    compute_zproj.main(argv=[str(in_dir), str(out_single), "-m", "max", "--area"])
    ref_csv = (out_single / "calculations" / "cell_area.csv").read_bytes()
    ref_tifs = sorted(p.name for p in out_single.glob("*.tif*"))

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from tmat_tpu.tools import compute_zproj\n"
        f"compute_zproj.main(argv=[{str(in_dir)!r}, {str(out_multi)!r}, "
        "'-m', 'max', '--area'])\n"
    )
    _run_workers(code, 2, {"TMAT_TPU_BASE_DIR": str(tmp_path / "base")})

    got_tifs = sorted(p.name for p in out_multi.glob("*.tif*"))
    assert got_tifs == ref_tifs, "each projection written exactly once"
    got_csv = (out_multi / "calculations" / "cell_area.csv").read_bytes()
    assert got_csv == ref_csv


@pytest.mark.slow
def test_two_process_branches_sweep_matches_single_process(tmp_path):
    """compute_branches across 2 processes with a threshold sweep: rows
    for BOTH sweep CSVs gathered to the primary in discovery order, vis
    disabled (--no-vis exercises the native Morse stats path)."""
    import json

    from scipy import ndimage

    from tmat_tpu.models.params_io import save_params
    from tmat_tpu.models.unet import build_unet_xception

    patch = 32
    ckpt = tmp_path / "ckpt.msgpack"
    _, variables = build_unet_xception(
        1, (patch, patch), channels=1, filter_counts=(8, 16)
    )
    save_params(ckpt, variables)
    model_cfg = tmp_path / "segmentor.json"
    model_cfg.write_text(
        json.dumps(
            {
                "patch_size": patch,
                "checkpoint_file": str(ckpt),  # absolute: same resolution
                "filter_counts": [8, 16],  # in-process and in workers
                "ds_ratio": 1.0,
                "channels": 1,
            }
        )
    )

    rng = np.random.RandomState(4)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i in range(3):
        img = rng.rand(96, 96).astype(np.float32) * 10
        rr, cc = np.mgrid[0:96, 0:96]
        ring = np.abs(np.sqrt((rr - 48.0) ** 2 + (cc - 48.0) ** 2) - 30) < 3
        img[ring] += 180
        img[48, 18:78] += 150
        img = ndimage.gaussian_filter(img, 1.0)
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            in_dir / f"well{i}.tif"
        )

    out_single = tmp_path / "out_single"
    out_multi = tmp_path / "out_multi"
    argv_tail = [
        "--image-width-microns",
        "1000",
        "--model-cfg-path",
        str(model_cfg),
        "--graph-thresh-1",
        "2",
        "8",
        "--no-vis",
    ]

    from tmat_tpu.tools import compute_branches

    compute_branches.main(argv=[str(in_dir), str(out_single)] + argv_tail)
    ref_csvs = {
        p.name: p.read_bytes() for p in out_single.glob("branching_analysis*.csv")
    }
    assert len(ref_csvs) == 2, "one CSV per sweep config expected"

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from tmat_tpu.tools import compute_branches\n"
        f"compute_branches.main(argv=[{str(in_dir)!r}, {str(out_multi)!r}] "
        f"+ {argv_tail!r})\n"
    )
    _run_workers(
        code, 2, {"TMAT_TPU_BASE_DIR": str(tmp_path / "base")}, timeout=600
    )

    got_csvs = {
        p.name: p.read_bytes() for p in out_multi.glob("branching_analysis*.csv")
    }
    assert got_csvs == ref_csvs, (
        "both sweep CSVs must be byte-identical to single-process"
    )
    # config.json written once, by the primary
    assert len(list(out_multi.glob("config*.json"))) == 1


@pytest.mark.slow
def test_two_process_inv_depth_matches_single_process(tmp_path, monkeypatch):
    """compute_inv_depth across 2 processes: striped stacks, CSV rows
    gathered to the primary in discovery order."""
    import json

    from tmat_tpu.models.params_io import save_params
    from tmat_tpu.models.resnet import build_resnet50_tl

    # a tiny 2-member ensemble under a fresh base dir
    base = tmp_path / "base"
    mt = base / "model_training"
    ens = mt / "best_ensemble"
    ens.mkdir(parents=True)
    inp_shape = (32, 32, 3)
    _, template = build_resnet50_tl(
        1, inp_shape, base_last_layer="conv2_block3_out", seed=3
    )
    for i in range(2):
        save_params(ens / f"best_finetune_weights_{i}.msgpack", template)
    (mt / "invasion_depth_best_hp.json").write_text(
        json.dumps({"last_resnet_layer": "conv2_block3_out"})
    )
    (mt / "invasion_depth_training_values.json").write_text(
        json.dumps(
            {
                "cls_thresh": 0.5,
                "resnet_inp_shape": list(inp_shape),
                "n_models": 2,
            }
        )
    )
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({"n_pred_models": 2}))

    in_dir = tmp_path / "in"
    rng = np.random.RandomState(2)
    in_dir.mkdir()
    for i in range(3):
        stack_dir = in_dir / f"stack{i}"
        stack_dir.mkdir()
        for z in range(2):
            Image.fromarray((rng.rand(40, 40) * 255).astype(np.uint8)).save(
                stack_dir / f"s_z{z}.tif"
            )

    out_single = tmp_path / "out_single"
    out_multi = tmp_path / "out_multi"
    out_single.mkdir()
    out_multi.mkdir()

    # in-process reference: rebind the module global (defs caches the env
    # base dir at import); the subprocess workers get the env var instead
    from tmat_tpu.core import defs

    monkeypatch.setattr(defs, "MODEL_TRAINING_DIR", mt)

    from tmat_tpu.tools import compute_inv_depth

    compute_inv_depth.main(
        argv=[str(in_dir), str(out_single), "-c", str(cfg)]
    )
    ref_csv = (out_single / "invasion_depth_predictions.csv").read_bytes()

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from tmat_tpu.tools import compute_inv_depth\n"
        f"compute_inv_depth.main(argv=[{str(in_dir)!r}, {str(out_multi)!r}, "
        f"'-c', {str(cfg)!r}])\n"
    )
    _run_workers(code, 2, {"TMAT_TPU_BASE_DIR": str(base)})

    got_csv = (out_multi / "invasion_depth_predictions.csv").read_bytes()
    assert got_csv == ref_csv
    assert len(list(out_multi.glob("*.csv"))) == 1
