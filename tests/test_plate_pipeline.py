"""End-to-end plate pipeline test on the 8-device virtual mesh."""

import json

import numpy as np
import pytest
from PIL import Image
from scipy import ndimage

from tmat_tpu.core import defs
from tmat_tpu.models.params_io import save_params
from tmat_tpu.models.unet import UNetXceptionPatchSegmentor, build_unet_xception
from tmat_tpu.tools import plate_pipeline


@pytest.fixture
def tiny_segmentor(tmp_path):
    patch = 32
    _, variables = build_unet_xception(1, (patch, patch), channels=1,
                                       filter_counts=(8, 16))
    ckpt = tmp_path / "ckpt.msgpack"
    save_params(ckpt, variables)
    return UNetXceptionPatchSegmentor(patch, ckpt, (8, 16), ds_ratio=1.0)


def _plate(n_wells=4, z=3, hw=96, rng=None):
    rng = rng or np.random.RandomState(0)
    plate = rng.rand(n_wells, z, hw, hw).astype(np.float32) * 10
    rr, cc = np.mgrid[0:hw, 0:hw]
    ring = np.abs(np.sqrt((rr - hw / 2) ** 2 + (cc - hw / 2) ** 2) - hw / 3) < 2
    plate[:, 1][:, ring] += 200
    return plate


def test_analyze_well_graph_constant_raster_no_nan():
    """Regression: a constant prediction raster must not seed NaN/inf into
    the rescale (255/(hi-lo) overflowed float32 before the guard)."""
    import warnings

    cfg = {"image_width_microns": 800.0}
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        n, total, avg = plate_pipeline._analyze_well_graph(
            np.full((384, 384), 0.25, np.float32), cfg, 384
        )
    assert (n, total, avg) == (0, 0.0, 0.0)


def test_run_plate_end_to_end(tiny_segmentor, rng):
    plate = _plate(rng=rng)
    ids = [f"W{i}" for i in range(4)]
    results = plate_pipeline.run_plate(
        plate, ids, tiny_segmentor, {"image_width_microns": 800.0}, sd_coef=-2.0
    )
    timer = results.pop("_timer")
    assert results["well_id"] == ids
    assert len(results["area_pct"]) == 4
    # the bright ring is a real structure: area fraction should be > 0
    for pct in results["area_pct"]:
        assert 0 < pct < 100
    assert "device_pipeline" in timer.totals and "morse_graphs" in timer.totals


def test_plate_cli(tmp_path, tiny_segmentor, monkeypatch, rng):
    # write stacks + model cfg, then run the CLI main
    mt = tmp_path / "model_training"
    cfg_dir = mt / "binary_segmentation" / "configs"
    ckpt_dir = mt / "binary_segmentation" / "checkpoints"
    cfg_dir.mkdir(parents=True)
    ckpt_dir.mkdir(parents=True)
    _, variables = build_unet_xception(1, (32, 32), channels=1, filter_counts=(8, 16))
    save_params(ckpt_dir / "checkpoint_1.msgpack", variables)
    (cfg_dir / "unet_patch_segmentor_1.json").write_text(
        json.dumps(
            {
                "patch_size": 32,
                "checkpoint_file": "checkpoint_1.msgpack",
                "filter_counts": [8, 16],
                "ds_ratio": 1.0,
                "channels": 1,
            }
        )
    )
    monkeypatch.setattr(defs, "MODEL_TRAINING_DIR", mt)

    in_dir = tmp_path / "plate"
    in_dir.mkdir()
    plate = _plate(n_wells=2, rng=rng)
    for i in range(2):
        frames = [Image.fromarray(s.astype(np.uint8)) for s in plate[i]]
        frames[0].save(
            in_dir / f"well{i}.tif", save_all=True, append_images=frames[1:]
        )

    out_dir = tmp_path / "out"
    plate_pipeline.main(
        argv=[str(in_dir), str(out_dir), "--image-width-microns", "800"]
    )
    assert (out_dir / "plate_results.csv").is_file()


def test_run_plate_detect_well(tiny_segmentor, rng):
    """-w parity: well mask bounds the area denominator and prunes edges."""
    plate = _plate(n_wells=2, hw=96, rng=rng)
    # bright circular well interior so the mask fits a real boundary
    hw = 96
    rr, cc = np.mgrid[0:hw, 0:hw]
    inside = (rr - hw / 2) ** 2 + (cc - hw / 2) ** 2 <= (0.45 * hw) ** 2
    plate[:, :, ~inside] = 5.0
    plate[:, :, inside] += 60.0
    results = plate_pipeline.run_plate(
        plate,
        ["W0", "W1"],
        tiny_segmentor,
        {"image_width_microns": 800.0},
        sd_coef=-2.0,
        detect_well=True,
    )
    results.pop("_timer")
    assert len(results["area_pct"]) == 2
    for pct in results["area_pct"]:
        assert 0 <= pct <= 100


def test_run_plate_ragged_z_methods(tiny_segmentor, rng):
    """Non-max projections on a Z-padded plate must mask the padding:
    a min projection over zero-padding would otherwise return all zeros,
    and avg would dilute by the pad slices (VERDICT r1 weak #8)."""
    plate = _plate(n_wells=4, z=3, rng=rng)
    # well 3 has only 2 real slices; slice 2 is padding
    plate[3, 2] = 0.0
    z_counts = [3, 3, 3, 2]
    ids = [f"W{i}" for i in range(4)]

    for method in ("min", "avg", "med"):
        results = plate_pipeline.run_plate(
            plate,
            ids,
            tiny_segmentor,
            {"image_width_microns": 800.0},
            sd_coef=-2.0,
            proj_method=method,
            z_counts=z_counts,
        )
        results.pop("_timer")
        assert len(results["area_pct"]) == 4

    # direct numerical check: the projection inside stage1 matches a
    # hand-computed masked reduction for the ragged well
    from tmat_tpu.ops.zproj import proj_masked
    import jax.numpy as jnp

    got = np.asarray(proj_masked(jnp.asarray(plate[3]), 2, "min"))
    want = plate[3, :2].min(0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_streaming_matches_buffered(tiny_segmentor, rng):
    """Wrapper smoke test: run_plate delegates to run_plate_streaming, so
    this asserts the array-entry adapter (z-count trimming, padding) is
    faithful; the fused-vs-unfused divergence check is
    test_streaming_matches_independent_ops."""
    plate = _plate(n_wells=3, z=3, rng=rng)
    plate[2, 2] = 0.0
    z_counts = [3, 3, 2]
    ids = ["A", "B", "C"]
    cfg = {"image_width_microns": 800.0}

    buffered = plate_pipeline.run_plate(
        plate.astype(np.uint8),
        ids,
        tiny_segmentor,
        cfg,
        sd_coef=-2.0,
        z_counts=z_counts,
    )
    buffered.pop("_timer")

    def wells():
        for i, wid in enumerate(ids):
            yield wid, plate[i, : z_counts[i]].astype(np.uint8)

    streamed = plate_pipeline.run_plate_streaming(
        wells(),
        3,
        plate.shape[1:],
        tiny_segmentor,
        cfg,
        plate_dtype=np.uint8,
        sd_coef=-2.0,
    )
    streamed.pop("_timer")
    assert streamed == buffered


def test_streaming_matches_independent_ops(tiny_segmentor, rng):
    """The fused plate_stage1/stage2 pipeline must equal the same wells
    pushed through the INDEPENDENTLY composed public ops (plate_zproj_masked
    -> plate_threshold -> resize/rescale -> plate_segment -> median ->
    skeletonize -> filter_branch_seg_mask -> stage2 -> Morse stats) — a
    genuinely different set of device programs, so a fusion bug in stage1
    cannot cancel out of the comparison."""
    import jax
    import jax.numpy as jnp

    from tmat_tpu.ops import morphology as morph
    from tmat_tpu.ops.rescale import rescale_intensity
    from tmat_tpu.ops.resize import resize
    from tmat_tpu.parallel import plate as PL
    from tmat_tpu.parallel.mesh import make_mesh
    from tmat_tpu.topo.transforms import (
        _median_filter_disk2_batch,
        filter_branch_seg_mask,
    )

    n_dev = len(jax.devices())
    plate = _plate(n_wells=3, z=3, rng=rng).astype(np.uint8)
    plate[2, 2] = 0
    z_counts = [3, 3, 2]
    ids = ["A", "B", "C"]
    cfg = {"image_width_microns": 800.0}

    def wells():
        for i, wid in enumerate(ids):
            yield wid, plate[i, : z_counts[i]]

    streamed = plate_pipeline.run_plate_streaming(
        wells(), 3, plate.shape[1:], tiny_segmentor, cfg,
        plate_dtype=np.uint8, sd_coef=-2.0,
    )
    streamed.pop("_timer")

    # --- independent composition (pad to the device count for sharding) ---
    mesh = make_mesh(axis_names=("data",))
    padded = np.zeros((n_dev,) + plate.shape[1:], plate.dtype)
    padded[:3] = plate
    zcs = np.asarray(z_counts + [1] * (n_dev - 3), np.int32)

    proj = PL.plate_zproj_masked(mesh, jnp.asarray(padded), zcs, "max")
    thresh = PL.plate_threshold(mesh, proj.astype(jnp.float32), -2.0)
    areas = np.asarray(jnp.mean(thresh.astype(jnp.float32), axis=(1, 2)))

    hw = plate.shape[-1]
    target = (hw, hw)  # ds_ratio 1.0
    small = jax.vmap(
        lambda p: rescale_intensity(
            resize(p.astype(jnp.float32)[None], target, "lanczos")[0],
            out_range=(0, 1),
        )
    )(proj)
    preds = PL.plate_segment(
        mesh, small, tiny_segmentor._pred_fn, tiny_segmentor.patch_size, 2
    )
    seg = (preds > 0.5).astype(jnp.float32)
    filtered = _median_filter_disk2_batch(seg) > 0.5
    skels = jax.vmap(morph.skeletonize)(filtered)

    f_np, s_np = np.asarray(filtered), np.asarray(skels)
    masks = np.stack(
        [
            filter_branch_seg_mask(
                f_np[j].astype(np.uint8), footprint=None,
                precomputed_skeleton=s_np[j],
            )
            > 0
            for j in range(n_dev)
        ]
    )
    dsamp = (plate_pipeline.DOWNSAMPLE_WIDTH, plate_pipeline.DOWNSAMPLE_WIDTH)
    p384 = np.asarray(
        PL.plate_stage2(mesh, preds, jnp.asarray(masks), skels, dsamp)
    )
    stats = [
        plate_pipeline._analyze_well_graph(p384[j], cfg, dsamp[1])
        for j in range(3)
    ]

    np.testing.assert_allclose(
        streamed["area_pct"], [float(a) * 100 for a in areas[:3]], atol=1e-5
    )
    assert streamed["total_branches"] == [s[0] for s in stats]
    np.testing.assert_allclose(
        streamed["total_branch_length_um"], [s[1] for s in stats], atol=1e-6
    )
    np.testing.assert_allclose(
        streamed["avg_branch_length_um"], [s[2] for s in stats], atol=1e-6
    )


def test_stage1_fs_pre_projected_matches_in_program_projection(
    tiny_segmentor, rng
):
    """fs + detect_well reuses the focus-stack projection computed for
    well fitting as stage1's input (pre_projected=True) instead of
    projecting the stack a second time in-program. Pin the substitution:
    stage1 fed the precomputed fs projection must agree with stage1
    projecting the raw stack itself, on every output."""
    import jax
    import jax.numpy as jnp

    from tmat_tpu.parallel import plate as PL
    from tmat_tpu.parallel.mesh import make_mesh

    n_dev = len(jax.devices())
    hw = 64
    plate = _plate(n_wells=n_dev, z=3, hw=hw, rng=rng).astype(np.uint8)
    plate[-1, 2] = 0  # ragged Z: the masked projection must agree too
    zcs = np.asarray([3] * (n_dev - 1) + [2], np.int32)
    mesh = make_mesh(axis_names=("data",))
    target = (hw, hw)
    rr, cc = np.mgrid[0:hw, 0:hw]
    wm = (rr - hw / 2) ** 2 + (cc - hw / 2) ** 2 <= (0.45 * hw) ** 2
    wm_small = jnp.asarray(
        np.repeat(wm[None].astype(np.float32), n_dev, 0)
    )

    kw = dict(proj_method="fs", z_counts=zcs, tta=1)
    in_program = PL.plate_stage1(
        mesh, jnp.asarray(plate), tiny_segmentor._pred_fn,
        tiny_segmentor.patch_size, 2, target, -2.0, wm_small,
        pre_projected=False, **kw,
    )
    proj = PL.plate_zproj_masked(mesh, jnp.asarray(plate), zcs, "fs").astype(
        jnp.float32
    )
    pre_projected = PL.plate_stage1(
        mesh, proj, tiny_segmentor._pred_fn,
        tiny_segmentor.patch_size, 2, target, -2.0, wm_small,
        pre_projected=True, **kw,
    )
    for got, want in zip(pre_projected, in_program):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-6
        )


def test_streaming_matches_buffered_detect_well(tiny_segmentor, rng):
    """-w in streaming mode (per-chunk mask fitting) must equal the
    array-entry path per well."""
    hw = 96
    plate = _plate(n_wells=2, hw=hw, rng=rng)
    rr, cc = np.mgrid[0:hw, 0:hw]
    inside = (rr - hw / 2) ** 2 + (cc - hw / 2) ** 2 <= (0.45 * hw) ** 2
    plate[:, :, ~inside] = 5.0
    plate[:, :, inside] += 60.0
    plate = plate.astype(np.uint8)
    cfg = {"image_width_microns": 800.0}
    ids = ["W0", "W1"]

    buffered = plate_pipeline.run_plate(
        plate, ids, tiny_segmentor, cfg, sd_coef=-2.0, detect_well=True
    )
    buffered.pop("_timer")

    streamed = plate_pipeline.run_plate_streaming(
        ((wid, plate[i]) for i, wid in enumerate(ids)),
        2,
        plate.shape[1:],
        tiny_segmentor,
        cfg,
        plate_dtype=np.uint8,
        sd_coef=-2.0,
        detect_well=True,
    )
    streamed.pop("_timer")
    assert streamed == buffered


def test_probe_plate_geometry(tmp_path, rng):
    from PIL import Image as PILImage

    # uniform uint8 sequence wells -> streaming geometry
    d1 = tmp_path / "w1"
    d1.mkdir()
    for z in range(3):
        PILImage.fromarray(
            rng.randint(0, 255, (16, 18)).astype(np.uint8)
        ).save(d1 / f"s_z{z}.tif")
    paths = {"w1": sorted(str(p) for p in d1.glob("*.tif"))}
    geo = plate_pipeline._probe_plate_geometry(paths)
    assert geo is not None
    assert geo[:3] == (3, 16, 18) and geo[3] == np.uint8

    # a multi-channel hyperstack forces the buffered fallback
    pages = [
        PILImage.fromarray(rng.randint(0, 255, (8, 8)).astype(np.uint8))
        for _ in range(6)
    ]
    desc = "ImageJ=1.53\nimages=6\nchannels=2\nslices=3\nframes=1\n"
    hyper = tmp_path / "hyper.tif"
    pages[0].save(
        hyper, save_all=True, append_images=pages[1:], tiffinfo={270: desc}
    )
    assert (
        plate_pipeline._probe_plate_geometry({"h": str(hyper)}) is None
    )

    # mixed-dtype slice sequences must widen the batch dtype (every
    # file's mode is probed, not just the first)
    d2 = tmp_path / "w2"
    d2.mkdir()
    PILImage.fromarray(rng.randint(0, 255, (16, 18)).astype(np.uint8)).save(
        d2 / "s_z0.tif"
    )
    PILImage.fromarray(
        rng.randint(0, 60000, (16, 18)).astype(np.uint16)
    ).save(d2 / "s_z1.tif")
    geo = plate_pipeline._probe_plate_geometry(
        {"w2": sorted(str(p) for p in d2.glob("*.tif"))}
    )
    assert geo is not None and geo[3] == np.uint16

    # wells that differ in SPATIAL size are refused loudly: zero-padding
    # a smaller well to the plate maximum would bias its area denominator
    # and GMM background fit rather than fail (ragged Z stays supported)
    small = tmp_path / "small.tif"
    PILImage.fromarray(rng.randint(0, 255, (12, 12)).astype(np.uint8)).save(
        small
    )
    with pytest.raises(ValueError, match="spatial size"):
        plate_pipeline._probe_plate_geometry(
            {"w1": paths["w1"], "w3": str(small)}
        )


def test_host_tails_overlap_across_chunks(monkeypatch):
    """Structural pin for the multi-chip projection (VERDICT r4 #7).

    BASELINE.md's ~69 wells/sec 8-chip projection assumes per-chunk host
    tails (component filter, Morse stats) run CONCURRENTLY across pool
    threads (48 ms/well of host work amortizes to ~6 ms/well over 8
    threads). This asserts the scheduler actually PERMITS that overlap,
    counter/barrier-based rather than wall-clock: a Barrier(4) inside the
    component-filter stage releases only if >= 4 chunks' host tails are
    in flight simultaneously. A regression that serializes host tails
    (a global postprocess lock, or dispatching chunk i+1 only after chunk
    i's result) breaks the barrier instead.
    """
    import threading

    import jax
    from jax.sharding import Mesh

    from tmat_tpu.parallel.validation import identity_segmentor, make_demo_plate

    n_wells, parties = 8, 4
    barrier = threading.Barrier(parties)
    outcome = {"met": 0, "broken": 0}
    entries = {"n": 0}
    lock = threading.Lock()
    real_filter = plate_pipeline.filter_branch_seg_mask

    def gated_filter(*args, **kwargs):
        with lock:
            entries["n"] += 1
            gate = entries["n"] <= parties
        if gate:
            try:
                barrier.wait(timeout=120)
                with lock:
                    outcome["met"] += 1
            except threading.BrokenBarrierError:
                with lock:
                    outcome["broken"] += 1
        return real_filter(*args, **kwargs)

    monkeypatch.setattr(plate_pipeline, "filter_branch_seg_mask", gated_filter)

    # 1-device mesh -> one well per chunk -> 8 concurrent chunk tasks
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    plate, ids = make_demo_plate(n_wells)
    res = plate_pipeline.run_plate(
        plate,
        ids,
        identity_segmentor(),
        {"image_width_microns": 800.0},
        mesh=mesh,
        sd_coef=-1.0,
    )
    res.pop("_timer")
    assert outcome["broken"] == 0 and outcome["met"] == parties, (
        f"host tails did not overlap {parties}-way: {outcome} "
        "(the plate scheduler serialized chunk postprocess work)"
    )
    # the run itself stays correct under the gating
    assert res["well_id"] == ids
    assert all(b > 0 for b in res["total_branches"]), res["total_branches"]
