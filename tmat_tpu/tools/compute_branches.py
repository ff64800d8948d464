"""Analyze microvessels in input directory of Z-stacks or Z-projections.

Detects and quantifies branch structures in 2-D images or Z-stacks:
UNet (2-D) or multi-scale Sato vesselness (3-D) segmentation, discrete
Morse graph extraction, and branch statistics. CLI surface, visualization
outputs (original/vesselness/prediction/segmentation-mask/distance-
transform/well-mask/barcode/Morse-tree PNGs) and the UTF-16 CSV contract
match the reference scripts/compute_branches.py:1-606, including
graph-threshold sweeps via the cartesian product of --graph-thresh-1/2.

TPU-first: the 2-D path's tiled UNet runs as one fused XLA program
(ops/tiled.py); the 3-D path's Sato scales are batched over the whole
stack in one jit (ops/sato.py); the 10-iteration gradient-guided region
expansion is shifted-compare updates on device. The Morse graph itself is
the native C++ kernel + host forest analysis (topo/).
"""

from __future__ import annotations

import csv
import json
import os
import sys
import traceback
from functools import partial
from itertools import product
from pathlib import Path
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from tmat_tpu.core import defs, io as tio
from tmat_tpu.core.config import load_tool_config, merge_cli_overrides
from tmat_tpu.core.log import SFM, section_footer, section_header
from tmat_tpu.models.unet import get_unet_patch_segmentor_from_cfg
from tmat_tpu.ops import morphology as morph
from tmat_tpu.ops.canny import canny
from tmat_tpu.ops.filters import gaussian, unsharp_mask_nd
from tmat_tpu.ops.rescale import rescale_intensity
from tmat_tpu.ops.resize import resize, target_shape_for_ratio
from tmat_tpu.ops.sato import sato
from tmat_tpu.ops.wellmask import gen_superellipse_mask, generate_well_mask
from tmat_tpu.topo import regionprops as rp
from tmat_tpu.topo.morse import MorseGraph
from tmat_tpu.topo.transforms import filter_branch_seg_mask
from tmat_tpu.tools import args as su


DEFAULT_CONFIG_NAME = "default_branching_computation.json"
DOWNSAMPLE_WIDTH = 384


def create_output_csv(output_file: Path) -> None:
    """CSV header (compute_branches.py:56-71); UTF-16 like the reference."""
    fields = [
        "Image",
        "Total # of branches",
        "Total branch length (µm)",
        "Average branch length (µm)",
    ]
    with open(output_file, "w", encoding="utf-16") as f:
        writer = csv.writer(f, lineterminator="\n")
        writer.writerow(fields)


def append_csv_row(
    output_dir: Path, tuned_str: str, fields: list, created_csv_files: set
) -> None:
    """Append one result row to the sweep-config's UTF-16 CSV.

    Keeps the reference's collision contract (behavior of
    compute_branches.py:475-487): rows land in the first
    ``branching_analysis{tag}[-N].csv`` (N = 2, 3, ...) that either this
    run already opened or does not exist yet — a pre-existing CSV from an
    earlier run is never appended to, it gets a suffixed sibling.
    """

    def candidates():
        yield output_dir / f"branching_analysis{tuned_str}.csv"
        n = 2
        while True:
            yield output_dir / f"branching_analysis{tuned_str}-{n}.csv"
            n += 1

    for path in candidates():
        ours = str(path) in created_csv_files
        if ours or not path.is_file():
            break
    if not ours:
        create_output_csv(path)
        created_csv_files.add(str(path))

    with open(path, "a", encoding="utf-16") as f:
        csv.writer(f, lineterminator="\n").writerow(fields)

    print(f"Results saved to {path}.", flush=True)


def save_vis(img, save_dir, filename) -> None:
    img = np.asarray(rescale_intensity(jnp.asarray(img, jnp.float32), (0, 255)))
    file = tio.get_unique_output_filepath(os.path.join(str(save_dir), filename))
    tio.save_image(file, img.astype(np.uint8))


def pixels_to_microns(num_pixels, im_width_px, im_width_microns):
    return (im_width_microns / im_width_px) * num_pixels


def microns_to_pixels(num_microns, im_width_px, im_width_microns):
    return (im_width_px / im_width_microns) * num_microns


def make_well_mask(img: np.ndarray, seed: int = 0):
    """Well mask + shrunken inverted pruning mask (compute_branches.py:109-141)."""
    well_mask = generate_well_mask(img, return_superellipse_params=True, seed=seed)
    if isinstance(well_mask, tuple):
        well_mask, t, d, s_a, s_b, c_x, c_y, n = well_mask
        well_mask = well_mask > 0
        d *= 0.9
        shrunken = np.asarray(
            gen_superellipse_mask(t, d, s_a, s_b, c_x, c_y, n, img.shape[:2])
        )
    else:
        well_mask = well_mask > 0
        shrunken = np.asarray(
            morph.binary_erosion(jnp.asarray(well_mask), morph.disk(5))
        )

    coverage = well_mask.sum() / well_mask.size
    if coverage < 0.4:
        print(
            f"{SFM.warning} Well mask coverage is too low ({coverage * 100:.2f}%) "
            "so it will not be used for analysis."
        )
        well_mask = np.full(img.shape[:2], True)
        shrunken = np.full(img.shape[:2], True)
    return well_mask, shrunken


def _shift2d(x: jnp.ndarray, dr: int, dc: int, fill):
    """out[i, j] = x[i + dr, j + dc], out-of-range -> fill (no wraparound)."""
    h, w = x.shape
    padded = jnp.pad(x, 1, constant_values=fill)
    return jax.lax.dynamic_slice(padded, (1 + dr, 1 + dc), (h, w))


@partial(jax.jit, static_argnames=("iters",))
def _region_expansion(mask: jnp.ndarray, vessels: jnp.ndarray, iters: int = 10):
    """Gradient-guided region expansion (compute_branches.py:287-297).

    Each iteration marks neighbors of mask pixels as expandable when they
    sit on a non-decreasing intensity path (mask_hi) and not on a
    decreasing one (mask_lo). Expressed as 8 pad-and-shift compares ORed
    per iteration inside one fori_loop jit — XLA fuses each iteration to
    a single elementwise pass (the previous slice-scatter formulation
    dispatched 160 partial-array updates and dominated the whole 3-D
    branches path at ~1.7s/stack; this runs in ~10ms). Bit-equal to the
    scatter formulation (test_tool_branches.py::test_region_expansion_
    matches_scatter_reference): a neighbor outside the frame contributes
    False exactly like the reference's slice-overlap writes.
    """
    mask = mask.astype(bool)
    offsets = [p for p in product((-1, 0, 1), repeat=2) if p != (0, 0)]

    def body(_, m):
        lo = jnp.zeros_like(m)
        hi = jnp.zeros_like(m)
        for r, c in offsets:
            # the source pixel for destination (i, j) is (i - r, j - c)
            src_mask = _shift2d(m, -r, -c, False)
            src_vess = _shift2d(vessels, -r, -c, 0.0)
            lt = vessels < src_vess
            lo = lo | (src_mask & lt)
            hi = hi | (src_mask & ~lt)
        return m | ((vessels > 0.01) & hi & ~lo)

    return jax.lax.fori_loop(0, iters, body, mask)


@partial(jax.jit, static_argnames=("target_shape",))
def _stack_vesselness(img, target_shape):
    """Fused device head of the 3-D path: blur -> resize -> rescale ->
    pairwise slice max -> Sato scales -> unsharp -> vessels/canny/
    skeleton, ONE program. The unfused chain cost ~300ms of per-op
    dispatch + small-program latency per stack through the TPU tunnel
    (round-3 stage profile); fused it is a single dispatch."""
    stack = jnp.asarray(img, jnp.float32)
    stack = gaussian(stack, sigma=1.0, mode="nearest")
    stack = resize(stack, target_shape, "linear")
    stack = rescale_intensity(stack, out_range=(0, 1))
    pairs = jnp.maximum(stack[:-1], stack[1:])
    img_vess = sato(pairs)
    img_vess_sharp = unsharp_mask_nd(img_vess, 2.0, 2.0)
    vessels = jnp.max(img_vess_sharp, axis=0)
    edges = canny(vessels, sigma=0)
    skel = morph.skeletonize(edges)
    return vessels, edges, skel


@jax.jit
def _stack_expand(mask, vessels, edges):
    """Fused middle: 3 edge-blur iterations + 10-iteration region
    expansion + edge subtraction + disk(2) closing (compute_branches.py:
    281-297 reference semantics), one program."""
    mask = mask.astype(bool)
    for _ in range(3):
        vessels_blur = gaussian(vessels, 1.0, mode="nearest")
        vessels = jnp.where(mask, vessels_blur, vessels)
    m = _region_expansion(mask, vessels, iters=10)
    m = m & ~edges.astype(bool)
    return morph.binary_closing(m, morph.disk(2))


@jax.jit
def _stack_final(vessels_mask, vessels):
    """Fused tail: dilate the filtered mask, re-apply vesselness, final
    Gaussian (compute_branches.py:299-306), then the Morse-input [0, 255]
    stretch (the eager rescale_intensity cost ten per-process compiles)."""
    out = jnp.where(
        morph.binary_dilation(vessels_mask.astype(bool), morph.square(3)),
        vessels,
        0.0,
    )
    return rescale_intensity(gaussian(out, 1.0, mode="nearest"), out_range=(0, 255))


# per-(shape, target) jit closures for the vesselness head: the AOT
# executable cache needs a callable whose runtime signature is arrays
# only, so the static target_shape is baked into a cached closure
_VESSELNESS_JITS: dict = {}

# 2-D path fused head/tail (mirrors the plate pipeline's stage1/stage2
# fusion): the eager resize/rescale and medial-axis/EDT/downsample
# chains each dispatched ~5 small programs per image — per-program
# dispatch latency and per-process compiles both scale with program
# count through remote TPU runtimes
_BRANCH2D_JITS: dict = {}


def _branch2d_head(raw_img, target_shape):
    """resize (lanczos4, ds_ratio geometry) + [0,1] rescale, ONE program.
    Returns (resized_f32, rescaled) — the resized image feeds the vis
    PNG, the rescaled one the segmentor (compute_branches.py:318-330)."""
    key = ("head", tuple(raw_img.shape), str(np.asarray(raw_img).dtype), tuple(target_shape))
    fn = _BRANCH2D_JITS.get(key)
    if fn is None:
        def core(x):
            resized = resize(x.astype(jnp.float32), tuple(target_shape), "lanczos4")
            return resized, rescale_intensity(resized, out_range=(0, 1))

        fn = _BRANCH2D_JITS[key] = jax.jit(core)
    return _aot_3d(fn, (jnp.asarray(raw_img),), ("branch2d",) + key)


def _branch2d_tail(seg_mask, pred, dsamp_res):
    """Centerline-relative distance weighting + working-width downsample +
    Morse-input [0, 255] stretch, ONE program (compute_branches.py:338-356;
    the plate twin is parallel/plate.plate_stage2). Returns
    (weighted_pred, analysis_scaled) — the second output is the downsampled
    analysis image already rescaled onto [0, 255] for the Morse stage (the
    eager rescale_intensity dispatched ten per-process device compiles;
    cold-start census, BASELINE.md)."""
    from tmat_tpu.ops.distance import edt as _edt

    # "tail2": the program body changed when the 0-255 stretch was folded
    # in — the key version retires round-4 "tail" cache entries
    key = ("tail2", tuple(np.asarray(seg_mask).shape), tuple(dsamp_res))
    fn = _BRANCH2D_JITS.get(key)
    if fn is None:
        def core(mask, p):
            skel, dist = morph.medial_axis(mask, return_distance=True)
            cdt = _edt(~skel)
            rel = dist / jnp.maximum(dist + cdt, 1e-12)
            weighted = p * rel
            analysis = resize(weighted, tuple(dsamp_res), "linear")
            return weighted, rescale_intensity(analysis, out_range=(0, 255))

        fn = _BRANCH2D_JITS[key] = jax.jit(core)
    return _aot_3d(
        fn, (jnp.asarray(seg_mask, bool), jnp.asarray(pred, jnp.float32)),
        ("branch2d",) + key,
    )


def _aot_3d(jitted, args, key_parts):
    """3-D path programs close over no weights — geometry-keyed entries in
    the cross-process executable cache (core/aot_cache.py) are safe and
    remove the dominant per-process compiles of the Sato path."""
    from tmat_tpu.core.aot_cache import aot_call

    return aot_call(jitted, args, key_parts, label="branches3d")


def _stack_vesselness_aot(img, target_shape):
    key = (tuple(img.shape), str(np.asarray(img).dtype), tuple(target_shape))
    fn = _VESSELNESS_JITS.get(key)
    if fn is None:
        fn = jax.jit(lambda x: _stack_vesselness(x, target_shape))
        _VESSELNESS_JITS[key] = fn
    return _aot_3d(fn, (jnp.asarray(img),), ("branches3d_vesselness",) + key)


def _ecc_diameter_filter(skel_np: np.ndarray, thresh: float = 3.5) -> np.ndarray:
    """Drop skeleton components with eccentricity * equivalent diameter
    <= thresh (compute_branches.py:276-279) — one labeling pass feeding
    both properties (native C++ engine when available)."""
    labels, n = rp.label(skel_np)
    if n == 0:
        return np.zeros_like(skel_np)
    props = rp.region_properties(
        labels, n, props=("eccentricity", "equivalent_diameter_area")
    )
    keep = props["eccentricity"] * props["equivalent_diameter_area"] > thresh
    lut = np.concatenate(([False], keep))
    return np.where(lut[labels], skel_np, 0)


def analyze_img(
    img_id: str,
    img_files: Union[str, list],
    model,
    output_dir: Path,
    config: dict,
    created_csv_files: set,
    use_well_mask: bool = False,
    row_sink=None,
) -> None:
    """Measure branches in an image and append results
    (compute_branches.py:144-489)."""
    image_width_microns = config.get("image_width_microns")
    graph_thresh_1 = config.get("graph_thresh_1", 5)
    graph_thresh_2 = config.get("graph_thresh_2", 10)
    graph_smoothing_window = config.get("graph_smoothing_window", 12)
    min_branch_length = config.get("min_branch_length", 12)
    max_branch_length = config.get("max_branch_length")
    remove_isolated_branches = config.get("remove_isolated_branches", False)
    time_index = config.get("time")
    channel_index = config.get("channel")
    vis = config.get("save_vis", True)
    # with --no-vis every save_vis call becomes a no-op and the Morse
    # stage runs on the native C++ engine (statistics only, no graph
    # object to plot); CSV outputs are identical (test_morse_native.py)
    sv = save_vis if vis else (lambda *a, **k: None)

    print("", flush=True)
    print("=========================================", flush=True)
    print(f"Analyzing {img_id}...", flush=True)
    print("=========================================", flush=True)

    img, pix_sizes = tio.load_image(img_files, time_index, channel_index)
    n_dims = img.ndim

    if image_width_microns is None:
        if pix_sizes.X is None:
            print(
                f"\n{SFM.failure} The --image-width-microns parameter was not "
                "specified, and the pixel to micron conversion factor was not "
                "found in the image metadata.\n"
                f"{SFM.info} {SFM.bold}Solution:{SFM.reset} Specify "
                "--image-width-microns and try again. Exiting...\n"
            )
            sys.exit(1)
        image_width_microns = img.shape[-1] * pix_sizes.X

    vis_dir = output_dir / "visualizations" / img_id
    if vis:
        vis_dir.mkdir(parents=True, exist_ok=True)

    img_dsamp_res = tuple(
        int(v)
        for v in np.round(
            np.multiply(img.shape[-2:], DOWNSAMPLE_WIDTH / img.shape[-1])
        ).astype(int)
    )

    if n_dims == 3:
        # --- Z stack: Sato vesselness + post-processing (device) ----------
        original_image = img.max(0)
        sv(original_image, vis_dir, "original_image.png")

        if use_well_mask:
            original_dsamp = np.asarray(
                resize(jnp.asarray(original_image, jnp.float32), img_dsamp_res, "linear")
            )
            well_mask, shrunken = make_well_mask(original_dsamp)
        else:
            well_mask = np.full(img_dsamp_res, True)
            shrunken = np.full(img_dsamp_res, True)
        pruning_mask = np.logical_not(shrunken)

        print("Processing slices...", flush=True)
        # three fused device programs with two host interludes (the
        # label-dependent component filters); each interlude fetches one
        # 384px raster — the previous per-op chain paid ~8 dispatches +
        # fetches per stack and was latency-bound through the TPU tunnel
        vessels, edges, skel = _stack_vesselness_aot(img, img_dsamp_res)

        mask_np = _ecc_diameter_filter(np.asarray(skel).astype(np.uint8))

        vessels_mask = _aot_3d(
            _stack_expand,
            (jnp.asarray(mask_np > 0), vessels, edges),
            ("branches3d_expand", tuple(mask_np.shape)),
        )

        vessels_mask = filter_branch_seg_mask(
            np.asarray(vessels_mask).astype(np.uint8), None, False
        )

        # "final2": program body changed (0-255 stretch folded in) — the
        # key version retires earlier cache entries
        analysis_img = np.asarray(
            _aot_3d(
                _stack_final,
                (jnp.asarray(vessels_mask > 0), vessels),
                ("branches3d_final2", tuple(np.asarray(vessels_mask).shape)),
            )
        )
        # already on [0, 255]; save_vis's own stretch maps it identically
        sv(analysis_img, vis_dir, "vesselness_image.png")
    else:
        # --- 2-D image: UNet patch segmentation (fused tiled inference) ---
        target_shape = target_shape_for_ratio(img.shape[:2], model.ds_ratio)
        resized, rescaled = _branch2d_head(img, target_shape)
        original_image = np.asarray(resized)
        sv(original_image, vis_dir, "original_image.png")
        img = np.asarray(rescaled)

        if use_well_mask:
            well_mask, shrunken = make_well_mask(img)
        else:
            well_mask = np.full(img.shape[:2], True)
            shrunken = np.full(img.shape[:2], True)
        pruning_mask = np.logical_not(shrunken)

        print("", flush=True)
        print("Segmenting image...", flush=True)

        pred = model.predict(img * well_mask, auto_resample=False)
        sv(pred, vis_dir, "prediction.png")

        seg_mask = pred > 0.5
        seg_mask = filter_branch_seg_mask((seg_mask * well_mask).astype(np.uint8))
        seg_mask = seg_mask.astype(float)

        weighted, analysis = _branch2d_tail(seg_mask > 0, pred, img_dsamp_res)
        pred = np.asarray(weighted)

        sv(seg_mask, vis_dir, "segmentation_mask.png")
        sv(pred, vis_dir, "distance_transform.png")

        analysis_img = np.asarray(analysis)
        if use_well_mask:
            pruning_mask = (
                np.asarray(
                    resize(
                        jnp.asarray(pruning_mask, jnp.float32),
                        img_dsamp_res,
                        "nearest",
                    )
                )
                > 0
            )
        else:
            # all-False either way: resizing a zero raster cost two
            # per-process device compiles on the no-well-mask path
            pruning_mask = np.zeros(img_dsamp_res, bool)

    if use_well_mask:
        sv(np.asarray(well_mask) * 255, vis_dir, "well_mask.png")

    # --- per-config graph sweeps ---------------------------------------------
    # Sweep-filename contract (behavior of compute_branches.py:366-395,
    # re-derived): one config per (thresh1 x thresh2) combination; swept
    # (multi-value) params are zero-padded into the filename tag so sweep
    # outputs sort lexicographically.
    sweep_axes = {
        "thresh1": np.atleast_1d(graph_thresh_1).tolist(),
        "thresh2": np.atleast_1d(graph_thresh_2).tolist(),
    }
    cfgs = [dict(zip(sweep_axes, combo)) for combo in product(*sweep_axes.values())]
    tuned = [k for k, v in sweep_axes.items() if len(v) > 1]

    def _pad_format(values):
        """Zero-padded format spec wide enough for every swept value."""
        if not all(isinstance(x, (int, float)) for x in values):
            return "{}"
        if all(isinstance(x, int) for x in values):
            digits = max(len(str(x)) for x in values)
            return f"{{:0{digits}d}}"
        as_text = [str(float(x)) for x in values]
        int_digits = max(t.index(".") for t in as_text)
        frac_digits = max(len(t) - t.index(".") - 1 for t in as_text)
        return f"{{:0{int_digits + 1 + frac_digits}.{frac_digits}f}}"

    pad_fmt = {k: _pad_format(v) for k, v in sweep_axes.items()}

    for cfg in cfgs:
        tag = "".join(
            f"_{k}_{pad_fmt[k].format(v)}" for k, v in cfg.items() if k in tuned
        )
        tuned_str = f"_CONFIG{tag}" if tag else ""

        if n_dims == 2:
            print("\nComputing graph and barcode...", flush=True)

        width_px = analysis_img.shape[1]
        min_branch_length_px = round(
            microns_to_pixels(min_branch_length, width_px, image_width_microns)
        )
        max_branch_length_px = None
        if max_branch_length is not None:
            max_branch_length_px = round(
                max(
                    1,
                    microns_to_pixels(max_branch_length, width_px, image_width_microns),
                )
            )
        smoothing_window_px = round(
            max(
                1,
                microns_to_pixels(
                    graph_smoothing_window, width_px, image_width_microns
                ),
            )
        )

        # both paths' fused tails already stretch the analysis image onto
        # [0, 255] on device (_branch2d_tail / _stack_final)
        scaled_img = analysis_img
        morse_kwargs = dict(
            thresholds=(cfg["thresh1"], cfg["thresh2"]),
            smoothing_window=smoothing_window_px,
            min_branch_length=min_branch_length_px,
            max_branch_length=max_branch_length_px,
            remove_isolated_branches=remove_isolated_branches,
            pruning_mask=pruning_mask,
        )

        morse_graph = None
        native_stats = None
        if not vis:
            # statistics-only fast path: the C++ engine computes the same
            # smooth/trim/forest/barcode chain bit-identically
            # (test_morse_native.py) without building the Python graph the
            # plots would need
            from tmat_tpu.topo.morse_native import morse_stats_native

            native_stats = morse_stats_native(scaled_img, **morse_kwargs)

        if native_stats is None:
            # an empty Morse graph flows through with 0 branches on both
            # engines (topo/morse.py:298-301); no exception path exists,
            # unlike the reference's NetworkXPointlessConcept skip
            # (compute_branches.py:417-429)
            morse_graph = MorseGraph(scaled_img, **morse_kwargs)

        # Barcode + Morse tree visualizations (compute_branches.py:431-450)
        if vis:
            _save_morse_vis(
                morse_graph,
                vis_dir,
                tuned_str,
                original_image,
                img_dsamp_res,
            )

        print("\nComputing branch statistics...", flush=True)

        if native_stats is not None:
            total_num_branches, total_px, avg_px = native_stats
            total_branch_length = pixels_to_microns(
                total_px, width_px, image_width_microns
            )
            avg_branch_length = pixels_to_microns(
                avg_px, width_px, image_width_microns
            )
        else:
            total_branch_length = pixels_to_microns(
                morse_graph.get_total_branch_length(), width_px, image_width_microns
            )
            avg_branch_length = pixels_to_microns(
                morse_graph.get_average_branch_length(), width_px, image_width_microns
            )
            total_num_branches = len(morse_graph.barcode)

        fields = [img_id, total_num_branches, total_branch_length, avg_branch_length]

        if row_sink is not None:
            # multi-process run: rows are gathered and written by the
            # primary process after the loop (main), preserving discovery
            # order; writing from every process would tear the shared CSV
            row_sink(tuned_str, fields)
        else:
            append_csv_row(output_dir, tuned_str, fields, created_csv_files)


def _save_morse_vis(morse_graph, vis_dir, tuned_str, original_image, img_dsamp_res):
    """Barcode + Morse-tree overlay PNGs (compute_branches.py:431-450)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    save_path = tio.get_unique_output_filepath(
        str(vis_dir / f"barcode{tuned_str}.png")
    )
    plt.figure(figsize=(6, 6))
    plt.margins(0)
    ax = plt.gca()
    scaling_factor = original_image.shape[1] / img_dsamp_res[1]
    morse_graph.plot_colored_barcode(scaling_factor=scaling_factor, ax=ax)
    plt.savefig(save_path, dpi=300, bbox_inches="tight", pad_inches=0)

    save_path = tio.get_unique_output_filepath(
        str(vis_dir / f"morse_tree{tuned_str}.png")
    )
    fig_width = 10
    fig_height = fig_width * (original_image.shape[0] / original_image.shape[1])
    plt.figure(figsize=(fig_width, fig_height))
    plt.margins(0)
    ax = plt.gca()
    ax.imshow(
        np.asarray(
            rescale_intensity(jnp.asarray(original_image), out_range=(0, 255))
        ),
        cmap="gray",
    )
    morse_graph.plot_colored_tree(scaling_factor=scaling_factor, ax=ax)
    plt.savefig(save_path, dpi=200, bbox_inches="tight", pad_inches=0)
    plt.close("all")


def main(args=None, argv=None):
    from tmat_tpu.core.compile_cache import enable_persistent_cache
    from tmat_tpu.parallel.distributed import (
        is_multiprocess,
        is_primary,
        maybe_initialize_from_env,
        merge_striped_rows,
        process_index,
        stripe,
    )

    # multi-host runs set TMAT_TPU_COORDINATOR (+ process id/count, or
    # TPU-pod auto-detection); must run before the backend is touched
    maybe_initialize_from_env()
    enable_persistent_cache()

    default_config_path = str(defs.default_config_path(DEFAULT_CONFIG_NAME))
    arg_defaults = {"default_config_path": default_config_path}

    if args is None:
        args = su.parse_branching_args(arg_defaults, argv)
        config = load_tool_config(args.config, Path(default_config_path))
    else:
        config = {}

    args_dict = vars(args)
    config = merge_cli_overrides(
        config,
        args_dict,
        (
            "image_width_microns",
            "graph_thresh_1",
            "graph_thresh_2",
            "graph_smoothing_window",
            "min_branch_length",
            "max_branch_length",
            "remove_isolated_branches",
        ),
    )

    model_cfg_path = args_dict.get("model_cfg_path") or config.get("model_cfg_path")
    if not model_cfg_path:
        cfg_dir = Path(defs.model_training_path("binary_segmentation")) / "configs"
        last_exp = 0
        for file in cfg_dir.glob("unet_patch_segmentor_*.json"):
            try:
                last_exp = max(last_exp, int(file.stem.split("_")[-1]))
            except ValueError:
                continue
        model_cfg_path = str(cfg_dir / f"unet_patch_segmentor_{last_exp}.json")

    if not Path(model_cfg_path).is_file():
        print(
            f"{SFM.failure}Model config file {model_cfg_path} does not exist.",
            flush=True,
        )
        sys.exit(1)

    su.check_input_dir_structure(args.in_root)
    input_dir = Path(args.in_root)
    try:
        su.verify_output_dir(args.out_root)
    except PermissionError as error:
        print(f"{SFM.failure} {error}", flush=True)
        sys.exit(1)

    img_paths = su.resolve_image_paths(args.in_root)
    if len(img_paths) == 0:
        print(f"{SFM.failure}No images found in {input_dir}", flush=True)
        sys.exit(1)

    model = get_unet_patch_segmentor_from_cfg(model_cfg_path)
    if args_dict.get("tta"):
        # opt-in fast mode for the 2-D tiled UNet (same contract as
        # process_plate's --tta; plate_pipeline.py main). GUI-dispatched
        # namespaces bypass argparse choices — re-validate here.
        if int(args_dict["tta"]) not in (1, 4, 8):
            print(
                f"{SFM.failure} Invalid tta value: {args_dict['tta']!r} "
                "(choose 1, 4 or 8)",
                flush=True,
            )
            sys.exit(2)
        model.tta = int(args_dict["tta"])

    config["time"] = args.time
    config["channel"] = args.channel
    # GUI-dispatched namespaces predate --no-vis; default to saving
    config["save_vis"] = not args_dict.get("no_vis", False)
    output_dir = Path(args.out_root)
    created_csv_files = set()

    section_header("Performing Analysis")
    # multi-host scale-out: each process analyzes a round-robin stripe of
    # the images (per-image vis PNGs are written by their owner); CSV rows
    # are gathered and written by the primary in discovery order
    su.check_striped_discovery(list(img_paths))
    multi = is_multiprocess()
    gathered_rows: list = []
    stripe_error = None
    for gidx, (img_id, img_files) in stripe(enumerate(img_paths.items())):
        sink = None
        if multi:
            sink = lambda ts, fields, g=gidx: gathered_rows.append((g, ts, fields))
        kwargs = dict(use_well_mask=args.detect_well, row_sink=sink)
        if not multi:
            analyze_img(
                img_id, img_files, model, output_dir, config,
                created_csv_files, **kwargs,
            )
            continue
        try:
            analyze_img(
                img_id, img_files, model, output_dir, config,
                created_csv_files, **kwargs,
            )
        except SystemExit as e:
            # do NOT die alone: peers would hang in the row gather below;
            # fail together after the merge reports the error
            stripe_error = (
                f"process {process_index()}: analyzing {img_id} exited "
                f"with code {e.code}"
            )
            break
        except Exception as e:  # unreadable file, metadata error, ...
            traceback.print_exc()
            stripe_error = f"process {process_index()}: {img_id}: {e}"
            break

    if multi:
        # rows arrive sorted by global image index; append_csv_row routes
        # each to its sweep config's CSV, so per-CSV discovery order holds
        merged, errors = merge_striped_rows(gathered_rows, stripe_error)
        if errors:
            for e in errors:
                print(f"{SFM.failure} {e}", flush=True)
            sys.exit(1)
        if is_primary():
            for _, tuned_str, fields in merged:
                append_csv_row(output_dir, tuned_str, fields, created_csv_files)

    if is_primary():
        cfg_path = tio.get_unique_output_filepath(output_dir / "config.json")
        with open(cfg_path, "w", encoding="utf8") as f:
            json.dump(
                {k: v for k, v in config.items() if v is not None}, f, indent=4
            )

    print(f"{SFM.success} Analysis complete.", flush=True)
    section_footer()


if __name__ == "__main__":
    main()
