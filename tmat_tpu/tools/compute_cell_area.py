"""Compute cell coverage area in a directory of Z-stacks or Z-projections.

If 3-D data is provided, a maximum-intensity Z projection is applied before
the area calculation. CLI surface and outputs (thresholded/{id}_thresholded
.png, optional {id}_well_mask.png, calculations/cell_area.csv with
image_id/area_pct columns) match the reference scripts/compute_cell_area.py.

TPU-first design: instead of the reference's dask-thread fan-out of per-image
sklearn GMM fits, images in a batch are stacked by shape and the rescale +
masked GMM-EM threshold + area reduction run as ONE vmapped jit per shape
bucket (ops/threshold.py). Well masks are the device pipeline in
ops/wellmask.py.
"""

from __future__ import annotations

import csv
import os
import sys
from collections import defaultdict

import jax.numpy as jnp
import numpy as np

from tmat_tpu.core import defs, io as tio
from tmat_tpu.core.log import SFM, END_SEPARATOR, section_footer, section_header
from tmat_tpu.ops.rescale import rescale_intensity
from tmat_tpu.ops.resize import downsample_max_dim_shape, resize
from tmat_tpu.ops.threshold import exec_threshold, exec_threshold_batch
from tmat_tpu.ops.wellmask import generate_well_mask
from tmat_tpu.tools import args as su

THRESH_SUBDIR = "thresholded"
CALC_SUBDIR = "calculations"
DEFAULT_CONFIG_NAME = "default_cell_area_computation.json"


# geometry-keyed (convert -> linear resize) closures: the eager
# jnp.asarray + resize pair cost two per-process device compiles per
# input geometry (cold-start census, BASELINE.md round 4b)
_RESIZE_JITS: dict = {}


def _resize_f32_aot(img: np.ndarray, target) -> np.ndarray:
    import jax

    from tmat_tpu.core.aot_cache import aot_call

    key = (tuple(img.shape), str(img.dtype), tuple(target))
    fn = _RESIZE_JITS.get(key)
    if fn is None:
        fn = _RESIZE_JITS[key] = jax.jit(
            lambda x: resize(x.astype(jnp.float32), tuple(target), "linear")
        )
    return np.asarray(
        aot_call(fn, (img,), ("cell_area_resize",) + key, label="cell_area")
    )


def load_img(img_path, dsamp_size=None, T=None, C=None) -> np.ndarray:
    """Load, max-project if 3-D, and downsample (compute_cell_area.py:29-57)."""
    img = tio.load_image(img_path, T, C)[0]
    if img.ndim == 3:
        img = img.max(0)
    if dsamp_size is not None:
        target = downsample_max_dim_shape(img.shape, dsamp_size)
        img = _resize_f32_aot(img, target)
    return img


# per-(shape, masked, dtype) jit closures: the rescale + mask + GMM-EM
# threshold chain runs as ONE device program (dispatch latency through
# remote TPU runtimes is per-program), served from the cross-process AOT
# executable cache (no closed-over weights — geometry-keyed is safe)
_MT_JITS: dict = {}


def mask_and_threshold(img, sd_coef, well_mask=None) -> np.ndarray:
    """Rescale to [0,1], mask, GMM-threshold, binarize
    (compute_cell_area.py:60-87)."""
    import jax

    from tmat_tpu.core.aot_cache import aot_call

    img = jnp.asarray(img)
    masked = well_mask is not None
    key = (tuple(img.shape), img.dtype.name, masked)
    fn = _MT_JITS.get(key)
    if fn is None:
        if masked:
            def core(x, wm, coef):
                x = rescale_intensity(x.astype(jnp.float32), out_range=(0, 1))
                x = jnp.where(wm > 0, x, 0.0)
                return exec_threshold(x, wm, coef)
        else:
            def core(x, coef):
                x = rescale_intensity(x.astype(jnp.float32), out_range=(0, 1))
                return exec_threshold(x, None, coef)
        fn = _MT_JITS[key] = jax.jit(core)
    # np.float32 on purpose: jnp.float32(x) eagerly converts on device —
    # one more per-process compile; a host scalar enters the jit with the
    # identical f32[] aval
    if masked:
        args = (img, jnp.asarray(well_mask), np.float32(sd_coef))
    else:
        args = (img, np.float32(sd_coef))
    out = aot_call(fn, args, ("cell_area_mt",) + key, label="cell_area")
    return (np.asarray(out) > 0).astype(np.uint8) * defs.MAX_UINT8


def main(args=None, argv=None):
    from tmat_tpu.core.compile_cache import enable_persistent_cache
    from tmat_tpu.parallel.distributed import (
        is_multiprocess,
        is_primary,
        maybe_initialize_from_env,
        merge_striped_rows,
        process_index,
        stripe,
        sync_processes,
    )

    # multi-host runs set TMAT_TPU_COORDINATOR (+ process id/count, or
    # TPU-pod auto-detection); must run before the backend is touched
    maybe_initialize_from_env()
    enable_persistent_cache()

    """Computes cell area and saves to output directory."""
    default_config_path = str(defs.default_config_path(DEFAULT_CONFIG_NAME))
    if args is None:
        args = su.parse_cell_area_args(
            {"default_config_path": default_config_path}, argv
        )
        args_prespecified = False
    else:
        args_prespecified = True

    all_img_paths = su.cell_area_verify_input_dir(args.in_root)

    # every process must finish reading the input listing before any
    # process mutates out_root: the zproj --area chain reuses out_root as
    # in_root, and a fast peer's verify_output_dir would otherwise create
    # the thresholded/ + calculations/ subdirs mid-discovery and trip the
    # files-XOR-dirs check on a lagging process (no-op single-process)
    sync_processes("cell_area input discovered")

    try:
        su.verify_output_dir(args.out_root, [THRESH_SUBDIR, CALC_SUBDIR])
    except PermissionError as error:
        print(f"{SFM.failure} {error}", flush=True)
        sys.exit(1)

    config_path = (
        default_config_path
        if args_prespecified or getattr(args, "config", None) is None
        else args.config
    )
    try:
        config = su.verify_config_file(config_path)
    except FileNotFoundError as error:
        print(f"{SFM.failure} {error}", flush=True)
        sys.exit(1)

    section_header("Performing Analysis")

    dsamp_size = config["dsamp_size"]
    cli_sd_coef = getattr(args, "sd_coef", None)
    sd_coef = config["sd_coef"] if cli_sd_coef is None else cli_sd_coef
    batch_size = config["batch_size"]
    detect_well = getattr(args, "detect_well", False)
    rs_seed = config.get("rs_seed", 0)
    rs_seed = 0 if rs_seed in (None, "None") else int(rs_seed)

    # multi-host scale-out: each process owns a round-robin stripe of the
    # (deterministically discovered) image list; per-image PNGs are
    # written by their owner, and the shared CSV is assembled on the
    # primary process from all-gathered rows (parallel/distributed.py)
    su.check_striped_discovery(list(all_img_paths))
    indexed_items = stripe(list(enumerate(all_img_paths.items())))
    global_idxs = [i for i, _ in indexed_items]
    img_ids = [k for _, (k, _) in indexed_items]
    img_path_list = [v for _, (_, v) in indexed_items]

    if img_path_list:
        test_img_path = np.atleast_1d(img_path_list[0])[0]
        if tio.get_image_dims(test_img_path).Z > 1:
            print(
                f"{SFM.warning} Input images are Z stacks. Creating maximum "
                "intensity Z projections prior to cell area calculation.",
                flush=True,
            )

    area_prop = []
    gmm_thresh_all = []
    all_well_masks = []
    stripe_error = None

    def chunks(lst, n):
        for i in range(0, len(lst), n):
            yield lst[i : i + n]

    for batch_paths in chunks(list(img_path_list), batch_size):
        try:
            imgs = [
                load_img(p, dsamp_size=dsamp_size, T=args.time, C=args.channel)
                for p in batch_paths
            ]
        except OSError as error:
            print(f"{SFM.failure}{error}", flush=True)
            if is_multiprocess():
                # do NOT exit: peers would block in the row gather below.
                # Record the failure; every process exits together after
                # the merge sees it (coordinated failure).
                stripe_error = f"process {process_index()}: {error}"
                break
            sys.exit(1)

        if detect_well:
            well_masks = [
                generate_well_mask(img, mask_val=defs.MAX_UINT8, seed=rs_seed)
                for img in imgs
            ]
            well_areas = [int((wm > 0).sum()) for wm in well_masks]
        else:
            well_masks = [None] * len(imgs)
            well_areas = [None] * len(imgs)
        all_well_masks.extend(well_masks)

        # Bucket same-shape images so each bucket is ONE vmapped device call.
        # NOTE (multi-process determinism): striping changes bucket sizes, so
        # an image can take the singleton program in one world and the
        # vmapped batch program in another. On the CPU backend the two
        # lower to bitwise-equal results (test_distributed_tools pins CSV
        # byte-identity); on TPU a differently-tiled GMM reduction may
        # differ in the last ULP. Cross-process results are exact in
        # structure and float-tolerant in the last digit — documented
        # rather than engineered around (forcing singleton programs
        # everywhere would cost the batched path its dispatch savings).
        buckets = defaultdict(list)
        for i, img in enumerate(imgs):
            buckets[img.shape].append(i)
        thresholded = [None] * len(imgs)
        for shape, idxs in buckets.items():
            if detect_well or len(idxs) == 1:
                for i in idxs:
                    thresholded[i] = mask_and_threshold(
                        imgs[i], sd_coef, well_masks[i]
                    )
            else:
                import jax

                from tmat_tpu.core.aot_cache import aot_call

                stack = np.stack([imgs[i] for i in idxs])
                # rescale folded INTO the batched program ("batch2" key:
                # the body changed) — the eager per-image rescale chain
                # dispatched ~8 device programs per process
                key = (tuple(stack.shape), str(stack.dtype))
                fn = _MT_JITS.get(("batch",) + key)
                if fn is None:
                    def core(x, coef):
                        x = jax.vmap(
                            lambda im: rescale_intensity(
                                im.astype(jnp.float32), out_range=(0, 1)
                            )
                        )(x)
                        return exec_threshold_batch(x, jnp.ones_like(x), coef)

                    fn = _MT_JITS[("batch",) + key] = jax.jit(core)
                out = np.asarray(
                    aot_call(
                        fn,
                        (stack, np.float32(sd_coef)),
                        ("cell_area_batch2",) + key,
                        label="cell_area",
                    )
                )
                for j, i in enumerate(idxs):
                    thresholded[i] = (out[j] > 0).astype(np.uint8) * defs.MAX_UINT8

        gmm_thresh_all.extend(thresholded)
        for i, timg in enumerate(thresholded):
            ref_area = well_areas[i] if well_areas[i] is not None else timg.size
            area_prop.append(float((timg > 0).sum()) / ref_area)

    area_prop = np.array(area_prop)
    print("... Areas computed successfully.", flush=True)
    print(SFM.success, flush=True)
    section_footer()

    section_header("Saving Results...")
    clean_ids = [i.replace("/", "_").replace("\\", "_") for i in img_ids]
    if stripe_error is not None:
        # caught failure mid-stripe: keep only the completed images (the
        # run still fails below, after every process joins the gather)
        clean_ids = clean_ids[: len(gmm_thresh_all)]

    for i, img_id in enumerate(clean_ids):
        if detect_well:
            file = os.path.join(args.out_root, THRESH_SUBDIR, f"{img_id}_well_mask.png")
            tio.save_image(tio.get_unique_output_filepath(file), all_well_masks[i])
        file = os.path.join(args.out_root, THRESH_SUBDIR, f"{img_id}_thresholded.png")
        tio.save_image(tio.get_unique_output_filepath(file), gmm_thresh_all[i])

    # gather (original-order index, id, value) rows from every process so
    # the primary holds the complete CSV even on non-shared storage; the
    # single-process path degenerates to its own rows. A process that
    # caught a failure contributes its error instead of exiting mid-run
    # (peers would hang in this collective); everyone exits together.
    rows = [
        (gi, cid, prop * 100)
        for gi, cid, prop in zip(global_idxs, clean_ids, area_prop)
    ]
    merged, errors = merge_striped_rows(rows, stripe_error)
    if errors:
        for e in errors:
            print(f"{SFM.failure} {e}", flush=True)
        sys.exit(1)
    if is_primary():
        area_out_path = os.path.join(args.out_root, CALC_SUBDIR, "cell_area.csv")
        area_out_path = tio.get_unique_output_filepath(area_out_path)
        with open(area_out_path, "w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow(["image_id", "area_pct"])
            for _, img_id, pct in merged:
                writer.writerow([img_id, pct])

        print(
            f"... Area calculations saved to:{os.linesep}\t{area_out_path}",
            flush=True,
        )
    print(SFM.success, flush=True)
    print(END_SEPARATOR, flush=True)


if __name__ == "__main__":
    main()
