"""Predict depths of invasion in input directory of Z-stacks or Z-projections.

Analyzes invasion depth with an ensemble of ResNet50 classifiers: for every
Z slice of each stack, each ensemble member predicts invasion probability;
the mean probability is thresholded at cls_thresh. CLI surface and CSV
output (invasion_depth_predictions.csv with Z Slice ID / Invasion
Probability / Invasion Prediction columns) match the reference
scripts/compute_inv_depth.py:31-187.

TPU-first: ensemble members are a stacked parameter pytree; all members x
all Z slices run as ONE vmapped device call per stack instead of the
reference's n_models sequential Keras predicts. Slice preprocessing
(resize/rescale/3-channel/caffe) is a single jitted batch op.
"""

from __future__ import annotations

import csv
import json
import os
import sys
from pathlib import Path

import numpy as np

from tmat_tpu.core import defs, io as tio
from tmat_tpu.core.log import SFM, section_footer, section_header
from tmat_tpu.models.preprocess import prep_inv_depth_imgs_hybrid
from tmat_tpu.models.resnet import (
    build_resnet50_tl,
    make_ensemble_apply,
    stack_ensemble_variables,
)
from tmat_tpu.models.params_io import load_params
from tmat_tpu.tools import args as su

DEFAULT_CONFIG_NAME = "default_invasion_depth_computation.json"


def _rank_models_by_history(ensemble_dir: Path, n_models: int) -> np.ndarray:
    """Rank members by best fine-tune val_loss (compute_inv_depth.py:86-92).

    Falls back to identity order when histories are absent.
    """
    best_val_losses = np.full(n_models, np.inf)
    for i in range(n_models):
        hist = ensemble_dir / f"best_model_history_{i}.csv"
        if not hist.is_file():
            continue
        with open(hist) as fp:
            rows = [r for r in csv.DictReader(fp) if r.get("training_stage") == "finetune"]
        if rows:
            best_val_losses[i] = min(float(r["val_loss"]) for r in rows)
    if np.isinf(best_val_losses).all():
        return np.arange(n_models)
    return best_val_losses.argsort()


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
    if args is None:
        args = su.parse_inv_depth_args(
            {"default_config_path": default_config_path}, argv
        )

    su.check_input_dir_structure(args.in_root)

    try:
        su.verify_output_dir(args.out_root)
    except PermissionError as e:
        print(f"{SFM.failure} {e}", flush=True)
        sys.exit(1)

    section_header("Loading Classifier")

    with open(defs.model_training_path("invasion_depth_best_hp.json")) as fp:
        best_hp = json.load(fp)
    with open(defs.model_training_path("invasion_depth_training_values.json")) as fp:
        training_values = json.load(fp)

    cls_thresh = training_values["cls_thresh"]
    resnet_inp_shape = tuple(training_values["resnet_inp_shape"])
    n_models = training_values["n_models"]
    last_resnet_layer = best_hp["last_resnet_layer"]

    # honor an explicit config from either entry path (CLI flag or the
    # GUI's Config-file field; compute_branches.py applies the same rule)
    config_path = getattr(args, "config", None) or default_config_path
    try:
        config = su.verify_config_file(config_path)
    except FileNotFoundError as e:
        print(f"{SFM.failure} {e}", flush=True)
        sys.exit(1)
    n_pred_models = config["n_pred_models"]
    if n_pred_models > n_models:
        print(
            f"{SFM.failure} n_pred_models ({n_pred_models}) cannot exceed "
            f"n_models ({n_models}).",
            flush=True,
        )
        sys.exit(1)

    ensemble_dir = Path(defs.model_training_path("best_ensemble"))
    ranked = _rank_models_by_history(ensemble_dir, n_models)

    from tmat_tpu.models import default_infer_dtype

    # bf16 inference on TPU (params stay f32 in the checkpoint; the MXU
    # runs the convs in bfloat16 like the segmentor's tiled path)
    infer_dtype = default_infer_dtype()
    model, template = build_resnet50_tl(
        1, resnet_inp_shape, base_last_layer=last_resnet_layer, dtype=infer_dtype,
        init="zeros",  # checkpoints overwrite every value; skip eager init
    )
    member_vars = []
    for i in range(n_pred_models):
        idx = int(ranked[i])
        ckpt = ensemble_dir / f"best_finetune_weights_{idx}.msgpack"
        if not ckpt.is_file():
            print(
                f"{SFM.failure} Ensemble checkpoint not found: {ckpt}\n"
                f"{SFM.info} Train the ensemble with "
                f"{SFM.highlight('python -m tmat_tpu.models.train_invasion')} "
                "or place converted checkpoints in that directory.",
                flush=True,
            )
            sys.exit(1)
        print(f"Loading classifier {i}...", flush=True)
        member_vars.append(load_params(ckpt, template))
        print(f"... Classifier {i} loaded.", flush=True)

    stacked = stack_ensemble_variables(member_vars)
    ensemble_apply = make_ensemble_apply(model)

    print("All classifiers loaded.", flush=True)
    print(SFM.success, flush=True)
    section_footer()

    section_header("Making Predictions")

    zstack_paths = su.resolve_image_paths(args.in_root)
    if not zstack_paths:
        print(f"{SFM.failure} No Z stacks found in {args.in_root}", flush=True)
        sys.exit(1)

    inv_id_col = "Z Slice ID"
    inv_prob_col = "Invasion Probability"
    inv_pred_col = "Invasion Prediction (0=no 1=yes)"
    rows = []  # (stack's global index, row dict); index orders the CSV

    # multi-host scale-out: each process predicts a round-robin stripe of
    # the stacks; the shared CSV is assembled on the primary process from
    # all-gathered rows (parallel/distributed.py)
    su.check_striped_discovery(list(zstack_paths))
    my_stacks = stripe(enumerate(zstack_paths.items()))

    # Async dispatch with a bounded window: stack i+k's host resize,
    # transfer and prep overlap stack i's forwards, while at most
    # MAX_IN_FLIGHT stacks' inputs stay alive on device (an unbounded
    # queue would hold every stack's buffers on a slow backend)
    from collections import deque

    MAX_IN_FLIGHT = 8
    pending: deque = deque()

    def collect_one():
        gidx, zstack_id, yhat_members = pending.popleft()
        yhatp = np.asarray(yhat_members).mean(axis=0).squeeze(-1)
        for z in range(len(yhatp)):
            inv_prob = round(float(yhatp[z]), 4)
            rows.append(
                (
                    gidx,
                    {
                        inv_id_col: f"{zstack_id}_z{z}",
                        inv_prob_col: inv_prob,
                        inv_pred_col: int(inv_prob > cls_thresh),
                    },
                )
            )

    stripe_error = None
    for gidx, (zstack_id, zstack_path) in my_stacks:
        print(f"Processing {zstack_id}...", flush=True)
        try:
            img, _ = tio.load_image(zstack_path, args.time, args.channel)
        except OSError as error:
            print(f"{SFM.failure}{error}", flush=True)
            if is_multiprocess():
                # do NOT exit: peers would block in the row gather below;
                # record the failure and fail together after the merge
                stripe_error = f"process {process_index()}: {error}"
                break
            sys.exit(1)
        # host Lanczos-4 resize (the reference's cv2 kernel) + fused
        # device tail: 2.2x ingest throughput over the all-device prep
        # on the profiled TPU stack (BASELINE.md round-3)
        x = prep_inv_depth_imgs_hybrid(np.asarray(img), resnet_inp_shape[:-1])
        # (k, Z, 1) member predictions -> mean over members. Weights are
        # an ARGUMENT of the vmapped forward (not baked-in constants), so
        # the AOT executable cache key needs only the architecture +
        # shapes, not a checkpoint fingerprint (core/aot_cache.py).
        from tmat_tpu.core.aot_cache import aot_call

        yhat = aot_call(
            ensemble_apply,
            (stacked, x),
            (
                "inv_depth_ensemble",
                n_pred_models,
                tuple(resnet_inp_shape),
                last_resnet_layer,
                str(infer_dtype),
                tuple(x.shape),
            ),
            label="inv_depth",
        )
        pending.append((gidx, zstack_id, yhat))
        if len(pending) >= MAX_IN_FLIGHT:
            collect_one()
    while pending:
        collect_one()

    # primary assembles every process's rows in discovery order (rows
    # within a stack stay in z order: the sort is stable); a caught
    # failure propagates through the same gather so every process exits
    # together instead of peers hanging in the collective
    merged, errors = merge_striped_rows(rows, stripe_error)
    if errors:
        for e in errors:
            print(f"{SFM.failure} {e}", flush=True)
        sys.exit(1)
    if is_primary():
        print("Saving results...", flush=True)
        out_csv_path = os.path.join(args.out_root, "invasion_depth_predictions.csv")
        out_csv_path = tio.get_unique_output_filepath(out_csv_path)
        with open(out_csv_path, "w", newline="") as f:
            writer = csv.DictWriter(
                f, fieldnames=[inv_id_col, inv_prob_col, inv_pred_col]
            )
            writer.writeheader()
            writer.writerows(row for _, row in merged)
        print("... Results saved.", flush=True)
    print(SFM.success, flush=True)
    section_footer()


if __name__ == "__main__":
    main()
