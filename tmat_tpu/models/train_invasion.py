"""Train the invasion-depth ResNet50-TL classifier ensemble.

Runnable replacement for the reference's notebook workflows
(invasion_depth_hp_search.ipynb + invasion_depth_train_ensemble.ipynb,
SURVEY §2.6): per-member reshuffled train/val split, two-stage
frozen -> fine-tune fit with early stopping, history CSVs compatible with
compute_inv_depth's member ranking (compute_inv_depth.py:86-92), and
best_finetune_weights_{i}.msgpack checkpoints.

Expected data layout: IMG_DIR/<class_name>/*.tif with class names matching
invasion_depth_training_values.json's class_labels
({"no_invasion": 0, "invasion": 1}).

Usage:
    python -m tmat_tpu.models.train_invasion IMG_DIR [--n-models 5]
        [--frozen-epochs 50] [--fine-tune-epochs 50] [--batch-size 32]
"""

from __future__ import annotations

import argparse
import csv
import json
from glob import glob
from pathlib import Path

import numpy as np

from tmat_tpu.core import defs
from tmat_tpu.models import train as T
from tmat_tpu.models.augment import augment_invasion_imgs
from tmat_tpu.models.data import InvasionDataGenerator, get_train_val_split
from tmat_tpu.models.params_io import save_params
from tmat_tpu.models.resnet import build_resnet50_tl


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("img_dir", type=str)
    p.add_argument("--n-models", type=int, default=None)
    p.add_argument("--frozen-epochs", type=int, default=None)
    p.add_argument("--fine-tune-epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--img-size", type=int, default=None)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--last-layer", type=str, default=None)
    p.add_argument(
        "--ckpt-dtype",
        choices=("float32", "float16"),
        default="float16",
        help=(
            "Storage dtype for saved member checkpoints; float16 halves "
            "artifact size and load_params casts back to float32."
        ),
    )
    p.add_argument(
        "--single-stage",
        action="store_true",
        help=(
            "Train all parameters in one stage. The reference's frozen->"
            "fine-tune recipe assumes an ImageNet-pretrained base; with a "
            "randomly initialized base (no pretrained weights bundled in "
            "this environment) the frozen stage trains a head on random "
            "features and wastes epochs."
        ),
    )
    args = p.parse_args(argv)

    with open(defs.model_training_path("invasion_depth_best_hp.json")) as fp:
        best_hp = json.load(fp)
    with open(defs.model_training_path("invasion_depth_training_values.json")) as fp:
        tv = json.load(fp)

    n_models = args.n_models or tv["n_models"]
    frozen_epochs = args.frozen_epochs or tv["frozen_epochs"]
    fine_tune_epochs = args.fine_tune_epochs or tv["fine_tune_epochs"]
    batch_size = args.batch_size or tv["batch_size"]
    img_hw = (
        (args.img_size, args.img_size)
        if args.img_size
        else tuple(tv["resnet_inp_shape"][:2])
    )
    last_layer = args.last_layer or best_hp["last_resnet_layer"]
    class_labels = tv["class_labels"]

    class_paths = {
        label: sorted(glob(str(Path(args.img_dir) / name / "*")))
        for name, label in class_labels.items()
    }
    for name, label in class_labels.items():
        if not class_paths[label]:
            raise FileNotFoundError(
                f"No images for class '{name}' under {args.img_dir}/{name}/"
            )

    out_dir = Path(defs.MODEL_TRAINING_DIR) / "best_ensemble"
    out_dir.mkdir(parents=True, exist_ok=True)

    for member in range(n_models):
        rs = np.random.RandomState(args.seed + member)
        shuffled = {
            k: list(np.array(v)[rs.permutation(len(v))])
            for k, v in class_paths.items()
        }
        train_paths, val_paths = get_train_val_split(shuffled, tv["val_split"])

        train_gen = InvasionDataGenerator(
            train_paths,
            class_labels,
            batch_size,
            img_hw,
            rs,
            class_weights=True,
            augmentation_function=lambda x, r: augment_invasion_imgs(x, r),
        )
        val_gen = InvasionDataGenerator(
            val_paths, class_labels, batch_size, img_hw, rs, shuffle=False
        )

        model, variables = build_resnet50_tl(
            1, (*img_hw, 3), base_last_layer=last_layer, seed=args.seed + member
        )
        print(f"=== Training ensemble member {member} ===", flush=True)
        state, frozen_res, ft_res = T.two_stage_tl_fit(
            model,
            variables,
            lambda: iter(train_gen),
            lambda: iter(val_gen),
            frozen_lr=best_hp["frozen_lr"],
            fine_tune_lr=best_hp["fine_tune_lr"],
            beta_1=best_hp["adam_beta_1"],
            beta_2=best_hp["adam_beta_2"],
            frozen_epochs=0 if args.single_stage else frozen_epochs,
            fine_tune_epochs=(
                frozen_epochs + fine_tune_epochs
                if args.single_stage
                else fine_tune_epochs
            ),
            patience=tv["early_stopping_patience"],
            min_delta=tv["early_stopping_min_delta"],
            verbose=True,
        )

        save_params(
            out_dir / f"best_finetune_weights_{member}.msgpack",
            {"params": state.params, "batch_stats": state.batch_stats},
            dtype=np.dtype(args.ckpt_dtype),
        )

        # History CSV with the reference's schema (ranking contract)
        hist_path = out_dir / f"best_model_history_{member}.csv"
        with open(hist_path, "w", newline="") as fp:
            writer = csv.DictWriter(
                fp,
                fieldnames=[
                    "loss",
                    "binary_accuracy",
                    "val_loss",
                    "val_binary_accuracy",
                    "training_stage",
                ],
            )
            writer.writeheader()
            for stage, res in (("frozen", frozen_res), ("finetune", ft_res)):
                n_epochs = len(res.history.get("loss", []))
                for e in range(n_epochs):
                    writer.writerow(
                        {
                            "loss": res.history["loss"][e],
                            "binary_accuracy": res.history.get(
                                "binary_accuracy", [0] * n_epochs
                            )[e],
                            "val_loss": res.history.get("val_loss", [""] * n_epochs)[e],
                            "val_binary_accuracy": res.history.get(
                                "val_binary_accuracy", [""] * n_epochs
                            )[e],
                            "training_stage": stage,
                        }
                    )
        print(f"Member {member} saved to {out_dir}", flush=True)


if __name__ == "__main__":
    main()
