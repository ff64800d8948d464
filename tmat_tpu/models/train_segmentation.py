"""Train the UNet-Xception microvessel segmentor.

Runnable replacement for the reference's notebook workflow
(notebooks/microvessels_segmentation_training/train_binary_segmentation
.ipynb, SURVEY §2.6): image/mask pairing, seeded split, augmented batch
generator with fg/bg sample weights, optional filter-count x LR grid
search, final training with warmup + cosine-restarts AdamW, checkpoint +
numbered patch-segmentor config registration.

Usage:
    python -m tmat_tpu.models.train_segmentation IMG_DIR [--mask-dir ...]
        [--patch-size 320] [--filters 64 128 256 512] [--epochs 50]
        [--batch-size 16] [--lr 1e-3] [--ds-ratio 0.625] [--grid-search]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import optax

from tmat_tpu.core import defs
from tmat_tpu.core.io import get_img_mask_paths
from tmat_tpu.models import train as T
from tmat_tpu.models.augment import get_elastic_dual_transform, random_flip_rotate_crop
from tmat_tpu.models.data import BinaryMaskSequence, load_x, load_y
from tmat_tpu.models.registry import save_unet_patch_segmentor_cfg
from tmat_tpu.models.unet import build_unet_xception


def load_x_rescaled(batch_img_paths):
    """Images min-max rescaled to [0, 1] per image — the segmentor's
    inference contract (compute_branches rescales inputs to [0, 1] before
    predict, compute_branches.py:316)."""
    batch = load_x(batch_img_paths).astype(np.float32)
    lo = batch.min(axis=(1, 2), keepdims=True)
    hi = batch.max(axis=(1, 2), keepdims=True)
    return (batch - lo) / np.maximum(hi - lo, 1e-38)


def make_augmentor(rs, patch_size, crop_size=None):
    geo = random_flip_rotate_crop(rs, crop_size=crop_size, out_size=patch_size)
    elastic = get_elastic_dual_transform(rs=rs, p=0.85)

    def batch_aug(images, masks):
        images, masks = geo(images, masks)
        out_i, out_m = [], []
        for img, msk in zip(images, masks):
            res = elastic(img, msk)
            out_i.append(res["image"])
            out_m.append(res["mask"])
        return np.array(out_i), np.array(out_m)

    return batch_aug


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("img_dir", type=str)
    p.add_argument("--mask-dir", type=str, default=None)
    p.add_argument("--img-suffix", type=str, default=".tif")
    p.add_argument("--mask-suffix", type=str, default="_mask.tif")
    p.add_argument("--patch-size", type=int, default=320)
    p.add_argument("--filters", type=int, nargs="+", default=[64, 128, 256, 512])
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--warmup-steps", type=int, default=100)
    p.add_argument("--val-split", type=float, default=0.2)
    p.add_argument("--ds-ratio", type=float, default=0.625)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--fg-weight", type=float, default=1.0)
    p.add_argument("--bg-weight", type=float, default=1.0)
    p.add_argument("--grid-search", action="store_true")
    p.add_argument("--patience", type=int, default=25)
    p.add_argument("--bn-momentum", type=float, default=0.9)
    args = p.parse_args(argv)

    rs = np.random.RandomState(args.seed)
    pairs = get_img_mask_paths(
        args.img_dir, args.mask_dir, args.img_suffix, args.mask_suffix
    )
    rs.shuffle(pairs)
    n_val = max(1, round(len(pairs) * args.val_split))
    val_pairs, train_pairs = pairs[:n_val], pairs[n_val:]
    print(f"{len(train_pairs)} training / {len(val_pairs)} validation pairs")

    aug = make_augmentor(rs, args.patch_size)
    train_seq = BinaryMaskSequence(
        args.batch_size,
        [a for a, _ in train_pairs],
        [b for _, b in train_pairs],
        rs,
        load_x_rescaled,
        load_y,
        augmentation_function=aug,
        sample_weights=(args.bg_weight, args.fg_weight),
    )
    # validation batch can't exceed the split size (else zero batches and
    # the monitored val metric silently disappears)
    val_seq = BinaryMaskSequence(
        min(args.batch_size, max(len(val_pairs), 1)),
        [a for a, _ in val_pairs],
        [b for _, b in val_pairs],
        rs,
        load_x_rescaled,
        load_y,
        shuffle=False,
    )

    schedule = T.warmup_schedule(
        args.warmup_steps,
        T.cosine_decay_restarts(args.lr, max(args.epochs * len(train_seq) // 3, 1),
                                t_mul=1.0, m_mul=0.5),
    )

    def make_tx():
        return optax.adamw(schedule)

    if args.grid_search:
        search = T.UNetXceptionGridSearch(
            str(Path(defs.MODEL_TRAINING_DIR) / "binary_segmentation" / "search"),
            [tuple(args.filters), tuple(f // 2 for f in args.filters)],
            [make_tx],
            1,
            (args.patch_size, args.patch_size),
            bn_momentum=args.bn_momentum,
        )
        best_fc, best = search.search(
            "val_mean_iou_coef" if val_pairs else "mean_iou_coef",
            "max",
            lambda: iter(train_seq),
            (lambda: iter(val_seq)) if val_pairs else None,
            epochs=max(args.epochs // 5, 1),
        )
        print(f"Grid search best filters: {best_fc} (score {best})")
        filters = best_fc
    else:
        filters = tuple(args.filters)

    model, variables = build_unet_xception(
        1,
        (args.patch_size, args.patch_size),
        channels=1,
        filter_counts=filters,
        bn_momentum=args.bn_momentum,
    )
    tx = make_tx()
    state = T.init_train_state(variables, tx)
    step = T.make_unet_train_step(model, tx)
    eval_step = T.make_unet_eval_step(model)

    ckpt_dir = Path(defs.MODEL_TRAINING_DIR) / "binary_segmentation" / "checkpoints"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    from tmat_tpu.models.registry import get_last_exp_num

    exp_num = get_last_exp_num() + 1
    ckpt_path = ckpt_dir / f"checkpoint_{exp_num}.msgpack"

    state, result, best = T.fit(
        state,
        step,
        eval_step,
        lambda: iter(train_seq),
        (lambda: iter(val_seq)) if val_pairs else None,
        epochs=args.epochs,
        monitor="val_mean_iou_coef" if val_pairs else "mean_iou_coef",
        mode="max",
        patience=args.patience,
        checkpoint_path=str(ckpt_path),
        verbose=True,
    )

    cfg_path = save_unet_patch_segmentor_cfg(
        {
            "patch_size": args.patch_size,
            "checkpoint_file": ckpt_path.name,
            "filter_counts": list(filters),
            "ds_ratio": args.ds_ratio,
            "channels": 1,
        }
    )
    print(f"Saved checkpoint {ckpt_path} and config {cfg_path}")
    print(f"Best epoch {result.best_epoch}: {result.best_metric}")


if __name__ == "__main__":
    main()
