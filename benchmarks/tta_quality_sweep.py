"""IoU-vs-TTA sweep across a synthetic eval set (VERDICT r3 weak #6).

The tta∈{8,4,1} fast modes of the tiled UNet (ops/tiled.py) shipped with a
single-plate quality measurement; this sweep quantifies the trade across a
diverse synthetic eval set so the BASELINE.md table users consult when
flipping `--tta` rests on more than one data point. For each eval image it
reports, per tta mode:

  - IoU of the thresholded mask against tta=8 (reference parity mode);
  - IoU against the synthetic ground-truth mask (does TTA actually help?);
  - Morse branch-count delta vs tta=8 at the tool's default thresholds.

Run: JAX_PLATFORMS=cpu python benchmarks/tta_quality_sweep.py [--n 12]
(quality, not speed — the CPU backend is fine and deterministic).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _eval_images(n: int, size: int):
    """Diverse (image float [0,1], gt bool) pairs: vessel density and
    contrast vary across the set (models/synthetic.py generator)."""
    from scipy import ndimage

    from tmat_tpu.models.synthetic import synth_vessel_image

    out = []
    for i in range(n):
        rng = np.random.RandomState(1000 + i)
        n_vessels = 2 + (i % 5)  # sparse..dense coverage
        img, mask = synth_vessel_image(rng, size=size, n_vessels=n_vessels)
        img_f = img.astype(np.float32) / 255.0
        if i % 3 == 2:  # low-contrast variant
            img_f = img_f * 0.5 + 0.1
        out.append((img_f, mask > 0, n_vessels))
    return out


def _iou(a: np.ndarray, b: np.ndarray) -> float:
    union = np.logical_or(a, b).sum()
    if union == 0:
        return 1.0  # two empty masks agree perfectly
    return float(np.logical_and(a, b).sum() / union)


def _branches(pred: np.ndarray) -> int:
    from tmat_tpu.topo.morse_native import morse_stats_native

    lo, hi = float(pred.min()), float(pred.max())
    if hi - lo < 1e-12:
        return 0
    scaled = (pred - lo) * np.float32(255.0 / (hi - lo))
    stats = morse_stats_native(
        scaled, thresholds=(5, 10), smoothing_window=12, min_branch_length=12
    )
    return int(stats[0]) if stats is not None else 0


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=12)
    parser.add_argument("--size", type=int, default=512)
    args = parser.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from tmat_tpu.core import defs
    from tmat_tpu.models.unet import UNetXceptionPatchSegmentor

    ckpt = Path(
        defs.model_training_path(
            "binary_segmentation/checkpoints/checkpoint_1.msgpack"
        )
    )
    if not ckpt.is_file():
        print("shipped checkpoint missing; nothing to sweep", file=sys.stderr)
        return 1

    images = _eval_images(args.n, args.size)
    rows = []
    preds = {}
    for tta in (8, 4, 1):
        seg = UNetXceptionPatchSegmentor(
            320, ckpt, (64, 128, 256, 512), ds_ratio=0.625, tta=tta
        )
        preds[tta] = [seg.predict(img) for img, _, _ in images]

    for i, (img, gt, n_vessels) in enumerate(images):
        m8 = preds[8][i] > 0.5
        b8 = _branches(preds[8][i])
        row = {
            "img": i,
            "n_vessels": n_vessels,
            "branches_tta8": b8,
            "gt_iou_tta8": _iou(m8, gt),
        }
        for tta in (4, 1):
            m = preds[tta][i] > 0.5
            row[f"iou_vs_tta8_tta{tta}"] = _iou(m, m8)
            row[f"gt_iou_tta{tta}"] = _iou(m, gt)
            row[f"branch_delta_tta{tta}"] = _branches(preds[tta][i]) - b8
        rows.append(row)
        print(json.dumps(row), flush=True)

    def col(key):
        return np.array([r[key] for r in rows], np.float64)

    summary = {
        "n_images": len(rows),
        "size": args.size,
        "iou_vs_tta8": {
            "tta4": {
                "mean": round(col("iou_vs_tta8_tta4").mean(), 4),
                "min": round(col("iou_vs_tta8_tta4").min(), 4),
            },
            "tta1": {
                "mean": round(col("iou_vs_tta8_tta1").mean(), 4),
                "min": round(col("iou_vs_tta8_tta1").min(), 4),
            },
        },
        "gt_iou_mean": {
            "tta8": round(col("gt_iou_tta8").mean(), 4),
            "tta4": round(col("gt_iou_tta4").mean(), 4),
            "tta1": round(col("gt_iou_tta1").mean(), 4),
        },
        "max_abs_branch_delta": {
            "tta4": int(np.abs(col("branch_delta_tta4")).max()),
            "tta1": int(np.abs(col("branch_delta_tta1")).max()),
        },
    }
    print("SUMMARY " + json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
