"""Evaluate a trained patch segmentor on a directory of images.

Runnable replacement for the reference's manual evaluation notebook
(test_binary_segmentation.ipynb, SURVEY §2.6): loads the segmentor from a
numbered config, predicts each image via the fused tiled pipeline, and
saves side-by-side image / prediction / thresholded panels. When masks are
present (``*_mask`` suffix) it also reports mean IoU @ 0.5.

Usage:
    python -m tmat_tpu.models.eval_segmentation IMG_DIR OUT_DIR
        [--model-cfg PATH] [--mask-suffix _mask.tif]
"""

from __future__ import annotations

import argparse
from glob import glob
from pathlib import Path

import numpy as np

from tmat_tpu.core import defs, io as tio
from tmat_tpu.models.registry import get_last_exp_num
from tmat_tpu.models.unet import get_unet_patch_segmentor_from_cfg


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("img_dir", type=str)
    p.add_argument("out_dir", type=str)
    p.add_argument("--model-cfg", type=str, default=None)
    p.add_argument("--mask-suffix", type=str, default="_mask.tif")
    p.add_argument("--img-suffix", type=str, default=".tif")
    args = p.parse_args(argv)

    model_cfg = args.model_cfg
    if not model_cfg:
        cfg_dir = Path(defs.model_training_path("binary_segmentation")) / "configs"
        model_cfg = str(cfg_dir / f"unet_patch_segmentor_{get_last_exp_num()}.json")
    segmentor = get_unet_patch_segmentor_from_cfg(model_cfg)

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    img_paths = sorted(
        fp
        for fp in glob(str(Path(args.img_dir) / f"*{args.img_suffix}"))
        if not fp.endswith(args.mask_suffix)
    )
    if not img_paths:
        raise FileNotFoundError(f"No images in {args.img_dir}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ious = []
    for fp in img_paths:
        img, _ = tio.load_image(fp)
        if img.ndim == 3:
            img = img.max(0)
        pred = segmentor.predict(np.asarray(img, np.float32))
        thresh = pred > 0.5

        mask_path = fp.replace(args.img_suffix, args.mask_suffix)
        mask = None
        if Path(mask_path).is_file():
            mask = np.asarray(tio.load_image(mask_path)[0]) > 0
            inter = (thresh & mask).sum()
            union = (thresh | mask).sum()
            ious.append((inter + 1) / (union + 1))

        n_panels = 3 + (mask is not None)
        fig, axes = plt.subplots(1, n_panels, figsize=(4 * n_panels, 4))
        for ax, (panel, title) in zip(
            axes,
            [(img, "image"), (pred, "prediction"), (thresh, "threshold 0.5")]
            + ([(mask, "ground truth")] if mask is not None else []),
        ):
            ax.imshow(panel, cmap="gray")
            ax.set_title(title)
            ax.set_axis_off()
        panel_path = out_dir / f"{Path(fp).stem}_eval.png"
        fig.savefig(panel_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        print(f"{Path(fp).name} -> {panel_path}", flush=True)

    if ious:
        print(f"mean IoU @0.5 over {len(ious)} images: {np.mean(ious):.4f}", flush=True)


if __name__ == "__main__":
    main()
