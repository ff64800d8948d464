"""Input preprocessing for the invasion-depth classifier.

Parity target: fl_tissue_model_tools/data_prep.py:17-61 — per-slice LANCZOS
resize to the classifier input size, rescale to 0-255, replicate grayscale
to 3 channels, then Keras resnet50.preprocess_input (caffe mode: RGB->BGR +
ImageNet mean subtraction).

TPU-first: the whole Z stack is preprocessed in one jitted batched call
instead of the reference's per-slice dask threads.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tmat_tpu.ops.rescale import rescale_intensity
from tmat_tpu.ops.resize import resize

# Keras caffe-mode ImageNet means (BGR order). numpy on purpose: a
# module-level jnp.array costs an eager device convert (one remote XLA
# compile per process) at import time; traced code embeds it either way.
_CAFFE_MEAN_BGR = np.array([103.939, 116.779, 123.68], np.float32)


def resnet50_preprocess(x: jax.Array) -> jax.Array:
    """Keras resnet50.preprocess_input: RGB->BGR, subtract ImageNet means."""
    x = x.astype(jnp.float32)
    x = x[..., ::-1]
    return x - _CAFFE_MEAN_BGR


@partial(jax.jit, static_argnames=("img_hw",))
def prep_inv_depth_imgs(images: jax.Array, img_hw: Tuple[int, int]) -> jax.Array:
    """Preprocess a (Z, H, W) stack to classifier inputs (Z, h, w, 3).

    Each slice is rescaled to its own 0-255 range (data_prep.py:36).
    """
    images = images.astype(jnp.float32)
    if images.ndim == 2:
        images = images[None]
    resized = resize(images, tuple(img_hw), "lanczos4")
    rescaled = jax.vmap(lambda im: rescale_intensity(im, out_range=(0, 255)))(resized)
    three_ch = jnp.repeat(rescaled[..., None], 3, axis=-1)
    return resnet50_preprocess(three_ch)


@jax.jit
def _prep_resized(resized: jax.Array) -> jax.Array:
    """Device tail of the hybrid prep: per-slice 0-255 rescale, 3-channel
    replication, caffe-mode normalization (data_prep.py:36-61) — one
    program; the f32 cast happens ON DEVICE so integer slices transfer in
    their native dtype (a host-side astype would quadruple the H2D)."""
    rescaled = jax.vmap(lambda im: rescale_intensity(im, out_range=(0, 255)))(
        resized.astype(jnp.float32)
    )
    three_ch = jnp.repeat(rescaled[..., None], 3, axis=-1)
    return resnet50_preprocess(three_ch)


def prep_inv_depth_imgs_hybrid(images, img_hw: Tuple[int, int]) -> jax.Array:
    """prep_inv_depth_imgs with the Lanczos-4 resize on the HOST.

    2.2x the ingest throughput on the profiled TPU stack (the device
    resize program + its dispatch dominated the current path; BASELINE.md
    round-3 H2D section) and exactly the cv2 INTER_LANCZOS4 kernel the
    reference uses (resize_lanczos4_host). The device still does the
    rescale/replicate/normalize tail in one fused program.
    """
    import numpy as np

    from tmat_tpu.ops.resize import resize_lanczos4_host

    images = np.asarray(images)
    if images.ndim == 2:
        images = images[None]
    resized = resize_lanczos4_host(images, tuple(img_hw))
    if np.issubdtype(images.dtype, np.integer):
        # cv2.resize preserves integer dtypes (round + saturate), so for
        # integer microscopy stacks the integer slices ARE the reference's
        # resize output (up to .5-tie rounding direction) — and uint8 H2D
        # is 4x fewer bytes than f32 on the transfer-bound ingest path
        info = np.iinfo(images.dtype)
        resized = np.clip(np.rint(resized), info.min, info.max).astype(
            images.dtype
        )
    # the fused device tail closes over no weights: serve it from the
    # cross-process AOT executable cache keyed on geometry alone
    from tmat_tpu.core.aot_cache import aot_call

    return aot_call(
        _prep_resized,
        (resized,),
        ("inv_prep_tail", tuple(resized.shape), str(resized.dtype)),
        label="inv_prep",
    )
