"""Flax model zoo + training harnesses.

Architectures mirror the reference's Keras builders (models.py:33-171) so
capabilities and checkpoints are interchangeable; execution is TPU-first:
NHWC layouts, optional bfloat16 compute, whole-plate batches, ensembles as
a stacked-parameter vmap axis.
"""

from tmat_tpu.models.unet import UNetXception, build_unet_xception, UNetXceptionPatchSegmentor, get_unet_patch_segmentor_from_cfg
from tmat_tpu.models.resnet import ResNet50TL, build_resnet50_tl
from tmat_tpu.models.params_io import save_params, load_params


def default_infer_dtype():
    """Production inference compute dtype: bfloat16 on accelerators (the
    MXU's native format — f32 ran the tools' models ~6x slower end-to-end
    through this TPU stack), float32 on CPU. Single source of truth for
    every inference entry point (tools, benches, segmentor configs)."""
    import jax
    import jax.numpy as jnp

    return jnp.bfloat16 if jax.devices()[0].platform != "cpu" else jnp.float32
