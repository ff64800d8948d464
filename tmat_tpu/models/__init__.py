"""Flax model zoo + training harnesses.

Architectures mirror the reference's Keras builders (models.py:33-171) so
capabilities and checkpoints are interchangeable; execution is TPU-first:
NHWC layouts, optional bfloat16 compute, whole-plate batches, ensembles as
a stacked-parameter vmap axis.
"""

from tmat_tpu.models.unet import UNetXception, build_unet_xception, UNetXceptionPatchSegmentor, get_unet_patch_segmentor_from_cfg
from tmat_tpu.models.resnet import ResNet50TL, build_resnet50_tl
from tmat_tpu.models.params_io import save_params, load_params
