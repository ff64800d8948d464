"""UNet-Xception segmentation model (Flax) + patch segmentor wrapper.

Architecture parity: the reference's Keras builder (models.py:85-171), an
Xception-style UNet — strided entry conv, separable-conv down blocks with
1x1 strided residuals, transpose-conv up blocks with upsampled residuals,
sigmoid head. Filter counts must increase consecutively by a factor of 2
(models.py:114).

TPU-first: NHWC, optional bfloat16 compute (params stay f32), BatchNorm
with Keras momentum/epsilon, whole patch batches in one call. The patch
segmentor delegates to the fused tiled-inference kernel (ops/tiled.py)
instead of the reference's host loop over 8 TTA rotations x 16-patch
chunks (smooth_tiled_predictions.py:136-217).
"""

from __future__ import annotations

import json
import warnings
from functools import partial
from pathlib import Path
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tmat_tpu.core import defs
from tmat_tpu.models.params_io import load_params
from tmat_tpu.ops.pallas_unet import make_fused_pred_fn, should_use_fused
from tmat_tpu.ops.resize import resize, target_shape_for_ratio
from tmat_tpu.ops.tiled import predict_img_with_smooth_windowing


def check_consec_factor(x: Sequence[float], factor: float) -> bool:
    """Elements increase consecutively by ``factor`` (models_util.py:194-216)."""
    return all(x[i] == x[i - 1] * factor for i in range(1, len(x)))


class SeparableConv(nn.Module):
    """Depthwise 3x3 + pointwise 1x1 (Keras SeparableConv2D)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        x = nn.Conv(
            in_ch,
            (3, 3),
            feature_group_count=in_ch,
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            name="depthwise",
        )(x)
        x = nn.Conv(
            self.features, (1, 1), padding="SAME", dtype=self.dtype, name="pointwise"
        )(x)
        return x


class UNetXception(nn.Module):
    """Xception-style UNet (models.py:85-171)."""

    n_outputs: int = 1
    filter_counts: Tuple[int, ...] = (32, 64, 128, 256)
    output_act: str = "sigmoid"
    dtype: jnp.dtype = jnp.float32
    # Keras default 0.99; lower it for short training runs so eval-mode
    # running statistics converge before early stopping
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, train: bool = False):
        filter_counts = tuple(sorted(self.filter_counts))
        assert check_consec_factor(filter_counts, 2), (
            "Filter depths do not increase consecutively by a factor of 2."
        )
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=1e-3,
            dtype=self.dtype,
        )

        x = x.astype(self.dtype)
        # Entry block
        x = nn.Conv(filter_counts[0], (3, 3), strides=2, padding="SAME", dtype=self.dtype)(x)
        x = norm()(x)
        x = nn.relu(x)
        previous = x

        # Downsampling Xception blocks
        for i, filters in enumerate(filter_counts[1:]):
            if i != 0:
                x = nn.relu(x)
            x = SeparableConv(filters, self.dtype)(x)
            x = norm()(x)
            x = nn.relu(x)
            x = SeparableConv(filters, self.dtype)(x)
            x = norm()(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
            residual = nn.Conv(
                filters, (1, 1), strides=2, padding="SAME", dtype=self.dtype
            )(previous)
            x = x + residual
            previous = x

        # Upsampling blocks
        for filters in reversed(filter_counts):
            x = nn.relu(x)
            x = nn.ConvTranspose(filters, (3, 3), padding="SAME", dtype=self.dtype)(x)
            x = norm()(x)
            x = nn.relu(x)
            x = nn.ConvTranspose(filters, (3, 3), padding="SAME", dtype=self.dtype)(x)
            x = norm()(x)
            x = _upsample2(x)
            # conv1x1(upsample2(p)) == upsample2(conv1x1(p)) bit-exactly
            # (pointwise conv commutes with nearest replication), and the
            # conv then runs on 4x fewer pixels — the residual convs at the
            # largest resolutions were the biggest HBM readers in the
            # forward pass (test_unet.py::test_upsample_conv_commute)
            residual = _upsample2(
                nn.Conv(filters, (1, 1), padding="SAME", dtype=self.dtype)(previous)
            )
            x = x + residual
            previous = x

        x = nn.Conv(self.n_outputs, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = x.astype(jnp.float32)
        if self.output_act == "sigmoid":
            x = nn.sigmoid(x)
        elif self.output_act == "softmax":
            x = nn.softmax(x)
        return x


def _upsample2(x: jax.Array) -> jax.Array:
    """Keras UpSampling2D(2), nearest-neighbor."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def build_unet_xception(
    n_outputs: int,
    img_shape: Tuple[int, int],
    channels: int = 1,
    filter_counts: Tuple[int, ...] = (32, 64, 128, 256),
    output_act: str = "sigmoid",
    dtype: jnp.dtype = jnp.float32,
    seed: int = 0,
    bn_momentum: float = 0.99,
    init: str = "random",
):
    """Create the model and initialized variables (params + batch_stats).

    ``init="zeros"`` builds the variable tree via ``jax.eval_shape`` +
    host numpy zeros — ZERO device programs. Use it whenever a checkpoint
    will immediately overwrite the values: an eager ``model.init`` of
    this architecture compiles ~150 tiny XLA programs (one per conv/BN/
    truncated-normal), which dominated cold CLI starts (283 s of compile
    across 241 programs measured on the dev tunnel; BASELINE.md
    cold-start section).
    """
    model = UNetXception(
        n_outputs=n_outputs,
        filter_counts=tuple(filter_counts),
        output_act=output_act,
        dtype=dtype,
        bn_momentum=bn_momentum,
    )
    # host dummy on purpose: an eager jnp.zeros here dispatched two device
    # programs per process (convert + broadcast_in_dim) before anything
    # useful ran — cold-start compile census, BASELINE.md
    dummy_shape = (1, img_shape[0], img_shape[1], channels)
    if init == "zeros":
        shapes = jax.eval_shape(
            lambda d: model.init(jax.random.PRNGKey(seed), d, train=False),
            jax.ShapeDtypeStruct(dummy_shape, jnp.float32),
        )
        variables = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), shapes
        )
    else:
        variables = model.init(
            jax.random.PRNGKey(seed), np.zeros(dummy_shape, np.float32), train=False
        )
    return model, variables


class UNetXceptionPatchSegmentor:
    """Binary segmentation on large images via fused tiled patches.

    Parity: models.py:597-653 — LANCZOS downsample by ds_ratio, optional
    mean/std normalization, spline-window smooth tiling (subdivisions=2),
    NEAREST upsample of the prediction back to the input size.
    """

    def __init__(
        self,
        patch_size: int,
        checkpoint_file,
        filter_counts: Tuple[int, ...],
        ds_ratio: float = 0.5,
        norm_mean: Optional[float] = None,
        norm_std: Optional[float] = None,
        channels: int = 1,
        dtype: jnp.dtype = jnp.float32,
        quantize: Optional[bool] = None,
        tta: int = 8,
    ):
        self.patch_size = patch_size
        # dihedral TTA variants (8 = reference parity, 4/1 = opt-in fast
        # modes; the tiled UNet cost is linear in tta)
        self.tta = tta
        self._dtype = jnp.dtype(dtype)
        self.channels = channels
        self.norm_mean = norm_mean
        self.norm_std = norm_std
        self.ds_ratio = ds_ratio
        self.model, template = build_unet_xception(
            1,
            (patch_size, patch_size),
            channels=channels,
            filter_counts=filter_counts,
            output_act="sigmoid",
            dtype=dtype,
            # the checkpoint overwrites every value: skip the eager random
            # init (it alone compiles ~150 device programs cold)
            init="zeros" if checkpoint_file is not None else "random",
        )
        if checkpoint_file is not None:
            self.variables = load_params(checkpoint_file, template)
            # weights identity for the AOT executable cache: compiled
            # tiled pipelines bake the checkpoint in as constants, so the
            # cache key must change when the checkpoint bytes do
            from tmat_tpu.core.aot_cache import ckpt_fingerprint

            fp = ckpt_fingerprint(checkpoint_file)
            self._ckpt_fp = (fp["size"], fp["blake2b16"])
        else:
            self.variables = template
            self._ckpt_fp = None  # unfingerprintable weights: no AOT cache

        model = self.model
        variables = self.variables

        def pred_fn(batch):
            return model.apply(variables, batch, train=False)

        self._pred_fn = pred_fn
        self.fused = False
        self.quantized = False
        if quantize is None:
            import os

            quantize = os.environ.get("TMAT_TPU_INT8", "0") == "1"
        if quantize:
            # w8a8 MXU path (models/quant.py): per-channel PTQ with
            # BN folding; scales come from a shipped sidecar JSON when
            # present, else a one-time CPU-backend calibration pass
            from tmat_tpu.models import quant as _quant

            scales = None
            if checkpoint_file is not None:
                # fingerprint-checked: a retrained checkpoint invalidates
                # the sidecar and forces recalibration
                scales = _quant.load_scales_for(checkpoint_file)
            calibrated = scales is None
            qfn, scales = _quant.make_quant_pred_fn(
                self.variables,
                # the model sorts filter_counts internally (reference
                # models.py:114); the folded tags must follow that order
                tuple(sorted(filter_counts)),
                scales=scales,
                patch_size=patch_size,
                # the dequantized elementwise domain follows the segmentor
                # compute dtype (bf16 in production, f32 in CPU tests)
                float_dtype=dtype,
            )
            if checkpoint_file is not None and calibrated:
                try:  # best-effort cache next to the checkpoint
                    _quant.save_scales_for(checkpoint_file, scales)
                except OSError:
                    pass
            self._pred_fn = qfn
            self.quantized = True
            return
        if should_use_fused(patch_size, filter_counts):
            try:
                self._pred_fn = make_fused_pred_fn(
                    variables, filter_counts, dtype=dtype, output_act="sigmoid"
                )
                self.fused = True
            except Exception as exc:  # pragma: no cover - defensive
                warnings.warn(
                    f"fused UNet path unavailable ({exc!r}); "
                    "falling back to the standard forward"
                )

    @property
    def _aot_key(self):
        """Weights + compute-path identity for the AOT executable cache,
        or None when the weights can't be fingerprinted (random init)."""
        if self._ckpt_fp is None:
            return None
        return (
            "unet",
            self._ckpt_fp,
            self.patch_size,
            self.channels,
            self._dtype.name,
            self.quantized,
            self.fused,
        )

    def predict(self, x: np.ndarray, auto_resample: bool = True) -> np.ndarray:
        x = jnp.asarray(x, jnp.float32)
        original_shape = tuple(x.shape[:2])
        target_shape = target_shape_for_ratio(original_shape, self.ds_ratio)
        do_resampling = original_shape != target_shape and auto_resample
        if do_resampling:
            x = resize(x, target_shape, "lanczos")

        if self.norm_mean is not None and self.norm_std is not None:
            x = (x - self.norm_mean) / self.norm_std

        pred = predict_img_with_smooth_windowing(
            x,
            window_size=self.patch_size,
            subdivisions=2,
            pred_func=self._pred_fn,
            channels=self.channels,
            tta=self.tta,
            # getattr: bare __new__-constructed test doubles have no
            # fingerprint and must simply skip the AOT executable cache
            aot_key=getattr(self, "_aot_key", None),
        )

        if do_resampling:
            pred = resize(pred, original_shape, "nearest")
        return np.asarray(pred)


def get_unet_patch_segmentor_from_cfg(cfg_json: str) -> UNetXceptionPatchSegmentor:
    """Instantiate a patch segmentor from a config JSON (models.py:656-684)."""
    with open(cfg_json, "r") as fp:
        cfg = json.load(fp)

    checkpoint_file = cfg["checkpoint_file"]
    if not Path(checkpoint_file).is_absolute():
        # prefer the user base dir, fall back to the packaged tree (which
        # ships a trained default checkpoint) — same resolution rule as the
        # config files themselves
        checkpoint_file = defs.model_training_path(
            f"binary_segmentation/checkpoints/{checkpoint_file}"
        )

    # production dtype (models.default_infer_dtype: bf16 on accelerators),
    # overridable per config ("dtype": "float32"/"bfloat16")
    dtype_name = cfg.get("dtype")
    if dtype_name is None:
        from tmat_tpu.models import default_infer_dtype

        dtype = default_infer_dtype()
    else:
        dtype = jnp.dtype(dtype_name)

    return UNetXceptionPatchSegmentor(
        cfg["patch_size"],
        checkpoint_file,
        tuple(cfg["filter_counts"]),
        ds_ratio=cfg.get("ds_ratio", 1),
        norm_mean=cfg.get("norm_mean", None),
        norm_std=cfg.get("norm_std", None),
        channels=cfg.get("channels", 1),
        dtype=dtype,
        quantize=cfg.get("quantize", None),
        tta=int(cfg.get("tta", 8)),
    )
