"""ResNet50 transfer-learning classifier (Flax).

Architecture parity: Keras applications ResNet50 as used by
build_ResNet50_TL (models.py:33-82) — v1 bottleneck blocks (stride on the
first 1x1), BN eps 1.001e-5, truncation at a named conv-block output
("conv4_block6_out", "conv5_block{1,2,3}_out"), then GAP -> Dense(n) ->
activation. The base runs in inference mode (frozen BN statistics) even
during fine-tuning, matching the Keras `base_model(inputs, training=False)`
call at models.py:71.

The invasion-depth ensemble stacks k parameter pytrees and vmaps apply over
the member axis, so "n_models x predict" (compute_inv_depth.py:160) becomes
one device call.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1.001e-5

# blocks per stage for ResNet50
_STAGE_BLOCKS = {2: 3, 3: 4, 4: 6, 5: 3}
_STAGE_FILTERS = {2: 64, 3: 128, 4: 256, 5: 512}

LAST_LAYER_OPTIONS = (
    "conv5_block3_out",
    "conv5_block2_out",
    "conv5_block1_out",
    "conv4_block6_out",
)


def _parse_last_layer(name: str) -> Tuple[int, int]:
    """'conv4_block6_out' -> (4, 6)."""
    parts = name.split("_")
    stage = int(parts[0][4:])
    block = int(parts[1][5:])
    if stage not in _STAGE_BLOCKS or not 1 <= block <= _STAGE_BLOCKS[stage]:
        raise ValueError(f"Unsupported ResNet50 truncation layer: {name}")
    return stage, block


class BottleneckBlock(nn.Module):
    """Keras-style ResNet v1 bottleneck (stride on first 1x1)."""

    filters: int
    stride: int
    conv_shortcut: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bn = lambda name: nn.BatchNorm(
            use_running_average=True, epsilon=BN_EPS, dtype=self.dtype, name=name
        )
        if self.conv_shortcut:
            shortcut = nn.Conv(
                4 * self.filters, (1, 1), strides=self.stride, dtype=self.dtype,
                name="0_conv",
            )(x)
            shortcut = bn("0_bn")(shortcut)
        else:
            shortcut = x

        y = nn.Conv(
            self.filters, (1, 1), strides=self.stride, dtype=self.dtype, name="1_conv"
        )(x)
        y = bn("1_bn")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding="SAME", dtype=self.dtype, name="2_conv")(y)
        y = bn("2_bn")(y)
        y = nn.relu(y)
        y = nn.Conv(4 * self.filters, (1, 1), dtype=self.dtype, name="3_conv")(y)
        y = bn("3_bn")(y)
        return nn.relu(y + shortcut)


class ResNet50Base(nn.Module):
    """ResNet50 feature extractor truncated at ``last_layer``."""

    last_layer: str = "conv5_block3_out"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        last_stage, last_block = _parse_last_layer(self.last_layer)
        x = x.astype(self.dtype)
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        x = nn.Conv(64, (7, 7), strides=2, padding="VALID", dtype=self.dtype, name="conv1_conv")(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=BN_EPS, dtype=self.dtype, name="conv1_bn"
        )(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        for stage in range(2, last_stage + 1):
            n_blocks = _STAGE_BLOCKS[stage] if stage < last_stage else last_block
            for block in range(1, n_blocks + 1):
                stride = 1 if (stage == 2 or block > 1) else 2
                x = BottleneckBlock(
                    filters=_STAGE_FILTERS[stage],
                    stride=stride,
                    conv_shortcut=(block == 1),
                    dtype=self.dtype,
                    name=f"conv{stage}_block{block}",
                )(x)
        return x


class ResNet50TL(nn.Module):
    """Truncated ResNet50 + GAP + Dense head (models.py:33-82)."""

    n_outputs: int = 1
    last_layer: str = "conv5_block3_out"
    output_act: str = "sigmoid"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ResNet50Base(self.last_layer, self.dtype, name="base_model")(x)
        x = jnp.mean(x, axis=(1, 2))  # GlobalAveragePooling2D
        # zero-init head: with a randomly-initialized base (no bundled
        # ImageNet weights) the GAP features are large and a random head
        # saturates the sigmoid at init, zeroing clipped-BCE gradients;
        # zero init starts at p=0.5 with healthy gradients. Loaded
        # checkpoints overwrite this anyway.
        x = nn.Dense(
            self.n_outputs, name="head", kernel_init=nn.initializers.zeros
        )(x.astype(jnp.float32))
        if self.output_act == "sigmoid":
            x = nn.sigmoid(x)
        elif self.output_act == "softmax":
            x = nn.softmax(x)
        return x


def build_resnet50_tl(
    n_outputs: int,
    img_shape: Tuple[int, int, int],
    base_last_layer: str = "conv5_block3_out",
    output_act: str = "sigmoid",
    dtype: jnp.dtype = jnp.float32,
    seed: int = 0,
    init: str = "random",
):
    """Create the TL model and initialized variables.

    ImageNet base weights are not bundled (zero-egress build); train via
    models/train.py or load converted checkpoints with params_io.

    ``init="zeros"`` builds the tree via ``jax.eval_shape`` + host numpy
    zeros (zero device programs) — use when a checkpoint will overwrite
    the values; ResNet50's eager random init compiles hundreds of tiny
    XLA programs, which dominates cold CLI starts (see
    models/unet.build_unet_xception).
    """
    model = ResNet50TL(
        n_outputs=n_outputs,
        last_layer=base_last_layer,
        output_act=output_act,
        dtype=dtype,
    )
    dummy = jnp.zeros((1, *img_shape), jnp.float32)
    if init == "zeros":
        import numpy as np

        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(seed), dummy, train=False)
        )
        variables = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), shapes
        )
    else:
        variables = model.init(jax.random.PRNGKey(seed), dummy, train=False)
    return model, variables


def stack_ensemble_variables(variable_list: Sequence[Any]) -> Any:
    """Stack k parameter pytrees along a new leading member axis.

    Stacks on HOST: checkpoint leaves arrive as host arrays, and an eager
    ``jnp.stack`` compiles one broadcast+concat XLA program per distinct
    leaf shape (~46 programs for a 2-member ResNet50) in every fresh
    process — cold-start glue the zero-compile census forbids
    (tests/test_cli_real_process_tools.py). The stacked tree crosses H2D
    once, inside the first fused-forward dispatch.
    """
    return jax.tree.map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *variable_list
    )


def make_ensemble_apply(model: ResNet50TL):
    """vmapped apply over the stacked member axis: (params_k, x) -> (k, B, n)."""

    def single(variables, x):
        return model.apply(variables, x, train=False)

    return jax.jit(jax.vmap(single, in_axes=(0, None)))


def make_ensemble_predict_fused(model: ResNet50TL, img_hw):
    """ONE device program per stack: slice preprocessing (lanczos resize,
    per-slice 0-255 rescale, 3-channel replication, caffe normalization —
    models/preprocess.py semantics) fused with the vmapped ensemble
    forward. The raw (Z, H, W) stack transfers in its native integer
    dtype; a single dispatch replaces the prep + apply pair (per-program
    dispatch latency is material through remote TPU runtimes)."""

    from tmat_tpu.models.preprocess import prep_inv_depth_imgs

    img_hw = tuple(img_hw)

    def single(variables, x):
        return model.apply(variables, x, train=False)

    @jax.jit
    def fused(stacked_vars, raw_stack):
        x = prep_inv_depth_imgs(raw_stack, img_hw)
        return jax.vmap(single, in_axes=(0, None))(stacked_vars, x)

    return fused
