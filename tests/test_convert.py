"""h5 -> msgpack converter tests using synthetic Keras-layout h5 files."""

import h5py
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tmat_tpu.models import convert
from tmat_tpu.models.resnet import build_resnet50_tl
from tmat_tpu.models.unet import build_unet_xception


def _write_legacy_h5(path, layers):
    """Write {layer_name: {weight_name: array}} in Keras legacy layout."""
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array(
            [name.encode() for name, _ in layers], dtype="S"
        )
        for name, weights in layers:
            g = f.create_group(name)
            g.attrs["weight_names"] = np.array(
                [f"{name}/{w}:0".encode() for w in weights], dtype="S"
            )
            sub = g.create_group(name)
            for wname, arr in weights.items():
                sub.create_dataset(f"{wname}:0", data=arr)


def _keras_unet_layers(rng, filters=(8, 16), channels=1):
    """Synthetic Keras weight list following build_UNetXception order."""
    layers = []
    counters = {"conv2d": 0, "batch_normalization": 0, "separable_conv2d": 0,
                "conv2d_transpose": 0}

    def name(kind):
        i = counters[kind]
        counters[kind] += 1
        return kind if i == 0 else f"{kind}_{i}"

    def conv(cin, cout, k=3):
        return {
            "kernel": rng.rand(k, k, cin, cout).astype(np.float32),
            "bias": rng.rand(cout).astype(np.float32),
        }

    def bn(c):
        return {
            "gamma": rng.rand(c).astype(np.float32),
            "beta": rng.rand(c).astype(np.float32),
            "moving_mean": rng.rand(c).astype(np.float32),
            "moving_variance": (rng.rand(c) + 0.5).astype(np.float32),
        }

    def sepconv(cin, cout):
        return {
            "depthwise_kernel": rng.rand(3, 3, cin, 1).astype(np.float32),
            "pointwise_kernel": rng.rand(1, 1, cin, cout).astype(np.float32),
            "bias": rng.rand(cout).astype(np.float32),
        }

    def convt(cin, cout):
        return {
            "kernel": rng.rand(3, 3, cout, cin).astype(np.float32),
            "bias": rng.rand(cout).astype(np.float32),
        }

    f0, f1 = filters
    layers.append((name("conv2d"), conv(channels, f0)))  # entry
    layers.append((name("batch_normalization"), bn(f0)))
    # down block (f1)
    layers.append((name("separable_conv2d"), sepconv(f0, f1)))
    layers.append((name("batch_normalization"), bn(f1)))
    layers.append((name("separable_conv2d"), sepconv(f1, f1)))
    layers.append((name("batch_normalization"), bn(f1)))
    layers.append((name("conv2d"), conv(f0, f1, 1)))  # residual
    # up blocks (f1 then f0)
    prev = f1
    for f in (f1, f0):
        layers.append((name("conv2d_transpose"), convt(prev, f)))
        layers.append((name("batch_normalization"), bn(f)))
        layers.append((name("conv2d_transpose"), convt(f, f)))
        layers.append((name("batch_normalization"), bn(f)))
        layers.append((name("conv2d"), conv(prev, f, 1)))  # residual
        prev = f
    layers.append((name("conv2d"), conv(f0, 1)))  # output head
    return layers


def test_unet_conversion_full_coverage(tmp_path, rng):
    model, template = build_unet_xception(1, (32, 32), channels=1, filter_counts=(8, 16))
    h5_path = tmp_path / "w.h5"
    _write_legacy_h5(h5_path, _keras_unet_layers(rng))

    variables = convert.convert_unet_weights(str(h5_path), template)
    # every parameter leaf replaced (none still equals the random init)
    flat_new = jax.tree.leaves(variables["params"])
    flat_old = jax.tree.leaves(template["params"])
    changed = sum(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(flat_new, flat_old)
    )
    assert changed == len(flat_new)
    # model runs with converted weights
    out = model.apply(variables, jnp.zeros((1, 32, 32, 1)), train=False)
    assert out.shape == (1, 32, 32, 1)


def test_unet_conversion_shape_mismatch_raises(tmp_path, rng):
    _, template = build_unet_xception(1, (32, 32), channels=1, filter_counts=(8, 16))
    layers = _keras_unet_layers(rng)
    # corrupt a kernel shape
    layers[0][1]["kernel"] = rng.rand(3, 3, 1, 999).astype(np.float32)
    h5_path = tmp_path / "bad.h5"
    _write_legacy_h5(h5_path, layers)
    with pytest.raises(ValueError, match="shape mismatch"):
        convert.convert_unet_weights(str(h5_path), template)


def test_resnet_conversion_named_layers(tmp_path, rng):
    model, template = build_resnet50_tl(
        1, (32, 32, 3), base_last_layer="conv4_block6_out"
    )
    import flax.traverse_util as tu

    flat = tu.flatten_dict(template["params"], sep="/")
    flat_stats = tu.flatten_dict(template["batch_stats"], sep="/")

    # build an h5 with matching named layers from random arrays
    layers = []
    seen = set()
    for key in flat:
        parts = key.split("/")
        if parts[0] == "head":
            lname = "dense"
        elif parts[1] == "conv1_conv":
            lname = "conv1_conv"
        elif parts[1] == "conv1_bn":
            lname = "conv1_bn"
        else:
            # base_model/convS_blockB/K_conv|K_bn
            block = parts[1]
            sub = parts[2]
            lname = f"{block}_{sub}"
        if lname in seen:
            continue
        seen.add(lname)
        if lname.endswith("_bn"):
            stats_key = "/".join(parts[:-1])
            c = flat[f"{stats_key}/scale"].shape[0]
            layers.append(
                (
                    lname,
                    {
                        "gamma": rng.rand(c).astype(np.float32),
                        "beta": rng.rand(c).astype(np.float32),
                        "moving_mean": rng.rand(c).astype(np.float32),
                        "moving_variance": (rng.rand(c) + 0.5).astype(np.float32),
                    },
                )
            )
        else:
            kshape = flat["/".join(parts[:-1]) + "/kernel"].shape
            w = {"kernel": rng.rand(*kshape).astype(np.float32)}
            bias_key = "/".join(parts[:-1]) + "/bias"
            if bias_key in flat:
                w["bias"] = rng.rand(*flat[bias_key].shape).astype(np.float32)
            layers.append((lname, w))

    h5_path = tmp_path / "resnet.h5"
    _write_legacy_h5(h5_path, layers)
    variables = convert.convert_resnet_weights(str(h5_path), template)

    flat_new = tu.flatten_dict(variables["params"], sep="/")
    changed = sum(
        not np.array_equal(np.asarray(flat_new[k]), np.asarray(flat[k]))
        for k in flat
    )
    assert changed == len(flat)
    out = model.apply(variables, jnp.zeros((1, 32, 32, 3)), train=False)
    assert out.shape == (1, 1)
