"""Plate-scale sharded pipelines: wells as the data-parallel axis.

Each entry point takes a whole plate of same-shape wells, shards the
leading axis over the mesh, and runs ONE jitted program; XLA keeps every
stage fused per device and no collectives are needed for these
embarrassingly-parallel stages (the design target in SURVEY §5
"distributed communication backend" and §7 step 8).

Jitted programs are cached per (mesh, geometry) — rebuilding the closure
per call would recompile every plate batch (remote compilation on this
TPU stack costs seconds-to-minutes per program).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tmat_tpu.ops.rescale import rescale_intensity
from tmat_tpu.ops.threshold import exec_threshold
from tmat_tpu.ops.tiled import PredFuncJitCache, _tiled_core
from tmat_tpu.ops.zproj import _focus_stack_zhw

_JIT_CACHE: Dict[Tuple, Callable] = {}
# pred_func-closing programs live in a weakref-keyed cache (see
# PredFuncJitCache: id()-keyed entries can outlive their predictor)
_SEGMENT_CACHE = PredFuncJitCache()


def _data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def _cached(key: Tuple, build: Callable[[], Callable]) -> Callable:
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = build()
        _JIT_CACHE[key] = fn
    return fn


def plate_zproj(mesh: Mesh, stacks: jax.Array, method: str = "max") -> jax.Array:
    """Z-project a (B, Z, H, W) plate of stacks, wells sharded over devices."""
    sharding = _data_sharding(mesh)

    def build():
        reducers = {
            "max": lambda s: jnp.max(s, axis=1),
            "min": lambda s: jnp.min(s, axis=1),
            "avg": lambda s: jnp.mean(s, axis=1),
            "med": lambda s: jnp.median(s, axis=1),
            "fs": jax.vmap(_focus_stack_zhw),
        }
        return jax.jit(
            reducers[method], in_shardings=sharding, out_shardings=sharding
        )

    fn = _cached(("zproj", mesh, method), build)
    return fn(jax.device_put(stacks, sharding))


def plate_threshold(
    mesh: Mesh, imgs: jax.Array, sd_coef: float, masks: Optional[jax.Array] = None
) -> jax.Array:
    """Rescale + GMM-threshold + binarize a (B, H, W) plate in one program."""
    sharding = _data_sharding(mesh)

    def build():
        def one(img, mask, coef):
            scaled = rescale_intensity(img, out_range=(0, 1))
            scaled = jnp.where(mask > 0, scaled, 0.0)
            out = exec_threshold(scaled, mask, coef)
            return (out > 0).astype(jnp.uint8)

        return jax.jit(
            jax.vmap(one, in_axes=(0, 0, None)),
            in_shardings=(sharding, sharding, None),
            out_shardings=sharding,
        )

    if masks is None:
        masks = jnp.ones_like(imgs)
    fn = _cached(("threshold", mesh), build)
    return fn(
        jax.device_put(imgs, sharding),
        jax.device_put(masks, sharding),
        jnp.float32(sd_coef),
    )


def plate_segment(
    mesh: Mesh,
    imgs: jax.Array,
    pred_func: Callable,
    window_size: int,
    subdivisions: int = 2,
) -> jax.Array:
    """Tiled smooth-blend segmentation of a (B, H, W) plate of wells.

    The full fused tiled pipeline (ops/tiled.py) is vmapped over wells and
    the well axis is sharded across the mesh — a 96-well plate on a v5e-8
    runs 12 wells per chip with zero host round-trips.
    """
    sharding = _data_sharding(mesh)

    def build():
        def one(img):
            return _tiled_core(img, pred_func, window_size, subdivisions, 1)

        return jax.jit(jax.vmap(one), in_shardings=sharding, out_shardings=sharding)

    key = ("segment", mesh, imgs.shape, window_size, subdivisions)
    fn = _SEGMENT_CACHE.get_or_build(pred_func, key, build)
    return fn(jax.device_put(imgs, sharding))
