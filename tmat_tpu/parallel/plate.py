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
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tmat_tpu.ops.rescale import rescale_intensity
from tmat_tpu.parallel.distributed import put_global
from tmat_tpu.ops.threshold import exec_threshold
from tmat_tpu.ops.tiled import PredFuncJitCache, _tiled_core
from tmat_tpu.ops.zproj import _focus_stack_zhw

import threading as _threading

_JIT_CACHE: Dict[Tuple, Callable] = {}
_JIT_CACHE_LOCK = _threading.Lock()
# pred_func-closing programs live in a weakref-keyed cache (see
# PredFuncJitCache: id()-keyed entries can outlive their predictor)
_SEGMENT_CACHE = PredFuncJitCache()


def _data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def _mesh_key(mesh: Mesh) -> tuple:
    """Stable, repr-hashable mesh identity for AOT executable cache keys
    (device ids + layout; the backend/device-kind half lives in
    aot_cache._env_key_parts)."""
    return (
        tuple(mesh.axis_names),
        tuple(mesh.devices.shape),
        tuple(int(d.id) for d in mesh.devices.flat),
    )


def packbits_device(x: jax.Array) -> jax.Array:
    """(..., W) bool -> (..., ceil(W/8)) uint8, np.unpackbits bit order.

    The plate postprocess fetches two boolean rasters per chunk; D2H
    through the TPU tunnel is the postprocess bottleneck (round-3 stage
    split), and packing on device cuts those bytes 8x with exact-bit
    round-tripping (unpack with np.unpackbits(..., axis=-1)[..., :W])."""
    w = x.shape[-1]
    pad = (-w) % 8
    if pad:
        x = jnp.pad(x.astype(jnp.uint8), [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    b = x.astype(jnp.uint8).reshape(*x.shape[:-1], -1, 8).astype(jnp.int32)
    weights = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
    return (b * weights).sum(-1).astype(jnp.uint8)


def unpackbits_device(packed: jax.Array, w: int) -> jax.Array:
    """Inverse of packbits_device on device: (..., W/8) uint8 -> (..., w) bool."""
    shifts = jnp.array([7, 6, 5, 4, 3, 2, 1, 0], jnp.uint8)
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*packed.shape[:-1], -1)[..., :w].astype(bool)


def _cached(key: Tuple, build: Callable[[], Callable]) -> Callable:
    # locked: plate streaming dispatches chunks from pool threads, and a
    # build race would pay a duplicate remote XLA compile
    with _JIT_CACHE_LOCK:
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
    return fn(put_global(stacks, sharding))


def plate_zproj_masked(
    mesh: Mesh, stacks: jax.Array, z_counts: jax.Array, method: str = "max"
) -> jax.Array:
    """Z-project a ragged (B, Z, H, W) plate: per-well ``z_counts`` mask the
    padded Z slices out of the reduction (ops/zproj.py::proj_masked), so
    every method is correct on plates whose wells have unequal depth."""
    from tmat_tpu.ops.zproj import proj_masked

    sharding = _data_sharding(mesh)

    def build():
        return jax.jit(
            jax.vmap(lambda s, zc: proj_masked(s, zc, method)),
            in_shardings=(sharding, sharding),
            out_shardings=sharding,
        )

    fn = _cached(("zproj_masked", mesh, method, stacks.shape, stacks.dtype.name), build)
    return fn(
        put_global(stacks, sharding),
        put_global(np.asarray(z_counts, np.int32), sharding),
    )


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
        put_global(imgs, sharding),
        put_global(masks, sharding),
        np.float32(sd_coef),
    )


def plate_segment(
    mesh: Mesh,
    imgs: jax.Array,
    pred_func: Callable,
    window_size: int,
    subdivisions: int = 2,
    tta: int = 8,
) -> jax.Array:
    """Tiled smooth-blend segmentation of a (B, H, W) plate of wells.

    The full fused tiled pipeline (ops/tiled.py) is vmapped over wells and
    the well axis is sharded across the mesh — a 96-well plate on a v5e-8
    runs 12 wells per chip with zero host round-trips. ``tta`` selects the
    D4 test-time-augmentation subgroup ({8, 4, 1}, same contract as
    ops/tiled.py); the default 8 is reference parity.
    """
    sharding = _data_sharding(mesh)

    def build():
        def one(img):
            return _tiled_core(img, pred_func, window_size, subdivisions, 1, tta)

        return jax.jit(jax.vmap(one), in_shardings=sharding, out_shardings=sharding)

    key = ("segment", mesh, imgs.shape, window_size, subdivisions, tta)
    fn = _SEGMENT_CACHE.get_or_build(pred_func, key, build)
    return fn(put_global(imgs, sharding))


def plate_stage1(
    mesh: Mesh,
    stacks: jax.Array,
    pred_func: Callable,
    window_size: int,
    subdivisions: int,
    target: Tuple[int, int],
    sd_coef,
    wm_small: Optional[jax.Array] = None,
    proj_method: str = "max",
    z_counts: Optional[jax.Array] = None,
    pre_projected: bool = False,
    tta: int = 8,
    aot_key=None,
):
    """Fused per-chunk device program for the plate pipeline.

    zproj (any of the five methods; ``z_counts`` masks Z padding on
    ragged plates) -> lanczos resize -> rescale -> tiled UNet segmentation,
    plus GMM threshold (area fraction only), disk(2) median filter and
    Zhang-Suen skeletonization of the thresholded prediction — ONE XLA
    program per chunk. Composes exactly the same ops as the unfused
    plate_zproj/plate_threshold/plate_segment + median_filter_batch +
    skeletonize sequence (asserted by test_plate_pipeline), but a single
    dispatch: per-op dispatch latency through the remote TPU tunnel is
    tens of ms, which dominated the non-UNet device time.

    Returns (area, pred, filtered, skel): area is the thresholded-pixel
    fraction (of well pixels when ``wm_small`` is given, of the frame
    otherwise); pred is the blended UNet probability map at ``target``
    resolution; filtered/skel feed filter_branch_seg_mask.
    """
    from tmat_tpu.ops import morphology as _morph
    from tmat_tpu.ops.resize import resize as _resize
    from tmat_tpu.ops.zproj import proj_masked
    from tmat_tpu.topo.transforms import _median_filter_disk2_batch

    sharding = _data_sharding(mesh)
    use_mask = wm_small is not None

    def build():
        def one(stack, wm_s, coef, zc):
            # pre_projected: the streaming producer already reduced the
            # stack during decode (host projection, ops/zproj.proj_host —
            # H2D of a (H, W) projection instead of the (Z, H, W) stack;
            # transfer bandwidth is the plate bottleneck on slow links)
            proj = (
                stack.astype(jnp.float32)
                if pre_projected
                else proj_masked(stack, zc, proj_method)
            )
            small = _resize(proj[None], target, "lanczos")[0]
            small = rescale_intensity(small, out_range=(0, 1))
            if use_mask:
                wm_full = (
                    _resize(wm_s[None], proj.shape, "nearest")[0] > 0
                ).astype(jnp.float32)
            else:
                wm_full = jnp.ones_like(proj)
            scaled = rescale_intensity(proj, out_range=(0, 1))
            scaled = jnp.where(wm_full > 0, scaled, 0.0)
            thresh = (exec_threshold(scaled, wm_full, coef) > 0).astype(jnp.float32)
            if use_mask:
                area = jnp.sum(thresh) / jnp.maximum(jnp.sum(wm_full), 1.0)
                small = small * wm_s
            else:
                area = jnp.mean(thresh)
            pred = _tiled_core(small, pred_func, window_size, subdivisions, 1, tta)
            return area, pred

        def chunk_fn(stacks, wm_s, coef, zcs):
            areas, preds = jax.vmap(one, in_axes=(0, 0, None, 0))(
                stacks, wm_s, coef, zcs
            )
            seg = (preds > 0.5).astype(jnp.float32)
            filtered = _median_filter_disk2_batch(seg) > 0.5
            skels = jax.vmap(_morph.skeletonize)(filtered)
            # bit-packed for the host fetch (packbits_device docstring);
            # stage2 re-consumes the DEVICE-resident filtered/skels via
            # the host-filtered mask, so only the packed copies move
            return areas, preds, packbits_device(filtered), packbits_device(skels)

        return jax.jit(
            chunk_fn,
            in_shardings=(sharding, sharding, None, sharding),
            out_shardings=(sharding, sharding, sharding, sharding),
        )

    key = (
        "stage1",
        mesh,
        stacks.shape,
        stacks.dtype.name,
        window_size,
        subdivisions,
        target,
        use_mask,
        proj_method,
        pre_projected,
        tta,
    )
    fn = _SEGMENT_CACHE.get_or_build(pred_func, key, build)
    if wm_small is None:
        # use_mask=False: the traced program never reads wm_s, so ship a
        # per-well scalar placeholder instead of an (n, *target) f32 ones
        # raster — that was ~target_h*target_w*4 B/well of dead H2D per
        # chunk through the (slow) device link
        wm_small = jnp.ones((stacks.shape[0], 1, 1), jnp.float32)
    if z_counts is None:
        z_counts = jnp.full((stacks.shape[0],), stacks.shape[1], jnp.int32)
    args = (
        put_global(stacks, sharding),
        put_global(wm_small, sharding),
        np.float32(sd_coef),
        put_global(np.asarray(z_counts, np.int32), sharding),
    )
    if aot_key is not None:
        # cross-process executable cache: this program bakes the
        # segmentor checkpoint in as constants, so the caller's aot_key
        # (checkpoint fingerprint + compute path) is part of the key
        from tmat_tpu.core.aot_cache import aot_call

        return aot_call(
            fn,
            args,
            ("plate_stage1", aot_key, _mesh_key(mesh)) + key[2:],
            label="plate_stage1",
        )
    return fn(*args)


def plate_stage2(
    mesh: Mesh,
    preds: jax.Array,
    masks: jax.Array,
    skels_pre: jax.Array,
    dsamp: Tuple[int, int],
) -> jax.Array:
    """Centerline-relative distance weighting + downsample, one program.

    masks are the component-filtered segmentation masks (host stage) —
    either a bool raster or host-np.packbits uint8 (the H2D of the full
    bool raster was the one unpacked transfer left in the postprocess
    loop; ~an eighth of the bytes through a slow link). skels_pre are the
    pre-filter skeletons — bool or the bit-packed uint8 form plate_stage1
    returns (component filtering only removes whole components, so the
    filtered skeleton is skels_pre & masks). Returns
    preds * dist/(dist+centerline_dt) resized to ``dsamp``.
    """
    from tmat_tpu.ops.distance import edt_batch as _edt_batch
    from tmat_tpu.ops.resize import resize as _resize

    sharding = _data_sharding(mesh)
    w = preds.shape[-1]
    packed = skels_pre.dtype == jnp.uint8 and skels_pre.shape[-1] != w
    masks_packed = masks.dtype == jnp.uint8 and masks.shape[-1] != w

    def build():
        def fn(preds, masks, skels_pre):
            if masks_packed:
                masks = unpackbits_device(masks, w)
            skels = skels_pre
            if packed:
                skels = unpackbits_device(skels, w)
            skels = skels & masks
            dist = _edt_batch(masks)
            cdt = _edt_batch(~skels)
            rel = dist / jnp.maximum(dist + cdt, 1e-12)
            return _resize(preds * rel, dsamp, "linear")

        return jax.jit(
            fn,
            in_shardings=(sharding, sharding, sharding),
            out_shardings=sharding,
        )

    fn = _cached(("stage2", mesh, preds.shape, dsamp, packed, masks_packed), build)
    args = (
        put_global(preds, sharding),
        put_global(masks, sharding),
        put_global(skels_pre, sharding),
    )
    # no closed-over weights: safe to AOT-cache on geometry alone
    from tmat_tpu.core.aot_cache import aot_call

    return aot_call(
        fn,
        args,
        (
            "plate_stage2",
            _mesh_key(mesh),
            preds.shape,
            masks.dtype.name,
            skels_pre.shape,
            skels_pre.dtype.name,
            dsamp,
            packed,
        ),
        label="plate_stage2",
    )
