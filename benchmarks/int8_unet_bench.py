"""Head-to-head: w8a8 int8 UNet forward (models/quant.py) vs the bf16
production forward, at production geometry on the current backend.

Methodology (see benchmarks/int8_probe.py): inputs staged + value-fetch
synced before the timer; repetitions rotate distinct input sets to defeat
the axon same-input dispatch cache. At batch 200 the forward is ~100 ms,
so the ~27 ms dispatch+fetch round trip is reported alongside as a
correction term measured from an empty fetch.

Usage: python benchmarks/int8_unet_bench.py [--batch 200] [--repeats 5]
       [--no-qdw]  (keep depthwise convs f32/bf16)
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def fetch_sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(fn, sets, repeats):
    fetch_sync(fn(sets[0]))  # compile + warm
    best = float("inf")
    for r in range(repeats):
        x = sets[(r + 1) % len(sets)]
        t0 = time.perf_counter()
        fetch_sync(fn(x))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=200)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--patch", type=int, default=320)
    ap.add_argument("--no-qdw", action="store_true")
    ap.add_argument("--no-qconvt", action="store_true",
                    help="keep the up-path transpose convs f32")
    ap.add_argument("--no-qres", action="store_true",
                    help="keep the residual 1x1 convs f32")
    ap.add_argument("--mixed", action="store_true",
                    help="bf16 storage, int8 only at the deep up-block convs")
    args = ap.parse_args()

    from tmat_tpu.core import defs
    from tmat_tpu.models.params_io import load_params
    from tmat_tpu.models.quant import (
        calibrate,
        default_calibration_batch,
        extract_folded,
        forward_quant,
        quantize_folded,
    )
    from tmat_tpu.models.unet import build_unet_xception

    filters = (64, 128, 256, 512)
    patch, B = args.patch, args.batch
    print(f"device={jax.devices()[0].device_kind} batch={B} patch={patch} "
          f"quantize_depthwise={not args.no_qdw}", flush=True)

    model16, tpl16 = build_unet_xception(
        1, (patch, patch), channels=1, filter_counts=filters, dtype=jnp.bfloat16
    )
    ckpt = Path(defs.model_training_path(
        "binary_segmentation/checkpoints/checkpoint_1.msgpack"))
    variables = load_params(ckpt, tpl16) if ckpt.is_file() else tpl16
    print(f"weights={'shipped checkpoint' if ckpt.is_file() else 'random init'}",
          flush=True)

    folded = extract_folded(variables, filters)
    cache = Path("/tmp/int8_scales.json")
    from tmat_tpu.models.quant import load_scales, save_scales

    scales = load_scales(cache)
    if scales is None:
        print("calibrating (host CPU backend)...", flush=True)
        scales = calibrate(folded, default_calibration_batch(patch))
        save_scales(cache, scales)
    bf16_fn = jax.jit(lambda x: model16.apply(variables, x, train=False))
    if args.mixed:
        from tmat_tpu.models.quant import forward_mixed, quantize_mixed

        qparams = quantize_mixed(folded, scales)
        int8_fn = jax.jit(lambda x: forward_mixed(qparams, x))
    else:
        f32_tags = ["head"]
        for tag, sp in folded.items():
            if tag == "_n":
                continue
            if args.no_qconvt and sp["kind"] == "convT":
                f32_tags.append(tag)
            if args.no_qres and tag.endswith(".res"):
                f32_tags.append(tag)
        qparams = quantize_folded(folded, scales,
                                  quantize_depthwise=not args.no_qdw,
                                  f32_tags=tuple(f32_tags))
        int8_fn = jax.jit(lambda x: forward_quant(qparams, x))

    rng = np.random.RandomState(0)
    sets = [
        jnp.asarray(rng.rand(B, patch, patch, 1), jnp.float32) for _ in range(3)
    ]
    for s in sets:
        fetch_sync(s)

    # dispatch+fetch round-trip correction (empty program)
    tiny = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8,), jnp.float32)
    fetch_sync(tiny(z))
    rtt = min(
        (lambda t0: (fetch_sync(tiny(z)), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(5)
    )
    print(f"dispatch+fetch rtt ~{rtt * 1e3:.1f} ms", flush=True)

    flops = None
    try:
        flops = bf16_fn.lower(sets[0]).compile().cost_analysis()["flops"]
    except Exception:
        pass

    t16 = timeit(bf16_fn, sets, args.repeats)
    print(f"bf16 {t16 * 1e3:8.2f} ms  {B / t16:7.1f} imgs/s"
          + (f"  {flops / t16 / 1e12:5.1f} TF/s" if flops else ""), flush=True)
    t8 = timeit(int8_fn, sets, args.repeats)
    print(f"int8 {t8 * 1e3:8.2f} ms  {B / t8:7.1f} imgs/s  "
          f"speedup {t16 / t8:.2f}x (rtt-corrected "
          f"{(t16 - rtt) / max(t8 - rtt, 1e-9):.2f}x)", flush=True)

    y16 = np.asarray(jax.device_get(bf16_fn(sets[0])), np.float32)
    y8 = np.asarray(jax.device_get(int8_fn(sets[0])), np.float32)
    a, b = y16 > 0.5, y8 > 0.5
    iou = np.logical_and(a, b).sum() / max(np.logical_or(a, b).sum(), 1)
    print(f"mask IoU int8 vs bf16 on random inputs: {iou:.5f} "
          f"(pos frac {a.mean():.4f})", flush=True)


if __name__ == "__main__":
    main()
