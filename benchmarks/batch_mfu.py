"""UNet-forward MFU across production patch-batch sizes (VERDICT r4 #4).

The plate path runs the tiled UNet at ONE batch per well, set by the
well geometry: the exact-coverage padded canvas for a 1024-px well at
ds_ratio 0.625 is 960 px -> a 5x5 patch grid x 8 TTA = **batch 200**
(the verdict's 72-patch estimate neglected the canvas aug padding; 72
is the batch for 512-px wells, whose 320-px canvas pads to 640 -> 3x3
grid x 8). Verified by tracing _tiled_core's pred_func input:
tests/test_tiled.py::test_production_patch_batch_sizes.

So the batch-200 roofline numbers ARE the headline geometry. This
benchmark answers the residual question: how far below that roofline do
SMALLER wells (batch 72) sit, and would folding k wells' patches into
one program (batch 72k) pay? Methodology: marginal cost of one forward
inside a k-replica program ((t(3)-t(1))/2, distinct inputs so XLA cannot
CSE the replicas) — cancels the dispatch floor and fetch RTT exactly
(established in benchmarks/unet_marginal.py / unet_variants.py).

Usage (on the TPU): python benchmarks/batch_mfu.py [--batches 72 144 200 400]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16 = {"TPU v5 lite": 197e12, "TPU v5e": 197e12}


def fetch_sync(out):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))


def timeit(fn, *args, repeats=5):
    fetch_sync(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fetch_sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def compiled_flops(fn, *args):
    try:
        an = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        return float(an.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[72, 144, 200, 400])
    ap.add_argument("--patch", type=int, default=320)
    ap.add_argument("--klo", type=int, default=1)
    ap.add_argument("--khi", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    from tmat_tpu.models import default_infer_dtype
    from tmat_tpu.models.unet import build_unet_xception

    dev = jax.devices()[0]
    peak = next((v for k, v in PEAK_BF16.items() if k in dev.device_kind), 197e12)
    dtype = default_infer_dtype()
    model, variables = build_unet_xception(
        1, (args.patch, args.patch), channels=1,
        filter_counts=(64, 128, 256, 512), dtype=dtype,
    )
    print(
        f"device={dev.device_kind} patch={args.patch} dtype={dtype} "
        f"marginal k={args.klo}->{args.khi} best-of-{args.repeats}"
    )

    rng = np.random.RandomState(0)
    rows = []
    for batch in args.batches:
        shape = (batch, args.patch, args.patch, 1)
        x0 = jnp.asarray(rng.rand(*shape), jnp.float32)
        flops = compiled_flops(
            lambda v, x: jnp.mean(model.apply(v, x, train=False)), variables, x0
        )

        def make(k):
            xs = [jnp.asarray(rng.rand(*shape), jnp.float32) for _ in range(k)]

            @jax.jit
            def f(v, *xs):
                return sum(
                    jnp.mean(model.apply(v, x, train=False)) for x in xs
                )

            return f, xs

        flo, xlo = make(args.klo)
        tlo = timeit(flo, variables, *xlo, repeats=args.repeats)
        fhi, xhi = make(args.khi)
        thi = timeit(fhi, variables, *xhi, repeats=args.repeats)
        dt = (thi - tlo) / (args.khi - args.klo)
        row = {
            "batch": batch,
            "marginal_ms": round(dt * 1e3, 1),
            "ms_per_img": round(dt * 1e3 / batch, 3),
            "gflops": round(flops / 1e9, 1),
            "mfu_pct": round(100 * flops / (dt * peak), 1) if dt > 0 else None,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    base = next((r for r in rows if r["batch"] == 72), rows[0])
    for r in rows:
        if r["batch"] > base["batch"] and base["ms_per_img"]:
            speedup = base["ms_per_img"] / r["ms_per_img"]
            # exact ratio, not floor division: batch 200 vs base 72 is a
            # 2.78x geometry change, not a "2x fold"
            print(
                f"# batch {base['batch']} -> {r['batch']} "
                f"({r['batch'] / base['batch']:.2f}x): "
                f"{speedup:.2f}x per-image",
                flush=True,
            )


if __name__ == "__main__":
    main()
