"""Precompile the analysis pipelines to warm the persistent XLA cache.

The reference's primary UX is a one-shot CLI process per directory
(`cli.py:176-184` subprocess dispatch); on TPU runtimes the first
compile of the fused tool programs costs minutes, which dwarfs warm
compute (BASELINE.md "Cold starts"). This tool runs every analysis
pipeline once on synthetic data at the user's microscope geometry so
each program lands in the persistent compilation cache
(core/compile_cache.py) AND — for the fixed-geometry tool programs —
the AOT executable cache (core/aot_cache.py), which serializes the
compiled executables themselves; later real CLI processes at the same
geometry deserialize in ~0.2 s each and start computing with zero
remote compiles.

Shapes are the compile key, so pass the geometry your plates actually
use: ``--size`` (pixels per side after any channel/time slicing) and
``--z`` (slices per stack). Re-run after changing either.

Usage: tmat-tpu warmup [--size 1024] [--z 8] [--tools zproj area branches inv_depth]
"""

from __future__ import annotations

import argparse
import shutil
import tempfile
import time
from pathlib import Path

import numpy as np

from tmat_tpu.core.log import SFM

TOOL_CHOICES = ("zproj", "area", "branches", "inv_depth", "plate")


def _parse(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        prog="warmup",
        description="Precompile tool pipelines at a fixed geometry to "
        "populate the persistent XLA compilation cache.",
    )
    parser.add_argument(
        "--size",
        type=int,
        default=1024,
        help="Image side length in pixels (the compile key; match your data).",
    )
    parser.add_argument(
        "--z",
        type=int,
        default=8,
        help="Z slices per stack (the compile key for stack tools).",
    )
    parser.add_argument(
        "--tools",
        nargs="+",
        choices=TOOL_CHOICES,
        default=list(TOOL_CHOICES),
        help="Subset of pipelines to warm (default: all).",
    )
    parser.add_argument(
        "--image-width-microns",
        type=float,
        default=1000.0,
        help="Physical width passed to the branches pipeline (does not "
        "affect compiled shapes; any value warms the same programs).",
    )
    return parser.parse_args(argv)


def _write_stack(dirpath: Path, n_z: int, size: int, rng: np.random.RandomState):
    """One synthetic Z-stack as a `{well}_z{i}.tif` image sequence."""
    from PIL import Image

    dirpath.mkdir(parents=True, exist_ok=True)
    yy, xx = np.mgrid[0:size, 0:size]
    for z in range(n_z):
        sl = rng.randint(10, 40, size=(size, size)).astype(np.uint8)
        # a few bright line segments so segmentation/Morse stages see
        # structure and exercise their full program set
        for k in range(4):
            c = (k + 1) * size // 5
            band = (np.abs(yy - xx + c - size // 2) < 2) | (np.abs(xx - c) < 1)
            sl[band] = 200
        Image.fromarray(sl).save(dirpath / f"W1_z{z:02d}.tif")


def main(args=None, argv=None):
    args = args if args is not None else _parse(argv)

    from tmat_tpu.core.compile_cache import enable_persistent_cache
    from tmat_tpu.parallel.distributed import (
        maybe_initialize_from_env,
        process_count,
    )

    # pod warmup: AOT keys include (process_count, process_index), so a
    # multi-host config must be warmed AS that config — run warmup on
    # every host with the same TMAT_TPU_COORDINATOR env as the real job
    maybe_initialize_from_env()
    cache_dir = enable_persistent_cache()
    print(f"{SFM.info} Persistent compile cache: {cache_dir}")
    print(
        f"{SFM.info} Warming {', '.join(args.tools)} at size={args.size} z={args.z}"
    )

    rng = np.random.RandomState(0)
    tmp = Path(tempfile.mkdtemp(prefix="tmat_warmup_"))
    try:
        in_dir = tmp / "in"
        # one stack per process: the striped tools warm a process's
        # programs only on images that process owns
        for w in range(max(1, process_count())):
            _write_stack(in_dir / f"stack_W{w + 1}", args.z, args.size, rng)

        runs = []
        if "zproj" in args.tools:
            from tmat_tpu.tools import compute_zproj

            runs.append(
                ("zproj", lambda out: compute_zproj.main(
                    argv=[str(in_dir), str(out), "-m", "fs"]))
            )
        if "area" in args.tools:
            from tmat_tpu.tools import compute_cell_area

            runs.append(
                ("area", lambda out: compute_cell_area.main(
                    argv=[str(in_dir), str(out), "-w"]))
            )
        if "inv_depth" in args.tools:
            from tmat_tpu.tools import compute_inv_depth

            runs.append(
                ("inv_depth", lambda out: compute_inv_depth.main(
                    argv=[str(in_dir), str(out)]))
            )
        if "branches" in args.tools:
            from tmat_tpu.tools import compute_branches

            runs.append(
                ("branches", lambda out: compute_branches.main(
                    argv=[
                        str(in_dir),
                        str(out),
                        "--image-width-microns",
                        str(args.image_width_microns),
                    ]))
            )
        if "plate" in args.tools:
            from tmat_tpu.tools import plate_pipeline

            # one synthetic well per mesh device: the plate stage1/stage2
            # compile keys include the chunk size (= device count), so a
            # warm run here serves process_plate's executables at this
            # geometry from the AOT cache
            import jax

            plate_in = tmp / "plate_in"
            rng_p = np.random.RandomState(1)
            for i in range(jax.device_count()):
                _write_stack(
                    plate_in / f"stack_W{i + 1}", args.z, args.size, rng_p
                )
            runs.append(
                ("plate", lambda out: plate_pipeline.main(
                    argv=[
                        str(plate_in),
                        str(out),
                        "--image-width-microns",
                        str(args.image_width_microns),
                    ]))
            )

        for name, run in runs:
            out = tmp / f"out_{name}"
            out.mkdir()
            t0 = time.perf_counter()
            run(out)
            print(
                f"{SFM.success} {name} warmed in {time.perf_counter() - t0:.1f}s"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    n_entries = sum(1 for p in Path(cache_dir).iterdir() if p.is_file())
    print(f"{SFM.success} Cache now holds {n_entries} compiled programs.")

    from tmat_tpu.core import aot_cache

    if aot_cache.enabled():
        d = aot_cache.cache_dir()
        n_exec = (
            sum(1 for p in d.iterdir() if p.suffix == ".jaxexec")
            if d.is_dir()
            else 0
        )
        print(
            f"{SFM.success} AOT executable cache holds {n_exec} serialized "
            f"executables ({d}); later CLI runs at this geometry start with "
            "zero compiles."
        )
        aot_cache.prune()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
