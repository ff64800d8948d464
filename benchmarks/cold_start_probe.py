"""Measure real cold-start wall + compile census with the AOT cache.

Round-3 BASELINE.md pinned the tunnel cold start at 37 programs / 39.8 s
compile sum / 68-293 s wall to first CSV (compute_branches, one image,
fresh process). This probe re-measures with the round-4 AOT executable
cache: run it twice back-to-back in FRESH processes (the probe execs the
tool in a subprocess) — run 1 populates, run 2 should deserialize the
heavy programs and show the residual small-program compile tail only.

Usage (on the TPU runtime):
    python benchmarks/cold_start_probe.py [--size 1024]
Prints one JSON line per run: wall to CSV, n_compiles (JAX_LOG_COMPILES
census), AOT stats.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_TOOL = """
import json, sys, time
t0 = time.time()
import matplotlib
matplotlib.use("Agg")
from tmat_tpu.tools import compute_branches
from tmat_tpu.core import aot_cache
t_import = time.time() - t0
compute_branches.main(argv=[
    sys.argv[1], sys.argv[2], "--image-width-microns", "1000", "--no-vis",
])
print("PROBE " + json.dumps({
    "wall_to_done_s": round(time.time() - t0, 1),
    "import_s": round(t_import, 1),
    "aot": {k: (round(v, 1) if isinstance(v, float) else v)
            for k, v in aot_cache.stats.items()},
}))
"""


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=1024)
    parser.add_argument("--z", type=int, default=1, help="1 = 2-D UNet path")
    args = parser.parse_args(argv)

    import numpy as np
    from PIL import Image

    tmp = Path(tempfile.mkdtemp(prefix="tmat_coldprobe_"))
    in_dir = tmp / "in"
    in_dir.mkdir()
    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0 : args.size, 0 : args.size]
    img = rng.randint(10, 40, (args.size, args.size)).astype(np.uint8)
    ring = (
        np.abs(np.sqrt((yy - args.size / 2) ** 2 + (xx - args.size / 2) ** 2)
               - args.size / 3) < 3
    )
    img[ring] = 200
    if args.z > 1:
        d = in_dir / "stackA"
        d.mkdir()
        for z in range(args.z):
            Image.fromarray(np.roll(img, z, 0)).save(d / f"s_z{z:02d}.tif")
    else:
        Image.fromarray(img).save(in_dir / "wellA.tif")

    env = dict(os.environ)
    env["JAX_LOG_COMPILES"] = "1"
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("TMAT_TPU_AOT_CACHE", "1")

    for run in (1, 2):
        out_dir = tmp / f"out{run}"
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-c", _TOOL, str(in_dir), str(out_dir)],
            capture_output=True,
            text=True,
            timeout=1800,
            env=env,
        )
        wall = time.time() - t0
        n_compiles = len(
            re.findall(r"Compiling ([\w<>.:-]+)", proc.stderr)
        )
        probe = {}
        for line in proc.stdout.splitlines():
            if line.startswith("PROBE "):
                probe = json.loads(line[6:])
        print(
            json.dumps(
                {
                    "run": run,
                    "rc": proc.returncode,
                    "wall_s": round(wall, 1),
                    "n_compiles": n_compiles,
                    **probe,
                }
            ),
            flush=True,
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
