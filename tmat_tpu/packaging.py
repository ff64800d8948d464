"""One-dir relocatable application bundle builder (the frozen-app layer).

Parity target: gui/pyinstaller_build.spec:51-134 — the reference ships a
PyInstaller one-dir app bundling the four scripts, tool configs, HP JSONs,
the five ensemble weight files + histories, and the UNet checkpoint as
datas next to a windowed launcher. PyInstaller freezes the entire
CPython + TensorFlow stack because end users run it on arbitrary desktop
machines.

TPU-first equivalent: a TPU deployment host always has the JAX/libtpu
stack provisioned (freezing libtpu into an app bundle would tie the
artifact to one runtime version), so the bundle carries everything ABOVE
the accelerator stack: the package source, default configs, and all model
artifacts, arranged exactly like the source tree so defs.py's packaged-
resource resolution (core/defs.py:33-38) works unchanged, plus `tmat` /
`tmat-gui` launcher scripts that prepend the bundle to sys.path of
whatever interpreter `TMAT_TPU_PYTHON` (default python3) names. The
result is relocatable: copy the directory anywhere, run `./tmat`.

Usage:
    python -m tmat_tpu.packaging OUT_DIR [--force]
"""

from __future__ import annotations

import argparse
import os
import shutil
import stat
import sys
from pathlib import Path

from tmat_tpu.core import defs

_LAUNCHER = """#!/usr/bin/env bash
# Relocatable launcher: run the bundled tmat_tpu with the host's Python.
# The bundle path travels via the environment, never spliced into code —
# paths with quotes/spaces stay paths instead of becoming Python syntax.
HERE="$(cd "$(dirname "${{BASH_SOURCE[0]}}")" && pwd)"
TMAT_TPU_BUNDLE_DIR="$HERE" exec "${{TMAT_TPU_PYTHON:-python3}}" -c "
import os
import sys
sys.path.insert(0, os.environ['TMAT_TPU_BUNDLE_DIR'])
from {module} import main
sys.exit(main() or 0)
" "$@"
"""

_README = """tmat-tpu one-dir application bundle
===================================

Relocatable: move or copy this directory anywhere and run

    ./tmat              # CLI (interactive menu, or ./tmat SUBCOMMAND ...)
    ./tmat-gui          # tkinter GUI

Host requirements (NOT bundled, by design — the accelerator stack is
provisioned per TPU host): Python >= 3.11 with jax, flax, optax, numpy,
pillow, scipy. Set TMAT_TPU_PYTHON to choose the interpreter.

Contents:
    tmat_tpu/        package source
    config/          default tool configs (JSON)
    model_training/  UNet segmentor checkpoint + invasion-depth ensemble
                     weights, histories, and HP metadata
"""


def build_bundle(out_dir, force: bool = False) -> Path:
    """Assemble the one-dir bundle; returns the bundle path."""
    out = Path(out_dir).expanduser().resolve()
    if out.exists():
        if not force:
            raise FileExistsError(
                f"{out} already exists (pass --force to overwrite)"
            )
        shutil.rmtree(out)
    out.mkdir(parents=True)

    pkg_src = Path(defs.PKG_BASE_DIR)
    shutil.copytree(
        pkg_src,
        out / "tmat_tpu",
        ignore=shutil.ignore_patterns(
            "__pycache__", "*.pyc", "*.so", "package.cfg"
        ),
    )
    # the mirrors of pyinstaller_build.spec:51-77's datas: configs + all
    # model artifacts (HP jsons, ensemble weights + histories, checkpoint)
    if Path(defs.PKG_CONFIG_DIR).is_dir():
        shutil.copytree(defs.PKG_CONFIG_DIR, out / "config")
    if Path(defs.PKG_MODEL_DIR).is_dir():
        shutil.copytree(defs.PKG_MODEL_DIR, out / "model_training")

    for name, module in (("tmat", "tmat_tpu.cli"), ("tmat-gui", "tmat_tpu.gui")):
        launcher = out / name
        launcher.write_text(_LAUNCHER.format(module=module))
        launcher.chmod(launcher.stat().st_mode | stat.S_IXUSR | stat.S_IXGRP)

    (out / "README.txt").write_text(_README)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("out_dir", type=str)
    p.add_argument("--force", action="store_true")
    args = p.parse_args(argv)
    out = build_bundle(args.out_dir, force=args.force)
    size_mb = sum(
        f.stat().st_size for f in out.rglob("*") if f.is_file()
    ) / 1e6
    print(f"Bundle written to {out} ({size_mb:.1f} MB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
