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
# Relocatable launcher. Interpreter preference order:
#   1. TMAT_TPU_PYTHON (explicit override)
#   2. the bundled standalone runtime (runtime/bin/python3), if present
#   3. the host's python3
# The bundle path travels via the environment, never spliced into code —
# paths with quotes/spaces stay paths instead of becoming Python syntax.
HERE="$(cd "$(dirname "${{BASH_SOURCE[0]}}")" && pwd)"
PY="${{TMAT_TPU_PYTHON:-}}"
if [ -z "$PY" ] && [ -x "$HERE/runtime/bin/python3" ]; then
    PY="$HERE/runtime/bin/python3"
    export PYTHONHOME="$HERE/runtime"
    unset PYTHONPATH
fi
PY="${{PY:-python3}}"
TMAT_TPU_BUNDLE_DIR="$HERE" exec "$PY" -c "
import os
import sys
sys.path.insert(0, os.environ['TMAT_TPU_BUNDLE_DIR'])
from {module} import main
sys.exit(main() or 0)
" "$@"
"""

# site-packages closure for the standalone runtime: tmat_tpu's imports
# plus their transitive runtime deps (CPU jax stack; no TPU plugin — the
# desktop/standalone case is exactly the one with no accelerator runtime
# provisioned, mirroring the reference's CPU TensorFlow freeze).
_RUNTIME_PACKAGES = (
    "jax",
    "jaxlib",
    "numpy",
    "numpy.libs",
    "scipy",
    "scipy.libs",
    "ml_dtypes",
    "opt_einsum",
    "flax",
    "msgpack",
    "optax",
    "chex",
    "absl",
    "PIL",
    "pillow.libs",
    "networkx",
    "matplotlib",
    "matplotlib.libs",
    "mpl_toolkits",
    "pylab.py",
    "cycler",
    "dateutil",
    "six.py",
    "kiwisolver",
    "pyparsing",
    "packaging",
    "fontTools",
    "contourpy",
    "toolz",
    "etils",
    "importlib_resources",
    "rich",
    "treescope",
    "typing_extensions.py",
    "markdown_it",
    "mdurl",
    "pygments",
    "yaml",
    "_yaml",
)

_README = """tmat-tpu one-dir application bundle
===================================

Relocatable: move or copy this directory anywhere and run

    ./tmat              # CLI (interactive menu, or ./tmat SUBCOMMAND ...)
    ./tmat-gui          # tkinter GUI

Interpreter: if a runtime/ directory is present (bundle built with
--standalone), the launchers use the embedded CPython + CPU jax stack and
the bundle needs NO Python installed on the machine (glibc only). Without
runtime/, the host needs Python >= 3.11 with jax, flax, optax, numpy,
pillow, scipy; set TMAT_TPU_PYTHON to choose the interpreter (a TPU
deployment host has the jax/libtpu stack provisioned anyway).

Contents:
    tmat_tpu/        package source
    config/          default tool configs (JSON)
    model_training/  UNet segmentor checkpoint + invasion-depth ensemble
                     weights, histories, and HP metadata
    runtime/         (--standalone only) embedded CPython + site-packages
"""


def _copy_runtime(out: Path) -> None:
    """Embed a standalone CPython runtime + the site-packages closure.

    Copies the running interpreter's binary, libpython and stdlib into
    ``runtime/`` (the binary's RUNPATH resolves libpython relative to
    ``bin/../lib``, so the copied tree is relocatable), then the curated
    subset of site-packages tmat_tpu needs. The result runs on a machine
    with no Python installed (glibc is the only host requirement, as with
    any manylinux build) — frozen-app parity with
    gui/pyinstaller_build.spec, which ships CPython+TF the same way.
    """
    import sysconfig

    base = Path(sys.base_prefix)
    stdlib = Path(sysconfig.get_paths()["stdlib"])
    runtime = out / "runtime"
    (runtime / "bin").mkdir(parents=True)

    real_python = Path(sys.executable).resolve()
    shutil.copy2(real_python, runtime / "bin" / "python3")

    libdir = runtime / "lib"
    libdir.mkdir()
    for lib in (base / "lib").glob("libpython*"):
        if lib.is_file() and not lib.is_symlink():
            shutil.copy2(lib, libdir / lib.name)
        elif lib.is_symlink():
            target = lib.resolve()
            if target.is_file():
                shutil.copy2(target, libdir / lib.name)

    shutil.copytree(
        stdlib,
        libdir / stdlib.name,
        ignore=shutil.ignore_patterns(
            "__pycache__", "test", "tests", "idlelib", "tkinter.bak"
        ),
    )

    site_src = Path(sysconfig.get_paths()["purelib"])
    site_dst = libdir / stdlib.name / "site-packages"
    site_dst.mkdir(parents=True, exist_ok=True)
    missing = []
    for name in _RUNTIME_PACKAGES:
        src = site_src / name
        if src.is_dir():
            shutil.copytree(
                src, site_dst / name,
                ignore=shutil.ignore_patterns("__pycache__"),
            )
        elif src.is_file():
            shutil.copy2(src, site_dst / name)
        else:
            missing.append(name)
    if missing:
        print(f"runtime packages not found (skipped): {missing}")


def build_bundle(out_dir, force: bool = False, standalone: bool = False) -> Path:
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

    if standalone:
        _copy_runtime(out)

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
    p.add_argument(
        "--standalone",
        action="store_true",
        help="embed a CPython runtime + CPU jax stack so the bundle runs "
        "on machines with no Python installed (frozen-app parity)",
    )
    args = p.parse_args(argv)
    out = build_bundle(args.out_dir, force=args.force, standalone=args.standalone)
    size_mb = sum(
        f.stat().st_size for f in out.rglob("*") if f.is_file()
    ) / 1e6
    print(f"Bundle written to {out} ({size_mb:.1f} MB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
