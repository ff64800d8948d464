"""Package constants and path registry.

Parity target: fl_tissue_model_tools/defs.py:1-65. The reference keeps an
install-time ``package.cfg`` with a user base dir that ``configure`` copies
scripts/configs into; we keep the same user-facing base-dir semantics but
resolve packaged resources straight from the installed tree (no copy step is
required for the tools to run — `configure` still materialises a user dir for
custom configs and model artifacts).
"""

from __future__ import annotations

import configparser
import os
from pathlib import Path

import numpy as np

SUPPORTED_IMAGE_FORMATS = ("ND2", "TIF", "TIFF", "OME-TIFF", "PNG")

# Max values for each integer type (defs.py:10-14)
MAX_UINT16 = np.iinfo(np.uint16).max
MAX_UINT8 = np.iinfo(np.uint8).max

# Epsilon value for floating point operations
EPSILON = np.finfo(np.float32).eps

PKG_NAME = "tmat_tpu"
PKG_BASE_DIR = Path(__file__).resolve().parent.parent
PKG_CFG_PATH = PKG_BASE_DIR / "package.cfg"

# Packaged resources (shipped inside the repo/package tree)
PKG_CONFIG_DIR = PKG_BASE_DIR.parent / "config"
if not PKG_CONFIG_DIR.is_dir():
    PKG_CONFIG_DIR = PKG_BASE_DIR / "config"
PKG_MODEL_DIR = PKG_BASE_DIR.parent / "model_training"
if not PKG_MODEL_DIR.is_dir():
    PKG_MODEL_DIR = PKG_BASE_DIR / "model_training"


def _read_user_base_dir() -> Path:
    """Resolve the user base dir from package.cfg / env, defaulting to ~/tmat_tpu."""
    env = os.environ.get("TMAT_TPU_BASE_DIR")
    if env:
        return Path(env).expanduser()
    cfg = configparser.ConfigParser()
    try:
        cfg.read(PKG_CFG_PATH)
        base = cfg[PKG_NAME]["base_dir"]
        if base.startswith("~"):
            return Path.home().resolve() / base[2:]
        return Path(base)
    except KeyError:
        return Path.home() / PKG_NAME


BASE_DIR = _read_user_base_dir()

# Subdirectories under the user base dir (defs.py:56-65)
MODEL_TRAINING_DIR = BASE_DIR / "model_training"
SCRIPT_CONFIG_DIR = BASE_DIR / "config"
OUTPUT_DIR = BASE_DIR / "output"


def default_config_path(name: str) -> Path:
    """Path of a packaged default tool config, preferring the user copy."""
    user = SCRIPT_CONFIG_DIR / name
    if user.is_file():
        return user
    return PKG_CONFIG_DIR / name


def model_training_path(relpath: str) -> Path:
    """Path under model_training/, preferring the user base dir over the
    packaged defaults (mirrors defs.MODEL_TRAINING_DIR usage at
    compute_inv_depth.py:53-115, models.py:669-671)."""
    user = MODEL_TRAINING_DIR / relpath
    if user.exists():
        return user
    return PKG_MODEL_DIR / relpath
