"""Create / relocate the user base directory.

Parity target: fl_tissue_model_tools/configure.py:33-137. Copies packaged
default configs into <base_dir>/config, creates model_training/ and output/,
and records the base dir in package.cfg with a ~-relative path when under
the user's home.
"""

from __future__ import annotations

import configparser
import shutil
from pathlib import Path

from tmat_tpu.core import defs
from tmat_tpu.core.log import SFM


def configure(target_base_dir: str = "") -> Path:
    """Materialise the user base dir and record it in package.cfg."""
    base_dir = Path(target_base_dir).expanduser() if target_base_dir else defs.BASE_DIR
    base_dir.mkdir(parents=True, exist_ok=True)

    config_dir = base_dir / "config"
    config_dir.mkdir(exist_ok=True)
    if defs.PKG_CONFIG_DIR.is_dir():
        for cfg in defs.PKG_CONFIG_DIR.glob("*.json"):
            dest = config_dir / cfg.name
            if not dest.exists():
                shutil.copy(cfg, dest)

    (base_dir / "model_training").mkdir(exist_ok=True)
    (base_dir / "output").mkdir(exist_ok=True)

    cfg = configparser.ConfigParser()
    cfg["metadata"] = {"name": defs.PKG_NAME}
    home = str(Path.home().resolve())
    base_str = str(base_dir.resolve())
    if base_str.startswith(home):
        base_str = "~" + base_str[len(home):]
    cfg[defs.PKG_NAME] = {"base_dir": base_str}
    with open(defs.PKG_CFG_PATH, "w") as fp:
        cfg.write(fp)

    print(f"{SFM.success} Base directory configured at {base_dir}", flush=True)
    return base_dir
