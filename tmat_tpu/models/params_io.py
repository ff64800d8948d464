"""Checkpoint save/load for model parameters and state.

Flax msgpack serialization; a checkpoint is a single file holding the
variables pytree (params + batch_stats). Replaces the reference's Keras
.h5 weight files (models.py:622, compute_inv_depth.py:113-117).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import flax.serialization
import jax


def save_params(path, variables: Any) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as fp:
        fp.write(flax.serialization.to_bytes(variables))


def load_params(path, template: Any) -> Any:
    """Load variables into the structure of ``template`` (from model.init)."""
    with open(path, "rb") as fp:
        data = fp.read()
    return flax.serialization.from_bytes(template, data)
