"""Checkpoint save/load for model parameters and state.

Flax msgpack serialization; a checkpoint is a single file holding the
variables pytree (params + batch_stats). Replaces the reference's Keras
.h5 weight files (models.py:622, compute_inv_depth.py:113-117).

Checkpoints may be stored at reduced precision (float16) to halve
shipped-artifact size; ``load_params`` always casts floating leaves back
to the template's dtype, so inference/training code sees the dtype it
initialized with.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np


def save_params(path, variables: Any, dtype=None) -> None:
    """Serialize a variables pytree; optionally down-cast float leaves.

    ``dtype=np.float16`` halves file size (used for the shipped invasion
    ensemble); integer/bool leaves are stored unchanged.
    """
    if dtype is not None:
        variables = jax.tree.map(
            lambda x: (
                np.asarray(x, dtype)
                if np.issubdtype(np.asarray(x).dtype, np.floating)
                else np.asarray(x)
            ),
            variables,
        )
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as fp:
        fp.write(flax.serialization.to_bytes(variables))


def load_params(path, template: Any) -> Any:
    """Load variables into the structure of ``template`` (from model.init).

    Float leaves are cast to the template leaf's dtype, so float16-stored
    checkpoints load as float32 (or bfloat16) transparently.
    """
    with open(path, "rb") as fp:
        data = fp.read()
    restored = flax.serialization.from_bytes(template, data)
    return jax.tree.map(
        lambda r, t: (
            jnp.asarray(r, jnp.asarray(t).dtype)
            if np.issubdtype(np.asarray(r).dtype, np.floating)
            else r
        ),
        restored,
        template,
    )
