"""Exact Euclidean distance transform on device.

Replaces the host scipy.ndimage.distance_transform_edt calls in the
centerline-enhancement hot path (compute_branches.py:340-344 semantics)
with a two-phase exact EDT that runs fully on device:

  phase 1: per-column distance to the nearest background pixel — two
           lax.scan passes (down + up) carrying a (W,) row vector
  phase 2: out[r, c] = min_{c'} (G[r, c']^2 + (c - c')^2) — a min-plus
           reduction evaluated in row chunks so the (chunk, W, W)
           broadcast stays in memory budget

Both phases are exact, so results match scipy's EDT bit-for-bit in the
squared domain. vmap over a leading batch axis processes a whole plate in
one program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = 1e9


def _column_pass(bg: jax.Array) -> jax.Array:
    """Per-column distance to nearest background (H, W) -> (H, W)."""

    def down(carry, bg_row):
        dist = jnp.where(bg_row, 0.0, carry + 1.0)
        return dist, dist

    init = jnp.full(bg.shape[1:], _BIG, jnp.float32)
    _, down_dists = jax.lax.scan(down, init, bg)

    def up(carry, dist_row):
        dist = jnp.minimum(dist_row, carry + 1.0)
        return dist, dist

    _, up_dists = jax.lax.scan(up, init, down_dists, reverse=True)
    return up_dists


@partial(jax.jit, static_argnames=("row_chunk",))
def edt(mask: jax.Array, row_chunk: int = 32) -> jax.Array:
    """Exact EDT of the foreground of a 2-D boolean mask."""
    mask = mask > 0
    h, w = mask.shape
    g = _column_pass(~mask)
    g2 = jnp.minimum(g * g, _BIG)  # (H, W) squared column distances

    cols = jnp.arange(w, dtype=jnp.float32)
    dcol2 = (cols[:, None] - cols[None, :]) ** 2  # (W, W)

    pad_h = (-h) % row_chunk
    g2p = jnp.pad(g2, ((0, pad_h), (0, 0)))
    blocks = g2p.reshape(-1, row_chunk, w)

    def block_min(block):
        # (chunk, 1, W') + (W, W') -> min over W'
        return jnp.min(block[:, None, :] + dcol2[None, :, :], axis=-1)

    out2 = jax.lax.map(block_min, blocks).reshape(-1, w)[:h]
    return jnp.sqrt(out2)


edt_batch = jax.jit(jax.vmap(lambda m: edt(m)), static_argnums=())
