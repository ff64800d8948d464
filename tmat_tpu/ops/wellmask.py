"""Well-boundary mask generation.

Parity target: fl_tissue_model_tools/well_mask_generation.py:16-277 —
auto-threshold (blur, corner-polarity inversion, Otsu, disk(5) erosion),
downsample to <=200 px, Canny border + image-edge injection, convex hull,
circularity-based superellipse exponent choice (perimeter/area > 0.027 ->
n=8 squircle, else n=2 ellipse), a 25k-candidate random search for the
smallest enclosing superellipse, and circle / convex-hull fallbacks.

TPU-first: the dense raster stages (blur/Otsu/erosion/Canny/rasterization)
are jitted device ops; the 25,000-candidate search is one vmapped
feasibility + area argmin on device (the reference loops in NumPy). Only
the convex hull (scipy, ~dozens of points) stays on host. Unlike the
reference's unseeded np.random.rand search, the candidate draw is a seeded
jax PRNG, making masks reproducible run-to-run.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tmat_tpu.ops import morphology
from tmat_tpu.ops.canny import canny
from tmat_tpu.ops.filters import gaussian
from tmat_tpu.ops.rescale import rescale_intensity
from tmat_tpu.ops.resize import resize
from tmat_tpu.ops.threshold import otsu_threshold

# Random-search parameter bounds (well_mask_generation.py:38-45)
_BOUNDS = np.array(
    [
        (-np.pi / 20, np.pi / 20),  # theta
        (0.67, 1.33),  # d
        (0.9, 1.1),  # s_a
        (0.9, 1.1),  # s_b
        (-0.3, 0.3),  # c_x
        (-0.3, 0.3),  # c_y
    ],
    np.float32,
)


@jax.jit
def auto_threshold_well(image: jax.Array) -> jax.Array:
    """Rough boolean well mask (well_mask_generation.py:236-277)."""
    im_blur = gaussian(image.astype(jnp.float32), sigma=1.0, mode="nearest")
    im_blur = rescale_intensity(im_blur, out_range=(0, 255))
    im_blur = jnp.floor(im_blur)  # .astype(np.uint8) truncation
    lo, hi = jnp.min(im_blur), jnp.max(im_blur)

    h, w = image.shape
    x_stop_left = int(h * 0.05)
    x_start_right = int(h * 0.95)
    y_stop_top = int(w * 0.05)
    y_start_bottom = int(w * 0.95)
    corners = jnp.stack(
        [
            jnp.median(im_blur[:x_stop_left, :y_stop_top]),
            jnp.median(im_blur[:x_stop_left, y_start_bottom:]),
            jnp.median(im_blur[x_start_right:, :y_stop_top]),
            jnp.median(im_blur[x_start_right:, y_start_bottom:]),
        ]
    )
    corners_min, corners_max = jnp.min(corners), jnp.max(corners)
    invert = jnp.abs(lo - corners_min) > jnp.abs(hi - corners_max)
    im_blur = jnp.where(invert, 255.0 - im_blur, im_blur)

    thresh = otsu_threshold(im_blur)
    im_thresh = im_blur >= thresh
    return morphology.binary_erosion(im_thresh, morphology.disk(5))


@partial(jax.jit, static_argnames=("n", "num_iters"))
def _superellipse_search(
    x: jax.Array, y: jax.Array, point_mask: jax.Array, n: int, num_iters: int, key
):
    """Vectorized random search for the smallest enclosing superellipse.

    Returns (params[6], feasible_any). Points are padded to a static size;
    point_mask marks real hull vertices.
    """
    lw = jax.random.uniform(key, (num_iters, 6), jnp.float32)
    lo = jnp.asarray(_BOUNDS[:, 0])
    hi = jnp.asarray(_BOUNDS[:, 1])
    params = lo + (hi - lo) * lw
    t, d, s_a, s_b, c_x, c_y = (params[:, i : i + 1] for i in range(6))

    if n == 2:
        val = ((x - c_x) / (d * s_a)) ** 2 + ((y - c_y) / (d * s_b)) ** 2
    elif n % 2 == 0:
        val = (
            (((x - c_x) * jnp.cos(t) - (y - c_y) * jnp.sin(t)) / (d * s_a)) ** n
            + (((x - c_x) * jnp.sin(t) + (y - c_y) * jnp.cos(t)) / (d * s_b)) ** n
        )
    else:
        val = (
            jnp.abs(((x - c_x) * jnp.cos(t) - (y - c_y) * jnp.sin(t)) / (d * s_a)) ** n
            + jnp.abs(((x - c_x) * jnp.sin(t) + (y - c_y) * jnp.cos(t)) / (d * s_b)) ** n
        )
    val = jnp.where(point_mask[None, :], val, -jnp.inf)
    feasible = jnp.max(val, axis=1) < 1.0

    gamma_const = 4.0 * math.gamma(1 + 1 / n) ** 2 / math.gamma(1 + 2 / n)
    area = gamma_const * params[:, 1] ** 2 * params[:, 2] * params[:, 3]
    area = jnp.where(feasible, area, jnp.inf)
    best = jnp.argmin(area)
    return params[best], jnp.any(feasible)


def get_superellipse_hull(
    x: np.ndarray,
    y: np.ndarray,
    n: int,
    num_iters: int = 25000,
    seed: int = 0,
) -> Tuple[float, float, float, float, float, float]:
    """Smallest random-search superellipse enclosing the points
    (well_mask_generation.py:16-91). Raises if no candidate encloses them."""
    max_pts = 256
    pts = len(x)
    if pts > max_pts:
        idx = np.linspace(0, pts - 1, max_pts).astype(int)
        x, y = x[idx], y[idx]
        pts = max_pts
    xp = np.zeros(max_pts, np.float32)
    yp = np.zeros(max_pts, np.float32)
    mask = np.zeros(max_pts, bool)
    xp[:pts], yp[:pts], mask[:pts] = x, y, True

    params, ok = _superellipse_search(
        jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(mask), n, num_iters,
        jax.random.PRNGKey(seed),
    )
    if not bool(ok):
        raise RuntimeError("No feasible superellipse found for hull points")
    t, d, s_a, s_b, c_x, c_y = (float(v) for v in params)
    return t, d, s_a, s_b, c_x, c_y


@partial(jax.jit, static_argnames=("n", "shape"))
def gen_superellipse_mask(t, d, s_a, s_b, c_x, c_y, n: int, shape) -> jax.Array:
    """Rasterize a superellipse mask (well_mask_generation.py:94-118).

    Row coordinate spans shape[0] via x, column via y (the reference builds
    an xy meshgrid then swaps axes; this generates the swapped layout
    directly).
    """
    xs = jnp.linspace(-1, 1, shape[0])
    ys = jnp.linspace(-1, 1, shape[1])
    X = xs[:, None]
    Y = ys[None, :]
    val = (
        jnp.abs(((X - c_x) * jnp.cos(t) - (Y - c_y) * jnp.sin(t)) / (d * s_a)) ** n
        + jnp.abs(((X - c_x) * jnp.sin(t) + (Y - c_y) * jnp.cos(t)) / (d * s_b)) ** n
    )
    return val < 1.0


def create_convex_hull_mask(
    array_shape: Tuple[int, int], hull_vertices: np.ndarray
) -> np.ndarray:
    """Rasterize the filled convex hull (well_mask_generation.py:121-139).

    Half-plane test against the ordered hull edges (equivalent to the
    reference's Delaunay find_simplex >= 0 on a convex point set).
    """
    from scipy.spatial import ConvexHull

    hull = ConvexHull(hull_vertices)
    verts = hull_vertices[hull.vertices]  # counter-clockwise order
    rows, cols = np.mgrid[0 : array_shape[0], 0 : array_shape[1]]
    pts = np.stack([rows.ravel(), cols.ravel()], axis=1).astype(np.float64)
    inside = np.ones(pts.shape[0], bool)
    for i in range(len(verts)):
        a = verts[i]
        b = verts[(i + 1) % len(verts)]
        edge = b - a
        rel = pts - a
        cross = edge[0] * rel[:, 1] - edge[1] * rel[:, 0]
        inside &= cross >= -1e-9
    return inside.reshape(array_shape)


def _inject_image_edges(border: jax.Array, mask: jax.Array) -> jax.Array:
    """Include mask pixels on the image frame in the border set
    (well_mask_generation.py:165-170)."""
    border = border.at[0, :].set(border[0, :] | mask[0, :])
    border = border.at[-1, :].set(border[-1, :] | mask[-1, :])
    border = border.at[:, 0].set(border[:, 0] | mask[:, 0])
    border = border.at[:, -1].set(border[:, -1] | mask[:, -1])
    return border


def generate_well_mask(
    image: np.ndarray,
    mask_val: int = 1,
    return_superellipse_params: bool = False,
    seed: int = 0,
):
    """Binary mask over the well (well_mask_generation.py:142-233)."""
    image = np.asarray(image)
    im_thresh = auto_threshold_well(jnp.asarray(image, jnp.float32))

    downsamp_ratio = min(1, 200 / max(im_thresh.shape))
    small_shape = tuple(
        int(round(s * downsamp_ratio)) for s in im_thresh.shape
    )
    im_small = resize(im_thresh.astype(jnp.float32), small_shape, "nearest") > 0

    border = canny(im_small.astype(jnp.float32))
    border = _inject_image_edges(border, im_small)
    border_points = np.argwhere(np.asarray(border))

    def circ_mask():
        # circle fallback (well_mask_generation.py:172-181); radius matches
        # the reference formula verbatim
        center = image.shape[0] // 2, image.shape[1] // 2
        radius = int(image.shape[0] * 0.5 * (1 - 0.95))
        rows, cols = np.mgrid[0 : image.shape[0], 0 : image.shape[1]]
        circ = (rows - center[0]) ** 2 + (cols - center[1]) ** 2 < radius**2
        return (circ * mask_val).astype(np.uint8)

    from scipy.spatial import ConvexHull

    try:
        hull = ConvexHull(border_points)
    except Exception:
        return circ_mask()
    hull_vertices = border_points[hull.vertices]

    well_mask = create_convex_hull_mask(small_shape, hull_vertices)
    wm_border = canny(jnp.asarray(well_mask, jnp.float32))
    wm_border = np.asarray(_inject_image_edges(wm_border, jnp.asarray(well_mask)))

    area = well_mask.sum()
    perimeter = wm_border.sum()
    n = 8 if (perimeter / max(area, 1)) > 0.027 else 2

    x = hull_vertices[:, 0] / small_shape[0] * 2 - 1
    y = hull_vertices[:, 1] / small_shape[1] * 2 - 1
    found_superellipse = False
    params = None
    try:
        t, d, s_a, s_b, c_x, c_y = get_superellipse_hull(x, y, n, seed=seed)
        d *= 0.9
        well_mask = np.asarray(
            gen_superellipse_mask(t, d, s_a, s_b, c_x, c_y, n, small_shape)
        )
        params = (t, d, s_a, s_b, c_x, c_y, n)
        found_superellipse = True
    except RuntimeError:
        print("Falling back to convex hull well mask.", flush=True)

    well_mask = well_mask.astype(np.uint8) * mask_val
    well_mask = np.asarray(
        resize(jnp.asarray(well_mask, jnp.float32), image.shape[:2], "nearest")
    ).astype(np.uint8)

    if found_superellipse and return_superellipse_params:
        return (well_mask, *params)
    return well_mask
