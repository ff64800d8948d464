"""Connected-component labeling and region statistics.

Parity targets: skimage.measure.{label, regionprops, regionprops_table,
perimeter} and skimage.morphology.remove_small_objects as used by
transforms.py:170-303 and compute_branches.py:276-279. The perimeter
estimator reproduces skimage's weighted border-pixel count exactly
(weights 1 / sqrt(2) / (1+sqrt2)/2 from the 10-2-10 neighbor code
convolution).

Host-side by design: these are label-dependent reductions over small
rasters feeding graph logic (see SURVEY §7 architecture cut); the dense
inputs (masks, skeletons) are produced on device.
"""

from __future__ import annotations

import math
from typing import Dict

import numpy as np
from scipy import ndimage


def label(mask: np.ndarray, connectivity: int = 2):
    """skimage.measure.label: connectivity 1 = cross, 2 = full 3x3.

    Native C++ fast path (csrc/labeling.cpp, exact scipy numbering);
    scipy fallback when no toolchain is available."""
    from tmat_tpu.topo import labeling_native as ln

    native = ln.label_native(np.asarray(mask), connectivity)
    if native is not None:
        return native
    structure = ndimage.generate_binary_structure(2, connectivity)
    labels, n = ndimage.label(np.asarray(mask) > 0, structure=structure)
    return labels, n


_PERIM_WEIGHTS = np.zeros(50)
_PERIM_WEIGHTS[[5, 7, 15, 17, 25, 27]] = 1.0
_PERIM_WEIGHTS[[21, 33]] = math.sqrt(2)
_PERIM_WEIGHTS[[13, 23]] = (1 + math.sqrt(2)) / 2
_PERIM_KERNEL = np.array([[10, 2, 10], [2, 1, 2], [10, 2, 10]])


def perimeter(mask: np.ndarray) -> float:
    """skimage.measure.perimeter (4-connectivity border, weighted counts)."""
    image = (np.asarray(mask) > 0).astype(np.uint8)
    strel = ndimage.generate_binary_structure(2, 1)
    eroded = ndimage.binary_erosion(image, strel, border_value=0)
    border = image - eroded.astype(np.uint8)
    perimeter_image = ndimage.convolve(
        border.astype(np.int32), _PERIM_KERNEL, mode="constant", cval=0
    )
    hist = np.bincount(perimeter_image[border > 0].ravel(), minlength=50)[:50]
    return float(hist @ _PERIM_WEIGHTS)


def _region_moments(rows: np.ndarray, cols: np.ndarray):
    """Central second moments of pixel coordinates (+1/12 pixel inertia not
    applied; skimage uses raw central moments for inertia_tensor)."""
    r0, c0 = rows.mean(), cols.mean()
    dr, dc = rows - r0, cols - c0
    mu20 = np.mean(dr * dr)
    mu02 = np.mean(dc * dc)
    mu11 = np.mean(dr * dc)
    return mu20, mu02, mu11


def eccentricity_from_moments(mu20, mu02, mu11) -> float:
    """skimage eccentricity via inertia tensor eigenvalues."""
    t = mu20 + mu02
    d = math.sqrt(max((mu20 - mu02) ** 2 + 4 * mu11**2, 0.0))
    l1 = (t + d) / 2
    l2 = (t - d) / 2
    if l1 == 0:
        return 0.0
    return math.sqrt(max(1 - l2 / l1, 0.0))


_ALL_PROPS = ("area", "perimeter", "eccentricity", "equivalent_diameter_area")


def region_properties(
    labels: np.ndarray, n_labels: int, props=_ALL_PROPS
) -> Dict[str, np.ndarray]:
    """Per-region area / perimeter / eccentricity / equivalent diameter.

    Index i of each array corresponds to label i+1 (like regionprops
    order). Only the requested ``props`` are computed: eccentricity is a
    set of vectorized bincount moment reductions over the whole raster,
    but perimeter needs a per-region pass (the border-code convolution
    would mix codes between diagonally adjacent components), so skipping
    it matters on skeleton images with hundreds of components.

    Native C++ fast path computes every requested property in one raster
    scan (csrc/labeling.cpp); this NumPy body is the fallback/oracle.
    """
    from tmat_tpu.topo import labeling_native as ln

    native = ln.region_props_native(labels, n_labels, props)
    if native is not None:
        return native
    idx = labels.ravel()
    areas = np.bincount(idx, minlength=n_labels + 1)[1:].astype(float)
    out: Dict[str, np.ndarray] = {}
    if "area" in props:
        out["area"] = areas
    if "equivalent_diameter_area" in props:
        out["equivalent_diameter_area"] = np.sqrt(4 * areas / np.pi)

    if "eccentricity" in props:
        rr, cc = np.indices(labels.shape)
        safe = np.maximum(areas, 1.0)

        def mean_of(w):
            return np.bincount(idx, weights=w.ravel(), minlength=n_labels + 1)[
                1:
            ] / safe

        r0 = mean_of(rr.astype(np.float64))
        c0 = mean_of(cc.astype(np.float64))
        mu20 = mean_of((rr * rr).astype(np.float64)) - r0 * r0
        mu02 = mean_of((cc * cc).astype(np.float64)) - c0 * c0
        mu11 = mean_of((rr * cc).astype(np.float64)) - r0 * c0
        t = mu20 + mu02
        d = np.sqrt(np.maximum((mu20 - mu02) ** 2 + 4 * mu11**2, 0.0))
        l1 = (t + d) / 2
        l2 = (t - d) / 2
        with np.errstate(divide="ignore", invalid="ignore"):
            eccs = np.sqrt(np.maximum(1 - l2 / np.maximum(l1, 1e-300), 0.0))
        eccs[l1 <= 0] = 0.0
        eccs[areas == 0] = 0.0
        out["eccentricity"] = eccs

    if "perimeter" in props:
        perims = np.zeros(n_labels)
        objects = ndimage.find_objects(labels)
        for i, sl in enumerate(objects):
            if sl is None:
                continue
            sub = labels[sl] == (i + 1)
            perims[i] = perimeter(sub)
        out["perimeter"] = perims
    return out


def regionprops_image(mask: np.ndarray, prop: str) -> np.ndarray:
    """Rasterize a per-region scalar property back onto the mask
    (transforms.py:291-303)."""
    labels, n = label(mask)
    if n == 0:
        return np.zeros(mask.shape, float)
    props = region_properties(labels, n, props=(prop,))[prop]
    lut = np.concatenate(([0.0], props))
    return lut[labels]


def remove_small_objects(labels: np.ndarray, min_size: int) -> np.ndarray:
    """Zero out labeled regions smaller than min_size (skimage semantics:
    regions with size < min_size are removed)."""
    from tmat_tpu.topo import labeling_native as ln

    if np.issubdtype(labels.dtype, np.integer):
        native = ln.remove_small_objects_native(
            labels, int(labels.max(initial=0)), min_size
        )
        if native is not None:
            return native
    out = labels.copy()
    counts = np.bincount(labels.ravel())
    too_small = counts < min_size
    too_small[0] = False
    out[too_small[labels]] = 0
    return out
