"""Reference-executed oracle for Z-stack discovery (VERDICT r4 item 3).

Runs the reference's own ``zstacks.clean_zstack_ids`` /
``find_zstack_image_sequences`` / ``find_zstack_files`` (zstacks.py:18-131)
against ``tmat_tpu.core.zdiscovery`` over adversarial id sets and directory
layouts. Everything must agree bit-for-bit EXCEPT the one documented
divergence: when separator-flattening keeps ids unique, the reference
discards the flattening (keeping '/' in ids that become filename stems)
while this codebase adopts it. That divergence is pinned here explicitly,
in both directions (see zdiscovery.clean_zstack_ids docstring and
PARITY.md "semantic decisions").
"""

import sys
from pathlib import Path

import pytest

from tmat_tpu.core import zdiscovery as zd

REFERENCE_ROOT = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REFERENCE_ROOT / "fl_tissue_model_tools").is_dir(),
    reason="reference checkout not available",
)


@pytest.fixture(scope="module")
def ref_zstacks():
    sys.path.insert(0, str(REFERENCE_ROOT))
    try:
        from fl_tissue_model_tools import zstacks as ref_zs
    finally:
        sys.path.remove(str(REFERENCE_ROOT))
    return ref_zs


def _flatten(zid: str) -> str:
    return zid.replace("/", "_").replace("\\", "_")


# ---------------------------------------------------------------------------
# clean_zstack_ids
# ---------------------------------------------------------------------------

AGREEMENT_CASES = [
    # plain ids, nothing to simplify
    ["A1", "A2", "B1"],
    # redundant directory prefix dropped by both sides
    ["well1/well1_s", "well2/well2_s"],
    # redundant-prefix simplification collides -> both keep originals, and
    # the subsequent flattening also collides -> both flatten the originals
    ["ab/abx", "ax/abx", "ab_abx"],
    # flattening collides -> both flatten the ORIGINAL ids (duplicates kept)
    ["a/b", "a_b"],
    # leading/trailing underscores stripped by both
    ["_A1_", "_B2_"],
    # stripping would collide -> both keep
    ["_A", "A"],
    # doubled underscores collapsed by both
    ["A__1", "B__2"],
    # collapsing would collide -> both keep
    ["A__1", "A_1"],
    # multi-number, mixed-case ids
    ["Z01_stack", "Z02_stack", "plate__3"],
    # empty and single-element lists
    [],
    ["only"],
]


@pytest.mark.parametrize("ids", AGREEMENT_CASES, ids=repr)
def test_clean_ids_agree_with_reference(ref_zstacks, ids):
    assert zd.clean_zstack_ids(list(ids)) == ref_zstacks.clean_zstack_ids(list(ids))


DIVERGENCE_CASES = [
    # unique after flattening: reference discards the flattening, we adopt it
    ["well1/sliceA", "well2/sliceB"],
    ["d1/img", "d2/img"],
    [r"p\q", "r/s"],
]


@pytest.mark.parametrize("ids", DIVERGENCE_CASES, ids=repr)
def test_clean_ids_documented_flattening_divergence(ref_zstacks, ids):
    ours = zd.clean_zstack_ids(list(ids))
    refs = ref_zstacks.clean_zstack_ids(list(ids))
    # the reference keeps the separators (its quirk: the unique flattening
    # is computed and then dropped, zstacks.py:44-48)
    assert refs == ids
    # we adopt the flattening; modulo that one pass, the sides agree
    assert ours == [_flatten(z) for z in refs]
    assert all("/" not in z and "\\" not in z for z in ours)


def test_clean_ids_property_never_collapses(ref_zstacks):
    """Both implementations preserve distinctness of distinct inputs — the
    adopt-if-unique contract — EXCEPT through the shared flatten-on-collision
    branch, which both sides adopt even when it collides (zstacks.py:44-48:
    on collision the *originals* are flattened and kept regardless). Combos
    that hit that hole are excluded, matching the reference's behavior."""
    import itertools

    pieces = ["a", "_a", "a_", "x/y", "x_y", "w1/w1s", "__z"]
    for combo in itertools.combinations(pieces, 3):
        ids = list(combo)
        flat = [_flatten(z) for z in ids]
        if len(set(flat)) != len(flat):
            continue  # the documented collapse hole both sides share
        for fn in (zd.clean_zstack_ids, ref_zstacks.clean_zstack_ids):
            out = fn(list(ids))
            assert len(set(out)) == len(set(ids)), (ids, out, fn)


# ---------------------------------------------------------------------------
# find_zstack_image_sequences / find_zstack_files
# ---------------------------------------------------------------------------


def _touch(root: Path, rel: str):
    p = root / rel
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_bytes(b"x")


def _compare_sequences(ref_zstacks, root: Path, keys_diverge: bool = False):
    ours = zd.find_zstack_image_sequences(str(root))
    refs = ref_zstacks.find_zstack_image_sequences(str(root))
    if keys_diverge:
        refs = {_flatten(k): v for k, v in refs.items()}
    assert set(ours) == set(refs)
    for k in ours:
        assert ours[k] == refs[k], k  # exact slice ordering contract


def test_sequences_flat_dir(ref_zstacks, tmp_path):
    for name in ["A_z02.tif", "A_z1.tif", "A_z3.tif", "B_z1.tif", "B_z2.tif"]:
        _touch(tmp_path, name)
    _compare_sequences(ref_zstacks, tmp_path)


def test_sequences_multi_number_names(ref_zstacks, tmp_path):
    # two z-numbers per name: ordering key is the REVERSED number tuple
    for name in [
        "scanz1_imgz2.tif",
        "scanz1_imgz1.tif",
        "scanz2_imgz1.tif",
        "scanz2_imgz2.tif",
    ]:
        _touch(tmp_path, name)
    _compare_sequences(ref_zstacks, tmp_path)


def test_sequences_redundant_subdirs(ref_zstacks, tmp_path):
    # dirname only repeats the basename -> both sides drop it, keys agree
    for rel in [
        "well1/well1_z1.tif",
        "well1/well1_z2.tif",
        "well2/well2_z1.tif",
        "well2/well2_z2.tif",
    ]:
        _touch(tmp_path, rel)
    _compare_sequences(ref_zstacks, tmp_path)


def test_sequences_nonredundant_subdirs_key_divergence(ref_zstacks, tmp_path):
    # dirnames carry real information -> ids keep them; the reference keeps
    # the '/' (its flattening quirk), we flatten to a usable filename stem
    for rel in [
        "day1/img_z1.tif",
        "day1/img_z2.tif",
        "day2/img_z1.tif",
        "day2/img_z2.tif",
    ]:
        _touch(tmp_path, rel)
    ours = zd.find_zstack_image_sequences(str(tmp_path))
    assert all("/" not in k for k in ours)
    _compare_sequences(ref_zstacks, tmp_path, keys_diverge=True)


def test_sequences_mixed_widths_raise_like_reference(ref_zstacks, tmp_path):
    # both names reduce to the same stack id but carry 1 vs 2 z-numbers
    _touch(tmp_path, "A_z1.tif")
    _touch(tmp_path, "Az2_z3.tif")
    with pytest.raises(zd.ZStackInputError):
        zd.find_zstack_image_sequences(str(tmp_path))
    with pytest.raises(Exception) as exc:
        ref_zstacks.find_zstack_image_sequences(str(tmp_path))
    assert type(exc.value).__name__ == "ZStackInputException"


def test_sequences_duplicate_numbers_raise_like_reference(ref_zstacks, tmp_path):
    # same stack id, same z-number tuple (1 == 01) -> ambiguous ordering
    _touch(tmp_path, "A_z1.tif")
    _touch(tmp_path, "A_z01.tif")
    with pytest.raises(zd.ZStackInputError):
        zd.find_zstack_image_sequences(str(tmp_path))
    with pytest.raises(Exception) as exc:
        ref_zstacks.find_zstack_image_sequences(str(tmp_path))
    assert type(exc.value).__name__ == "ZStackInputException"


def test_find_zstack_files_matches_reference(ref_zstacks, tmp_path):
    for name in ["stackA.tif", "stackB.ome.tiff", "c.nd2"]:
        _touch(tmp_path, name)
    (tmp_path / "subdir").mkdir()  # directories must be ignored
    ours = zd.find_zstack_files(str(tmp_path))
    refs = ref_zstacks.find_zstack_files(str(tmp_path))
    assert ours == refs
