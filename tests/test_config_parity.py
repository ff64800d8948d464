"""Shipped tool-config defaults are key/value-identical to the reference's.

The reference copies config/*.json into the user base dir at install and
merges CLI flags over them (script_util.py merge logic, e.g.
compute_branches.py:510-522); tools here do the same, so the shipped
defaults must match exactly — a silently-different default (say
graph_thresh_1) would change every analysis without any flag given.
"""

import json
from pathlib import Path

import pytest

REFERENCE_CONFIG = Path("/root/reference/config")
OUR_CONFIG = Path(__file__).resolve().parent.parent / "config"

pytestmark = pytest.mark.skipif(
    not REFERENCE_CONFIG.is_dir(), reason="reference checkout not available"
)


@pytest.mark.parametrize(
    "name",
    [
        "default_branching_computation.json",
        "default_cell_area_computation.json",
        "default_invasion_depth_computation.json",
    ],
)
def test_default_config_identical(name):
    ref = json.loads((REFERENCE_CONFIG / name).read_text())
    ours = json.loads((OUR_CONFIG / name).read_text())
    assert ours == ref, f"{name}: shipped defaults diverge from the reference"


def test_no_reference_config_missing():
    ref_names = {p.name for p in REFERENCE_CONFIG.glob("*.json")}
    our_names = {p.name for p in OUR_CONFIG.glob("*.json")}
    assert ref_names <= our_names, (
        f"reference config files missing here: {sorted(ref_names - our_names)}"
    )
