"""Locator + integrity manifest for the reference's real sample TIFFs.

The strongest tests in the suite (test_real_data_goldens.py,
test_real_data_cli_goldens.py) pin Morse statistics on two real vessel
masks shipped with the reference repo. The files are NOT vendored here —
the reference is under a restrictive academic license (Oregon State
"Free Academic Research Use") — so this module records their SHA-256
hashes and provenance, and resolves their location:

  1. ``TMAT_TPU_REFERENCE_SAMPLES`` env var (a directory holding the two
     TIFFs), for environments without the /root/reference checkout;
  2. the default read-only checkout path used by this build environment.

Fetch note: the files live in the upstream repository
fogg-lab/tissue-model-analysis-tools at
``notebooks/topology/sample_data/{mask.tif, D5_1_ZProj_002_mask.tif}``.

Hash verification makes a wrong or corrupted sample fail loudly (skip
with the mismatching hash in the reason) instead of producing confusing
golden diffs — and distinguishes "data not present" from "data present
but not the pinned bytes".
"""

import hashlib
import os
from pathlib import Path

DEFAULT_DIR = Path("/root/reference/notebooks/topology/sample_data")

SAMPLES = {
    "mask.tif": "e2a31b3be3aee00a8d43276f6ff042d383688e547c49836529c1bf587b45dbb8",
    "D5_1_ZProj_002_mask.tif": (
        "f2d51c134c7becc70c6db9b8d1f1251a161fcc219ad1ec04e9e2858e98e9182b"
    ),
}


def sample_dir() -> Path:
    override = os.environ.get("TMAT_TPU_REFERENCE_SAMPLES")
    return Path(override) if override else DEFAULT_DIR


def samples_unavailable_reason():
    """None if the pinned samples are present and hash-verified, else a
    skip reason naming exactly what is missing or mismatched."""
    d = sample_dir()
    if not d.is_dir():
        return (
            f"reference sample data not available at {d} (set "
            "TMAT_TPU_REFERENCE_SAMPLES; fetch note in tests/real_data.py)"
        )
    for name, expected in SAMPLES.items():
        p = d / name
        if not p.is_file():
            return f"sample {name} missing from {d}"
        got = hashlib.sha256(p.read_bytes()).hexdigest()
        if got != expected:
            return (
                f"sample {name} hash mismatch: got {got[:16]}…, pinned "
                f"{expected[:16]}… — wrong upstream revision?"
            )
    return None
