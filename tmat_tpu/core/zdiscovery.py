"""Z-stack discovery from directories of numbered image files.

Parity target: fl_tissue_model_tools/zstacks.py:18-131 (clean_zstack_ids,
find_zstack_image_sequences, find_zstack_files) and exceptions.py:3-13.
The discovery rules (``z<number>`` slice parsing, reversed multi-number
lexicographic ordering, SequenceMatcher-based ID cleanup) are behavioral
contracts of the reference CLI and are reproduced exactly.
"""

from __future__ import annotations

import os.path as osp
import re
from difflib import SequenceMatcher
from glob import glob
from typing import Dict, List

FILES_AND_DIRS_ERROR = (
    "Input directory must contain either image files or subdirectories of "
    "image files, but not both."
)


class ZStackInputError(Exception):
    """Raised when the Z-stack naming/numbering convention can't be parsed."""


def clean_zstack_ids(zstack_ids: List[str]) -> List[str]:
    """Simplify stack IDs while keeping them unique (zstacks.py:18-61)."""
    original_zstack_ids = zstack_ids

    # Drop directory prefixes that only repeat information in the basename
    ids = []
    for zid in zstack_ids:
        name = osp.basename(zid)
        dir_name = osp.dirname(zid)
        if len(dir_name) > len(name) / 2:
            matcher = SequenceMatcher(a=dir_name.lower(), b=name.lower())
            sum_matches = sum(m.size for m in matcher.get_matching_blocks())
            if sum_matches == len(dir_name):
                zid = name
        ids.append(zid)
    zstack_ids = ids if len(set(ids)) == len(ids) else zstack_ids

    ids = [zid.replace("/", "_").replace("\\", "_") for zid in zstack_ids]
    if len(set(ids)) != len(ids):
        zstack_ids = [
            zid.replace("/", "_").replace("\\", "_") for zid in original_zstack_ids
        ]
    else:
        zstack_ids = ids

    for transform in (str.lstrip, str.rstrip):
        ids = [transform(zid, "_") for zid in zstack_ids]
        zstack_ids = ids if len(set(ids)) == len(ids) else zstack_ids

    ids = [zid.replace("__", "_") for zid in zstack_ids]
    zstack_ids = ids if len(set(ids)) == len(ids) else zstack_ids

    return zstack_ids


def find_zstack_image_sequences(input_dir: str) -> Dict[str, List[str]]:
    """Group numbered per-slice image files into Z stacks (zstacks.py:64-116)."""
    img_paths = list(filter(osp.isfile, glob(osp.join(input_dir, "*"))))
    if not img_paths:
        img_paths = list(filter(osp.isfile, glob(osp.join(input_dir, "*", "*"))))

    zslice_stack_ids = []
    zslice_numbers_in_name = []
    for img_path in img_paths:
        relpath = osp.relpath(img_path, input_dir)
        name = osp.basename(relpath)
        dir_name = osp.dirname(relpath)
        zstack_id = osp.join(dir_name, re.sub(r"z\d+", "", name, flags=re.IGNORECASE))
        zstack_id = osp.splitext(zstack_id)[0]
        zslice_stack_ids.append(zstack_id)
        zslice_numbers_in_name.append(
            list(map(int, re.findall(r"(?<=z)\d+", name, re.IGNORECASE)))[::-1]
        )

    original_ids = list(set(zslice_stack_ids))
    id_map = dict(zip(original_ids, clean_zstack_ids(original_ids)))
    zslice_stack_ids = [id_map[zid] for zid in zslice_stack_ids]

    zstacks: Dict[str, List[str]] = {}
    for zstack_id in set(zslice_stack_ids):
        zstacks[zstack_id] = []
        zs_inds = [i for i, zid in enumerate(zslice_stack_ids) if zid == zstack_id]
        zs_nums_in_name = [zslice_numbers_in_name[i] for i in zs_inds]
        if not all(len(nums) == len(zs_nums_in_name[0]) for nums in zs_nums_in_name):
            raise ZStackInputError("Unrecognized Z slice naming convention")
        if len({tuple(nums) for nums in zs_nums_in_name}) != len(zs_inds):
            raise ZStackInputError(
                "Unrecognized Z slice numbering convention in image names"
            )
        zs_nums = [nums + [i] for i, nums in zip(zs_inds, zs_nums_in_name)]
        for nums in sorted(zs_nums):
            zstacks[zstack_id].append(img_paths[nums[-1]])

    return zstacks


def find_zstack_files(input_dir: str) -> Dict[str, str]:
    """Map stack IDs to single-file Z stacks (zstacks.py:119-131)."""
    img_paths = list(filter(osp.isfile, glob(osp.join(input_dir, "*"))))
    return {osp.splitext(osp.basename(fp))[0]: fp for fp in img_paths}
