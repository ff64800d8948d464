"""CLI flag-vocabulary parity against the reference's OWN argparse.

Imports the reference's script_util (with lightweight shims for its
unavailable deps) and captures each tool parser it builds, then compares
against this framework's tools/args.py parsers: every reference option
string and positional must exist here, with matching nargs on the sweep
flags. Extra options on our side (e.g. --no-vis) are features, allowed.

Reference anchors: script_util.py parse_zproj_args:301,
parse_cell_area_args:208, parse_inv_depth_args:380,
parse_branching_args:40.
"""

import argparse
import sys
import types
from pathlib import Path

import pytest

REFERENCE_ROOT = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REFERENCE_ROOT / "fl_tissue_model_tools").is_dir(),
    reason="reference checkout not available",
)


def _shim(name, parent=None, **attrs):
    m = types.ModuleType(name)
    m.__path__ = []
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    if parent is not None:
        setattr(sys.modules[parent], name.rsplit(".", 1)[1], m)
    return m


class _Stop(Exception):
    pass


def _capture(fn, *args):
    """Run a parse_* function but intercept at parse_args, returning the
    fully-built parser instead of parsing."""
    orig = argparse.ArgumentParser.parse_args
    box = {}

    def fake(self, *a, **k):
        box["parser"] = self
        raise _Stop

    argparse.ArgumentParser.parse_args = fake
    try:
        try:
            fn(*args)
        except _Stop:
            pass
    finally:
        argparse.ArgumentParser.parse_args = orig
    return box["parser"]


def _vocab(parser):
    opts = {o for a in parser._actions for o in a.option_strings}
    pos = [a.dest for a in parser._actions if not a.option_strings]
    nargs = {
        o: a.nargs for a in parser._actions for o in a.option_strings
    }
    return opts, pos, nargs


@pytest.fixture(scope="module")
def parsers():
    """(reference parser, our parser) per tool."""
    if "fl_tissue_model_tools.script_util" not in sys.modules:
        # reuse the richer numba/tqdm shims (tqdm objects need .refresh());
        # installing a weaker shim here poisoned test_reference_parity,
        # whose installer skips names already in sys.modules
        try:
            from tests.test_reference_parity import _install_shims
        except ImportError:  # tests/ not importable as a package
            from test_reference_parity import _install_shims

        _install_shims()
        if "aicsimageio" not in sys.modules:
            _shim("aicsimageio", AICSImage=object)
            _shim("aicsimageio.dimensions", "aicsimageio", Dimensions=object)
            _shim("aicsimageio.types", "aicsimageio", PhysicalPixelSizes=object)
            _shim(
                "aicsimageio.exceptions", "aicsimageio",
                UnsupportedFileFormatError=type(
                    "UnsupportedFileFormatError", (Exception,), {}
                ),
            )
        sys.path.insert(0, str(REFERENCE_ROOT))
        try:
            import fl_tissue_model_tools  # noqa: F401  (empty package init)

            if "fl_tissue_model_tools.defs" not in sys.modules:
                # the real defs raises without an installed package.cfg
                # (the reference's PyInstaller-detection path). This stub
                # must be a SUPERSET of test_reference_parity's (whose
                # installer skips names already in sys.modules): the GMM
                # parity tests need MAX_UINT8/MAX_UINT16/EPSILON too.
                import numpy as _np

                _shim(
                    "fl_tissue_model_tools.defs", "fl_tissue_model_tools",
                    SUPPORTED_IMAGE_FORMATS=("tif", "tiff", "nd2"),
                    BASE_DIR=Path("/tmp"), SCRIPT_CONFIG_DIR=Path("/tmp"),
                    PKG_MODEL_DIR=Path("/tmp"), PKG_CONFIG_DIR=Path("/tmp"),
                    MAX_UINT8=255, MAX_UINT16=65535,
                    EPSILON=_np.finfo(_np.float32).eps,
                )
            from fl_tissue_model_tools import script_util as ref_su
        finally:
            sys.path.remove(str(REFERENCE_ROOT))
    else:
        ref_su = sys.modules["fl_tissue_model_tools.script_util"]

    from tmat_tpu.tools import args as our_args

    defaults = {
        "default_config_path": "x.json",
        "thresh_subdir": "t",
        "calc_subdir": "c",
    }
    pairs = {}
    for name, fargs in [
        ("parse_zproj_args", ()),
        ("parse_cell_area_args", (defaults,)),
        ("parse_inv_depth_args", (defaults,)),
        ("parse_branching_args", (defaults,)),
    ]:
        ref_p = _capture(getattr(ref_su, name), *fargs)
        our_p = _capture(getattr(our_args, name), *fargs)
        pairs[name] = (ref_p, our_p)
    return pairs


@pytest.mark.parametrize(
    "name",
    [
        "parse_zproj_args",
        "parse_cell_area_args",
        "parse_inv_depth_args",
        "parse_branching_args",
    ],
)
def test_flag_vocabulary_superset(parsers, name):
    ref_p, our_p = parsers[name]
    ref_opts, ref_pos, ref_nargs = _vocab(ref_p)
    our_opts, our_pos, our_nargs = _vocab(our_p)
    missing = ref_opts - our_opts
    assert not missing, f"{name}: reference options missing here: {sorted(missing)}"
    assert ref_pos == our_pos, (
        f"{name}: positionals differ: ref {ref_pos} vs ours {our_pos}"
    )
    for opt in ref_opts:
        assert our_nargs[opt] == ref_nargs[opt], (
            f"{name}: {opt} nargs differs: ref {ref_nargs[opt]!r} "
            f"vs ours {our_nargs[opt]!r}"
        )


def test_branching_sweep_flags_accept_lists(parsers):
    """The sweep contract: graph-thresh-1/2 take one or more values
    (reference script_util.py graph_thresh nargs='+', README:308-320)."""
    _, our_p = parsers["parse_branching_args"]
    _, _, nargs = _vocab(our_p)
    assert nargs["--graph-thresh-1"] == "+"
    assert nargs["--graph-thresh-2"] == "+"
