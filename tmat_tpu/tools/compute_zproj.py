"""Compute Z projections from image stacks.

This tool creates Z projections from image stacks using one of five
projection methods (min/max/med/avg/focus-stacking) and can chain into the
cell-area tool. CLI surface and outputs match the reference
scripts/compute_zproj.py:26-123; the projections themselves run as jitted
device reductions (ops/zproj.py), with same-shape stacks batched into one
XLA call.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

from tmat_tpu.core import io as tio
from tmat_tpu.core.log import SFM, END_SEPARATOR, section_header
from tmat_tpu.ops.zproj import PROJ_METHODS, proj_focus_stacking
from tmat_tpu.tools import args as su

# per-(shape, dtype) jit closures for the focus-stacking projection so the
# AOT executable cache can serve it cross-process (no closed-over weights)
_FS_JITS: dict = {}


def _fs_aot(img):
    import jax
    import jax.numpy as jnp

    from tmat_tpu.core.aot_cache import aot_call

    img = jnp.asarray(img)
    key = (tuple(img.shape), img.dtype.name)
    fn = _FS_JITS.get(key)
    if fn is None:
        fn = _FS_JITS[key] = jax.jit(proj_focus_stacking)
    try:
        return aot_call(fn, (img,), ("zproj_fs",) + key, label="zproj")
    except jax.errors.JaxRuntimeError:
        # a Mosaic compile failure surfaces here (not inside
        # proj_focus_stacking's own dispatch-time fallback when traced
        # under this jit) — the eager path warns and falls back to XLA
        return proj_focus_stacking(img)


def main(args=None, argv=None):
    from tmat_tpu.core.compile_cache import enable_persistent_cache
    from tmat_tpu.parallel.distributed import (
        gather_objects,
        is_multiprocess,
        maybe_initialize_from_env,
        process_index,
        stripe,
        sync_processes,
    )
    from tmat_tpu.tools.args import check_striped_discovery

    # multi-host runs set TMAT_TPU_COORDINATOR (+ process id/count, or
    # TPU-pod auto-detection); must run before the backend is touched
    maybe_initialize_from_env()
    enable_persistent_cache()

    """Computes z projections and saves to output directory."""
    if args is None:
        args = su.parse_zproj_args(argv)
        args_prespecified = False
    else:
        args_prespecified = True

    compute_area_after = getattr(args, "area", False)

    su.check_input_dir_structure(args.in_root)

    zstack_paths = su.resolve_image_paths(args.in_root)
    if not zstack_paths:
        print(f"{SFM.failure} No Z stacks found in {args.in_root}", flush=True)
        sys.exit(1)

    su.verify_output_dir(args.out_root)

    section_header("Constructing Z Projections")
    proj_method = PROJ_METHODS[args.method]
    print("Loading and computing Z stacks...", flush=True)

    # multi-host scale-out: each process projects a round-robin stripe of
    # the stacks (outputs are strictly per-stack files — no shared file)
    check_striped_discovery(list(zstack_paths))
    stripe_error = None
    for zs_id, zs_path in stripe(zstack_paths.items()):
        print(f"Processing {zs_id}...", flush=True)
        try:
            img, _ = tio.load_image(zs_path, args.time, args.channel)
        except OSError as error:
            print(f"{SFM.failure}{error}", flush=True)
            if is_multiprocess():
                # do NOT exit: peers would either hang in the chain
                # barrier below or silently "succeed" with this stripe's
                # projections missing; fail together instead
                stripe_error = f"process {process_index()}: {error}"
                break
            sys.exit(1)
        # med/avg of integer stacks produce floats; save_image keeps them as
        # float TIFFs (mirroring the reference's cv2.imwrite behavior)
        if args.method == "fs":
            # focus stacking is the one heavy zproj program (blur +
            # Laplacian + argmax-gather); serve it from the cross-process
            # AOT executable cache. The jit closure preserves the Pallas
            # dispatch inside proj_focus_stacking; if the Mosaic payload
            # resists serialization, aot_call falls back to plain jit.
            zproj = np.asarray(_fs_aot(img))
        else:
            zproj = np.asarray(proj_method(img))
        out_ext = Path(np.atleast_1d(zs_path)[0]).suffix.lower()
        if out_ext not in (".tif", ".tiff", ".png"):
            out_ext = ".tiff"
        save_path = os.path.join(args.out_root, f"{zs_id}_{args.method}{out_ext}")
        save_path = tio.get_unique_output_filepath(save_path)
        tio.save_image(save_path, zproj)
        print(f"Z projection saved to {save_path}", flush=True)

    if is_multiprocess():
        # coordinated success/failure: without this gather a process that
        # failed mid-stripe would leave the combined run silently missing
        # its projections (plain zproj has no later collective)
        errors = [e for e in gather_objects(stripe_error) if e]
        if errors:
            for e in errors:
                print(f"{SFM.failure} {e}", flush=True)
            sys.exit(1)

    print("... Projections saved.", flush=True)
    print(SFM.success, flush=True)
    print(END_SEPARATOR, flush=True)

    if compute_area_after:
        from tmat_tpu.core import defs
        from tmat_tpu.tools import compute_cell_area

        # every process must see every projection before the chained area
        # tool re-discovers the out_root (multi-host runs need the out dir
        # on shared storage for the chain; check_striped_discovery in the
        # area tool fails loudly if the listings diverge)
        sync_processes("zproj->area")

        if args_prespecified:
            compute_cell_area.main(args)
        else:
            # Chain area computation using out_root as both input and output
            # (compute_zproj.py:98-119), in-process rather than a subprocess.
            chained_argv = [args.out_root, args.out_root]
            if args.channel is not None:
                chained_argv += ["--channel", str(args.channel)]
            if args.time is not None:
                chained_argv += ["--time", str(args.time)]
            area_args = su.parse_cell_area_args(
                {
                    "default_config_path": str(
                        defs.default_config_path("default_cell_area_computation.json")
                    )
                },
                chained_argv,
            )
            compute_cell_area.main(area_args)


if __name__ == "__main__":
    main()
