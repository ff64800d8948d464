"""Plate-scale distribution over a device mesh.

The reference has no distributed backend (SURVEY §2.5); this layer is the
TPU-native design: wells are the data-parallel axis over an ICI mesh, the
image height is an optional spatial axis, and pipelines run as sharded
jits with XLA inserting any needed collectives.
"""

from tmat_tpu.parallel.distributed import (
    fetch,
    initialize,
    is_multiprocess,
    is_primary,
    maybe_initialize_from_env,
    put_global,
    sync_processes,
)
from tmat_tpu.parallel.mesh import make_mesh, shard_leading, replicated
from tmat_tpu.parallel.plate import (
    plate_zproj,
    plate_zproj_masked,
    plate_threshold,
    plate_segment,
)
