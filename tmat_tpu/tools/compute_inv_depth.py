"""Predict depth of invasion in input directory of Z-stacks or Z-projections."""
import sys
from tmat_tpu.core.log import SFM


def main(args=None, argv=None):
    print(f"{SFM.failure} compute_inv_depth: model layer lands in a later milestone.")
    sys.exit(1)
