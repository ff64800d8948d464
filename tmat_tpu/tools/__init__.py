"""The four batch workloads, CLI-compatible with the reference `tmat` tools:
compute_zproj, compute_cell_area, compute_inv_depth, compute_branches."""
