"""Device-side image kernels (pure JAX / Pallas).

Every op here is jit-safe (static shapes, no Python data-dependent control
flow) and batched: leading axes are carried through so plates of wells or
stacks of slices run as one XLA program.
"""
