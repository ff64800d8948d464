"""tmat_tpu — TPU-native tissue-model analysis framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
fogg-lab/tissue-model-analysis-tools (reference surveyed in SURVEY.md):
four batch microscopy workloads (Z-projection, cell coverage area,
invasion depth, microvessel branching), a Flax model zoo, a discrete
Morse topology engine with a native C++ kernel, and plate-scale
data-parallel execution over a `jax.sharding.Mesh`.

Layering (bottom to top):
  core/      image I/O, configs, logging, path plumbing
  ops/       pure-JAX + Pallas device kernels (projections, GMM threshold,
             morphology, filters, tiled inference, well masks)
  models/    Flax UNet-Xception & ResNet50-TL + optax training harnesses
  topo/      discrete-Morse graph kernel (C++) + MorseGraph analysis
  parallel/  device mesh setup and plate-scale sharded pipelines
  tools/     the four workloads, CLI-compatible with the reference
"""

__version__ = "0.1.0"
