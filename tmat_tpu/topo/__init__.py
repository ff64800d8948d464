"""Discrete-Morse topology engine.

- dmtgraph: native C++ kernel (union-find persistence + unstable-manifold
  collection) with a pure-NumPy cross-check fallback
- morse: MorseGraph forest analysis (smoothing, trimming, branches, barcode)
- regionprops: connected-component statistics feeding mask filtering
"""

from tmat_tpu.topo.dmtgraph import compute_dmt_graph
from tmat_tpu.topo.morse import MorseGraph
