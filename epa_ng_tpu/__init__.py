"""epa_ng_tpu — a TPU-native phylogenetic placement framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of EPA-ng
(maximum-likelihood evolutionary placement of query sequences onto a fixed
reference tree), formulated as dense batched tensor algebra:

- reference-tree conditional likelihood vectors (CLVs) for every edge live as
  HBM-resident ``[edges, sites, rates, states]`` tensors,
- preplacement scoring is a single one-hot contraction on the MXU,
- thorough placement is a vmapped Newton branch-length optimization working in
  the eigenbasis of the substitution model ("sumtable" form),
- multi-chip scaling uses ``jax.sharding`` meshes (queries data-parallel,
  edges model-parallel) instead of MPI.

Reference behavior parity targets EPA-ng v0.3.8 (see SURVEY.md).
"""

__version__ = "0.1.0"

from epa_ng_tpu.utils.options import Options  # noqa: F401
