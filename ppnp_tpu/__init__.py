"""ppnp_tpu — a TPU-native PPNP/APPNP node-embedding and retrieval engine.

A from-scratch JAX/XLA/Pallas reimagination of the capabilities of the
reference repo `bkj/ppnp` (the official PPNP/APPNP personalized-PageRank GNN
code, ICLR 2019 — see SURVEY.md for the full reference analysis).

Layering (bottom → top), mirroring SURVEY.md §1 but TPU-first:

- ``ppnp_tpu.data``      — SparseGraph container, npz IO, synthetic surrogates
  (reference: ppnp/data/{io,sparsegraph}.py).
- ``ppnp_tpu.preprocessing`` — stratified splits, L1 attribute normalization
  (reference: ppnp/preprocessing.py).
- ``ppnp_tpu.ops``       — Â normalization, device sparse formats, power-
  iteration and exact-PPR propagation (reference: ppnp/pytorch/propagation.py).
- ``ppnp_tpu.kernels``   — Pallas TPU SpMM kernel (no reference analog; the
  reference uses scipy/torch.sparse on CPU/GPU).
- ``ppnp_tpu.models``    — the PPNP prediction MLP + plug-in propagation
  (reference: ppnp/pytorch/model.py).
- ``ppnp_tpu.parallel``  — device mesh, row-sharded propagation with boundary
  exchange, DP MLP (no reference analog; required by BASELINE.json:5).
- ``ppnp_tpu.train``     — training loop + early stopping
  (reference: ppnp/pytorch/{training,earlystopping}.py).
- ``ppnp_tpu.retrieval`` — top-k dot-product candidate retrieval over the
  (sharded) propagated embedding table (no reference analog; BASELINE.json:11).
"""

__version__ = "0.1.0"

from ppnp_tpu.data.sparsegraph import SparseGraph  # noqa: F401
from ppnp_tpu.data.datasets import load_dataset  # noqa: F401
