"""Data layer: graph container, npz IO, dataset registry, synthetic graphs.

Reference analog: ``ppnp/data/`` (io.py, sparsegraph.py, *.npz) — see
SURVEY.md §2.1 rows 1–3.
"""

from ppnp_tpu.data.sparsegraph import SparseGraph  # noqa: F401
from ppnp_tpu.data.io import load_from_npz, save_to_npz  # noqa: F401
from ppnp_tpu.data.datasets import load_dataset  # noqa: F401
