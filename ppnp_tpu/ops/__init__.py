"""Compute ops: Â normalization, device sparse formats, propagation.

Reference analog: ``ppnp/pytorch/propagation.py`` (SURVEY.md §2.1 rows
5–7), redesigned TPU-first: scipy only at ingest, then static-shape device
arrays, gather + segment-sum SpMM (XLA) or a Pallas kernel, and
``lax.scan`` power iteration with threaded PRNG keys for edge dropout.
"""

from ppnp_tpu.ops.normalize import calc_A_hat  # noqa: F401
from ppnp_tpu.ops.sparse import EdgeList, edge_list_from_scipy  # noqa: F401
from ppnp_tpu.ops.pairchunks import (  # noqa: F401
    PairChunks, pair_chunks_auto, pair_chunks_banded,
    pair_chunks_from_scipy, select_geometry, validate_pair_chunks,
)
from ppnp_tpu.ops.propagation import (  # noqa: F401
    spmm_edge_list, PPRPowerIteration,
)
from ppnp_tpu.ops.exact import calc_ppr_exact, PPRExact  # noqa: F401
