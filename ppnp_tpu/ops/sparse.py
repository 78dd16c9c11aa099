"""Device-side sparse formats for the propagation SpMM.

The reference keeps Â as a scipy CSR / ``torch.sparse`` tensor
(``ppnp/pytorch/propagation.py`` ~L45, ``utils.sparse_matrix_to_torch`` —
SURVEY.md §2.1). On TPU we instead want static-shape, padded, row-sorted
arrays that XLA and Pallas can tile:

``EdgeList`` — destination-sorted COO ``(dst, src, w)`` padded to a fixed
nnz. This is the XLA-native format: SpMM = row gather + segment-sum, both
of which XLA compiles well, and it is trivially differentiable. It is
built once at ingest on the host and shipped to device. (The Pallas
kernels use their own format, ``ppnp_tpu.ops.pairchunks.PairChunks``.)
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from flax import struct

from ppnp_tpu.utils.padding import round_up_to_multiple

__all__ = ["EdgeList", "edge_list_from_scipy"]


@struct.dataclass
class EdgeList:
    """Destination-sorted, padded COO edges of a sparse matrix.

    Padding entries have ``w == 0`` and ``dst == n_rows - 1`` (keeping the
    dst array sorted so ``segment_sum`` can use ``indices_are_sorted``).
    ``n_rows`` is static so jit caches per matrix shape, not per matrix.
    """

    dst: jnp.ndarray  # int32 [nnz_pad], sorted ascending
    src: jnp.ndarray  # int32 [nnz_pad]
    w: jnp.ndarray    # float32 [nnz_pad]
    n_rows: int = struct.field(pytree_node=False)
    n_cols: int = struct.field(pytree_node=False)
    nnz: int = struct.field(pytree_node=False)  # real (unpadded) count

    @property
    def nnz_pad(self) -> int:
        return self.dst.shape[0]


def edge_list_from_scipy(
    mat: sp.spmatrix,
    nnz_pad: Optional[int] = None,
    pad_multiple: int = 512,
) -> EdgeList:
    """Convert a scipy sparse matrix to a padded, dst-sorted EdgeList."""
    csr = mat.tocsr()
    csr.sum_duplicates()
    coo = csr.tocoo()  # CSR→COO yields row-major (dst-sorted) order
    nnz = coo.nnz
    if nnz_pad is None:
        nnz_pad = round_up_to_multiple(max(nnz, 1), pad_multiple)
    if nnz_pad < nnz:
        raise ValueError(f"nnz_pad={nnz_pad} < nnz={nnz}")

    n_rows, n_cols = csr.shape
    pad = nnz_pad - nnz
    dst = np.concatenate([coo.row.astype(np.int32),
                          np.full(pad, n_rows - 1, dtype=np.int32)])
    src = np.concatenate([coo.col.astype(np.int32),
                          np.zeros(pad, dtype=np.int32)])
    w = np.concatenate([coo.data.astype(np.float32),
                        np.zeros(pad, dtype=np.float32)])
    return EdgeList(dst=jnp.asarray(dst), src=jnp.asarray(src),
                    w=jnp.asarray(w), n_rows=n_rows, n_cols=n_cols, nnz=nnz)
