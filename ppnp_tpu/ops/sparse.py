"""Device-side sparse formats for the propagation SpMM.

The reference keeps Â as a scipy CSR / ``torch.sparse`` tensor
(``ppnp/pytorch/propagation.py`` ~L45, ``utils.sparse_matrix_to_torch`` —
SURVEY.md §2.1). On TPU we instead want static-shape, padded, row-sorted
arrays that XLA and Pallas can tile:

- ``EdgeList`` — destination-sorted COO ``(dst, src, w)`` padded to a fixed
  nnz. This is the XLA-native format: SpMM = row gather + segment-sum, both
  of which XLA compiles well, and it is trivially differentiable.
- ``EllBlocks`` — row-blocked ELL (each row padded to the block's slot
  count): the Pallas kernel format. Column indices and values are laid out
  ``[n_row_blocks, block_rows, max_slots]`` so a kernel instance processes
  one row block with fully static shapes.

Both formats are built once at ingest on the host and shipped to device.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from flax import struct

from ppnp_tpu.utils.padding import round_up_to_multiple

__all__ = ["EdgeList", "edge_list_from_scipy", "EllBlocks",
           "ell_from_scipy"]


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


@struct.dataclass
class EllBlocks:
    """Row-blocked ELL layout for the Pallas SpMM kernel.

    ``cols[b, r, s]`` is the source-row index feeding destination row
    ``b * block_rows + r`` in slot ``s``; ``vals`` the matching Â value
    (0 for padding slots, with ``cols`` pointing at row 0 — a harmless
    gather). ``max_slots`` is the max row degree within the whole matrix,
    rounded up; row blocks are sized for the kernel's sublane tiling.
    """

    cols: jnp.ndarray  # int32 [n_blocks, block_rows, max_slots]
    vals: jnp.ndarray  # float32 [n_blocks, block_rows, max_slots]
    n_rows: int = struct.field(pytree_node=False)  # padded row count
    n_cols: int = struct.field(pytree_node=False)
    block_rows: int = struct.field(pytree_node=False)
    nnz: int = struct.field(pytree_node=False)

    @property
    def n_blocks(self) -> int:
        return self.cols.shape[0]

    @property
    def max_slots(self) -> int:
        return self.cols.shape[2]


def ell_from_scipy(
    mat: sp.spmatrix,
    block_rows: int = 256,
    slot_multiple: int = 8,
) -> EllBlocks:
    """Pack a scipy sparse matrix into row-blocked ELL."""
    csr = mat.tocsr()
    csr.sum_duplicates()
    n_rows, n_cols = csr.shape
    n_rows_pad = round_up_to_multiple(n_rows, block_rows)
    degrees = np.diff(csr.indptr)
    max_deg = int(degrees.max()) if len(degrees) else 1
    max_slots = round_up_to_multiple(max(max_deg, 1), slot_multiple)

    cols = np.zeros((n_rows_pad, max_slots), dtype=np.int32)
    vals = np.zeros((n_rows_pad, max_slots), dtype=np.float32)
    # Vectorized ELL fill: position of each nnz within its row.
    nnz = csr.nnz
    if nnz:
        row_ids = np.repeat(np.arange(n_rows), degrees)
        intra = np.arange(nnz) - np.repeat(csr.indptr[:-1], degrees)
        cols[row_ids, intra] = csr.indices
        vals[row_ids, intra] = csr.data
    n_blocks = n_rows_pad // block_rows
    cols = cols.reshape(n_blocks, block_rows, max_slots)
    vals = vals.reshape(n_blocks, block_rows, max_slots)
    return EllBlocks(cols=jnp.asarray(cols), vals=jnp.asarray(vals),
                     n_rows=n_rows_pad, n_cols=n_cols,
                     block_rows=block_rows, nnz=nnz)
