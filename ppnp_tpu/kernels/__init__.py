"""Pallas TPU kernels — the native compute tier of the framework.

The reference has zero native code (SURVEY.md §2.1: pure Python over
scipy/torch); its SpMM is ``torch.sparse.mm``. Here the propagation SpMM
is a hand-written Mosaic/TPU kernel (``spmm.py``) designed for the MXU:
gather and scatter are reformulated as small one-hot matmuls against a
VMEM-resident H (see ``ppnp_tpu.ops.pairchunks`` for the packing).
"""

from ppnp_tpu.kernels.blocked import (  # noqa: F401
    BlockedPairChunks, build_blocked_pair_chunks, spmm_blocked)
from ppnp_tpu.kernels.spmm import spmm_pair_chunks  # noqa: F401
