"""The PPNP/APPNP model: a small MLP producing local predictions, then a
plug-in propagation operator (power iteration or exact PPR), then
log-softmax.

Reference analog: ``ppnp/pytorch/model.py::PPNP`` (~L10 __init__, ~L35
forward — SURVEY.md §3.2):

- fcs = [Linear(nfeat→h₁, no bias), …, Linear(h_last→nclasses, no bias)]
- forward: dropout(X) → fc₁ → ReLU → dropout → fc₂ → … → H_local
  → propagation(H_local, idx) → log_softmax
- the L2-regularized set is the FIRST layer's weights only.

TPU-native design: parameters are a plain pytree (a list of weight
matrices — two dense layers don't justify a module framework, SURVEY.md
§7), the forward is a pure function, and the attribute matrix arrives
densified (dense X on the MXU beats sparse ops for these shapes; dropout
on a densified sparse matrix is mathematically identical to the
reference's MixedDropout, see ``ppnp_tpu.ops.dropout``).

Key structural fact preserved (SURVEY.md §3.2): the MLP always runs over
ALL n nodes; ``idx`` only selects output rows after propagation.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ppnp_tpu.ops.dropout import dropout
from ppnp_tpu.ops.sparse_input import ShardedSparseInput, SparseInput

__all__ = ["init_mlp_params", "mlp_forward", "ppnp_forward", "l2_reg"]

MlpParams = List[jnp.ndarray]  # list of weight matrices, no biases


def init_mlp_params(key: jax.Array, n_features: int,
                    hidden_units: Sequence[int], n_classes: int,
                    dtype=jnp.float32) -> MlpParams:
    """Glorot-uniform weights for [n_features, *hidden_units, n_classes]."""
    dims = [n_features, *hidden_units, n_classes]
    init = jax.nn.initializers.glorot_uniform()
    keys = jax.random.split(key, len(dims) - 1)
    return [init(k, (d_in, d_out), dtype)
            for k, d_in, d_out in zip(keys, dims[:-1], dims[1:])]


def mlp_forward(params: MlpParams, x: jnp.ndarray, *,
                key: Optional[jax.Array] = None, train: bool = False,
                drop_prob: float = 0.5) -> jnp.ndarray:
    """Local (pre-propagation) logits H_local for all n nodes.

    Dropout precedes every layer (the reference's layer stack); ReLU after
    every layer except the last.
    """
    use_drop = bool(train and drop_prob > 0.0 and key is not None)
    n_layers = len(params)
    if use_drop:
        keys = jax.random.split(key, n_layers)
    h = x
    for i, w in enumerate(params):
        if i == 0 and isinstance(x, (SparseInput, ShardedSparseInput)):
            # Sparse first layer (the reference's MixedDropout∘
            # MixedLinear): input dropout = id-keyed edge dropout on X's
            # nnz values, fc1 = SpMM through the pair-chunks kernel —
            # see ops/sparse_input.py. The sharded variant runs per
            # shard inside shard_map (row-sharded output).
            h = x.matmul(w, key=keys[0] if use_drop else None,
                         train=train, drop_prob=drop_prob)
        else:
            if use_drop:
                h = dropout(keys[i], h, drop_prob)
            if h.dtype != w.dtype:
                if jnp.finfo(h.dtype).bits < jnp.finfo(w.dtype).bits:
                    # Mixed-precision input path (x_dtype=bfloat16 in
                    # train_model): keep the 500MB-scale attribute matrix
                    # in bf16 end-to-end — dropout writes a bf16 dropped
                    # copy, the MXU consumes bf16 operands natively —
                    # while master weights stay f32. Casting W (1-2MB)
                    # down is free; accumulation stays f32 via
                    # preferred_element_type, so only the DATA is
                    # low-precision.
                    h = jnp.matmul(h, w.astype(h.dtype),
                                   preferred_element_type=w.dtype)
                else:
                    # Inverted case (weights narrower than the data —
                    # only reachable by API misuse): upcast the small
                    # operand so precision is never silently degraded.
                    h = h @ w.astype(h.dtype)
            else:
                h = h @ w
        if i < n_layers - 1:
            h = jax.nn.relu(h)
    return h


def ppnp_forward(params: MlpParams, x: jnp.ndarray, propagator,
                 idx: Optional[jnp.ndarray] = None, *,
                 key: Optional[jax.Array] = None, train: bool = False,
                 drop_prob: float = 0.5) -> jnp.ndarray:
    """Full PPNP forward: MLP → propagate → select idx → log_softmax."""
    if key is not None:
        key_mlp, key_prop = jax.random.split(key)
    else:
        key_mlp = key_prop = None
    with jax.named_scope("ppnp/mlp"):
        h_local = mlp_forward(params, x, key=key_mlp, train=train,
                              drop_prob=drop_prob)
    with jax.named_scope("ppnp/propagate"):
        z = propagator(h_local, idx, key=key_prop, train=train)
    return jax.nn.log_softmax(z, axis=-1)


def l2_reg(params: MlpParams) -> jnp.ndarray:
    """Σ‖W_fc1‖² — the reference regularizes the first layer only."""
    return jnp.sum(params[0] ** 2)
