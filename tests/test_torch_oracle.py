"""Cross-backend redundancy check against a torch (CPU) oracle.

The reference's correctness story includes two parallel backends whose
agreement is an implicit consistency test (SURVEY.md §4 item 2: torch vs
TF). Here the second implementation is an independent torch-CPU build of
the same math; agreement of the full forward (MLP → K-step propagation →
log-softmax) validates our JAX path the same way.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ppnp_tpu.models.appnp import init_mlp_params, ppnp_forward  # noqa: E402
from ppnp_tpu.ops.normalize import calc_A_hat  # noqa: E402
from ppnp_tpu.ops.propagation import PPRPowerIteration  # noqa: E402
from ppnp_tpu.ops.sparse import edge_list_from_scipy  # noqa: E402
from ppnp_tpu.preprocessing import normalize_attributes  # noqa: E402


def _torch_forward(weights, x, a_hat_dense, alpha, niter):
    h = torch.from_numpy(x)
    for i, w in enumerate(weights):
        h = h @ torch.from_numpy(np.asarray(w))
        if i < len(weights) - 1:
            h = torch.relu(h)
    a = torch.from_numpy(a_hat_dense)
    preds = h
    for _ in range(niter):
        preds = (1 - alpha) * (a @ preds) + alpha * h
    return torch.log_softmax(preds, dim=-1).numpy()


def test_forward_matches_torch(small_graph):
    a_hat = calc_A_hat(small_graph.adj_matrix)
    x = np.asarray(normalize_attributes(small_graph.attr_matrix).todense(),
                   dtype=np.float32)
    n_classes = int(small_graph.labels.max()) + 1
    params = init_mlp_params(jax.random.PRNGKey(0), x.shape[1], [32],
                             n_classes)
    prop = PPRPowerIteration(edges=edge_list_from_scipy(a_hat), alpha=0.1,
                             niter=10)
    z_jax = np.asarray(
        ppnp_forward(params, jnp.asarray(x), prop, None, train=False))
    z_torch = _torch_forward(params, x, a_hat.toarray().astype(np.float32),
                             0.1, 10)
    np.testing.assert_allclose(z_jax, z_torch, rtol=5e-3, atol=5e-4)
