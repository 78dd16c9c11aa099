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


class _TorchPPNP(torch.nn.Module):
    """Independent torch build of the reference trainer's model
    (SURVEY.md §3.1-3.3): 1-hidden-layer MLP (no bias), dropout on
    inputs/hidden, K-step propagation with fresh edge dropout on Â's
    values each iteration, log-softmax."""

    def __init__(self, f, h, c, a_idx, a_val, n, alpha, niter, drop):
        super().__init__()
        self.fc1 = torch.nn.Linear(f, h, bias=False)
        self.fc2 = torch.nn.Linear(h, c, bias=False)
        self.a_idx, self.a_val, self.n = a_idx, a_val, n
        self.alpha, self.niter, self.drop = alpha, niter, drop

    def forward(self, x):
        h = torch.nn.functional.dropout(x, self.drop, self.training)
        h = torch.relu(self.fc1(h))
        h = torch.nn.functional.dropout(h, self.drop, self.training)
        h0 = self.fc2(h)
        preds = h0
        for _ in range(self.niter):
            v = torch.nn.functional.dropout(self.a_val, self.drop,
                                            self.training)
            a = torch.sparse_coo_tensor(self.a_idx, v, (self.n, self.n))
            preds = (1 - self.alpha) * torch.sparse.mm(a, preds) \
                + self.alpha * h0
        return torch.log_softmax(preds, dim=-1)


def _train_torch(graph, seed, *, alpha=0.1, niter=10, hidden=32,
                 drop=0.5, lr=0.01, reg=5e-3, max_epochs=200,
                 patience=50, idx_split_args=None):
    """Reference-semantics trainer: Adam, L2 on fc1 only, dual-criterion
    early stopping (improvement in stopping acc OR loss resets
    patience; best snapshot at highest acc, ties -> lower loss),
    best-state restore, valtest accuracy."""
    from ppnp_tpu.preprocessing import gen_splits

    torch.manual_seed(seed)
    labels = np.asarray(graph.labels)
    idx_tr, idx_st, idx_vt = gen_splits(
        labels, dict(idx_split_args, seed=seed & 0x7FFFFFFF), test=True)
    a_hat = calc_A_hat(graph.adj_matrix).tocoo()
    x = torch.from_numpy(np.asarray(
        normalize_attributes(graph.attr_matrix).todense(),
        dtype=np.float32))
    a_idx = torch.from_numpy(np.stack([a_hat.row, a_hat.col])).long()
    a_val = torch.from_numpy(a_hat.data.astype(np.float32))
    y = torch.from_numpy(labels).long()
    n_classes = int(labels.max()) + 1

    model = _TorchPPNP(x.shape[1], hidden, n_classes, a_idx, a_val,
                       x.shape[0], alpha, niter, drop)
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    best_acc, best_loss, best_state, wait = -1.0, np.inf, None, 0
    for epoch in range(max_epochs):
        model.train()
        opt.zero_grad()
        logp = model(x)
        loss = torch.nn.functional.nll_loss(logp[idx_tr], y[idx_tr]) \
            + (reg / 2) * (model.fc1.weight ** 2).sum()
        loss.backward()
        opt.step()
        model.eval()
        with torch.no_grad():
            logp = model(x)
            sl = float(torch.nn.functional.nll_loss(logp[idx_st],
                                                    y[idx_st]))
            sa = float((logp[idx_st].argmax(1) == y[idx_st])
                       .float().mean())
        improved = sa >= best_acc or sl <= best_loss
        if sa > best_acc or (sa == best_acc and sl < best_loss):
            best_state = {k: v.clone() for k, v
                          in model.state_dict().items()}
        best_acc, best_loss = max(sa, best_acc), min(sl, best_loss)
        wait = 0 if improved else wait + 1
        if wait >= patience:
            break
    if best_state is not None:
        model.load_state_dict(best_state)
    model.eval()
    with torch.no_grad():
        preds = model(x).argmax(1).numpy()
    return float((preds[idx_vt] == labels[idx_vt]).mean())


@pytest.mark.slow
def test_training_loop_matches_torch(small_graph):
    """Full TRAINING-loop oracle (VERDICT r4 item 7): an independent
    torch-CPU trainer with the reference's semantics (Adam, fc1-only
    L2, input/hidden/edge dropout, dual-criterion patience early
    stopping, best-state restore) reaches the same valtest accuracy as
    ``train_model`` within seed variance on the same splits."""
    from ppnp_tpu.train import train_model

    split_args = {"ntrain_per_class": 10, "nstopping": 60, "nknown": 200}
    seeds = [0, 1, 2]
    prop = PPRPowerIteration(
        edges=edge_list_from_scipy(calc_A_hat(small_graph.adj_matrix)),
        alpha=0.1, niter=10, drop_prob=0.5)
    jax_accs, torch_accs = [], []
    for s in seeds:
        _, res = train_model(
            small_graph, prop, hidden_units=(32,), seed=s, test=True,
            print_interval=0, epoch_chunk=50,
            idx_split_args=dict(split_args, seed=s),
            stopping_args={"max_epochs": 200, "patience": 50})
        jax_accs.append(res["valtest"]["accuracy"])
        torch_accs.append(_train_torch(small_graph, s,
                                       idx_split_args=split_args))
    jm, tm = float(np.mean(jax_accs)), float(np.mean(torch_accs))
    spread = max(np.ptp(jax_accs), np.ptp(torch_accs), 0.02)
    assert abs(jm - tm) <= spread + 0.03, \
        f"jax {jax_accs} vs torch {torch_accs}"
