"""Simple end-to-end example — the reference's ``simple_example_*.ipynb``
flattened into a script (SURVEY.md §2.1 "Experiment driver").

Trains APPNP on Cora-ML with the paper's hyperparameters and prints the
early-stopping and test metrics, then runs a top-k retrieval query over
the propagated embedding table.

Run: python examples/simple_example.py
"""

import logging

import jax.numpy as jnp
import numpy as np

from ppnp_tpu import load_dataset
from ppnp_tpu.ops import (PPRPowerIteration, calc_A_hat,
                          edge_list_from_scipy)
from ppnp_tpu.preprocessing import normalize_attributes
from ppnp_tpu.retrieval import build_embedding_table, retrieve_topk
from ppnp_tpu.train import train_model

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(levelname)s: %(message)s")


def main():
    graph = load_dataset("cora_ml").standardize()
    print(f"loaded {graph}")

    # The propagation operator is pre-built and plugged into the model,
    # exactly like the reference's model_args['propagation'].
    a_hat = calc_A_hat(graph.adj_matrix)
    propagator = PPRPowerIteration(
        edges=edge_list_from_scipy(a_hat), alpha=0.1, niter=10,
        drop_prob=0.5)

    params, result = train_model(
        graph, propagator,
        hidden_units=[64], drop_prob=0.5,
        learning_rate=0.01, reg_lambda=5e-3,
        test=True, seed=0, print_interval=100)

    print(f"early stopping: {result['early_stopping']}")
    print(f"test (valtest): {result['valtest']}")
    print(f"runtime: {result['runtime']:.1f}s "
          f"({1000 * result['runtime_perepoch']:.1f} ms/epoch)")

    # Retrieval over the propagated hidden-layer embedding table.
    x = jnp.asarray(np.asarray(
        normalize_attributes(graph.attr_matrix).todense(),
        dtype=np.float32))
    table = build_embedding_table(params, x, propagator, level="hidden")
    scores, idx = retrieve_topk(table[:3], table, k=5)
    for q in range(3):
        print(f"node {q} nearest propagated embeddings: "
              f"{np.asarray(idx[q]).tolist()}")


if __name__ == "__main__":
    main()
