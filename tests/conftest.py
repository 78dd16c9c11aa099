"""Test environment: force CPU with 8 virtual devices.

Per SURVEY.md §4, the TPU-native analog of "fake backends" for distributed
tests is 8 virtual CPU devices: mesh/shard_map/collective logic runs in one
process, and the single-device case is its N=1 degeneration.

NOTE: this environment pins ``JAX_PLATFORMS=axon`` (the TPU platform) and
overrides the env var, so we must force the platform through jax.config
before any device use. TPU-only tests (marked ``tpu``) spawn subprocesses.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

from ppnp_tpu.utils.compcache import enable_compilation_cache  # noqa: E402

# Persistent compile cache: slow XLA:CPU compiles (sharded train steps,
# pallas interpreter programs) skip recompilation across suite runs.
enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import scipy.sparse as sp  # noqa: E402

from ppnp_tpu.data.synthetic import make_attributed_sbm  # noqa: E402


# Tests measured ≥ ~8.5s on the single-core CI box (full-suite
# --durations run, 2026-08-21) — mostly Pallas interpret-mode
# compile+run costs. Matched by substring so a parametrized name
# without brackets marks every param. Inline @pytest.mark.slow also
# works; this central list saves touching a dozen files.
_SLOW_BY_ID = (
    "test_fused.py::test_fused_grad_eval_and_train",
    "test_fused.py::test_fused_odd_niter",
    "test_fused.py::test_fused_forward_eval_and_train",
    "test_sharded.py::test_sharded_pallas_train_dropout_runs",
    "test_sharded.py::test_sharded_pallas_grad_matches_xla",
    "test_sharded.py::test_sharded_pallas_matches_oracle",
    "test_train.py::test_cora_ml_integration",
    "test_multiprocess.py::test_multiprocess_sharded_pallas",
    "test_multiprocess.py::test_multiprocess_sharded_propagation",
    "test_multiprocess.py::test_multiprocess_fault_detection",
    "test_multiseed.py::test_batched_matches_sequential[pallas]",
    "test_banded.py::test_banded_fused_matches_per_step",
    "test_banded.py::test_banded_grad_matches_dense_oracle",
    "test_banded.py::test_banded_matches_scipy",
    "test_banded.py::test_banded_reordered_transparent",
    "test_banded.py::test_banded_hub_and_empty_rows",
    "test_banded.py::test_banded_empty_matrix",
    "test_banded.py::test_banded_rectangular",
    "test_banded.py::test_banded_native_spmm_correct",
    "test_kernel.py::test_pallas_training_with_dropout",
    "test_kernel.py::test_spmm_grad_id_dropout_matches_dense",
    "test_kernel.py::test_spmm_grad_transpose_packing",
    "test_kernel.py::test_kernel_asymmetric_src_window",
    "test_kernel.py::test_kernel_empty_rows_and_hubs",
    "test_kernel.py::test_propagation_pallas_reordered_matches_xla",
    "test_kernel.py::test_kernel_reordered_transparent",
    "test_kernel.py::test_kernel_rectangular",
    "test_kernel.py::test_native_packer_matches_numpy",
    "test_kernel.py::test_kernel_matches_scipy",
    "test_kernel.py::test_kernel_reordered_assume_permuted",
    "test_kernel.py::test_kernel_weight_override",
    "test_kernel.py::test_kernel_fused_init",
    "test_kernel.py::test_power_iteration_pallas_backend_matches_xla",
    "test_blocked.py::test_blocked_end_to_end_training",
    "test_blocked.py::test_blocked_grad_matches_dense",
    "test_blocked.py::test_blocked_train_dropout_statistics",
    "test_blocked.py::test_blocked_forward_matches_scipy",
    "test_blocked.py::test_blocked_propagation_matches_xla_backend",
    "test_blocked.py::test_blocked_init_and_scale",
    "test_blocked.py::test_blocked_auto_geometry_matches_scipy",
    "test_blocked.py::test_blocked_small_graph_single_block",
    "test_grouped.py::test_grouped_vjp_matches_per_group_grads",
    "test_grouped.py::test_grouped_matches_per_group_calls",
    "test_grouped.py::test_grouped_init_fuses_alpha_mix",
    "test_grouped.py::test_grouped_vjp_fallback_weight_transfer",
    "test_grouped.py::test_grouped_matches_scipy",
    "test_autotune.py::test_select_geometry_sampled_matches_full_count",
    "test_sparse_input.py::test_train_model_sparse_x",
    "test_harness.py::test_reproduce_full_table_with_standin_npz",
    "test_harness.py::test_bench_blocked_structure",
    "test_harness.py::test_cli_train_profile_flag",
)


def pytest_collection_modifyitems(config, items):
    # The fast tier: every test not marked ``slow`` (inline or via the
    # duration-derived list above) is ``quick``, so `pytest -m quick`
    # yields a <5 min green signal on one CPU core.
    for item in items:
        slow = "slow" in item.keywords
        if not slow and any(s in item.nodeid for s in _SLOW_BY_ID):
            item.add_marker(pytest.mark.slow)
            slow = True
        if not slow:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches():
    """Drop compiled-program caches between test modules.

    The whole suite runs in one process; XLA:CPU has shown rare compiler
    segfaults when hundreds of programs accumulate in one backend client
    (observed once in test_kernel.py mid-suite, never standalone).
    Clearing per module keeps the client small and the suite
    deterministic at negligible recompile cost.
    """
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def small_graph():
    """A small standardized attributed SBM graph shared across tests."""
    g = make_attributed_sbm(
        n_nodes=400, n_classes=4, n_features=128, n_edges=1600, seed=7)
    return g.standardize()


@pytest.fixture(scope="session")
def random_csr():
    """A random sparse matrix factory for kernel tests."""
    def make(n_rows, n_cols, density=0.01, seed=0):
        rng = np.random.RandomState(seed)
        mat = sp.random(n_rows, n_cols, density=density, random_state=rng,
                        format="csr", dtype=np.float32)
        return mat
    return make
