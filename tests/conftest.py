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


def pytest_collection_modifyitems(config, items):
    # 'tpu' tests need a real TPU; they self-skip via fixtures, but make
    # the skip explicit when the platform is CPU-only.
    pass


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
