"""Multi-device / multi-host parallelism.

No reference analog — the reference is single-process single-device
(SURVEY.md §2.2); these are the new first-class components required by
BASELINE.json:5:

- ``mesh.py``       — device mesh construction + ``jax.distributed`` init.
- ``partition.py``  — host-side row partition of Â with a precomputed,
  static-shape boundary-exchange plan (which remote H rows each shard
  needs per power-iteration step).
- ``sharded.py``    — the ``shard_map``-based sharded power iteration:
  all-to-all (or all-gather) boundary exchange → local SpMM → α-mix,
  riding ICI within a slice and DCN across slices via XLA collectives.

The MLP feature tower needs no code here: it is data-parallel over the
node axis via GSPMD (``NamedSharding`` on X and the jitted train step).
"""

from ppnp_tpu.parallel.health import assert_devices_healthy  # noqa: F401
from ppnp_tpu.parallel.mesh import initialize_distributed, make_mesh  # noqa: F401
from ppnp_tpu.parallel.partition import (  # noqa: F401
    ShardedGraph, build_sharded_graph,
)
from ppnp_tpu.parallel.sharded import ShardedPowerIteration  # noqa: F401
