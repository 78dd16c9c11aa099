"""Model layer: the PPNP prediction MLP with plug-in propagation.

Reference analog: ``ppnp/pytorch/model.py`` + ``utils.py`` (SURVEY.md §2.1
rows 8–9), rebuilt as pure functions over explicit parameter pytrees.
"""

from ppnp_tpu.models.appnp import (  # noqa: F401
    init_mlp_params, mlp_forward, ppnp_forward, l2_reg,
)
