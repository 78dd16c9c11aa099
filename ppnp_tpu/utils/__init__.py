"""Small shared utilities (padding, tree helpers)."""

from ppnp_tpu.utils.padding import round_up_to_multiple, pad_rows  # noqa: F401
