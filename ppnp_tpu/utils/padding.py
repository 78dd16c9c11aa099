"""Static-shape padding helpers.

TPU/XLA wants static shapes and hardware-aligned tiles (lane dim 128,
sublane 8 for f32 — see the Pallas guide's tiling constraints). These
helpers centralize the rounding so every module pads consistently.
"""

from __future__ import annotations

import numpy as np

__all__ = ["round_up_to_multiple", "pad_rows", "pad_to_length"]


def round_up_to_multiple(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_rows(arr: np.ndarray, n_rows: int, value=0) -> np.ndarray:
    """Pad axis 0 of ``arr`` up to ``n_rows`` with ``value``."""
    if arr.shape[0] > n_rows:
        raise ValueError(f"cannot pad {arr.shape[0]} rows down to {n_rows}")
    if arr.shape[0] == n_rows:
        return arr
    pad_widths = [(0, n_rows - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad_widths, constant_values=value)


def pad_to_length(arr: np.ndarray, length: int, value=0) -> np.ndarray:
    """Pad a 1-D array up to ``length`` with ``value``."""
    return pad_rows(arr, length, value)
