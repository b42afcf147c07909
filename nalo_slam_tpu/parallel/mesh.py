"""Device-mesh helpers.

The reference's only true multi-device communication is the NCCL DDP of the
offline BTS trainer (SURVEY.md §2.4); the TPU-native equivalents here are
jax.sharding meshes whose collectives ride ICI:

* dp: data parallel (batch of sequences / training batch)
* tp: tensor parallel (conv output channels of the mask net)
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp <= n, f"mesh {dp}x{tp} needs {dp*tp} devices, have {n}"
    arr = np.array(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))
