"""Device-mesh construction helpers.

The reference is strictly single-GPU (SURVEY.md §2.3); all parallelism here is new
capability. One 1-D ``('data',)`` mesh covers DP training; the leave-one-out x
{OC,OD} sweep (BASELINE config 5) runs as independent replicas (see
``parallel.sweep``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def data_mesh(n_devices: int | None = None, axis: str = "data",
              devices=None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))
