"""DeepWT whitening front-end.

Behavioral spec: ``/root/reference/algorithms.py:1080-1117`` (duplicate at
``shape_networks.py:206-239``): two un-normalized DoubleConvWT blocks; returns the
three feature maps consumed by the whitening loss and the shape nets:

  out[0] = pre-ReLU output of block 1        (covariance loss target #1)
  out[1] = pre-ReLU output of block 2        (covariance loss target #2)
  out[2] = ReLU(out[1])                      (input to the shape-prior U-Nets)

With ``whitening=False`` the reference returns ``[x]`` (identity passthrough,
``algorithms.py:1115-1117``).
"""

from __future__ import annotations

import jax
from flax import linen as nn

from wt_pse_tpu.models.layers import DoubleConvWT


class DeepWT(nn.Module):
    features: int = 16
    whitening: bool = True
    dtype: str | None = None

    def setup(self):
        if self.whitening:
            self.DoubleConv = DoubleConvWT(self.features, dtype=self.dtype)
            self.DoubleConv2 = DoubleConvWT(self.features, dtype=self.dtype)

    def __call__(self, x: jax.Array, packed: bool = False) -> list[jax.Array]:
        if not self.whitening:
            return [x]
        z1 = self.DoubleConv(x, packed)
        z2 = self.DoubleConv2(nn.relu(z1), packed)
        return [z1, z2, nn.relu(z2)]
