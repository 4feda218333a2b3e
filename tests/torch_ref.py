"""Golden-oracle torch modules for parity testing.

These are independent torch implementations of the *behavioral specs* documented in
SURVEY.md §2 (ConvD/ConvU at ``/root/reference/algorithms.py:877-962``, DoubleConv at
398-428, DeepWT at 1080-1117, teacher at 979-1075, student at
``shape_networks.py:415-598``, WT_PSE at 1134-1353). They exist so tests can:

1. build a torch net, export its ``state_dict``, import via
   ``wt_pse_tpu.io.torch_import``, and assert the flax forward matches torch — the
   exact mechanism the released ``.pth.tar`` goes through;
2. produce golden loss values for the whitening/MMD formulas.

Written in eval-friendly compact style; attribute names intentionally match the
reference so state_dict keys line up (that naming IS the spec for the importer).
"""

from __future__ import annotations

import torch
from torch import nn
import torch.nn.functional as F


def _conv3(i, o):
    return nn.Conv2d(i, o, 3, 1, 1, bias=True)


class ConvD(nn.Module):
    def __init__(self, i, o, first=False):
        super().__init__()
        self.first = first
        self.conv1, self.bn1 = _conv3(i, o), nn.BatchNorm2d(o)
        self.conv2, self.bn2 = _conv3(o, o), nn.BatchNorm2d(o)
        self.conv3, self.bn3 = _conv3(o, o), nn.BatchNorm2d(o)

    def forward(self, x):
        if not self.first:
            x = F.max_pool2d(x, 2)
        x = self.bn1(self.conv1(x))  # NB: no activation after bn1
        y = F.relu(self.bn2(self.conv2(x)))
        return F.relu(self.bn3(self.conv3(y)))


class ConvU(nn.Module):
    def __init__(self, planes, first=False):
        super().__init__()
        self.first = first
        if not first:
            self.conv1, self.bn1 = _conv3(2 * planes, planes), nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes // 2, 1, 1, 0, bias=True)
        self.bn2 = nn.BatchNorm2d(planes // 2)
        self.conv3, self.bn3 = _conv3(planes, planes), nn.BatchNorm2d(planes)

    def forward(self, x, prev):
        if not self.first:
            x = F.relu(self.bn1(self.conv1(x)))
        y = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)
        y = F.relu(self.bn2(self.conv2(y)))
        y = torch.cat([prev, y], 1)
        return F.relu(self.bn3(self.conv3(y)))


class DoubleConv(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.double_conv = nn.Sequential(
            _conv3(i, o), nn.BatchNorm2d(o), nn.ReLU(True),
            _conv3(o, o), nn.BatchNorm2d(o), nn.ReLU(True),
        )

    def forward(self, x):
        return self.double_conv(x)


class DoubleConvWT(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.double_conv = nn.Sequential(_conv3(i, o), nn.ReLU(True), _conv3(o, o))

    def forward(self, x):
        return self.double_conv(x)


class DeepWT(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.DoubleConv = DoubleConvWT(i, o)
        self.DoubleConv2 = DoubleConvWT(o, o)

    def forward(self, x):
        z1 = self.DoubleConv(x)
        z2 = self.DoubleConv2(F.relu(z1))
        return [z1, z2, F.relu(z2)]


def _head(n_in, n_out):
    return nn.Sequential(
        nn.Conv2d(n_in, n_in, 1), nn.ReLU(),
        nn.Conv2d(n_in, 8, 1), nn.ReLU(),
        nn.Conv2d(8, n_out, 1),
    )


class _Trunk(nn.Module):
    """down1..up4 shared by all three nets."""

    def __init__(self, n):
        super().__init__()
        self.down1, self.down2 = ConvD(n, 2 * n), ConvD(2 * n, 4 * n)
        self.down3, self.down4 = ConvD(4 * n, 8 * n), ConvD(8 * n, 16 * n)
        self.up1 = ConvU(16 * n, first=True)
        self.up2, self.up3, self.up4 = ConvU(8 * n), ConvU(4 * n), ConvU(2 * n)

    def trunk(self, x1):
        x2 = self.down1(x1)
        x3 = self.down2(x2)
        x4 = self.down3(x3)
        x5 = self.down4(x4)
        x = self.up1(x5, x4)
        x = self.up2(x, x3)
        x = self.up3(x, x2)
        return self.up4(x, x1)


class Teacher(_Trunk):
    def __init__(self, n=16):
        super().__init__(n)
        self.inc = DoubleConv(1, n)
        self.fusion = nn.Sequential(nn.Conv2d(2 * n, n, 1), nn.ReLU())
        self.mu_prior = _head(2 * n, 1)
        self.logvar_prior = _head(2 * n, 1)

    def forward(self, feats, mask, eps=None):
        x1 = self.fusion(torch.cat([self.inc(mask), feats], 1))
        fm = self.trunk(x1)
        mu, logvar = self.mu_prior(fm), self.logvar_prior(fm)
        if eps is None:
            return mu
        return mu + torch.exp(logvar / 2) * eps, mu


class Student(_Trunk):
    def __init__(self, n=16):
        super().__init__(n)
        self.wt_model = DeepWT(3, n)
        self.mu_prior = _head(2 * n, 1)
        self.logvar_prior = _head(2 * n, 1)

    def forward(self, feats, eps=None):
        fm = self.trunk(feats)
        mu = torch.nan_to_num(self.mu_prior(fm))
        if eps is None:
            return mu
        std = torch.nan_to_num(torch.exp(self.logvar_prior(fm) / 2))
        return (mu + std * eps) * std + mu, mu


class WTPSE(_Trunk):
    def __init__(self, n=16, n_classes=1, feature_dim=8, coef=0.3):
        super().__init__(n)
        self.coef = coef
        self.inc = ConvD(3, n, first=True)
        self.wt_model = DeepWT(3, n)
        self.prior_dist = Teacher(n)
        self.mu = nn.Sequential(nn.Conv2d(2 * n, 2 * n, 1), nn.ReLU(),
                                nn.Conv2d(2 * n, feature_dim, 1))
        self.outc = nn.Sequential(nn.Conv2d(feature_dim, n_classes, 1))
        self.attention_layer = nn.Module()
        self.attention_layer.layer1 = nn.Conv2d(1, 1, 1)

    def embed(self, x):
        return self.mu(self.trunk(self.inc(x)))

    def fuse_out(self, embedding, z):
        att = torch.sigmoid(self.attention_layer.layer1(z))
        return self.outc(self.coef * embedding + att * embedding), att

    def forward(self, inputs, mask, wt_inputs, eps):
        embedding = self.embed(inputs)
        feats = self.wt_model(wt_inputs)
        z, _mu = self.prior_dist(feats[-1], mask, eps)
        out, att = self.fuse_out(embedding, z)
        return out, (att > 0.75).float(), feats
