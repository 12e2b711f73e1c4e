"""Darknet importer tests: hand-built cfg + weights stream, numerics
vs torch (modules/dnn/src/darknet analog)."""

import struct

import numpy as np

import torch
import torch.nn as nn

from opencv_tpu.dnn import darknet_importer as dk


_CFG = """
[net]
channels=1
height=16
width=16

[convolutional]
batch_normalize=1
filters=4
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
filters=6
size=3
stride=1
pad=1
activation=linear

[shortcut]
from=-1
activation=linear

[route]
layers=-1,-3

[convolutional]
filters=2
size=1
stride=1
pad=0
activation=logistic
"""


def _weights_stream(arrs):
    header = struct.pack("<3i", 0, 2, 0) + struct.pack("<q", 0)
    return header + b"".join(np.asarray(a, np.float32).tobytes() for a in arrs)


def test_darknet_cfg_parse():
    secs = dk.parse_cfg(_CFG)
    assert secs[0]["type"] == "net"
    types = [s["type"] for s in secs[1:]]
    assert types == ["convolutional", "maxpool", "convolutional",
                     "shortcut", "route", "convolutional"]


def test_darknet_importer_matches_torch(rng):
    b1 = rng.normal(0, 0.1, 4).astype(np.float32)
    s1 = rng.uniform(0.5, 1.5, 4).astype(np.float32)
    m1 = rng.normal(0, 0.1, 4).astype(np.float32)
    v1 = rng.uniform(0.5, 1.5, 4).astype(np.float32)
    k1 = rng.normal(0, 0.3, (4, 1, 3, 3)).astype(np.float32)
    b2 = rng.normal(0, 0.1, 6).astype(np.float32)
    k2 = rng.normal(0, 0.2, (6, 4, 3, 3)).astype(np.float32)
    b3 = rng.normal(0, 0.1, 2).astype(np.float32)
    k3 = rng.normal(0, 0.2, (2, 10, 1, 1)).astype(np.float32)  # 6+4 routed

    stream = _weights_stream([b1, s1, m1, v1, k1, b2, k2, b3, k3])
    net = dk.load_darknet(_CFG, stream)
    x = rng.normal(0, 1, (1, 1, 16, 16)).astype(np.float32)
    net.set_input(x, "data")
    got = np.asarray(net.forward())

    with torch.no_grad():
        c1 = nn.Conv2d(1, 4, 3, padding=1, bias=False)
        c1.weight.copy_(torch.from_numpy(k1))
        bn = nn.BatchNorm2d(4, eps=1e-5).eval()
        bn.weight.copy_(torch.from_numpy(s1))
        bn.bias.copy_(torch.from_numpy(b1))
        bn.running_mean.copy_(torch.from_numpy(m1))
        bn.running_var.copy_(torch.from_numpy(v1))
        c2 = nn.Conv2d(4, 6, 3, padding=1)
        c2.weight.copy_(torch.from_numpy(k2))
        c2.bias.copy_(torch.from_numpy(b2))
        c3 = nn.Conv2d(10, 2, 1)
        c3.weight.copy_(torch.from_numpy(k3))
        c3.bias.copy_(torch.from_numpy(b3))

        t = torch.from_numpy(x)
        a = nn.functional.leaky_relu(bn(c1(t)), 0.1)
        p = nn.functional.max_pool2d(a, 2)
        b = c2(p)
        sc = b + b  # shortcut from=-1 adds the previous layer to itself
        r = torch.cat([sc, p], dim=1)  # route -1,-3 = [shortcut, maxpool]
        want = torch.sigmoid(c3(r)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)
