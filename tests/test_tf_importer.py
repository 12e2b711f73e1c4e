"""TF GraphDef importer tests: hand-encoded frozen graphs (the
environment has no tensorflow), numerics vs torch in NHWC."""

import struct

import numpy as np

import torch
import torch.nn as nn

from opencv_tpu.dnn import proto, tf_importer


def _tf_tensor_bytes(arr):
    arr = np.asarray(arr)
    dt = {np.dtype(np.float32): 1, np.dtype(np.int32): 3}[arr.dtype]
    shape = b"".join(
        proto.field_bytes(2, proto.field_varint(1, d)) for d in arr.shape
    )
    return (
        proto.field_varint(1, dt)
        + proto.field_bytes(2, shape)
        + proto.field_bytes(4, arr.tobytes())
    )


def _attr(key, value_bytes):
    return proto.field_bytes(
        5, proto.field_str(1, key) + proto.field_bytes(2, value_bytes)
    )


def _av_tensor(arr):
    return proto.field_bytes(8, _tf_tensor_bytes(arr))


def _av_s(s):
    return proto.field_bytes(2, s.encode())


def _av_ints(vals):
    body = b"".join(proto.field_varint(3, v) for v in vals)
    return proto.field_bytes(1, body)


def _node(name, op, inputs=(), attrs=()):
    b = proto.field_str(1, name) + proto.field_str(2, op)
    for i in inputs:
        b += proto.field_str(3, i)
    for a in attrs:
        b += a
    return proto.field_bytes(1, b)


def test_tf_importer_conv_pipeline(rng):
    kern = rng.normal(0, 0.3, (3, 3, 1, 4)).astype(np.float32)  # HWIO
    bias = rng.normal(0, 0.1, (4,)).astype(np.float32)
    w2 = rng.normal(0, 0.1, (4 * 8 * 8, 10)).astype(np.float32)

    graph = b"".join([
        _node("input", "Placeholder"),
        _node("k", "Const", attrs=[_attr("value", _av_tensor(kern))]),
        _node("b", "Const", attrs=[_attr("value", _av_tensor(bias))]),
        _node("conv", "Conv2D", ["input", "k"], [
            _attr("strides", _av_ints([1, 1, 1, 1])),
            _attr("padding", _av_s("SAME")),
        ]),
        _node("badd", "BiasAdd", ["conv", "b"]),
        _node("relu", "Relu", ["badd"]),
        _node("pool", "MaxPool", ["relu"], [
            _attr("ksize", _av_ints([1, 2, 2, 1])),
            _attr("strides", _av_ints([1, 2, 2, 1])),
            _attr("padding", _av_s("VALID")),
        ]),
        _node("shape", "Const", attrs=[
            _attr("value", _av_tensor(np.asarray([-1, 8 * 8 * 4], np.int32)))
        ]),
        _node("flat", "Reshape", ["pool", "shape"]),
        _node("w2", "Const", attrs=[_attr("value", _av_tensor(w2))]),
        _node("fc", "MatMul", ["flat", "w2"]),
        _node("prob", "Softmax", ["fc"]),
    ])

    net = tf_importer.load_tf(graph)
    x = rng.normal(0, 1, (2, 16, 16, 1)).astype(np.float32)  # NHWC
    net.set_input(x, "input")
    got = np.asarray(net.forward("prob"))

    tm = nn.Sequential(
        nn.Conv2d(1, 4, 3, padding=1), nn.ReLU(), nn.MaxPool2d(2),
    ).eval()
    with torch.no_grad():
        tm[0].weight.copy_(torch.from_numpy(kern.transpose(3, 2, 0, 1)))
        tm[0].bias.copy_(torch.from_numpy(bias))
        feat = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    flat = feat.transpose(0, 2, 3, 1).reshape(2, -1)  # NHWC flatten
    z = flat @ w2
    e = np.exp(z - z.max(1, keepdims=True))
    want = e / e.sum(1, keepdims=True)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_tf_importer_fused_bn_and_mean(rng):
    g = rng.uniform(0.5, 1.5, (3,)).astype(np.float32)
    be = rng.normal(0, 0.1, (3,)).astype(np.float32)
    mu = rng.normal(0, 0.1, (3,)).astype(np.float32)
    va = rng.uniform(0.5, 1.5, (3,)).astype(np.float32)
    graph = b"".join([
        _node("input", "Placeholder"),
        _node("g", "Const", attrs=[_attr("value", _av_tensor(g))]),
        _node("be", "Const", attrs=[_attr("value", _av_tensor(be))]),
        _node("mu", "Const", attrs=[_attr("value", _av_tensor(mu))]),
        _node("va", "Const", attrs=[_attr("value", _av_tensor(va))]),
        _node("bn", "FusedBatchNormV3", ["input", "g", "be", "mu", "va"]),
        _node("axes", "Const", attrs=[
            _attr("value", _av_tensor(np.asarray([1, 2], np.int32)))
        ]),
        _node("gap", "Mean", ["bn", "axes"]),
    ])
    net = tf_importer.load_tf(graph)
    x = rng.normal(0, 1, (2, 6, 5, 3)).astype(np.float32)
    net.set_input(x, "input")
    got = np.asarray(net.forward("gap"))
    want = ((x - mu) / np.sqrt(va + 1e-3) * g + be).mean(axis=(1, 2))
    np.testing.assert_allclose(got, want, atol=1e-4)
