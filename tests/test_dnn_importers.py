"""dnn importer tests: ONNX + Caffe readers against gold numerics.

The environment has no `onnx` package (so torch.onnx.export is
unavailable); model files are built byte-for-byte with the cleanroom
protobuf writer (opencv_tpu.dnn.proto) — which simultaneously round-trip
tests the wire format — and outputs are compared against the same
network evaluated by torch (CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

import torch
import torch.nn as nn

from opencv_tpu.dnn import caffe_importer, onnx_importer, proto


# --------------------------------------------------- ONNX fixture build ---

def _onnx_tensor(name, arr):
    arr = np.asarray(arr, np.float32)
    body = b""
    for d in arr.shape:
        body += proto.field_varint(1, d)
    body += proto.field_varint(2, 1)  # FLOAT
    body += proto.field_str(8, name)
    body += proto.field_bytes(9, arr.tobytes())
    return body


def _onnx_tensor_i64(name, arr):
    arr = np.asarray(arr, np.int64)
    body = b""
    for d in arr.shape:
        body += proto.field_varint(1, d)
    body += proto.field_varint(2, 7)  # INT64
    body += proto.field_str(8, name)
    body += proto.field_bytes(9, arr.tobytes())
    return body


def _attr_ints(name, vals):
    b = proto.field_str(1, name)
    for v in vals:
        b += proto.field_varint(8, v)
    return b


def _attr_float(name, v):
    return proto.field_str(1, name) + proto.field_float(2, v)


def _attr_int(name, v):
    return proto.field_str(1, name) + proto.field_varint(3, v)


def _node(op, ins, outs, attrs=()):
    b = b""
    for i in ins:
        b += proto.field_str(1, i)
    for o in outs:
        b += proto.field_str(2, o)
    b += proto.field_str(4, op)
    for a in attrs:
        b += proto.field_bytes(5, a)
    return b


def _value_info(name):
    return proto.field_str(1, name)


def _onnx_model(nodes, initializers, inputs, outputs):
    g = b""
    for n in nodes:
        g += proto.field_bytes(1, n)
    g += proto.field_str(2, "g")
    for t in initializers:
        g += proto.field_bytes(5, t)
    for i in inputs:
        g += proto.field_bytes(11, _value_info(i))
    for o in outputs:
        g += proto.field_bytes(12, _value_info(o))
    return proto.field_varint(1, 7) + proto.field_bytes(7, g)


def test_onnx_importer_matches_torch(rng):
    w1 = rng.normal(0, 0.3, (4, 1, 3, 3)).astype(np.float32)
    b1 = rng.normal(0, 0.1, (4,)).astype(np.float32)
    g = rng.uniform(0.5, 1.5, (4,)).astype(np.float32)
    be = rng.normal(0, 0.1, (4,)).astype(np.float32)
    mu = rng.normal(0, 0.1, (4,)).astype(np.float32)
    va = rng.uniform(0.5, 1.5, (4,)).astype(np.float32)
    w2 = rng.normal(0, 0.1, (10, 4 * 8 * 8)).astype(np.float32)
    b2 = rng.normal(0, 0.1, (10,)).astype(np.float32)

    nodes = [
        _node("Conv", ["input", "w1", "b1"], ["c1"],
              [_attr_ints("kernel_shape", [3, 3]),
               _attr_ints("strides", [1, 1]),
               _attr_ints("pads", [1, 1, 1, 1])]),
        _node("BatchNormalization", ["c1", "g", "be", "mu", "va"], ["bn"],
              [_attr_float("epsilon", 1e-5)]),
        _node("Relu", ["bn"], ["r1"]),
        _node("MaxPool", ["r1"], ["p1"],
              [_attr_ints("kernel_shape", [2, 2]),
               _attr_ints("strides", [2, 2])]),
        _node("Flatten", ["p1"], ["f1"]),
        _node("Gemm", ["f1", "w2", "b2"], ["out"],
              [_attr_int("transB", 1)]),
    ]
    inits = [
        _onnx_tensor("w1", w1), _onnx_tensor("b1", b1),
        _onnx_tensor("g", g), _onnx_tensor("be", be),
        _onnx_tensor("mu", mu), _onnx_tensor("va", va),
        _onnx_tensor("w2", w2), _onnx_tensor("b2", b2),
    ]
    model = _onnx_model(nodes, inits, ["input"], ["out"])

    net = onnx_importer.load_onnx(model)
    x = rng.normal(0, 1, (2, 1, 16, 16)).astype(np.float32)
    net.set_input(x, "input")
    got = np.asarray(net.forward("out"))

    tm = nn.Sequential(
        nn.Conv2d(1, 4, 3, padding=1), nn.BatchNorm2d(4), nn.ReLU(),
        nn.MaxPool2d(2), nn.Flatten(), nn.Linear(4 * 8 * 8, 10),
    ).eval()
    with torch.no_grad():
        tm[0].weight.copy_(torch.from_numpy(w1))
        tm[0].bias.copy_(torch.from_numpy(b1))
        tm[1].weight.copy_(torch.from_numpy(g))
        tm[1].bias.copy_(torch.from_numpy(be))
        tm[1].running_mean.copy_(torch.from_numpy(mu))
        tm[1].running_var.copy_(torch.from_numpy(va))
        tm[4] = nn.Flatten()
        tm[5].weight.copy_(torch.from_numpy(w2))
        tm[5].bias.copy_(torch.from_numpy(b2))
        want = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_onnx_reshape_add_softmax(rng):
    w = rng.normal(0, 0.2, (6, 6)).astype(np.float32)
    c = rng.normal(0, 0.2, (6,)).astype(np.float32)
    nodes = [
        _node("MatMul", ["input", "w"], ["m1"]),
        _node("Add", ["m1", "c"], ["a1"]),
        _node("Softmax", ["a1"], ["out"], [_attr_int("axis", 1)]),
    ]
    inits = [_onnx_tensor("w", w), _onnx_tensor("c", c)]
    model = _onnx_model(nodes, inits, ["input"], ["out"])
    net = onnx_importer.load_onnx(model)
    x = rng.normal(0, 1, (3, 6)).astype(np.float32)
    net.set_input(x, "input")
    got = np.asarray(net.forward("out"))
    z = x @ w + c
    e = np.exp(z - z.max(1, keepdims=True))
    want = e / e.sum(1, keepdims=True)
    np.testing.assert_allclose(got, want, atol=1e-5)


# ------------------------------------------------------------- Caffe ---

_PROTOTXT = """
name: "tiny"
input: "data"
input_dim: 1
input_dim: 1
input_dim: 12
input_dim: 12
layer {
  name: "conv1"
  type: "Convolution"
  bottom: "data"
  top: "conv1"
  convolution_param { num_output: 3 kernel_size: 3 pad: 1 stride: 1 }
}
layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
layer {
  name: "pool1"
  type: "Pooling"
  bottom: "conv1"
  top: "pool1"
  pooling_param { pool: MAX kernel_size: 2 stride: 2 }
}
layer {
  name: "fc1"
  type: "InnerProduct"
  bottom: "pool1"
  top: "fc1"
  inner_product_param { num_output: 5 }
}
layer { name: "prob" type: "Softmax" bottom: "fc1" top: "prob" }
"""


def _caffe_blob(arr):
    arr = np.asarray(arr, np.float32)
    shape = b"".join(proto.field_varint(1, d) for d in arr.shape)
    return (
        proto.field_floats_packed(5, arr.reshape(-1).tolist())
        + proto.field_bytes(7, shape)
    )


def _caffemodel(layer_blobs):
    out = b""
    for name, blobs in layer_blobs.items():
        body = proto.field_str(1, name)
        for b in blobs:
            body += proto.field_bytes(7, _caffe_blob(b))
        out += proto.field_bytes(100, body)
    return out


def test_caffe_importer_matches_torch(rng):
    w1 = rng.normal(0, 0.3, (3, 1, 3, 3)).astype(np.float32)
    b1 = rng.normal(0, 0.1, (3,)).astype(np.float32)
    w2 = rng.normal(0, 0.1, (5, 3 * 6 * 6)).astype(np.float32)
    b2 = rng.normal(0, 0.1, (5,)).astype(np.float32)
    weights = _caffemodel({"conv1": [w1, b1], "fc1": [w2, b2]})

    net = caffe_importer.load_caffe(_PROTOTXT, weights)
    x = rng.normal(0, 1, (1, 1, 12, 12)).astype(np.float32)
    net.set_input(x, "data")
    got = np.asarray(net.forward("prob"))

    tm = nn.Sequential(
        nn.Conv2d(1, 3, 3, padding=1), nn.ReLU(), nn.MaxPool2d(2),
        nn.Flatten(), nn.Linear(3 * 6 * 6, 5), nn.Softmax(dim=1),
    ).eval()
    with torch.no_grad():
        tm[0].weight.copy_(torch.from_numpy(w1))
        tm[0].bias.copy_(torch.from_numpy(b1))
        tm[4].weight.copy_(torch.from_numpy(w2))
        tm[4].bias.copy_(torch.from_numpy(b2))
        want = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_prototxt_parser_shapes():
    cfg = caffe_importer.parse_prototxt(_PROTOTXT)
    assert cfg["name"] == "tiny"
    assert cfg["input"] == "data"
    assert cfg["input_dim"] == [1, 1, 12, 12]
    names = [l["name"] for l in cfg["layer"]]
    assert names == ["conv1", "relu1", "pool1", "fc1", "prob"]
    assert cfg["layer"][0]["convolution_param"]["num_output"] == 3


def test_proto_roundtrip(rng):
    arr = rng.normal(0, 1, (2, 3)).astype(np.float32)
    buf = _onnx_tensor("t", arr)
    back = onnx_importer._tensor(proto.parse(buf))
    np.testing.assert_array_equal(back, arr)
