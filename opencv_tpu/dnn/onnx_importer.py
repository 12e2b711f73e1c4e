"""ONNX model importer -> dnn.Net.

Analog of the reference's ONNX importer (modules/dnn/src/onnx/
onnx_importer.cpp + its vendored opencv-onnx.proto). Field numbers come
from the public ONNX protobuf specification (onnx/onnx.proto upstream):
ModelProto.graph=7; GraphProto.node=1/.initializer=5/.input=11/
.output=12; NodeProto.input=1/.output=2/.op_type=4/.attribute=5;
AttributeProto.name=1/.f=2/.i=3/.s=4/.t=5/.floats=7/.ints=8;
TensorProto.dims=1/.data_type=2/.float_data=4/.int64_data=7/.name=8/
.raw_data=9.

The decoded graph lowers onto the existing layer zoo (dnn/layers.py);
the Net jits into one XLA program, so an imported classifier runs as a
single fused TPU executable rather than the reference's per-layer
dispatch."""

from __future__ import annotations

import struct

import numpy as np

import jax.numpy as jnp

from opencv_tpu.dnn import layers, proto
from opencv_tpu.dnn.net import Net

_F = {  # TensorProto.DataType
    1: np.float32, 6: np.int32, 7: np.int64, 11: np.float64,
    10: np.float16, 9: np.bool_, 2: np.uint8, 3: np.int8,
}


def _tensor(fields) -> np.ndarray:
    dims = proto.get_ints(fields, 1)
    dtype = _F[proto.get_int(fields, 2, 1)]
    raw = proto.get_bytes(fields, 9)
    if raw:
        arr = np.frombuffer(raw, dtype=dtype)
    else:
        if dtype == np.float32:
            arr = np.asarray(proto.get_floats_packed(fields, 4), np.float32)
        elif dtype in (np.int64,):
            arr = np.asarray(proto.get_ints(fields, 7), np.int64)
        else:
            arr = np.asarray(proto.get_ints(fields, 5), np.int32).astype(dtype)
    return arr.reshape(dims) if dims else arr


def _attrs(node_fields) -> dict:
    out = {}
    for a in proto.get_messages(node_fields, 5):
        name = proto.get_str(a, 1)
        if 2 in a:
            out[name] = struct.unpack("<f", a[2][-1])[0]
        elif 3 in a:
            out[name] = a[3][-1]
        elif 4 in a:
            out[name] = a[4][-1]
        elif 5 in a:
            out[name] = _tensor(proto.parse(a[5][-1]))
        elif 7 in a:
            out[name] = proto.get_floats_packed(a, 7)
        elif 8 in a:
            out[name] = proto.get_ints(a, 8)
        else:
            out[name] = None
    return out


def _conv_padding(attrs, spatial=2):
    pads = attrs.get("pads")
    if pads:
        return [(int(pads[i]), int(pads[i + spatial])) for i in range(spatial)]
    ap = attrs.get("auto_pad", b"NOTSET")
    if ap in (b"SAME_UPPER", b"SAME_LOWER"):
        return "SAME"
    return [(0, 0)] * spatial


def load_onnx(path_or_bytes) -> Net:
    """Parse an ONNX file into a Net (readNetFromONNX analog)."""
    if isinstance(path_or_bytes, (str,)):
        with open(path_or_bytes, "rb") as f:
            buf = f.read()
    else:
        buf = bytes(path_or_bytes)
    model = proto.parse(buf)
    graph = proto.parse(proto.get_bytes(model, 7))

    consts: dict[str, np.ndarray] = {}
    for t in proto.get_messages(graph, 5):  # initializer
        consts[proto.get_str(t, 8)] = _tensor(t)

    # graph inputs that are not initializers = runtime inputs
    input_names = []
    for vi in proto.get_messages(graph, 11):
        nm = proto.get_str(vi, 1)
        if nm not in consts:
            input_names.append(nm)

    net = Net()
    net._input_names = list(input_names) or ["data"]

    def const_or_ref(name):
        return consts.get(name)

    for nf in proto.get_messages(graph, 1):  # nodes
        op = proto.get_str(nf, 4)
        ins = proto.get_strs(nf, 1)
        outs = proto.get_strs(nf, 2)
        at = _attrs(nf)
        out_name = outs[0]

        def w(i):
            return jnp.asarray(consts[ins[i]])

        if op == "Constant":
            consts[out_name] = at.get("value")
            continue
        if op == "Conv":
            stride = tuple(int(s) for s in at.get("strides", [1, 1]))
            pad = _conv_padding(at)
            groups = int(at.get("group", 1))
            weight = w(1)
            bias = w(2) if len(ins) > 2 else None
            net.add_layer(
                out_name,
                (lambda weight=weight, bias=bias, stride=stride, pad=pad,
                        groups=groups: lambda x: layers.convolution(
                    x, weight, bias, stride=stride, pad=pad, groups=groups
                ))(),
                [ins[0]],
            )
        elif op == "Gemm":
            weight = w(1)
            bias = w(2) if len(ins) > 2 else None
            trans_b = int(at.get("transB", 0))
            wmat = weight if trans_b else weight.T
            net.add_layer(
                out_name,
                (lambda wmat=wmat, bias=bias: lambda x: layers.fully_connected(
                    x, wmat, bias
                ))(),
                [ins[0]],
            )
        elif op == "MatMul":
            if ins[1] in consts:
                weight = w(1)
                net.add_layer(
                    out_name,
                    (lambda weight=weight: lambda x: x @ weight)(),
                    [ins[0]],
                )
            else:
                net.add_layer(out_name, lambda a, b: a @ b, [ins[0], ins[1]])
        elif op == "Relu":
            net.add_layer(out_name, layers.relu, [ins[0]])
        elif op == "LeakyRelu":
            alpha = float(at.get("alpha", 0.01))
            net.add_layer(
                out_name,
                (lambda alpha=alpha: lambda x: jnp.where(x > 0, x, alpha * x))(),
                [ins[0]],
            )
        elif op == "Sigmoid":
            net.add_layer(out_name, layers.sigmoid, [ins[0]])
        elif op == "Tanh":
            net.add_layer(out_name, jnp.tanh, [ins[0]])
        elif op == "Clip":
            lo = float(at.get("min", -3.4e38))
            hi = float(at.get("max", 3.4e38))
            net.add_layer(
                out_name,
                (lambda lo=lo, hi=hi: lambda x: jnp.clip(x, lo, hi))(),
                [ins[0]],
            )
        elif op == "Softmax":
            axis = int(at.get("axis", -1))
            net.add_layer(
                out_name,
                (lambda axis=axis: lambda x: layers.softmax(x, axis=axis))(),
                [ins[0]],
            )
        elif op in ("MaxPool", "AveragePool"):
            k = tuple(int(v) for v in at["kernel_shape"])
            stride = tuple(int(v) for v in at.get("strides", k))
            pad = _conv_padding(at)
            if pad == "SAME":
                pad = [(kk // 2, kk // 2) for kk in k]
            mode = "max" if op == "MaxPool" else "avg"
            net.add_layer(
                out_name,
                (lambda k=k, stride=stride, pad=pad, mode=mode:
                 lambda x: _pool(x, k, stride, pad, mode))(),
                [ins[0]],
            )
        elif op == "GlobalAveragePool":
            net.add_layer(
                out_name, lambda x: jnp.mean(x, axis=(2, 3), keepdims=True),
                [ins[0]],
            )
        elif op == "BatchNormalization":
            gamma, beta, mean, var = w(1), w(2), w(3), w(4)
            eps = float(at.get("epsilon", 1e-5))
            net.add_layer(
                out_name,
                (lambda mean=mean, var=var, gamma=gamma, beta=beta, eps=eps:
                 lambda x: layers.batch_norm(x, mean, var, gamma, beta, eps))(),
                [ins[0]],
            )
        elif op in ("Add", "Sub", "Mul", "Div"):
            fn = {"Add": jnp.add, "Sub": jnp.subtract,
                  "Mul": jnp.multiply, "Div": jnp.divide}[op]
            srcs = []
            cvals = []
            for nm in ins[:2]:
                if nm in consts:
                    cvals.append(jnp.asarray(consts[nm]))
                    srcs.append(None)
                else:
                    srcs.append(nm)
            live = [s for s in srcs if s is not None]
            if len(live) == 2:
                net.add_layer(out_name, fn, live)
            else:
                cv = cvals[0]
                net.add_layer(
                    out_name, (lambda fn=fn, cv=cv: lambda x: fn(x, cv))(),
                    [live[0]],
                )
        elif op == "Concat":
            axis = int(at.get("axis", 1))
            net.add_layer(
                out_name,
                (lambda axis=axis: lambda *xs: jnp.concatenate(xs, axis))(),
                ins,
            )
        elif op == "Flatten":
            net.add_layer(out_name, layers.flatten, [ins[0]])
        elif op == "Reshape":
            shape = consts[ins[1]].astype(np.int64)
            net.add_layer(
                out_name,
                (lambda shape=tuple(int(s) for s in shape):
                 lambda x: x.reshape(tuple(
                     x.shape[i] if s == 0 else s for i, s in enumerate(shape)
                 )))(),
                [ins[0]],
            )
        elif op == "Transpose":
            perm = tuple(int(p) for p in at["perm"])
            net.add_layer(
                out_name,
                (lambda perm=perm: lambda x: jnp.transpose(x, perm))(),
                [ins[0]],
            )
        elif op in ("Identity", "Dropout"):
            net.add_layer(out_name, lambda x: x, [ins[0]])
        else:
            raise NotImplementedError(f"ONNX op {op!r} not supported")
    return net


def _pool(x, k, stride, pad, mode):
    from jax import lax

    pads = [(0, 0), (0, 0)] + [tuple(p) for p in pad]
    if mode == "max":
        return lax.reduce_window(
            x, -jnp.inf, lax.max, (1, 1) + k, (1, 1) + stride, pads
        )
    s = lax.reduce_window(x, 0.0, lax.add, (1, 1) + k, (1, 1) + stride, pads)
    cnt = lax.reduce_window(
        jnp.ones_like(x), 0.0, lax.add, (1, 1) + k, (1, 1) + stride, pads
    )
    return s / cnt
