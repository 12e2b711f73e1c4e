"""TensorFlow GraphDef importer -> dnn.Net.

Analog of the reference's TF importer (modules/dnn/src/tensorflow/,
vendored graph.pb schemas). Field numbers from the public TensorFlow
framework protos: GraphDef.node=1; NodeDef.name=1/.op=2/.input=3/
.attr=5 (map entries: key=1, value=2); AttrValue.s=2/.i=3/.f=4/.b=5/
.type=6/.tensor=8/.list=1; TensorProto.dtype=1/.tensor_shape=2/
.tensor_content=4/.float_val=5/.int_val=7; TensorShapeProto.dim=2
(Dim.size=1).

TF graphs are NHWC with HWIO conv kernels; the importer keeps NHWC
end-to-end (XLA takes dimension_numbers directly — no transposes
inserted, unlike the reference which permutes everything to NCHW)."""

from __future__ import annotations

import struct

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from opencv_tpu.dnn import proto
from opencv_tpu.dnn.net import Net

_DT = {1: np.float32, 3: np.int32, 9: np.int64, 10: np.bool_}


def _tf_tensor(fields) -> np.ndarray:
    dtype = _DT[proto.get_int(fields, 1, 1)]
    shape = []
    if 2 in fields:
        sh = proto.parse(fields[2][-1])
        for d in proto.get_messages(sh, 2):
            shape.append(proto.get_int(d, 1, 0))
    raw = proto.get_bytes(fields, 4)
    if raw:
        arr = np.frombuffer(raw, dtype=dtype)
    elif dtype == np.float32:
        arr = np.asarray(proto.get_floats_packed(fields, 5), np.float32)
    else:
        arr = np.asarray(proto.get_ints(fields, 7), dtype)
    if shape:
        if arr.size == 1 and int(np.prod(shape)) > 1:
            arr = np.broadcast_to(arr, shape).copy()
        arr = arr.reshape(shape)
    return arr


def _attrs(node_fields) -> dict:
    out = {}
    for entry in proto.get_messages(node_fields, 5):
        key = proto.get_str(entry, 1)
        av = proto.parse(proto.get_bytes(entry, 2))
        if 2 in av:
            out[key] = av[2][-1]  # bytes (s)
        elif 3 in av:
            out[key] = av[3][-1]  # int
        elif 4 in av:
            out[key] = struct.unpack("<f", av[4][-1])[0]
        elif 5 in av:
            out[key] = bool(av[5][-1])
        elif 8 in av:
            out[key] = _tf_tensor(proto.parse(av[8][-1]))
        elif 1 in av:  # list
            lst = proto.parse(av[1][-1])
            if 3 in lst:
                out[key] = proto.get_ints(lst, 3)
            elif 4 in lst:
                out[key] = proto.get_floats_packed(lst, 4)
            else:
                out[key] = proto.get_strs(lst, 2)
        elif 6 in av:
            out[key] = av[6][-1]  # dtype enum
    return out


def _pad_of(attrs):
    return (attrs.get("padding", b"VALID") or b"VALID").decode()


def load_tf(path_or_bytes) -> Net:
    """Parse a frozen GraphDef into a Net (readNetFromTensorflow analog).
    Layout stays NHWC (TF-native); Placeholder nodes become Net inputs."""
    if isinstance(path_or_bytes, str):
        with open(path_or_bytes, "rb") as f:
            buf = f.read()
    else:
        buf = bytes(path_or_bytes)
    g = proto.parse(buf)
    net = Net()
    consts: dict[str, np.ndarray] = {}
    input_names: list[str] = []

    def src(name):
        # TF input refs may carry ":0" ports or "^" control edges
        return name.lstrip("^").split(":")[0]

    for nf in proto.get_messages(g, 1):
        name = proto.get_str(nf, 1)
        op = proto.get_str(nf, 2)
        ins = [src(s) for s in proto.get_strs(nf, 3) if not s.startswith("^")]
        at = _attrs(nf)

        if op == "Const":
            consts[name] = at["value"]
            continue
        if op == "Placeholder":
            input_names.append(name)
            continue

        def cval(i):
            return jnp.asarray(consts[ins[i]])

        if op == "Conv2D":
            kern = cval(1)  # HWIO
            strides = [int(s) for s in at.get("strides", [1, 1, 1, 1])]
            pad = _pad_of(at)
            net.add_layer(
                name,
                (lambda kern=kern, s=tuple(strides[1:3]), pad=pad:
                 lambda x: lax.conv_general_dilated(
                     x, kern, s, pad,
                     dimension_numbers=("NHWC", "HWIO", "NHWC"),
                 ))(),
                [ins[0]],
            )
        elif op == "DepthwiseConv2dNative":
            kern = cval(1)  # [H, W, C, M]
            strides = [int(s) for s in at.get("strides", [1, 1, 1, 1])]
            pad = _pad_of(at)
            hwcm = kern.shape
            net.add_layer(
                name,
                (lambda kern=kern.reshape(hwcm[0], hwcm[1], 1,
                                          hwcm[2] * hwcm[3]),
                        s=tuple(strides[1:3]), pad=pad, groups=hwcm[2]:
                 lambda x: lax.conv_general_dilated(
                     x, kern, s, pad,
                     dimension_numbers=("NHWC", "HWIO", "NHWC"),
                     feature_group_count=groups,
                 ))(),
                [ins[0]],
            )
        elif op == "BiasAdd":
            b = cval(1)
            net.add_layer(
                name, (lambda b=b: lambda x: x + b)(), [ins[0]]
            )
        elif op in ("Relu",):
            net.add_layer(name, lambda x: jnp.maximum(x, 0.0), [ins[0]])
        elif op == "Relu6":
            net.add_layer(name, lambda x: jnp.clip(x, 0.0, 6.0), [ins[0]])
        elif op == "Sigmoid":
            net.add_layer(name, jax.nn.sigmoid, [ins[0]])
        elif op in ("MaxPool", "AvgPool"):
            k = [int(v) for v in at["ksize"]][1:3]
            s = [int(v) for v in at["strides"]][1:3]
            pad = _pad_of(at)
            mode = op
            net.add_layer(
                name,
                (lambda k=tuple(k), s=tuple(s), pad=pad, mode=mode:
                 lambda x: _pool_nhwc(x, k, s, pad, mode))(),
                [ins[0]],
            )
        elif op == "MatMul":
            wmat = cval(1)
            if at.get("transpose_b", False):
                wmat = wmat.T
            net.add_layer(
                name, (lambda wmat=wmat: lambda x: x @ wmat)(), [ins[0]]
            )
        elif op in ("Add", "AddV2", "Sub", "Mul", "RealDiv"):
            fn = {"Add": jnp.add, "AddV2": jnp.add, "Sub": jnp.subtract,
                  "Mul": jnp.multiply, "RealDiv": jnp.divide}[op]
            if ins[1] in consts:
                cv = cval(1)
                net.add_layer(
                    name, (lambda fn=fn, cv=cv: lambda x: fn(x, cv))(),
                    [ins[0]],
                )
            else:
                net.add_layer(name, fn, ins[:2])
        elif op in ("FusedBatchNorm", "FusedBatchNormV3"):
            gamma, beta, mean, var = cval(1), cval(2), cval(3), cval(4)
            eps = float(at.get("epsilon", 1e-3))
            net.add_layer(
                name,
                (lambda gamma=gamma, beta=beta, mean=mean, var=var, eps=eps:
                 lambda x: (x - mean) / jnp.sqrt(var + eps) * gamma + beta)(),
                [ins[0]],
            )
        elif op == "Reshape":
            shape = tuple(int(v) for v in consts[ins[1]].reshape(-1))
            net.add_layer(
                name,
                (lambda shape=shape: lambda x: x.reshape(
                    tuple(x.shape[0] if s == -1 and i == 0 else s
                          for i, s in enumerate(shape))
                ))(),
                [ins[0]],
            )
        elif op == "Softmax":
            net.add_layer(name, lambda x: jax.nn.softmax(x, -1), [ins[0]])
        elif op in ("Identity", "NoOp"):
            if ins:
                net.add_layer(name, lambda x: x, [ins[0]])
        elif op == "ConcatV2":
            axis = int(consts[ins[-1]].reshape(-1)[0])
            net.add_layer(
                name,
                (lambda axis=axis: lambda *xs: jnp.concatenate(xs, axis))(),
                ins[:-1],
            )
        elif op == "Mean":  # global average pool pattern
            axes = tuple(int(v) for v in consts[ins[1]].reshape(-1))
            keep = bool(at.get("keep_dims", at.get("keepdims", False)))
            net.add_layer(
                name,
                (lambda axes=axes, keep=keep:
                 lambda x: jnp.mean(x, axis=axes, keepdims=keep))(),
                [ins[0]],
            )
        else:
            raise NotImplementedError(f"TF op {op!r} not supported")

    net._input_names = input_names or ["input"]
    return net


def _pool_nhwc(x, k, s, pad, mode):
    if mode == "MaxPool":
        return lax.reduce_window(
            x, -jnp.inf, lax.max, (1,) + k + (1,), (1,) + s + (1,), pad
        )
    cnt = lax.reduce_window(
        jnp.ones_like(x), 0.0, lax.add, (1,) + k + (1,), (1,) + s + (1,), pad
    )
    tot = lax.reduce_window(
        x, 0.0, lax.add, (1,) + k + (1,), (1,) + s + (1,), pad
    )
    return tot / cnt
