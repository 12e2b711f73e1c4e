"""Caffe model importer -> dnn.Net.

Analog of the reference's Caffe importer (modules/dnn/src/caffe/
caffe_importer.cpp + vendored caffe.proto). Handles the deploy-style
pair: a .prototxt (protobuf TEXT format — parsed by the small recursive
parser below) describing topology, and a binary .caffemodel carrying the
learned blobs. Field numbers come from the public Caffe protobuf schema:
NetParameter.name=1/.input=3/.input_dim=4/.layer=100;
LayerParameter.name=1/.type=2/.bottom=3/.top=4/.blobs=7/
.convolution_param=106/.inner_product_param=117/.pooling_param=121;
BlobProto.data=5(packed float)/.shape=7; BlobShape.dim=1;
ConvolutionParameter.num_output=1/.pad=3/.kernel_size=4/.group=5/
.stride=6; PoolingParameter.pool=1/.kernel_size=2/.stride=3/.pad=4;
InnerProductParameter.num_output=1.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from opencv_tpu.dnn import layers, proto
from opencv_tpu.dnn.net import Net


# ---------------------------------------------------- prototxt parsing ---

def parse_prototxt(text: str) -> dict:
    """Protobuf text format -> nested dict; repeated keys become lists."""
    tokens = []
    for raw in text.splitlines():
        line = raw.split("#")[0].strip()
        if not line:
            continue
        line = line.replace("{", " { ").replace("}", " } ").replace(":", ": ")
        tokens.extend(line.split())

    def parse_block(i):
        out: dict = {}
        while i < len(tokens):
            t = tokens[i]
            if t == "}":
                return out, i + 1
            key = t.rstrip(":")
            if i + 1 < len(tokens) and tokens[i + 1] == "{":
                val, i = parse_block(i + 2)
            else:
                v = tokens[i + 1]
                i += 2
                if v.startswith('"'):
                    val = v.strip('"')
                else:
                    try:
                        val = int(v)
                    except ValueError:
                        try:
                            val = float(v)
                        except ValueError:
                            val = v.strip('"')
            if key in out:
                if not isinstance(out[key], list):
                    out[key] = [out[key]]
                out[key].append(val)
            else:
                out[key] = val
        return out, i

    out, _ = parse_block(0)
    return out


def _aslist(v):
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


# ------------------------------------------------------- binary blobs ---

def _blob(fields) -> np.ndarray:
    data = np.asarray(proto.get_floats_packed(fields, 5), np.float32)
    if 7 in fields:
        shape = proto.get_ints(proto.parse(fields[7][-1]), 1)
    else:  # legacy num/channels/height/width
        shape = [proto.get_int(fields, k, 1) for k in (1, 2, 3, 4)]
    return data.reshape([int(s) for s in shape])


def load_caffemodel_blobs(path_or_bytes) -> dict[str, list[np.ndarray]]:
    """layer name -> blobs from a binary .caffemodel."""
    if isinstance(path_or_bytes, str):
        with open(path_or_bytes, "rb") as f:
            buf = f.read()
    else:
        buf = bytes(path_or_bytes)
    net = proto.parse(buf)
    out: dict[str, list[np.ndarray]] = {}
    for lf in proto.get_messages(net, 100):
        name = proto.get_str(lf, 1)
        out[name] = [_blob(b) for b in proto.get_messages(lf, 7)]
    return out


# ------------------------------------------------------------ importer ---

def load_caffe(prototxt_text: str, caffemodel=None) -> Net:
    """Build a Net from deploy prototxt (+ optional binary weights).
    (readNetFromCaffe analog.)"""
    cfg = parse_prototxt(prototxt_text)
    blobs = load_caffemodel_blobs(caffemodel) if caffemodel is not None else {}
    net = Net()
    inputs = _aslist(cfg.get("input")) or ["data"]
    net._input_names = list(inputs)

    # Caffe names BLOBS, and in-place layers (relu bottom/top "conv1")
    # reuse the producer's blob name — resolve every bottom through the
    # latest producer of that blob
    blob_to_layer = {i: i for i in inputs}

    def _wire(name, fn, bottoms, tops):
        ins = [blob_to_layer.get(b, b) for b in bottoms] if bottoms else "auto"
        net.add_layer(name, fn, ins)
        for t in _aslist(tops) or [name]:
            blob_to_layer[t] = name

    for layer_cfg in _aslist(cfg.get("layer")):
        name = layer_cfg["name"]
        ltype = layer_cfg["type"]
        bottoms = _aslist(layer_cfg.get("bottom"))
        tops = layer_cfg.get("top")
        wb = blobs.get(name, [])
        weight = jnp.asarray(wb[0]) if len(wb) > 0 else None
        bias = jnp.asarray(wb[1]) if len(wb) > 1 else None

        if ltype == "Input":
            continue
        if ltype == "Convolution":
            p = layer_cfg.get("convolution_param", {})
            k = int(p.get("kernel_size", 3))
            stride = int(p.get("stride", 1))
            pad = int(p.get("pad", 0))
            groups = int(p.get("group", 1))
            _wire(
                name,
                (lambda weight=weight, bias=bias, stride=stride, pad=pad,
                        groups=groups: lambda x: layers.convolution(
                    x, weight, bias, stride=stride,
                    pad=[(pad, pad), (pad, pad)], groups=groups,
                ))(),
                bottoms, tops,
            )
        elif ltype == "InnerProduct":
            _wire(
                name,
                (lambda weight=weight, bias=bias:
                 lambda x: layers.fully_connected(x, weight, bias))(),
                bottoms, tops,
            )
        elif ltype == "ReLU":
            _wire(name, layers.relu, bottoms, tops)
        elif ltype == "Sigmoid":
            _wire(name, layers.sigmoid, bottoms, tops)
        elif ltype == "TanH":
            _wire(name, jnp.tanh, bottoms, tops)
        elif ltype == "Softmax":
            _wire(name, layers.softmax, bottoms, tops)
        elif ltype == "Pooling":
            p = layer_cfg.get("pooling_param", {})
            k = int(p.get("kernel_size", 2))
            stride = int(p.get("stride", k))
            pad = int(p.get("pad", 0))
            is_max = p.get("pool", "MAX") in ("MAX", 0)
            glob = p.get("global_pooling", "false") in (True, "true", 1)
            if glob:
                fn = (
                    (lambda: lambda x: jnp.max(x, axis=(2, 3), keepdims=True))()
                    if is_max
                    else (lambda: lambda x: jnp.mean(x, (2, 3), keepdims=True))()
                )
            else:
                from opencv_tpu.dnn.onnx_importer import _pool

                mode = "max" if is_max else "avg"
                fn = (lambda k=k, stride=stride, pad=pad, mode=mode:
                      lambda x: _pool(x, (k, k), (stride, stride),
                                      [(pad, pad), (pad, pad)], mode))()
            _wire(name, fn, bottoms, tops)
        elif ltype == "Eltwise":
            op = layer_cfg.get("eltwise_param", {}).get("operation", "SUM")
            fn = jnp.add if op in ("SUM", 1) else jnp.multiply
            _wire(name, fn, bottoms, tops)
        elif ltype == "Concat":
            axis = int(layer_cfg.get("concat_param", {}).get("axis", 1))
            _wire(
                name,
                (lambda axis=axis: lambda *xs: jnp.concatenate(xs, axis))(),
                bottoms, tops,
            )
        elif ltype == "Flatten":
            _wire(name, layers.flatten, bottoms, tops)
        elif ltype == "BatchNorm":
            mean = jnp.asarray(wb[0])
            var = jnp.asarray(wb[1])
            scale = float(wb[2].reshape(-1)[0]) if len(wb) > 2 else 1.0
            scale = 1.0 / scale if scale != 0 else 1.0
            _wire(
                name,
                (lambda mean=mean * scale, var=var * scale:
                 lambda x: layers.batch_norm(
                     x, mean, var, jnp.ones_like(mean), jnp.zeros_like(mean)
                 ))(),
                bottoms, tops,
            )
        elif ltype == "Scale":
            gamma = weight
            beta = bias if bias is not None else jnp.zeros_like(gamma)
            _wire(
                name,
                (lambda gamma=gamma, beta=beta: lambda x: x * gamma.reshape(
                    1, -1, 1, 1
                ) + beta.reshape(1, -1, 1, 1))(),
                bottoms, tops,
            )
        elif ltype == "Dropout":
            _wire(name, lambda x: x, bottoms, tops)
        else:
            raise NotImplementedError(f"Caffe layer type {ltype!r}")
    return net
