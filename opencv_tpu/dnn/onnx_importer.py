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
            out[name] = proto.get_int(a, 3)
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
            alpha = float(at.get("alpha", 1.0))
            beta = float(at.get("beta", 1.0))
            wmat = weight if trans_b else weight.T
            if alpha != 1.0:
                wmat = wmat * alpha
            if bias is not None and beta != 1.0:
                bias = bias * beta
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
        elif op in _UNARY:
            net.add_layer(out_name, _UNARY[op], [ins[0]])
        elif op == "Softplus":
            net.add_layer(out_name, lambda x: jnp.logaddexp(0.0, x), [ins[0]])
        elif op == "Elu":
            alpha = float(at.get("alpha", 1.0))
            net.add_layer(
                out_name,
                (lambda alpha=alpha: lambda x: jnp.where(
                    x > 0, x, alpha * (jnp.exp(x) - 1.0)
                ))(),
                [ins[0]],
            )
        elif op == "PRelu":
            slope = w(1)
            # torch exports [C] or [C,1,1]; broadcast against NCHW
            net.add_layer(
                out_name,
                (lambda slope=slope: lambda x: jnp.where(
                    x > 0, x,
                    x * slope.reshape(
                        (1, -1) + (1,) * max(0, x.ndim - 2)
                    ) if slope.size > 1 else x * slope.reshape(())
                ))(),
                [ins[0]],
            )
        elif op == "HardSigmoid":
            alpha = float(at.get("alpha", 0.2))
            beta = float(at.get("beta", 0.5))
            net.add_layer(
                out_name,
                (lambda alpha=alpha, beta=beta:
                 lambda x: jnp.clip(alpha * x + beta, 0.0, 1.0))(),
                [ins[0]],
            )
        elif op == "HardSwish":
            net.add_layer(
                out_name,
                lambda x: x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0),
                [ins[0]],
            )
        elif op == "Cast":
            to = _F[int(at.get("to", 1))]
            net.add_layer(
                out_name, (lambda to=to: lambda x: x.astype(to))(), [ins[0]]
            )
        elif op == "Pow":
            if len(ins) > 1 and ins[1] in consts:
                e = jnp.asarray(consts[ins[1]])
                net.add_layer(
                    out_name, (lambda e=e: lambda x: x**e)(), [ins[0]]
                )
            else:
                net.add_layer(out_name, jnp.power, [ins[0], ins[1]])
        elif op in ("Min", "Max"):
            fn = jnp.minimum if op == "Min" else jnp.maximum
            live = [nm for nm in ins if nm not in consts]
            cvals = [jnp.asarray(consts[nm]) for nm in ins if nm in consts]
            net.add_layer(
                out_name,
                (lambda fn=fn, cvals=cvals: lambda *xs: _variadic(
                    fn, list(xs) + cvals
                ))(),
                live,
            )
        elif op == "Where":
            # any of (cond, x, y) may be a constant initializer (masked-
            # fill transformer exports): bind consts into the closure and
            # wire only live tensors as runtime inputs (the Min/Max rule)
            live = [nm for nm in ins[:3] if nm not in consts]
            binds = [
                jnp.asarray(consts[nm]) if nm in consts else None
                for nm in ins[:3]
            ]
            net.add_layer(
                out_name,
                (lambda binds=binds: lambda *xs: jnp.where(
                    *[
                        b if b is not None else xs_it.pop(0)
                        for xs_it in [list(xs)]
                        for b in binds
                    ]
                ))(),
                live,
            )
        elif op == "Slice":
            if len(ins) > 1:  # opset >= 10: starts/ends/axes/steps inputs
                starts = [int(v) for v in np.atleast_1d(consts[ins[1]])]
                ends = [int(v) for v in np.atleast_1d(consts[ins[2]])]
                axes = (
                    [int(v) for v in np.atleast_1d(consts[ins[3]])]
                    if len(ins) > 3 and ins[3]
                    else list(range(len(starts)))
                )
                steps = (
                    [int(v) for v in np.atleast_1d(consts[ins[4]])]
                    if len(ins) > 4 and ins[4]
                    else [1] * len(starts)
                )
            else:  # opset 1: attributes
                starts = [int(v) for v in at["starts"]]
                ends = [int(v) for v in at["ends"]]
                axes = [int(v) for v in at.get("axes", range(len(starts)))]
                steps = [1] * len(starts)
            net.add_layer(
                out_name,
                (lambda starts=starts, ends=ends, axes=axes, steps=steps:
                 lambda x: _slice(x, starts, ends, axes, steps))(),
                [ins[0]],
            )
        elif op == "Split":
            axis = int(at.get("axis", 0))
            if "split" in at:
                sizes = [int(v) for v in at["split"]]
            elif len(ins) > 1 and ins[1] in consts:
                sizes = [int(v) for v in np.atleast_1d(consts[ins[1]])]
            else:
                sizes = None  # equal split over len(outs)
            # one layer per output: each slices its own chunk (XLA fuses)
            for oi, onm in enumerate(outs):
                net.add_layer(
                    onm,
                    (lambda oi=oi, axis=axis, sizes=sizes, nout=len(outs):
                     lambda x: _split_chunk(x, oi, axis, sizes, nout))(),
                    [ins[0]],
                )
        elif op in ("Squeeze", "Unsqueeze"):
            if "axes" in at:
                axes = [int(v) for v in at["axes"]]
            elif len(ins) > 1 and ins[1] in consts:
                axes = [int(v) for v in np.atleast_1d(consts[ins[1]])]
            else:
                axes = None
            sq = op == "Squeeze"
            net.add_layer(
                out_name,
                (lambda axes=axes, sq=sq: lambda x: (
                    jnp.squeeze(x, axis=tuple(axes) if axes else None)
                    if sq
                    else jnp.expand_dims(x, tuple(axes))
                ))(),
                [ins[0]],
            )
        elif op == "Expand":
            shape = tuple(int(v) for v in np.atleast_1d(consts[ins[1]]))
            net.add_layer(
                out_name,
                (lambda shape=shape: lambda x: jnp.broadcast_to(
                    x, np.broadcast_shapes(x.shape, shape)
                ))(),
                [ins[0]],
            )
        elif op == "Gather":
            axis = int(at.get("axis", 0))
            if ins[1] in consts:
                idx = jnp.asarray(consts[ins[1]])
                net.add_layer(
                    out_name,
                    (lambda idx=idx, axis=axis:
                     lambda x: jnp.take(x, idx, axis=axis))(),
                    [ins[0]],
                )
            else:
                net.add_layer(
                    out_name,
                    (lambda axis=axis: lambda x, i: jnp.take(
                        x, i.astype(jnp.int32), axis=axis
                    ))(),
                    [ins[0], ins[1]],
                )
        elif op == "Pad":
            mode = at.get("mode", b"constant").decode()
            if len(ins) > 1:  # opset >= 11
                pads = [int(v) for v in np.atleast_1d(consts[ins[1]])]
                cval = (
                    float(np.atleast_1d(consts[ins[2]])[0])
                    if len(ins) > 2 and ins[2] in consts
                    else 0.0
                )
            else:
                pads = [int(v) for v in at["pads"]]
                cval = float(at.get("value", 0.0))
            jmode = {"constant": "constant", "reflect": "reflect",
                     "edge": "edge"}[mode]
            net.add_layer(
                out_name,
                (lambda pads=pads, cval=cval, jmode=jmode:
                 lambda x: _pad(x, pads, cval, jmode))(),
                [ins[0]],
            )
        elif op in ("ReduceMean", "ReduceSum", "ReduceMax", "ReduceMin"):
            fn = {"ReduceMean": jnp.mean, "ReduceSum": jnp.sum,
                  "ReduceMax": jnp.max, "ReduceMin": jnp.min}[op]
            if "axes" in at and at["axes"]:
                axes = tuple(int(v) for v in at["axes"])
            elif len(ins) > 1 and ins[1] in consts:
                axes = tuple(int(v) for v in np.atleast_1d(consts[ins[1]]))
            else:
                axes = None
            keep = bool(at.get("keepdims", 1))
            net.add_layer(
                out_name,
                (lambda fn=fn, axes=axes, keep=keep:
                 lambda x: fn(x, axis=axes, keepdims=keep))(),
                [ins[0]],
            )
        elif op == "GlobalMaxPool":
            net.add_layer(
                out_name, lambda x: jnp.max(x, axis=(2, 3), keepdims=True),
                [ins[0]],
            )
        elif op == "InstanceNormalization":
            scale, bias = w(1), w(2)
            eps = float(at.get("epsilon", 1e-5))
            net.add_layer(
                out_name,
                (lambda scale=scale, bias=bias, eps=eps: lambda x: (
                    (x - jnp.mean(x, axis=(2, 3), keepdims=True))
                    / jnp.sqrt(jnp.var(x, axis=(2, 3), keepdims=True) + eps)
                    * scale[None, :, None, None]
                    + bias[None, :, None, None]
                ))(),
                [ins[0]],
            )
        elif op == "LRN":
            alpha = float(at.get("alpha", 1e-4))
            beta = float(at.get("beta", 0.75))
            bias = float(at.get("bias", 1.0))
            size = int(at["size"])
            net.add_layer(
                out_name,
                (lambda alpha=alpha, beta=beta, bias=bias, size=size:
                 lambda x: _lrn(x, size, alpha, beta, bias))(),
                [ins[0]],
            )
        elif op == "ConvTranspose":
            stride = tuple(int(s) for s in at.get("strides", [1, 1]))
            pads = at.get("pads", [0, 0, 0, 0])
            out_pad = at.get("output_padding", [0, 0])
            groups = int(at.get("group", 1))
            weight = w(1)
            bias = w(2) if len(ins) > 2 else None
            net.add_layer(
                out_name,
                (lambda weight=weight, bias=bias, stride=stride, pads=pads,
                        out_pad=out_pad, groups=groups:
                 lambda x: _conv_transpose(
                     x, weight, bias, stride, pads, out_pad, groups
                 ))(),
                [ins[0]],
            )
        elif op in ("Resize", "Upsample"):
            mode = at.get("mode", b"nearest").decode()
            # Upsample and opset-10 Resize(X, scales) predate the
            # coordinate_transformation_mode attribute; their fixed
            # convention is asymmetric
            coord = at.get(
                "coordinate_transformation_mode",
                b"asymmetric" if op == "Upsample" or len(ins) == 2
                else b"half_pixel",
            ).decode()
            nearest_mode = at.get(
                "nearest_mode",
                b"floor" if op == "Upsample" or len(ins) == 2
                else b"round_prefer_floor",
            ).decode()
            if op == "Upsample" or len(ins) == 2:
                sc_name = ins[1]
                scales = [float(v) for v in np.atleast_1d(consts[sc_name])]
                sizes = None
            elif (len(ins) > 2 and ins[2] in consts
                  and np.asarray(consts[ins[2]]).size):
                scales = [float(v) for v in np.atleast_1d(consts[ins[2]])]
                sizes = None
            else:
                scales = None
                sizes = [int(v) for v in np.atleast_1d(consts[ins[3]])]
            net.add_layer(
                out_name,
                (lambda scales=scales, sizes=sizes, mode=mode, coord=coord,
                        nearest_mode=nearest_mode:
                 lambda x: _resize(x, scales, sizes, mode, coord,
                                   nearest_mode))(),
                [ins[0]],
            )
        elif op in ("LSTM", "GRU"):
            direction = at.get("direction", b"forward").decode()
            ndir = 2 if direction == "bidirectional" else 1
            W = np.asarray(consts[ins[1]])  # [ndir, G*H, D]
            Rm = np.asarray(consts[ins[2]])  # [ndir, G*H, H]
            B = (
                np.asarray(consts[ins[3]])
                if len(ins) > 3 and ins[3] in consts
                else None
            )
            hidden = int(at.get("hidden_size", Rm.shape[2]))
            is_lstm = op == "LSTM"

            lbr = bool(at.get("linear_before_reset", 0))

            # optional inputs: sequence_lens (4), initial_h (5),
            # initial_c (6).  Per-sequence lengths have no analog in the
            # scan-based layers, so refuse loudly instead of silently
            # ignoring them; initial states thread through when constant.
            if len(ins) > 4 and ins[4]:
                raise NotImplementedError(
                    f"ONNX {op}: per-sequence sequence_lens input is not "
                    "supported (all sequences run full length)"
                )
            H0 = Cc0 = None
            if len(ins) > 5 and ins[5]:
                if ins[5] not in consts:
                    raise NotImplementedError(
                        f"ONNX {op}: runtime (non-initializer) initial_h "
                        "is not supported"
                    )
                H0 = np.asarray(consts[ins[5]])  # [ndir, N, H]
            if is_lstm and len(ins) > 6 and ins[6]:
                if ins[6] not in consts:
                    raise NotImplementedError(
                        f"ONNX {op}: runtime (non-initializer) initial_c "
                        "is not supported"
                    )
                Cc0 = np.asarray(consts[ins[6]])

            def rnn_run(x, W=W, Rm=Rm, B=B, hidden=hidden, ndir=ndir,
                        direction=direction, is_lstm=is_lstm, lbr=lbr,
                        H0=H0, Cc0=Cc0):
                # x [T, N, D] (ONNX layout)
                ys_dirs, h_dirs, c_dirs = [], [], []
                for d in range(ndir):
                    rev = direction == "reverse" or d == 1
                    xs = x[::-1] if rev else x
                    h0 = jnp.asarray(H0[d]) if H0 is not None else None
                    c0 = jnp.asarray(Cc0[d]) if Cc0 is not None else None
                    if is_lstm:
                        # ONNX gate order (i, o, f, c) -> layers.lstm
                        # order (i, f, o, g)
                        perm = _gate_perm(hidden, [0, 2, 1, 3])
                        wi = jnp.asarray(W[d][perm])
                        wh = jnp.asarray(Rm[d][perm])
                        b = (
                            jnp.asarray(B[d][:4 * hidden][perm]
                                        + B[d][4 * hidden:][perm])
                            if B is not None
                            else None
                        )
                        ys, (h_t, c_t) = layers.lstm(
                            xs, wi, wh, b, h0=h0, c0=c0
                        )
                        c_dirs.append(c_t)
                    else:
                        wi = jnp.asarray(W[d])
                        wh = jnp.asarray(Rm[d])
                        bi = (
                            jnp.asarray(B[d][:3 * hidden])
                            if B is not None else None
                        )
                        bh = (
                            jnp.asarray(B[d][3 * hidden:])
                            if B is not None else None
                        )
                        ys, h_t = layers.gru(
                            xs, wi, wh, bi, bh, h0=h0,
                            linear_before_reset=lbr,
                        )
                    ys_dirs.append(ys[::-1] if rev else ys)
                    h_dirs.append(h_t)
                Y = jnp.stack(ys_dirs, axis=1)  # [T, ndir, N, H]
                Yh = jnp.stack(h_dirs, axis=0)  # [ndir, N, H]
                Yc = jnp.stack(c_dirs, axis=0) if is_lstm else None
                return Y, Yh, Yc

            full = out_name + "__rnn_state"
            net.add_layer(full, rnn_run, [ins[0]])
            if outs[0]:
                net.add_layer(outs[0], lambda s: s[0], [full])
            if len(outs) > 1 and outs[1]:
                net.add_layer(outs[1], lambda s: s[1], [full])
            if len(outs) > 2 and outs[2]:
                net.add_layer(outs[2], lambda s: s[2], [full])
        else:
            raise NotImplementedError(f"ONNX op {op!r} not supported")
    # safety net: any layer input that is neither a layer output nor a
    # graph input but IS an initializer gets registered as a fixed input
    # blob (handlers normally bind consts into closures; this covers op
    # paths that wire an initializer name as a live input)
    produced = {nm for nm, _, _ in net._layers}
    for _, _, in_names in list(net._layers):
        for nm in in_names:
            if nm not in produced and nm in consts and nm not in net._inputs:
                net.set_input(jnp.asarray(consts[nm]), nm)
    return net


def _gate_perm(h, order):
    """Row permutation turning gate-blocked [G*H, ...] weights from one
    gate order into another."""
    return np.concatenate([np.arange(h) + g * h for g in order])


_UNARY = {
    "Exp": jnp.exp,
    "Log": jnp.log,
    "Neg": jnp.negative,
    "Abs": jnp.abs,
    "Sqrt": jnp.sqrt,
    "Floor": jnp.floor,
    "Ceil": jnp.ceil,
    "Reciprocal": lambda x: 1.0 / x,
    "Erf": lambda x: _erf(x),
    "Sin": jnp.sin,
    "Cos": jnp.cos,
}


def _erf(x):
    from jax import lax as _lax

    return _lax.erf(x)


def _variadic(fn, xs):
    out = xs[0]
    for x in xs[1:]:
        out = fn(out, x)
    return out


def _slice(x, starts, ends, axes, steps):
    sl = [slice(None)] * x.ndim
    big = 1 << 40
    for s, e, a, st in zip(starts, ends, axes, steps):
        e = None if e >= big or e == 9223372036854775807 else e
        sl[a] = slice(s, e, st)
    return x[tuple(sl)]


def _split_chunk(x, oi, axis, sizes, nout):
    if sizes is None:
        # opset-18 equal-split rule: ceil(dim/nout) chunks, last smaller
        chunk = -(-x.shape[axis] // nout)
        sizes = [
            min(chunk, x.shape[axis] - i * chunk) for i in range(nout)
        ]
    start = int(np.sum(sizes[:oi]))
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(start, start + sizes[oi])
    return x[tuple(sl)]


def _pad(x, pads, cval, jmode):
    """ONNX Pad incl. negative entries (crop semantics): pad the
    non-negative part, then slice away the negative part."""
    pos = [(max(pads[i], 0), max(pads[i + x.ndim], 0))
           for i in range(x.ndim)]
    out = jnp.pad(
        x, pos, mode=jmode,
        **({"constant_values": cval} if jmode == "constant" else {}),
    )
    sl = tuple(
        slice(
            max(-pads[i], 0),
            out.shape[i] - max(-pads[i + x.ndim], 0),
        )
        for i in range(x.ndim)
    )
    return out[sl]


def _lrn(x, size, alpha, beta, bias):
    """Across-channel local response normalization (NCHW)."""
    sq = x * x
    half = size // 2
    pad = jnp.pad(sq, ((0, 0), (half, size - 1 - half), (0, 0), (0, 0)))
    den = jnp.zeros_like(x)
    for i in range(size):
        den = den + pad[:, i : i + x.shape[1]]
    return x / (bias + (alpha / size) * den) ** beta


def _conv_transpose(x, weight, bias, stride, pads, out_pad, groups):
    """ONNX/torch ConvTranspose2d as a forward conv with lhs dilation.

    weight [Cin, Cout/g, kH, kW] -> grouped OIHW with spatial flip; the
    forward padding is (k - 1 - pad) per edge plus output_padding on the
    trailing edge.
    """
    from jax import lax as _lax

    cin, cog, kh, kw = weight.shape
    wg = weight.reshape(groups, cin // groups, cog, kh, kw)
    wg = jnp.transpose(wg, (0, 2, 1, 3, 4)).reshape(
        groups * cog, cin // groups, kh, kw
    )
    wg = wg[:, :, ::-1, ::-1]
    pad_h = (kh - 1 - int(pads[0]), kh - 1 - int(pads[2]) + int(out_pad[0]))
    pad_w = (kw - 1 - int(pads[1]), kw - 1 - int(pads[3]) + int(out_pad[1]))
    out = _lax.conv_general_dilated(
        x,
        wg,
        window_strides=(1, 1),
        padding=(pad_h, pad_w),
        lhs_dilation=stride,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias[None, :, None, None]
    return out


def _resize_src_coords(out_n, in_n, coord):
    """Source (input-space, float) coordinate of each output index under
    an ONNX coordinate_transformation_mode."""
    i = np.arange(out_n, dtype=np.float64)
    s = in_n / out_n
    if coord == "half_pixel":
        return (i + 0.5) * s - 0.5
    if coord == "pytorch_half_pixel":
        return (i + 0.5) * s - 0.5 if out_n > 1 else np.zeros_like(i)
    if coord == "asymmetric":
        return i * s
    if coord == "align_corners":
        return i * ((in_n - 1) / (out_n - 1)) if out_n > 1 else i * 0.0
    raise NotImplementedError(
        f"ONNX Resize coordinate_transformation_mode {coord!r}"
    )


def _resize(x, scales, sizes, mode, coord, nearest_mode="round_prefer_floor"):
    """ONNX Resize on NCHW, exact per-mode conventions (separable)."""
    h, w = x.shape[2], x.shape[3]
    if sizes is not None:
        oh, ow = int(sizes[2]), int(sizes[3])
    else:
        # ONNX: floor(len * scale), not round
        oh, ow = int(np.floor(h * scales[2])), int(np.floor(w * scales[3]))
    sy = _resize_src_coords(oh, h, coord)
    sx = _resize_src_coords(ow, w, coord)
    if mode == "nearest":
        rnd = {
            "round_prefer_floor": lambda v: np.ceil(v - 0.5),
            "round_prefer_ceil": lambda v: np.floor(v + 0.5),
            "floor": np.floor,
            "ceil": np.ceil,
        }
        if nearest_mode not in rnd:
            raise NotImplementedError(
                f"ONNX Resize nearest_mode {nearest_mode!r}"
            )
        iy = jnp.asarray(
            np.clip(rnd[nearest_mode](sy), 0, h - 1).astype(np.int32)
        )
        ix = jnp.asarray(
            np.clip(rnd[nearest_mode](sx), 0, w - 1).astype(np.int32)
        )
        return x[:, :, iy[:, None], ix[None, :]]
    if mode != "linear":
        raise NotImplementedError(f"ONNX Resize mode {mode!r}")
    # separable bilinear as two small dense weight matmuls [oh,h],[ow,w]
    # (static shapes; XLA maps them to the MXU)
    def wmat(src, n):
        src = np.clip(src, 0.0, n - 1)  # border clamp BEFORE weights
        lo = np.floor(src).astype(np.int64)
        hi = np.minimum(lo + 1, n - 1)
        frac = src - lo
        m = np.zeros((len(src), n), np.float32)
        m[np.arange(len(src)), lo] += (1.0 - frac).astype(np.float32)
        m[np.arange(len(src)), hi] += frac.astype(np.float32)
        return jnp.asarray(m)

    wy, wx = wmat(sy, h), wmat(sx, w)
    out = jnp.einsum("oh,nchw,pw->ncop", wy, x.astype(jnp.float32), wx)
    return out.astype(x.dtype)


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
