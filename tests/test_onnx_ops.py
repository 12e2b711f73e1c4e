"""ONNX importer op-zoo breadth (round 3): the decomposed-LayerNorm /
GELU transformer pattern, ConvTranspose/Resize upsampling, and the
tensor-manipulation ops (Slice/Split/Gather/Pad/Reduce*), verified
against torch numerics. Reference layer slots:
modules/dnn/src/layers/{slice,split,padding,reshape,resize,
deconvolution,normalize_bbox,lrn}_layer.cpp."""

import numpy as np
import pytest

import torch
import torch.nn as nn

from opencv_tpu.dnn import onnx_importer, proto

from test_dnn_importers import (  # noqa: F401
    _attr_float,
    _attr_int,
    _attr_ints,
    _node,
    _onnx_model,
    _onnx_tensor,
    _onnx_tensor_i64,
)


def _attr_str(name, s):
    return proto.field_str(1, name) + proto.field_str(4, s)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_layernorm_gelu_mlp_block(rng):
    """The transformer MLP block exactly as torch's old exporter emits it:
    LayerNorm decomposed to ReduceMean/Sub/Pow/Sqrt/Div, GELU to Erf."""
    d, dff = 16, 32
    g = rng.uniform(0.5, 1.5, (d,)).astype(np.float32)
    be = rng.normal(0, 0.1, (d,)).astype(np.float32)
    w1 = rng.normal(0, 0.2, (d, dff)).astype(np.float32)
    b1 = rng.normal(0, 0.1, (dff,)).astype(np.float32)
    w2 = rng.normal(0, 0.2, (dff, d)).astype(np.float32)
    b2 = rng.normal(0, 0.1, (d,)).astype(np.float32)

    nodes = [
        _node("ReduceMean", ["input"], ["mu"], [_attr_ints("axes", [-1])]),
        _node("Sub", ["input", "mu"], ["xc"]),
        _node("Pow", ["xc", "two"], ["x2"]),
        _node("ReduceMean", ["x2"], ["var"], [_attr_ints("axes", [-1])]),
        _node("Add", ["var", "eps"], ["vare"]),
        _node("Sqrt", ["vare"], ["sd"]),
        _node("Div", ["xc", "sd"], ["xn"]),
        _node("Mul", ["xn", "g"], ["xg"]),
        _node("Add", ["xg", "be"], ["ln"]),
        _node("MatMul", ["ln", "w1"], ["h0"]),
        _node("Add", ["h0", "b1"], ["h1"]),
        # erf-GELU: 0.5 * h * (1 + erf(h / sqrt(2)))
        _node("Div", ["h1", "sqrt2"], ["hs"]),
        _node("Erf", ["hs"], ["he"]),
        _node("Add", ["he", "one"], ["h2"]),
        _node("Mul", ["h1", "h2"], ["h3"]),
        _node("Mul", ["h3", "half"], ["gelu"]),
        _node("MatMul", ["gelu", "w2"], ["o0"]),
        _node("Add", ["o0", "b2"], ["out"]),
    ]
    inits = [
        _onnx_tensor("two", np.float32(2.0)),
        _onnx_tensor("eps", np.float32(1e-5)),
        _onnx_tensor("sqrt2", np.float32(np.sqrt(2.0))),
        _onnx_tensor("one", np.float32(1.0)),
        _onnx_tensor("half", np.float32(0.5)),
        _onnx_tensor("g", g),
        _onnx_tensor("be", be),
        _onnx_tensor("w1", w1),
        _onnx_tensor("b1", b1),
        _onnx_tensor("w2", w2),
        _onnx_tensor("b2", b2),
    ]
    model = _onnx_model(nodes, inits, ["input"], ["out"])
    net = onnx_importer.load_onnx(model)

    x = rng.normal(0, 1, (2, 5, d)).astype(np.float32)
    net.set_input(x, "input")
    got = np.asarray(net.forward("out"))

    ln = nn.LayerNorm(d)
    ln.weight.data = torch.from_numpy(g)
    ln.bias.data = torch.from_numpy(be)
    with torch.no_grad():
        t = ln(torch.from_numpy(x))
        t = torch.nn.functional.gelu(t @ torch.from_numpy(w1)
                                     + torch.from_numpy(b1))
        want = (t @ torch.from_numpy(w2) + torch.from_numpy(b2)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_convtranspose_resize_prelu(rng):
    cin, cout = 3, 5
    w = rng.normal(0, 0.3, (cin, cout, 4, 4)).astype(np.float32)
    b = rng.normal(0, 0.1, (cout,)).astype(np.float32)
    slope = rng.uniform(0.05, 0.3, (cout,)).astype(np.float32)

    nodes = [
        _node(
            "ConvTranspose", ["input", "w", "b"], ["ct"],
            [_attr_ints("strides", [2, 2]), _attr_ints("pads", [1, 1, 1, 1]),
             _attr_ints("kernel_shape", [4, 4])],
        ),
        _node("PRelu", ["ct", "slope"], ["pr"]),
        _node(
            "Resize", ["pr", "", "scales"], ["out"],
            [_attr_str("mode", "nearest"),
             _attr_str("coordinate_transformation_mode", "asymmetric")],
        ),
    ]
    inits = [
        _onnx_tensor("w", w),
        _onnx_tensor("b", b),
        _onnx_tensor("slope", slope.reshape(cout, 1, 1)),
        _onnx_tensor("scales", np.float32([1, 1, 2, 2])),
    ]
    model = _onnx_model(nodes, inits, ["input"], ["out"])
    net = onnx_importer.load_onnx(model)

    x = rng.normal(0, 1, (1, cin, 7, 9)).astype(np.float32)
    net.set_input(x, "input")
    got = np.asarray(net.forward("out"))

    ct = nn.ConvTranspose2d(cin, cout, 4, stride=2, padding=1)
    ct.weight.data = torch.from_numpy(w)
    ct.bias.data = torch.from_numpy(b)
    pr = nn.PReLU(cout)
    pr.weight.data = torch.from_numpy(slope)
    up = nn.Upsample(scale_factor=2, mode="nearest")
    with torch.no_grad():
        want = up(pr(ct(torch.from_numpy(x)))).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_grouped_convtranspose(rng):
    cin, cout, g = 4, 6, 2
    w = rng.normal(0, 0.3, (cin, cout // g, 3, 3)).astype(np.float32)
    nodes = [
        _node(
            "ConvTranspose", ["input", "w"], ["out"],
            [_attr_ints("strides", [2, 2]), _attr_ints("pads", [0, 0, 0, 0]),
             _attr_ints("output_padding", [1, 1]), _attr_int("group", g),
             _attr_ints("kernel_shape", [3, 3])],
        )
    ]
    model = _onnx_model(nodes, [_onnx_tensor("w", w)], ["input"], ["out"])
    net = onnx_importer.load_onnx(model)
    x = rng.normal(0, 1, (2, cin, 5, 6)).astype(np.float32)
    net.set_input(x, "input")
    got = np.asarray(net.forward("out"))
    ct = nn.ConvTranspose2d(cin, cout, 3, stride=2, output_padding=1,
                            groups=g, bias=False)
    ct.weight.data = torch.from_numpy(w)
    with torch.no_grad():
        want = ct(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_bilinear_resize_matches_torch(rng):
    nodes = [
        _node(
            "Resize", ["input", "", "scales"], ["out"],
            [_attr_str("mode", "linear"),
             _attr_str("coordinate_transformation_mode", "half_pixel")],
        )
    ]
    model = _onnx_model(
        nodes, [_onnx_tensor("scales", np.float32([1, 1, 2, 2]))],
        ["input"], ["out"],
    )
    net = onnx_importer.load_onnx(model)
    x = rng.normal(0, 1, (1, 3, 6, 8)).astype(np.float32)
    net.set_input(x, "input")
    got = np.asarray(net.forward("out"))
    with torch.no_grad():
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x), scale_factor=2, mode="bilinear",
            align_corners=False,
        ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_slice_split_gather_pad_reduce(rng):
    nodes = [
        _node("Slice", ["input", "st", "en", "ax", "sp"], ["sl"]),
        _node("Split", ["sl"], ["a", "b"], [_attr_int("axis", 1)]),
        _node("Gather", ["a", "gi"], ["ga"], [_attr_int("axis", 2)]),
        _node("Pad", ["ga", "pads"], ["pd"]),
        _node("ReduceMax", ["pd"], ["rm"],
              [_attr_ints("axes", [2, 3]), _attr_int("keepdims", 0)]),
        _node("Concat", ["rm", "rm"], ["cc"], [_attr_int("axis", 1)]),
        _node("Unsqueeze", ["cc", "ua"], ["out"]),
    ]
    inits = [
        _onnx_tensor_i64("st", [0, 2]),
        _onnx_tensor_i64("en", [4, 100]),
        _onnx_tensor_i64("ax", [1, 3]),
        _onnx_tensor_i64("sp", [1, 2]),
        _onnx_tensor_i64("gi", [0, 2, 1]),
        _onnx_tensor_i64("pads", [0, 0, 1, 1, 0, 0, 1, 1]),
        _onnx_tensor_i64("ua", [0]),
    ]
    model = _onnx_model(nodes, inits, ["input"], ["out"])
    net = onnx_importer.load_onnx(model)
    x = rng.normal(0, 1, (2, 6, 5, 9)).astype(np.float32)
    net.set_input(x, "input")
    got = np.asarray(net.forward("out"))

    t = x[:, 0:4, :, 2::2]
    a = t[:, :2]
    ga = a[:, :, [0, 2, 1], :]
    pd = np.pad(ga, ((0, 0), (0, 0), (1, 1), (1, 1)))
    rm = pd.max(axis=(2, 3))
    want = np.concatenate([rm, rm], axis=1)[None]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_instancenorm_hardswish_globalmaxpool(rng):
    c = 4
    sc = rng.uniform(0.5, 1.5, (c,)).astype(np.float32)
    bi = rng.normal(0, 0.2, (c,)).astype(np.float32)
    nodes = [
        _node("InstanceNormalization", ["input", "sc", "bi"], ["in0"],
              [_attr_float("epsilon", 1e-5)]),
        _node("HardSwish", ["in0"], ["hs"]),
        _node("GlobalMaxPool", ["hs"], ["out"]),
    ]
    model = _onnx_model(
        nodes, [_onnx_tensor("sc", sc), _onnx_tensor("bi", bi)],
        ["input"], ["out"],
    )
    net = onnx_importer.load_onnx(model)
    x = rng.normal(0, 2, (2, c, 6, 7)).astype(np.float32)
    net.set_input(x, "input")
    got = np.asarray(net.forward("out"))
    inorm = nn.InstanceNorm2d(c, affine=True)
    inorm.weight.data = torch.from_numpy(sc)
    inorm.bias.data = torch.from_numpy(bi)
    with torch.no_grad():
        t = nn.functional.hardswish(inorm(torch.from_numpy(x)))
        want = t.amax(dim=(2, 3), keepdim=True).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def _gate_rows(h, order):
    return np.concatenate([np.arange(h) + g * h for g in order])


def test_onnx_lstm_matches_torch(rng):
    """ONNX LSTM op (gate order iofc, B = Wb|Rb) vs torch.nn.LSTM
    (gate order ifgo)."""
    T, N, D, H = 6, 3, 5, 4
    m = nn.LSTM(D, H)
    p_t2o = _gate_rows(H, [0, 3, 1, 2])  # torch ifgo -> onnx iofc
    with torch.no_grad():
        W = m.weight_ih_l0.numpy()[p_t2o][None]
        R = m.weight_hh_l0.numpy()[p_t2o][None]
        B = np.concatenate(
            [m.bias_ih_l0.numpy()[p_t2o], m.bias_hh_l0.numpy()[p_t2o]]
        )[None]
    nodes = [
        _node("LSTM", ["input", "W", "R", "B"], ["Y", "Yh", "Yc"],
              [_attr_int("hidden_size", H)]),
    ]
    inits = [_onnx_tensor("W", W), _onnx_tensor("R", R), _onnx_tensor("B", B)]
    net = onnx_importer.load_onnx(_onnx_model(nodes, inits, ["input"], ["Y"]))
    x = rng.normal(0, 1, (T, N, D)).astype(np.float32)
    net.set_input(x, "input")
    gotY = np.asarray(net.forward("Y"))
    gotYc = np.asarray(net.forward("Yc"))
    with torch.no_grad():
        wantY, (wantH, wantC) = m(torch.from_numpy(x))
    np.testing.assert_allclose(gotY[:, 0], wantY.numpy(), atol=1e-5)
    np.testing.assert_allclose(gotYc, wantC.numpy(), atol=1e-5)


def test_onnx_gru_bidirectional_matches_torch(rng):
    T, N, D, H = 5, 2, 4, 3
    m = nn.GRU(D, H, bidirectional=True)
    p_t2o = _gate_rows(H, [1, 0, 2])  # torch rzn -> onnx zrh
    with torch.no_grad():
        W = np.stack(
            [m.weight_ih_l0.numpy()[p_t2o],
             m.weight_ih_l0_reverse.numpy()[p_t2o]]
        )
        R = np.stack(
            [m.weight_hh_l0.numpy()[p_t2o],
             m.weight_hh_l0_reverse.numpy()[p_t2o]]
        )
        B = np.stack(
            [np.concatenate([m.bias_ih_l0.numpy()[p_t2o],
                             m.bias_hh_l0.numpy()[p_t2o]]),
             np.concatenate([m.bias_ih_l0_reverse.numpy()[p_t2o],
                             m.bias_hh_l0_reverse.numpy()[p_t2o]])]
        )
    nodes = [
        _node("GRU", ["input", "W", "R", "B"], ["Y"],
              [_attr_int("hidden_size", H),
               _attr_int("linear_before_reset", 1),
               _attr_str("direction", "bidirectional")]),
    ]
    inits = [_onnx_tensor("W", W), _onnx_tensor("R", R), _onnx_tensor("B", B)]
    net = onnx_importer.load_onnx(_onnx_model(nodes, inits, ["input"], ["Y"]))
    x = rng.normal(0, 1, (T, N, D)).astype(np.float32)
    net.set_input(x, "input")
    got = np.asarray(net.forward("Y"))  # [T, 2, N, H]
    with torch.no_grad():
        want, _ = m(torch.from_numpy(x))  # [T, N, 2H]
    np.testing.assert_allclose(got[:, 0], want.numpy()[:, :, :H], atol=1e-5)
    np.testing.assert_allclose(got[:, 1], want.numpy()[:, :, H:], atol=1e-5)


def test_lrn_matches_torch(rng):
    nodes = [
        _node("LRN", ["input"], ["out"],
              [_attr_int("size", 5), _attr_float("alpha", 1e-3),
               _attr_float("beta", 0.75), _attr_float("bias", 1.5)]),
    ]
    model = _onnx_model(nodes, [], ["input"], ["out"])
    net = onnx_importer.load_onnx(model)
    x = rng.normal(0, 1, (2, 8, 5, 5)).astype(np.float32)
    net.set_input(x, "input")
    got = np.asarray(net.forward("out"))
    with torch.no_grad():
        want = nn.LocalResponseNorm(5, alpha=1e-3, beta=0.75, k=1.5)(
            torch.from_numpy(x)
        ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)
