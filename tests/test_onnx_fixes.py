"""ONNX importer correctness fixes (round-4 ADVICE items): Where with
constant operands, LSTM/GRU initial states + sequence_lens guard,
opset-10 two-input Resize, exact Resize coordinate conventions, and
negative-pad crop semantics. Reference layer slots:
modules/dnn/src/layers/{recurrent,resize,padding,slice}_layer.cpp."""

import numpy as np
import pytest

import torch

from opencv_tpu.dnn import onnx_importer

from test_dnn_importers import (  # noqa: F401
    _attr_int,
    _attr_ints,
    _node,
    _onnx_model,
    _onnx_tensor,
    _onnx_tensor_i64,
)
from test_onnx_ops import _attr_str  # noqa: F401


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _run(model, x, out="out", inp="input"):
    net = onnx_importer.load_onnx(model)
    net.set_input(x, inp)
    return np.asarray(net.forward(out))


def test_where_constant_condition(rng):
    """The masked-fill export: Where(const_mask, x, const_fill)."""
    mask = (rng.uniform(size=(2, 4)) > 0.5).astype(np.float32)
    # condition and fill value are both initializers; only x is live
    nodes = [_node("Where", ["mask", "input", "fill"], ["out"])]
    inits = [
        _onnx_tensor("mask", mask),
        _onnx_tensor("fill", np.float32(-1e9)),
    ]
    model = _onnx_model(nodes, inits, ["input"], ["out"])
    x = rng.normal(size=(2, 4)).astype(np.float32)
    got = _run(model, x)
    want = np.where(mask > 0, x, np.float32(-1e9))
    np.testing.assert_allclose(got, want)


def test_where_all_live(rng):
    nodes = [_node("Where", ["c", "a", "b"], ["out"])]
    model = _onnx_model(nodes, [], ["c", "a", "b"], ["out"])
    net = onnx_importer.load_onnx(model)
    c = rng.uniform(size=(3, 3)) > 0.5
    a = rng.normal(size=(3, 3)).astype(np.float32)
    b = rng.normal(size=(3, 3)).astype(np.float32)
    net.set_input(c, "c")
    net.set_input(a, "a")
    net.set_input(b, "b")
    got = np.asarray(net.forward("out"))
    np.testing.assert_allclose(got, np.where(c, a, b))


def _lstm_weights(rng, d, h):
    """ONNX-layout LSTM weights (gate order i, o, f, c) + torch gold."""
    wi = rng.normal(0, 0.3, (4 * h, d)).astype(np.float32)
    wh = rng.normal(0, 0.3, (4 * h, h)).astype(np.float32)
    b = rng.normal(0, 0.1, (8 * h,)).astype(np.float32)
    return wi, wh, b


def _torch_lstm_from_onnx(wi, wh, b, d, h):
    """torch LSTM (gate order i, f, g, o) from ONNX (i, o, f, c)."""
    m = torch.nn.LSTM(d, h)
    perm = np.concatenate(
        [np.arange(h), 2 * h + np.arange(h), 3 * h + np.arange(h),
         h + np.arange(h)]
    )
    m.weight_ih_l0.data = torch.from_numpy(wi[perm])
    m.weight_hh_l0.data = torch.from_numpy(wh[perm])
    m.bias_ih_l0.data = torch.from_numpy(b[: 4 * h][perm])
    m.bias_hh_l0.data = torch.from_numpy(b[4 * h :][perm])
    return m


def test_lstm_initial_state(rng):
    t, n, d, h = 5, 2, 3, 4
    wi, wh, b = _lstm_weights(rng, d, h)
    h0 = rng.normal(0, 0.5, (1, n, h)).astype(np.float32)
    c0 = rng.normal(0, 0.5, (1, n, h)).astype(np.float32)
    nodes = [
        _node("LSTM", ["input", "W", "R", "B", "", "h0", "c0"],
              ["Y", "Yh", "Yc"], [_attr_int("hidden_size", h)])
    ]
    inits = [
        _onnx_tensor("W", wi[None]),
        _onnx_tensor("R", wh[None]),
        _onnx_tensor("B", b[None]),
        _onnx_tensor("h0", h0),
        _onnx_tensor("c0", c0),
    ]
    model = _onnx_model(nodes, inits, ["input"], ["Y"])
    x = rng.normal(0, 1, (t, n, d)).astype(np.float32)
    got = _run(model, x, out="Y")  # [T, 1, N, H]

    m = _torch_lstm_from_onnx(wi, wh, b, d, h)
    with torch.no_grad():
        want, _ = m(
            torch.from_numpy(x),
            (torch.from_numpy(h0), torch.from_numpy(c0)),
        )
    np.testing.assert_allclose(got[:, 0], want.numpy(), atol=2e-5)


def test_lstm_sequence_lens_rejected(rng):
    h = 4
    wi, wh, b = _lstm_weights(rng, 3, h)
    nodes = [
        _node("LSTM", ["input", "W", "R", "B", "lens"], ["Y"],
              [_attr_int("hidden_size", h)])
    ]
    inits = [
        _onnx_tensor("W", wi[None]),
        _onnx_tensor("R", wh[None]),
        _onnx_tensor("B", b[None]),
        _onnx_tensor_i64("lens", np.array([3, 5])),
    ]
    model = _onnx_model(nodes, inits, ["input"], ["Y"])
    with pytest.raises(NotImplementedError, match="sequence_lens"):
        onnx_importer.load_onnx(model)


def test_gru_initial_state(rng):
    t, n, d, h = 6, 2, 3, 4
    wi = rng.normal(0, 0.3, (3 * h, d)).astype(np.float32)
    wh = rng.normal(0, 0.3, (3 * h, h)).astype(np.float32)
    b = rng.normal(0, 0.1, (6 * h,)).astype(np.float32)
    h0 = rng.normal(0, 0.5, (1, n, h)).astype(np.float32)
    nodes = [
        _node("GRU", ["input", "W", "R", "B", "", "h0"], ["Y"],
              [_attr_int("hidden_size", h),
               _attr_int("linear_before_reset", 1)])
    ]
    inits = [
        _onnx_tensor("W", wi[None]),
        _onnx_tensor("R", wh[None]),
        _onnx_tensor("B", b[None]),
        _onnx_tensor("h0", h0),
    ]
    model = _onnx_model(nodes, inits, ["input"], ["Y"])
    x = rng.normal(0, 1, (t, n, d)).astype(np.float32)
    got = _run(model, x, out="Y")

    # torch GRU gate order (r, z, n) vs ONNX (z, r, h)
    m = torch.nn.GRU(d, h)
    perm = np.concatenate(
        [h + np.arange(h), np.arange(h), 2 * h + np.arange(h)]
    )
    m.weight_ih_l0.data = torch.from_numpy(wi[perm])
    m.weight_hh_l0.data = torch.from_numpy(wh[perm])
    m.bias_ih_l0.data = torch.from_numpy(b[: 3 * h][perm])
    m.bias_hh_l0.data = torch.from_numpy(b[3 * h :][perm])
    with torch.no_grad():
        want, _ = m(torch.from_numpy(x), torch.from_numpy(h0))
    np.testing.assert_allclose(got[:, 0], want.numpy(), atol=2e-5)


def test_resize_opset10_two_input(rng):
    """Opset-10 Resize(X, scales) — fixed asymmetric/floor convention."""
    nodes = [
        _node("Resize", ["input", "scales"], ["out"],
              [_attr_str("mode", "nearest")])
    ]
    inits = [_onnx_tensor("scales", np.array([1, 1, 2, 2], np.float32))]
    model = _onnx_model(nodes, inits, ["input"], ["out"])
    x = rng.normal(size=(1, 2, 3, 4)).astype(np.float32)
    got = _run(model, x)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), scale_factor=2, mode="nearest"
    ).numpy()
    np.testing.assert_allclose(got, want)


def test_resize_linear_align_corners(rng):
    nodes = [
        _node("Resize", ["input", "", "scales"], ["out"],
              [_attr_str("mode", "linear"),
               _attr_str("coordinate_transformation_mode",
                         "align_corners")])
    ]
    inits = [_onnx_tensor("scales", np.array([1, 1, 2, 2], np.float32))]
    model = _onnx_model(nodes, inits, ["input"], ["out"])
    x = rng.normal(size=(1, 2, 5, 7)).astype(np.float32)
    got = _run(model, x)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), scale_factor=2, mode="bilinear",
        align_corners=True,
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_resize_linear_half_pixel(rng):
    nodes = [
        _node("Resize", ["input", "", "scales"], ["out"],
              [_attr_str("mode", "linear"),
               _attr_str("coordinate_transformation_mode", "half_pixel")])
    ]
    inits = [_onnx_tensor("scales", np.array([1, 1, 2, 2], np.float32))]
    model = _onnx_model(nodes, inits, ["input"], ["out"])
    x = rng.normal(size=(1, 2, 4, 6)).astype(np.float32)
    got = _run(model, x)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), scale_factor=2, mode="bilinear",
        align_corners=False,
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_resize_nearest_half_pixel_round_prefer_floor(rng):
    """ONNX spec defaults (half_pixel + round_prefer_floor) against a
    direct numpy rendering of the spec formulas."""
    nodes = [
        _node("Resize", ["input", "", "scales"], ["out"],
              [_attr_str("mode", "nearest")])
    ]
    inits = [_onnx_tensor("scales", np.array([1, 1, 1.5, 1.5], np.float32))]
    model = _onnx_model(nodes, inits, ["input"], ["out"])
    x = rng.normal(size=(1, 1, 4, 4)).astype(np.float32)
    got = _run(model, x)
    oh = ow = 6
    sy = (np.arange(oh) + 0.5) * (4 / oh) - 0.5
    iy = np.clip(np.ceil(sy - 0.5), 0, 3).astype(int)
    want = x[:, :, iy[:, None], iy[None, :]]
    np.testing.assert_allclose(got, want)


def test_pad_negative_crop(rng):
    nodes = [
        _node("Pad", ["input", "pads"], ["out"],
              [_attr_str("mode", "constant")])
    ]
    inits = [
        _onnx_tensor_i64("pads", np.array([0, 0, 1, -1, 0, 0, -2, 1]))
    ]
    model = _onnx_model(nodes, inits, ["input"], ["out"])
    x = rng.normal(size=(1, 2, 5, 6)).astype(np.float32)
    got = _run(model, x)
    padded = np.pad(x, [(0, 0), (0, 0), (1, 0), (0, 1)])
    want = padded[:, :, :-2, 1:]
    np.testing.assert_allclose(got, want)


def test_split_uneven_equal_rule(rng):
    """Opset-18 equal split of 7 into 3 -> sizes (3, 3, 1)."""
    nodes = [_node("Split", ["input"], ["a", "b", "c"],
                   [_attr_int("axis", 1)])]
    model = _onnx_model(nodes, [], ["input"], ["c"])
    net = onnx_importer.load_onnx(model)
    x = rng.normal(size=(2, 7)).astype(np.float32)
    net.set_input(x, "input")
    got = np.asarray(net.forward("c"))
    np.testing.assert_allclose(got, x[:, 6:7])
