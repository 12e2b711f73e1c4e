"""QR detection/decoding tests (objdetect/src/qrcode.cpp analog), using
the module's own spec-conformant encoder as fixture."""

import numpy as np
import pytest

import jax.numpy as jnp

from opencv_tpu.ops import qrcode


def test_rs_roundtrip_with_errors(rng):
    data = list(rng.integers(0, 256, 19))
    ecc = qrcode.rs_encode(data, 7)
    cw = data + ecc
    # corrupt up to 3 symbols (7 ecc -> corrects 3)
    bad = list(cw)
    for pos in (2, 11, 20):
        bad[pos] ^= 0x5A
    fixed = qrcode.rs_correct(bad, 7)
    assert fixed == cw
    # 4 errors must be flagged uncorrectable (or at least not silently wrong)
    bad4 = list(cw)
    for pos in (1, 5, 9, 13):
        bad4[pos] ^= 0x77
    out = qrcode.rs_correct(bad4, 7)
    assert out is None or out != bad4


@pytest.mark.parametrize("version,text", [
    (1, "HELLO-TPU"),
    (2, "opencv_tpu qr decode 123"),
    (3, "the quick brown fox jumps over the lazy dog 01234"),
])
def test_encode_decode_roundtrip_from_pixels(version, text):
    mat = qrcode.encode_qr(text, version=version, mask_id=0)
    img = qrcode.render_qr(mat, module_px=6)
    quad, ok = qrcode.detect_qr(jnp.asarray(img))
    assert ok
    out = qrcode.decode_qr(jnp.asarray(img), quad)
    assert out == text


def test_decode_with_noise_and_offcenter(rng):
    text = "NOISY QR 42"
    mat = qrcode.encode_qr(text, version=2, mask_id=0)
    img = qrcode.render_qr(mat, module_px=5)
    # paste into a larger scene + noise
    scene = np.full((260, 300), 200.0, np.float32)
    scene[40:40 + img.shape[0], 60:60 + img.shape[1]] = img
    scene += rng.normal(0, 8.0, scene.shape).astype(np.float32)
    quad, ok = qrcode.detect_qr(jnp.asarray(scene))
    assert ok
    out = qrcode.decode_qr(jnp.asarray(scene), quad)
    assert out == text


def test_detect_reports_failure_on_blank():
    img = np.full((120, 120), 180.0, np.float32)
    _, ok = qrcode.detect_qr(jnp.asarray(img))
    assert not ok
