"""QR code round trip demo (objdetect QRCodeDetector analog):
encode a message, render it into a noisy scene, detect and decode.

Run: python examples/qr_demo.py [--cpu] [--text "..."]
"""

import argparse

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--text", default="opencv_tpu says hi")
args = parser.parse_args()
if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from opencv_tpu.ops import qrcode  # noqa: E402


def main():
    mat = qrcode.encode_qr(args.text, version=2)
    img = qrcode.render_qr(mat, module_px=5)
    rng = np.random.default_rng(0)
    scene = np.full((300, 340), 190.0, np.float32)
    scene[70:70 + img.shape[0], 90:90 + img.shape[1]] = img
    scene += rng.normal(0, 6.0, scene.shape).astype(np.float32)

    quad, ok = qrcode.detect_qr(jnp.asarray(scene))
    print("detected:", ok, "quad:\n", np.round(quad, 1))
    text = qrcode.decode_qr(jnp.asarray(scene), quad)
    print("decoded:", repr(text))
    assert text == args.text, "round trip failed"
    print("round trip OK")


if __name__ == "__main__":
    main()
