"""One-time re-encode of the reference's benchmark clip into a container
the framework decodes natively (MJPEG-AVI via opencv_tpu.io.video).

The reference ships Megamind.avi as XVID (MPEG-4 ASP), a codec whose
decoder lives in the reference's ffmpeg backend
(/root/reference/modules/videoio/src/cap_ffmpeg.cpp). Re-implementing an
MPEG-4 ASP decoder is out of scope for a TPU vision framework, so the
pipeline-equivalent move is transcoding once at ingest time — exactly
what a production loader would do before feeding a TPU pod — into the
framework's own dependency-free MJPEG-AVI (io/video.py mirrors the
reference's in-tree cap_mjpeg_decoder.cpp/cap_mjpeg_encoder.cpp pair).

This script is the provenance record for benchmarks/data/megamind_gray.avi.
It needs an XVID-capable decoder to RUN (cv2 here), but nothing in the
framework, tests, or bench path imports cv2 — they read the committed
artifact through opencv_tpu.io.video.read_mjpeg_avi.

Usage: python benchmarks/reencode_clips.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from opencv_tpu.io.video import read_mjpeg_avi, write_mjpeg_avi  # noqa: E402

SRC = "/root/reference/samples/data/Megamind.avi"
DST = os.path.join(os.path.dirname(__file__), "data", "megamind_gray.avi")
N_FRAMES = 150  # bench config 2 uses 100; VO real-video tests use up to 150


def main():
    import cv2  # one-time transcode only; see module docstring

    cap = cv2.VideoCapture(SRC)
    frames = []
    while len(frames) < N_FRAMES:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY))
    cap.release()
    assert len(frames) == N_FRAMES, f"decoded only {len(frames)} frames"
    arr = np.stack(frames)
    write_mjpeg_avi(DST, arr, fps=24, quality=92)

    back = read_mjpeg_avi(DST)
    assert back.shape == arr.shape, (back.shape, arr.shape)
    err = np.abs(back.astype(np.float32) - arr.astype(np.float32)).mean()
    print(f"wrote {DST}: {arr.shape}, {os.path.getsize(DST)/1e6:.2f} MB, "
          f"round-trip MAE {err:.2f} gray levels")
    assert err < 3.0, "JPEG quality too low for benchmark fidelity"


if __name__ == "__main__":
    main()
