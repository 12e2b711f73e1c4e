"""opencv_tpu — a TPU-native SLAM/SfM engine.

A from-scratch JAX/XLA/Pallas re-expression of the computer-vision pipeline
enabled by the tkortz/opencv fork (OpenCV 3.4.7 + tracking-by-detection):
FAST/ORB detection over image pyramids, rBRIEF descriptors, Hamming
brute-force matching, pyramidal Lucas-Kanade tracking, RANSAC two-view
geometry (essential matrix / homography / PnP), triangulation, sparse
bundle adjustment and pose-graph optimization, and multi-object
tracking-by-detection — all with static shapes, pad+mask discipline, and
`shard_map` distribution over TPU meshes.

Design stance (see SURVEY.md §7): one XLA backend (no dispatch funnel),
structure-of-arrays records with validity masks instead of dynamic
vectors, Pallas kernels where XLA fusion is insufficient, batched
hypothesis RANSAC instead of sequential loops.
"""

__version__ = "0.1.0"

from opencv_tpu.core.types import KeyPoints, Matches  # noqa: F401
