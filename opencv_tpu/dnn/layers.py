"""DNN layer kernels (reference `dnn` module analogs: the 3.4-era layer
zoo of modules/dnn/src/layers/*). Data layout NCHW like the reference.

On TPU each layer is just the XLA op — the reference's hand-written
OpenCL/Halide kernels (dnn/src/opencl/*.cl) have no reason to exist
here; the value of this module is the Net container + importer surface
(dnn/net.py), not the arithmetic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def convolution(x, weights, bias=None, stride=1, pad="SAME", groups=1):
    """x [N,C,H,W], weights [O, C/groups, kh, kw]."""
    dn = lax.conv_dimension_numbers(x.shape, weights.shape, ("NCHW", "OIHW", "NCHW"))
    s = (stride, stride) if isinstance(stride, int) else stride
    out = lax.conv_general_dilated(
        x, weights, s, pad, dimension_numbers=dn, feature_group_count=groups
    )
    if bias is not None:
        out = out + bias.reshape(1, -1, 1, 1)
    return out


def fully_connected(x, weights, bias=None):
    """x [N, D] (flattened on entry), weights [O, D]."""
    x = x.reshape(x.shape[0], -1)
    out = jnp.dot(x, weights.T, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out


def relu(x):
    return jnp.maximum(x, 0.0)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def softmax(x, axis=1):
    return jax.nn.softmax(x, axis=axis)


def max_pool(x, ksize=2, stride=None):
    stride = stride or ksize
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, 1, ksize, ksize),
        window_strides=(1, 1, stride, stride),
        padding="VALID",
    )


def avg_pool(x, ksize=2, stride=None):
    stride = stride or ksize
    s = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1, 1, ksize, ksize),
        window_strides=(1, 1, stride, stride),
        padding="VALID",
    )
    return s / (ksize * ksize)


def batch_norm(x, mean, var, gamma, beta, eps=1e-5):
    shape = (1, -1, 1, 1) if x.ndim == 4 else (1, -1)
    return (
        (x - mean.reshape(shape)) / jnp.sqrt(var.reshape(shape) + eps)
    ) * gamma.reshape(shape) + beta.reshape(shape)


def concat(xs, axis=1):
    return jnp.concatenate(xs, axis=axis)


def flatten(x):
    return x.reshape(x.shape[0], -1)
