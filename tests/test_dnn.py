"""dnn module: layer correctness vs NumPy, Net execution, and a trained
tiny CNN classifying synthetic shapes end to end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencv_tpu.dnn import Net, layers


def test_convolution_matches_numpy(rng):
    x = rng.normal(size=(1, 2, 6, 7)).astype(np.float32)
    w = rng.normal(size=(3, 2, 3, 3)).astype(np.float32)
    out = np.asarray(layers.convolution(jnp.asarray(x), jnp.asarray(w), pad="VALID"))
    assert out.shape == (1, 3, 4, 5)
    # check one output element by hand
    o, y, xx = 1, 2, 3
    want = (x[0, :, y : y + 3, xx : xx + 3] * w[o]).sum()
    np.testing.assert_allclose(out[0, o, y, xx], want, rtol=1e-4)


def test_pool_and_fc(rng):
    x = rng.normal(size=(2, 3, 4, 4)).astype(np.float32)
    mp = np.asarray(layers.max_pool(jnp.asarray(x), 2))
    assert mp.shape == (2, 3, 2, 2)
    assert mp[0, 0, 0, 0] == x[0, 0, :2, :2].max()
    ap = np.asarray(layers.avg_pool(jnp.asarray(x), 2))
    np.testing.assert_allclose(ap[0, 0, 0, 0], x[0, 0, :2, :2].mean(), rtol=1e-5)
    w = rng.normal(size=(5, 48)).astype(np.float32)
    fc = np.asarray(layers.fully_connected(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(fc[0], w @ x[0].reshape(-1), rtol=1e-4)


def test_net_sequential_and_branch(rng):
    x = rng.normal(size=(1, 1, 8, 8)).astype(np.float32)
    w = rng.normal(size=(2, 1, 3, 3)).astype(np.float32)
    net = Net()
    net.add_layer("conv", lambda a: layers.convolution(a, jnp.asarray(w)))
    net.add_layer("relu", layers.relu)
    net.add_layer("pool", lambda a: layers.max_pool(a, 2))
    net.set_input(x)
    out = np.asarray(net.forward())
    assert out.shape == (1, 2, 4, 4)
    assert out.min() >= 0.0
    # intermediate outputs addressable by name (getLayerOutput analog)
    mid = np.asarray(net.forward("conv"))
    assert mid.shape == (1, 2, 8, 8)
    # DAG: concat of two branches
    net2 = Net()
    net2.add_layer("a", layers.relu, ["data"])
    net2.add_layer("b", lambda t: -t, ["data"])
    net2.add_layer("cat", lambda p, q: layers.concat([p, q]), ["a", "b"])
    net2.set_input(x)
    assert np.asarray(net2.forward()).shape == (1, 2, 8, 8)


def make_shape_image(rng, kind):
    img = np.zeros((12, 12), np.float32)
    if kind == 0:  # filled square
        img[3:9, 3:9] = 1.0
    else:  # hollow ring
        img[2:10, 2:10] = 1.0
        img[4:8, 4:8] = 0.0
    img += rng.normal(0, 0.05, img.shape)
    return img


def test_tiny_cnn_trains_and_classifies(rng):
    """End-to-end: train a 2-class CNN with jax.grad on the dnn layers,
    run inference through Net."""
    def forward(params, x):
        h = layers.convolution(x, params["w1"], params["b1"])
        h = layers.relu(h)
        h = layers.max_pool(h, 2)
        return layers.fully_connected(h, params["w2"], params["b2"])

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    params = {
        "w1": jax.random.normal(k1, (4, 1, 3, 3)) * 0.3,
        "b1": jnp.zeros(4),
        "w2": jax.random.normal(k2, (2, 4 * 6 * 6)) * 0.1,
        "b2": jnp.zeros(2),
    }
    xs = np.stack([make_shape_image(rng, i % 2) for i in range(64)])[:, None]
    ys = np.arange(64) % 2

    def loss(params):
        logits = forward(params, jnp.asarray(xs))
        return -jnp.mean(
            jax.nn.log_softmax(logits)[jnp.arange(64), jnp.asarray(ys)]
        )

    grad = jax.jit(jax.grad(loss))
    for _ in range(60):
        g = grad(params)
        params = jax.tree.map(lambda p, gi: p - 0.5 * gi, params, g)

    net = Net()
    net.add_layer("conv", lambda a: layers.convolution(a, params["w1"], params["b1"]))
    net.add_layer("relu", layers.relu)
    net.add_layer("pool", lambda a: layers.max_pool(a, 2))
    net.add_layer("fc", lambda a: layers.fully_connected(a, params["w2"], params["b2"]))
    net.add_layer("prob", lambda a: layers.softmax(a, axis=1))
    test_x = np.stack([make_shape_image(np.random.default_rng(1000 + i), i % 2)
                       for i in range(20)])[:, None]
    net.set_input(test_x)
    probs = np.asarray(net.forward())
    pred = probs.argmax(1)
    assert (pred == np.arange(20) % 2).mean() > 0.9
