"""Net container: sequential/DAG execution of dnn layers.

Analog of cv::dnn::Net (dnn/include/opencv2/dnn/dnn.hpp:74-92 backends
collapse to one: XLA). Layers are (name, fn, input_names) records; the
whole graph jits into a single fused program — setInput/forward
semantics preserved.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp


class Net:
    def __init__(self):
        self._layers: list[tuple[str, Callable, list[str]]] = []
        self._inputs: dict[str, jnp.ndarray] = {}
        self._input_names: list[str] = ["data"]
        self._jitted = None

    def add_layer(
        self, name: str, fn: Callable, inputs: str | list[str] = "auto"
    ) -> "Net":
        """fn maps (one or more) input arrays to one output array.
        inputs="auto" chains from the previous layer (sequential)."""
        if inputs == "auto":
            prev = self._layers[-1][0] if self._layers else self._input_names[0]
            inputs = [prev]
        elif isinstance(inputs, str):
            inputs = [inputs]
        self._layers.append((name, fn, list(inputs)))
        self._jitted = None
        return self

    def set_input(self, x, name: str = "data") -> None:
        self._inputs[name] = jnp.asarray(x)
        if name not in self._input_names:
            self._input_names.append(name)

    def _execute(self, inputs: dict, upto: str | None):
        values = dict(inputs)
        for name, fn, in_names in self._layers:
            args = [values[n] for n in in_names]
            values[name] = fn(*args)
            if name == upto:
                break
        return values

    def forward(self, output_name: str | None = None) -> jnp.ndarray:
        """Run the graph (jitted, cached per output)."""
        target = output_name or self._layers[-1][0]

        @functools.lru_cache(maxsize=None)
        def make(t):
            def run(inputs):
                return self._execute(inputs, t)[t]

            return jax.jit(run)

        if self._jitted is None:
            self._jitted = make
        return self._jitted(target)(self._inputs)

    def layer_names(self) -> list[str]:
        return [n for (n, _, _) in self._layers]
