"""Functional fully-connected network factory.

Capability parity with the reference `_create_fcnn` (models.py:48-69):
configurable width/depth/activation {relu, sigmoid, tanh}, orthogonal init
with activation gain and zero bias, optional input dropout / hidden dropout
(applied between each hidden linear and its activation), and optional
spectral normalisation on every layer including the final one.

Design differences (TPU-first):
- Pure functions over a params pytree; no module objects on the compute path.
- Spectral norm is a power-iteration performed as an explicit functional
  step (`update_spectral_norm`) once per optimisation step; `apply` always
  divides by sigma computed from the stored (stop-gradient) u/v vectors,
  so gradients flow through the normalised weight exactly as in torch's
  parametrization.
- Dropout keys are derived per-layer with `jax.random.fold_in`, so one key
  drives the whole network deterministically.
"""

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
}

# torch.nn.init.calculate_gain values for the supported activations.
_GAINS = {"relu": 2.0**0.5, "tanh": 5.0 / 3.0, "sigmoid": 1.0}


def _orthogonal(key: jax.Array, shape: Sequence[int], gain: float) -> jax.Array:
    return jax.nn.initializers.orthogonal(scale=gain, column_axis=-1)(
        key, shape, jnp.float32
    )


class MLP:
    """Static MLP description; params produced by `init`, used by `apply`."""

    def __init__(
        self,
        input_size: int,
        hidden_size: int,
        depth: int,
        output_size: int,
        activation: str = "relu",
        input_dropout: float = 0.0,
        dropout: float = 0.0,
        final_gain: float = 1.0,
        spectral_norm: bool = False,
    ):
        assert activation in _ACTIVATIONS, f"unsupported activation {activation}"
        self.input_size = input_size
        self.hidden_size = hidden_size
        self.depth = depth
        self.output_size = output_size
        self.activation = activation
        self.input_dropout = input_dropout
        self.dropout = dropout
        self.final_gain = final_gain
        self.spectral_norm = spectral_norm
        dims = (input_size, *([hidden_size] * depth), output_size)
        self.dims = dims

    def init(self, key: jax.Array) -> Params:
        layers = []
        n_layers = len(self.dims) - 1
        keys = jax.random.split(key, n_layers)
        for i in range(n_layers):
            fan_in, fan_out = self.dims[i], self.dims[i + 1]
            gain = self.final_gain if i == n_layers - 1 else _GAINS[self.activation]
            layer = {
                "w": _orthogonal(keys[i], (fan_in, fan_out), gain),
                "b": jnp.zeros((fan_out,), jnp.float32),
            }
            if self.spectral_norm:
                # Power-iteration vectors over W^T (out, in) as in torch:
                # u in R^out, v in R^in, initialised with one iteration from
                # a random unit vector.
                ku, _ = jax.random.split(keys[i])
                u = jax.random.normal(ku, (fan_out,), jnp.float32)
                u = u / (jnp.linalg.norm(u) + 1e-12)
                v = layer["w"] @ u
                v = v / (jnp.linalg.norm(v) + 1e-12)
                u2 = layer["w"].T @ v
                u = u2 / (jnp.linalg.norm(u2) + 1e-12)
                layer["u"] = u
                layer["v"] = v
            layers.append(layer)
        return {"layers": tuple(layers)}

    def _effective_w(self, layer: Params) -> jax.Array:
        w = layer["w"]
        if self.spectral_norm:
            u = jax.lax.stop_gradient(layer["u"])
            v = jax.lax.stop_gradient(layer["v"])
            sigma = v @ w @ u  # v in R^in, u in R^out, w (in, out)
            w = w / sigma
        return w

    def apply(
        self,
        params: Params,
        x: jax.Array,
        *,
        rng: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        act = _ACTIVATIONS[self.activation]
        use_dropout = train and rng is not None
        h = x
        if self.input_dropout > 0 and use_dropout:
            h = _dropout(jax.random.fold_in(rng, 0), h, self.input_dropout)
        layers = params["layers"]
        for i, layer in enumerate(layers):
            w = self._effective_w(layer)
            h = h @ w + layer["b"]
            if i < len(layers) - 1:
                if self.dropout > 0 and use_dropout:
                    h = _dropout(jax.random.fold_in(rng, i + 1), h, self.dropout)
                h = act(h)
        return h


def _dropout(key: jax.Array, x: jax.Array, rate: float) -> jax.Array:
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def update_spectral_norm(params: Params) -> Params:
    """One power-iteration step per layer (torch parametrization semantics:
    v <- normalize(W v_dir from u), u <- normalize(...)). Call once per
    discriminator optimisation step, outside of differentiation.
    """
    new_layers = []
    for layer in params["layers"]:
        if "u" not in layer:
            new_layers.append(layer)
            continue
        w = layer["w"]  # (in, out)
        u = layer["u"]  # (out,)
        v = w @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u = w.T @ v
        u = u / (jnp.linalg.norm(u) + 1e-12)
        new_layers.append({**layer, "u": u, "v": v})
    return {**params, "layers": tuple(new_layers)}
