"""Host-side (numpy) greedy policy inference.

Greedy evaluation (reference evaluation.py:11-35) needs one tiny MLP
forward per env step. On a high-latency accelerator link each such call
costs a full device round-trip — orders of magnitude more than the
arithmetic. This module evaluates the deterministic policy
`tanh(mean(state))` in numpy from a one-time `jax.device_get` of the
actor params, so the whole evaluation loop (and render/trajectory capture)
runs without touching the device.

Only the deterministic eval path lives here; training-time sampling stays
on-device where it is fused into the update program.
"""

from typing import Callable

import numpy as np

_ACTIVATIONS = {
    "relu": lambda x: np.maximum(x, 0.0),
    "sigmoid": lambda x: 1.0 / (1.0 + np.exp(-x)),
    "tanh": np.tanh,
}


def host_greedy_fn(actor, params) -> Callable[[np.ndarray], np.ndarray]:
    """Returns `obs (B, S) -> greedy actions (B, A)` computed in numpy.

    Mirrors `SoftActor.greedy_action` exactly: MLP trunk -> (mean, log_std)
    chunks -> tanh(mean). Params are fetched from the device once, here.
    The actor MLP has no spectral norm and dropout is inactive at eval, so
    the forward is a plain affine/activation chain.
    """
    import jax

    act = _ACTIVATIONS[actor.net.activation]
    layers = [
        (np.asarray(jax.device_get(l["w"]), np.float32),
         np.asarray(jax.device_get(l["b"]), np.float32))
        for l in params["layers"]
    ]
    action_size = actor.action_size

    def greedy(obs: np.ndarray) -> np.ndarray:
        h = np.asarray(obs, np.float32)
        squeeze = h.ndim == 1
        if squeeze:
            h = h[None]
        for i, (w, b) in enumerate(layers):
            h = h @ w + b
            if i < len(layers) - 1:
                h = act(h)
        mean = h[:, :action_size]
        out = np.tanh(mean)
        return out[0] if squeeze else out

    return greedy
