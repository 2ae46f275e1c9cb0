"""Host-side (numpy) policy inference.

The policy MLP is tiny; on a high-latency accelerator link a device call
costs a full round-trip — orders of magnitude more than the arithmetic.
This module evaluates the policy in numpy from `jax.device_get`s of the
actor params:

- `host_greedy_fn`: deterministic `tanh(mean)` for evaluation/render loops
  (reference evaluation.py:11-35) — zero device round-trips inside eval.
- `HostActor`: stochastic tanh-Gaussian acting for the training loop's
  `training.host_acting` perf mode, with device→host param syncs dispatched
  asynchronously each iteration so acting params are stale by exactly one
  fused update program (the same staleness as `training.pipeline`), and the
  actions d2h round-trip leaves the critical path entirely.
"""

from typing import Callable

import numpy as np

from iltpu.models import distributions as D

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


class HostActor:
    """Numpy tanh-Gaussian sampler over asynchronously-synced device params.

    Protocol per hot-loop iteration (ordering matters because the trainer
    DONATES the state pytree to the fused update program):

        host_actor.refresh()                  # materialise last sync
        state = post_step(state, ...)         # donating dispatch
        host_actor.start_sync(state[...])     # async d2h of the NEW params
        actions = host_actor.sample(obs, rng) # numpy forward, no device

    `refresh` must run BEFORE the donating dispatch: it reads the arrays
    the previous `start_sync` captured, and dispatching first would donate
    (delete) them.
    """

    def __init__(self, actor, params):
        self.act = _ACTIVATIONS[actor.net.activation]
        self.action_size = actor.action_size
        self._pending = None
        self.layers = None
        self.start_sync(params)
        self.refresh()

    def start_sync(self, params):
        """Begin an async device->host copy of the actor params."""
        pending = [(l["w"], l["b"]) for l in params["layers"]]
        for w, b in pending:
            # No-op for host (numpy) params, e.g. checkpoint reloads.
            if hasattr(w, "copy_to_host_async"):
                w.copy_to_host_async()
                b.copy_to_host_async()
        self._pending = pending

    def refresh(self):
        """Materialise the params captured by the last `start_sync`."""
        if self._pending is not None:
            self.layers = [
                (np.asarray(w, np.float32), np.asarray(b, np.float32))
                for w, b in self._pending
            ]
            self._pending = None

    def _forward(self, obs):
        h = np.asarray(obs, np.float32)
        for i, (w, b) in enumerate(self.layers):
            h = h @ w + b
            if i < len(self.layers) - 1:
                h = self.act(h)
        mean = h[:, : self.action_size]
        log_std = np.clip(
            h[:, self.action_size :], D.LOG_STD_MIN, D.LOG_STD_MAX
        )
        return mean, log_std

    def sample(self, obs, rng: np.random.Generator) -> np.ndarray:
        """Stochastic action tanh(mean + eps * std); exploration noise from
        the host PRNG (seeded, so runs stay reproducible)."""
        mean, log_std = self._forward(obs)
        z = mean + rng.standard_normal(mean.shape, np.float32) * np.exp(log_std)
        return np.tanh(z)

    def greedy(self, obs) -> np.ndarray:
        return np.tanh(self._forward(obs)[0])
