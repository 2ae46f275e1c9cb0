#!/usr/bin/env python
"""Decompose the GAIL-hopper hot-loop iteration time.

Measures, on the live backend:
  1. bare device round-trip latency (trivial jitted fn, d2h sync),
  2. `_post_step` device time at n_updates in {0, 1, N} (update compute),
  3. host env.step batched physics cost at the configured num_envs,
  4. the full fused iteration (as bench.py runs it).

Prints one JSON line per measurement. Use to decide where the next
throughput unit comes from (fewer round-trips vs faster updates vs env).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, iters=50, warmup=5):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from iltpu.config import load_config
    from iltpu.trainer import Trainer

    N = int(os.environ.get("BENCH_NUM_ENVS", 16))
    alg = os.environ.get("BENCH_ALG", "GAIL")
    env_backend = os.environ.get("BENCH_ENV_BACKEND", "auto")
    cfg = load_config(
        [
            f"algorithm={alg}",
            "env=hopper",
            f"env_backend={env_backend}",
            f"num_envs={N}",
            "steps=4000",
            "training.start=100",
            "evaluation.interval=100000",
            "logging.interval=0",
            "checkpointing.interval=0",
        ]
    )
    trainer = Trainer(cfg)
    out = {}

    # 1. bare round trip
    trivial = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    out["roundtrip_trivial_ms"] = timeit(
        lambda: np.asarray(trivial(x)), iters=100
    ) * 1e3

    # 2. post_step at various n_updates (non-donated copy each call would
    # complicate things; measure dispatch+sync on a fresh packed batch but
    # keep the state by re-assigning)
    S, A = trainer.state_size, trainer.action_size
    obs = trainer.env.reset(0)
    rng = np.random.default_rng(0)
    packed = np.concatenate(
        [
            np.asarray(obs, np.float32),
            np.zeros((N, A), np.float32),
            np.zeros((N, 1), np.float32),
            np.asarray(obs, np.float32),
            np.zeros((N, 1), np.float32),
            np.zeros((N, 1), np.float32),
            np.asarray(obs, np.float32),
            np.full((N, 1), 200.0, np.float32),
        ],
        axis=1,
    )
    key = jax.random.key(0)

    for n_updates in (0, 1, N):
        def call(n=n_updates):
            s, aux, actions = trainer._post_step(
                trainer.state, key, jnp.asarray(packed), n_updates=n
            )
            trainer.state = s
            np.asarray(actions)

        out[f"post_step_{n_updates}_updates_ms"] = timeit(call, iters=30) * 1e3

    # 3. host env step
    actions = np.zeros((N, A), np.float32)
    out["env_step_ms"] = timeit(lambda: trainer.env.step(actions), iters=100) * 1e3

    # 4. interact-only (acting program + d2h)
    out["interact_ms"] = timeit(
        lambda: np.asarray(
            trainer._interact(
                trainer.state["sac"].actor_params, key,
                jnp.asarray(0, jnp.int32), jnp.asarray(obs),
            )
        ),
        iters=50,
    ) * 1e3

    out["num_envs"] = N
    out["algorithm"] = alg
    out["platform"] = jax.devices()[0].platform
    print(json.dumps(out))


if __name__ == "__main__":
    main()
