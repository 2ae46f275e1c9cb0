#!/usr/bin/env python
"""Standalone native vecenv stepping throughput (no learner, no JAX).

Measures the host physics ceiling for the headline bench: how many
env-steps/s the in-repo C++ threaded stepper (native/vecenv.cc) delivers
on this host with random actions. The gap between this number and
bench.py's pipelined number is the driver/learner overhead that is NOT
physics-bound.

Usage: python scripts/bench_native_env.py [--envs 512] [--iters 200]
"""

import argparse
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="hopper")
    p.add_argument("--envs", type=int, default=512)
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--warmup", type=int, default=50)
    args = p.parse_args()

    from iltpu.envs.native import NativeVecEnv

    env = NativeVecEnv(args.env, num_envs=args.envs, absorbing=True, seed=1)
    obs = env.reset(seed=1)
    act_dim = env.action_size
    rng = np.random.default_rng(0)
    actions = rng.uniform(-1, 1, size=(args.envs, act_dim)).astype(np.float32)

    for _ in range(args.warmup):
        env.step(actions)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        env.step(actions)
    dt = time.perf_counter() - t0
    steps = args.iters * args.envs
    print(
        f"{args.env} envs={args.envs}: {steps / dt:,.0f} env-steps/s "
        f"({dt / args.iters * 1e3:.2f} ms/iter, "
        f"{dt / steps * 1e6:.1f} us/env-step)"
    )
    del obs


if __name__ == "__main__":
    main()
