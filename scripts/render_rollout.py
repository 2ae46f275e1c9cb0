#!/usr/bin/env python
"""Render a greedy rollout of a saved agent as npz frames + animated GIF.

The watchable equivalent of the reference's `render=true` live viewer
(evaluation.py:21,26) for headless hosts. Loads the `agent/` checkpoint a
finished run writes, rolls the policy greedily with host-side numpy
inference, and writes `<out>.npz` (frame stack) and `<out>.gif`.

Usage:
  python scripts/render_rollout.py --env hopper \
      --agent outputs/validation/SAC_hopper/<stamp>/agent --out rollout
"""

import argparse
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env", required=True)
    p.add_argument("--agent", required=True, help="agent checkpoint dir")
    p.add_argument("--out", default="rollout", help="output basename")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-frames", type=int, default=1000)
    p.add_argument("--fps", type=int, default=40)
    p.add_argument("--hidden-size", type=int, default=256)
    p.add_argument("--depth", type=int, default=2)
    args = p.parse_args(argv)

    import jax  # noqa: F401  (backend init before model building)

    from iltpu.envs.host import SPECS, render_rollout
    from iltpu.models import SoftActor
    from iltpu.models.host_inference import host_greedy_fn
    from iltpu.utils.checkpoint import load_checkpoint

    ck, _ = load_checkpoint(args.agent)
    in_dim = int(ck["actor"]["layers"][0]["w"].shape[0])
    spec = SPECS[args.env]
    absorbing = in_dim == spec.obs_size + 1
    actor = SoftActor(
        in_dim, spec.action_size, args.hidden_size, args.depth
    )
    greedy = host_greedy_fn(actor, ck["actor"])
    n = render_rollout(
        args.env,
        greedy,
        args.out + ".npz",
        absorbing=absorbing,
        seed=args.seed,
        max_frames=args.max_frames,
        gif_path=args.out + ".gif",
        fps=args.fps,
    )
    print(f"wrote {args.out}.npz / {args.out}.gif ({n} frames)")


if __name__ == "__main__":
    main()
