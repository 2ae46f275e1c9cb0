#!/usr/bin/env python
"""Generate expert demonstration data in the D4RL transition format.

The reference consumes D4RL `expert-v2` datasets downloaded by the d4rl
package (`environments.py:23`); with no network egress this script produces
the equivalent: train a SAC expert with this framework, then roll out greedy
episodes and save `{observations, actions, rewards, next_observations,
terminals, timeouts}` as an .npz consumable via
`expert_data.source=<path>.npz`.

Usage:
  python scripts/generate_expert_data.py --env hopper --steps 1000000 \
      --episodes 25 --out data/hopper_expert.npz
  # quick smoke: --steps 5000 --episodes 3
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env", required=True)
    p.add_argument("--steps", type=int, default=1_000_000)
    p.add_argument("--episodes", type=int, default=25)
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num-envs", type=int, default=8)
    p.add_argument("--env-backend", default="auto")
    p.add_argument("--platform", default=None, help="pin jax backend (tpu|cpu)")
    p.add_argument(
        "--from-checkpoint", default=None, metavar="AGENT_DIRS",
        help="skip training; roll out from saved agent checkpoint(s)"
        " (comma-separated `agent/`/`agent_best/` dirs a finished run"
        " writes; attempts round-robin across them)",
    )
    p.add_argument(
        "--only-timeout-episodes", action="store_true",
        help="keep only episodes that survive to the time limit (D4RL"
        " expert-v2 demos are timeout-ended; terminal-ended demos poison"
        " AdRIL/SQIL via the absorbing wrap)",
    )
    p.add_argument(
        "--stochastic", type=float, default=0.0, metavar="SCALE",
        help="sample actions tanh(mean + SCALE*sigma*eps) instead of greedy."
        " A greedy near-expert hopper policy can deterministically fall"
        " at ~800 steps on every start state; small action noise"
        " diversifies the visited states enough for some episodes to"
        " reach the time limit (reject-sampling then keeps those)",
    )
    p.add_argument(
        "--min-normalized", type=float, default=None,
        help="reject episodes below this D4RL-normalized return"
        " (e.g. 0.95: near-expert survivors only)",
    )
    p.add_argument("--max-attempts", type=int, default=None,
                   help="rollout attempts cap with rejection filters"
                   " (default: 10x episodes)")
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from iltpu.config import load_config
    from iltpu.trainer import Trainer

    cfg = load_config(
        [
            "algorithm=SAC",
            f"env={args.env}",
            f"env_backend={args.env_backend}",
            f"seed={args.seed}",
            f"num_envs={args.num_envs}",
            f"steps={args.steps}",
            "logging.interval=0",
            f"evaluation.interval={max(args.steps // 10, 1)}",
            "evaluation.episodes=5",
            "imitation.absorbing=false",  # raw obs; wrapping happens at load
            "expert_data.source=synthetic",
            "imitation.trajectories=1",
        ]
    )
    from iltpu.models.host_inference import host_greedy_fn
    from iltpu.trainer import _make_env

    noise_rng = np.random.default_rng(args.seed + 99)

    def _policy_from_params(actor, params, raw_dim):
        """obs (B, raw_dim) -> actions; greedy or sigma-scaled stochastic,
        with absorbing-bit padding when the agent trained on augmented obs
        (the demo stores RAW observations — the loader re-wraps at
        consumption, like D4RL data)."""
        in_dim = int(np.asarray(params["layers"][0]["w"]).shape[0])
        assert in_dim in (raw_dim, raw_dim + 1), (in_dim, raw_dim)
        if args.stochastic > 0:
            from iltpu.models.host_inference import HostActor

            ha = HostActor(actor, params)
            scale = args.stochastic

            def base(obs):
                mean, log_std = ha._forward(obs)
                eps = noise_rng.standard_normal(mean.shape).astype(np.float32)
                return np.tanh(mean + scale * np.exp(log_std) * eps)
        else:
            base = host_greedy_fn(actor, params)
        if in_dim == raw_dim + 1:
            def policy(obs):
                pad = np.zeros((obs.shape[0], 1), np.float32)
                return base(np.concatenate([obs, pad], axis=1))
            return policy
        return base

    if args.from_checkpoint:
        from iltpu.models import SoftActor
        from iltpu.utils.checkpoint import load_checkpoint

        env0 = _make_env(cfg, 1, args.seed)
        raw_dim, act_dim = env0.obs_size, env0.action_size
        env0.close()
        rcfg = cfg.reinforcement
        policies = []
        for path in args.from_checkpoint.split(","):
            ck, _ = load_checkpoint(path)
            in_dim = int(np.asarray(ck["actor"]["layers"][0]["w"]).shape[0])
            actor = SoftActor(
                in_dim, act_dim,
                rcfg.actor.hidden_size, rcfg.actor.depth,
                rcfg.actor.activation,
            )
            policies.append(_policy_from_params(actor, ck["actor"], raw_dim))
    else:
        out_dir = os.path.join(
            os.path.dirname(args.out) or ".", "expert_training"
        )
        os.makedirs(out_dir, exist_ok=True)
        trainer = Trainer(cfg, out_dir)
        score = trainer.run()
        print(f"expert trained: mean normalized score {score:.3f}")
        # Rollouts -> flat transition arrays with episode boundaries.
        # Host-side inference: one params fetch, zero device calls per step.
        env0 = _make_env(cfg, 1, args.seed)
        raw_dim = env0.obs_size
        env0.close()
        policies = [
            _policy_from_params(
                trainer.actor, trainer.state["sac"].actor_params, raw_dim
            )
        ]

    env = _make_env(cfg, 1, args.seed + 7_654_321)
    cols = {k: [] for k in (
        "observations", "actions", "rewards", "next_observations",
        "terminals", "timeouts",
    )}
    from iltpu.envs.scores import d4rl_normalized_score

    kept, attempt = 0, 0
    max_attempts = args.max_attempts or 10 * args.episodes
    while kept < args.episodes and attempt < max_attempts:
        obs = env.reset(args.seed + 1000 + attempt)
        policy = policies[attempt % len(policies)]
        attempt += 1
        done = False
        ep_ret = 0.0
        ep_cols = {k: [] for k in cols}
        while not done:
            action = policy(np.asarray(obs))
            next_obs, r, term, to, obs_after = env.step(action)
            ep_cols["observations"].append(obs[0])
            ep_cols["actions"].append(action[0])
            ep_cols["rewards"].append(float(r[0]))
            ep_cols["next_observations"].append(next_obs[0])
            ep_cols["terminals"].append(float(term[0]))
            ep_cols["timeouts"].append(float(to[0]))
            ep_ret += float(r[0])
            done = bool(term[0] or to[0])
            obs = obs_after
        timed_out = bool(ep_cols["timeouts"][-1])
        norm = d4rl_normalized_score(args.env, ep_ret)
        why = None
        if args.only_timeout_episodes and not timed_out:
            why = "terminal"
        elif args.min_normalized is not None and norm < args.min_normalized:
            why = f"norm {norm:.2f} < {args.min_normalized}"
        if why:
            print(f"attempt {attempt} (policy {(attempt - 1) % len(policies)}):"
                  f" return {ep_ret:.1f} norm {norm:.2f}"
                  f" ({len(ep_cols['rewards'])} steps) — dropped ({why})")
            continue
        kept += 1
        for k in cols:
            cols[k].extend(ep_cols[k])
        print(f"episode {kept}/{args.episodes}: return {ep_ret:.1f}"
              f" norm {norm:.2f} ({len(ep_cols['rewards'])} steps,"
              f" {'timeout' if timed_out else 'terminal'})")
    env.close()
    if kept < args.episodes:
        print(f"WARNING: only {kept}/{args.episodes} episodes kept after"
              f" {attempt} attempts")

    arrays = {k: np.asarray(v, np.float32) for k, v in cols.items()}
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez_compressed(args.out, **arrays)
    print(f"wrote {args.out}: {arrays['observations'].shape[0]} transitions, "
          f"{kept} episodes")
    return args.out


if __name__ == "__main__":
    main()
