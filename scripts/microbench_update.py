#!/usr/bin/env python
"""On-device microbenchmark of the per-update cost components.

Each measurement scans `iters` repetitions of one component inside a single
jitted program (so the ~26 ms tunneled-link latency is amortised away) and
reports device time per iteration. Components:

  sac_full      the production SACLearner.update
  critic_only   TD target + critic grad + Adam
  actor_only    actor grad against the critic + Adam
  alpha_polyak  temperature grad + Adam + Polyak
  disc_gail     adversarial discriminator update (BCE + grad penalty)
  reward_pred   GAIL reward prediction for a batch

Usage: BENCH_PLATFORM=tpu python scripts/microbench_update.py [--iters 512]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=512)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )

    from iltpu.models.actor import SoftActor
    from iltpu.models.critic import TwinCritic, polyak_update
    from iltpu.rewards.gail import GAILDiscriminator
    from iltpu.updates.sac import SACLearner
    from iltpu.updates.adversarial import (
        AdversarialConfig,
        adversarial_imitation_update,
    )
    import optax

    S, A, B = 12, 3, args.batch
    key = jax.random.key(0)
    actor = SoftActor(S, A, hidden_size=256, depth=2)
    critic = TwinCritic(S, A, hidden_size=256, depth=2)
    learner = SACLearner(actor, critic)
    sac = learner.init(key)
    # production GAIL disc config (conf/algorithms.yaml): 64x1, spectral norm
    disc = GAILDiscriminator(
        S, A, hidden_size=64, depth=1, spectral_norm=True,
        reward_function="AIRL",
    )
    disc_params = disc.init(jax.random.key(1))
    disc_optim = optax.flatten(optax.adamw(3e-4))
    disc_opt = disc_optim.init(disc_params)

    def fake_batch(k):
        ks = jax.random.split(k, 4)
        return {
            "states": jax.random.normal(ks[0], (B, S)),
            "actions": jnp.tanh(jax.random.normal(ks[1], (B, A))),
            "rewards": jax.random.normal(ks[2], (B,)),
            "next_states": jax.random.normal(ks[3], (B, S)),
            "terminals": jnp.zeros((B,)),
            "timeouts": jnp.zeros((B,)),
            "weights": jnp.ones((B,)),
            "absorbing": jnp.zeros((B,)),
            "step": jnp.zeros((B,)),
        }

    batch = fake_batch(jax.random.key(2))
    ebatch = fake_batch(jax.random.key(3))

    def scan_time(step_fn, carry):
        f = jax.jit(
            lambda c: jax.lax.scan(
                lambda cc, i: (step_fn(cc, jax.random.fold_in(key, i)), None),
                c,
                jnp.arange(args.iters),
            )[0]
        )
        out = f(carry)  # compile
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(carry))
            best = min(best, time.perf_counter() - t0)
        return best / args.iters * 1e6  # us per iteration

    results = {}

    results["sac_full_us"] = scan_time(
        lambda s, k: learner.update(s, k, batch)[0], sac
    )

    def critic_only(s, k):
        alpha = jnp.exp(s.log_alpha)[0]
        from iltpu.models import distributions as D
        nm, nls = actor.dist(s.actor_params, batch["next_states"])
        z2 = D.sample_pretanh(k, nm, nls)
        na = jnp.tanh(z2)
        nlp = D.log_prob_from_pretanh(nm, nls, z2)
        tq1, tq2 = critic.apply(s.target_critic_params, batch["next_states"], na)
        tv = jnp.minimum(tq1, tq2) - alpha * nlp
        tgt = jax.lax.stop_gradient(batch["rewards"] + 0.99 * tv)

        def loss(cp):
            q1, q2 = critic.apply(cp, batch["states"], batch["actions"])
            return jnp.mean((q1 - tgt) ** 2) + jnp.mean((q2 - tgt) ** 2)

        g = jax.grad(loss)(s.critic_params)
        upd, copt = learner.critic_optim.update(g, s.critic_opt, s.critic_params)
        return s.replace(
            critic_params=optax.apply_updates(s.critic_params, upd),
            critic_opt=copt,
        )

    results["critic_only_us"] = scan_time(critic_only, sac)

    def actor_only(s, k):
        from iltpu.models import distributions as D

        def loss(ap):
            m, ls = actor.dist(ap, batch["states"])
            z = D.sample_pretanh(k, m, ls)
            na = jnp.tanh(z)
            lp = D.log_prob_from_pretanh(m, ls, z)
            q1, q2 = critic.apply(s.critic_params, batch["states"], na)
            return jnp.mean(0.2 * lp - jnp.minimum(q1, q2))

        g = jax.grad(loss)(s.actor_params)
        upd, aopt = learner.actor_optim.update(g, s.actor_opt, s.actor_params)
        return s.replace(
            actor_params=optax.apply_updates(s.actor_params, upd), actor_opt=aopt
        )

    results["actor_only_us"] = scan_time(actor_only, sac)

    def alpha_polyak(s, k):
        lp = batch["rewards"]

        def loss(la):
            return -jnp.mean(jnp.exp(la)[0] * (lp - 3.0))

        g = jax.grad(loss)(s.log_alpha)
        upd, aopt = learner.alpha_optim.update(g, s.alpha_opt, s.log_alpha)
        return s.replace(
            log_alpha=optax.apply_updates(s.log_alpha, upd),
            alpha_opt=aopt,
            target_critic_params=polyak_update(
                s.critic_params, s.target_critic_params, 0.995
            ),
        )

    results["alpha_polyak_us"] = scan_time(alpha_polyak, sac)

    def disc_step(carry, k):
        dp, dopt = carry
        dp, dopt, _ = adversarial_imitation_update(
            disc,
            actor,
            sac.actor_params,
            dp,
            dopt,
            disc_optim,
            batch,
            ebatch,
            k,
            AdversarialConfig(loss_function="BCE", grad_penalty=1.0),
        )
        return (dp, dopt)

    results["disc_gail_us"] = scan_time(disc_step, (disc_params, disc_opt))

    def reward_pred(carry, k):
        return carry + jnp.sum(
            disc.predict_reward(
                disc_params, batch["states"], batch["actions"],
            )
        ) * 0.0

    results["reward_pred_us"] = scan_time(reward_pred, jnp.zeros(()))

    results["iters"] = args.iters
    results["batch"] = B
    import jax as _j
    results["platform"] = _j.devices()[0].platform
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
