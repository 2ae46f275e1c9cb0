"""The fused SAC update (shared actor forward via jax.vjp + one joint
actor/temperature backward, iltpu/updates/sac.py) must be numerically
equivalent to the naive three-backward formulation that mirrors the
reference sequencing literally (training.py:14-54). This test implements
the naive version inline and checks the production update against it."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from iltpu.models.actor import SoftActor
from iltpu.models.critic import TwinCritic, polyak_update
from iltpu.models import distributions as D
from iltpu.updates.sac import SACLearner, SACState


def _naive_update(learner, state, key, t):
    """Literal transcription of the reference sequencing: separate target
    forward, critic step, actor step (own forward + backward), temperature
    step, Polyak."""
    actor, critic = learner.actor, learner.critic
    s, a, r = t["states"], t["actions"], t["rewards"]
    s2, term, w, absorbing = (
        t["next_states"], t["terminals"], t["weights"], t["absorbing"],
    )
    alpha = jnp.exp(state.log_alpha)[0]
    k_next, k_new = jax.random.split(key)

    next_mean, next_log_std = actor.dist(state.actor_params, s2)
    z2 = D.sample_pretanh(k_next, next_mean, next_log_std)
    next_action = (1.0 - absorbing[:, None]) * jnp.tanh(z2)
    next_log_prob = D.log_prob_from_pretanh(next_mean, next_log_std, z2)
    tq1, tq2 = critic.apply(state.target_critic_params, s2, next_action)
    target_v = jnp.minimum(tq1, tq2) - (1.0 - absorbing) * alpha * next_log_prob
    td_target = jax.lax.stop_gradient(
        r + (1.0 - term) * learner.discount * target_v
    )

    def critic_loss_fn(cp):
        q1, q2 = critic.apply(cp, s, a)
        return jnp.mean(w * (q1 - td_target) ** 2) + jnp.mean(
            w * (q2 - td_target) ** 2
        )

    critic_grads = jax.grad(critic_loss_fn)(state.critic_params)
    cu, copt = learner.critic_optim.update(
        critic_grads, state.critic_opt, state.critic_params
    )
    critic_params = optax.apply_updates(state.critic_params, cu)

    def actor_loss_fn(ap):
        mean, log_std = actor.dist(ap, s)
        z = D.sample_pretanh(k_new, mean, log_std)
        log_prob = D.log_prob_from_pretanh(mean, log_std, z)
        q1, q2 = critic.apply(critic_params, s, jnp.tanh(z))
        return jnp.mean(
            w * (1.0 - absorbing) * jax.lax.stop_gradient(alpha) * log_prob
            - jnp.minimum(q1, q2)
        ), log_prob

    actor_grads, log_prob = jax.grad(actor_loss_fn, has_aux=True)(
        state.actor_params
    )
    au, aopt = learner.actor_optim.update(
        actor_grads, state.actor_opt, state.actor_params
    )
    actor_params = optax.apply_updates(state.actor_params, au)

    lp_det = jax.lax.stop_gradient(log_prob)

    def alpha_loss_fn(la):
        return -jnp.mean(
            w
            * (1.0 - absorbing)
            * jnp.exp(la)[0]
            * (lp_det + learner.entropy_target)
        )

    alpha_grads = jax.grad(alpha_loss_fn)(state.log_alpha)
    alu, alopt = learner.alpha_optim.update(
        alpha_grads, state.alpha_opt, state.log_alpha
    )
    log_alpha = optax.apply_updates(state.log_alpha, alu)

    return SACState(
        actor_params=actor_params,
        critic_params=critic_params,
        target_critic_params=polyak_update(
            critic_params, state.target_critic_params, learner.polyak_factor
        ),
        log_alpha=log_alpha,
        actor_opt=aopt,
        critic_opt=copt,
        alpha_opt=alopt,
    )


@pytest.fixture
def setup():
    S, A, B = 7, 3, 32
    actor = SoftActor(S, A, hidden_size=32, depth=2)
    critic = TwinCritic(S, A, hidden_size=32, depth=2)
    learner = SACLearner(actor, critic, learning_rate=3e-4, discount=0.97)
    state = learner.init(jax.random.key(0))
    ks = jax.random.split(jax.random.key(1), 8)
    t = {
        "states": jax.random.normal(ks[0], (B, S)),
        "actions": jnp.tanh(jax.random.normal(ks[1], (B, A))),
        "rewards": jax.random.normal(ks[2], (B,)),
        "next_states": jax.random.normal(ks[3], (B, S)),
        "terminals": (jax.random.uniform(ks[4], (B,)) < 0.1).astype(jnp.float32),
        "timeouts": jnp.zeros((B,)),
        "weights": 1.0 + jax.random.uniform(ks[5], (B,)),
        "absorbing": (jax.random.uniform(ks[6], (B,)) < 0.2).astype(jnp.float32),
        "step": jnp.zeros((B,)),
    }
    return learner, state, t


def test_fused_update_matches_naive(setup):
    learner, state, t = setup
    key = jax.random.key(42)
    new_state, aux = learner.update(state, key, t)
    naive_state = _naive_update(learner, state, key, t)
    for name in ("actor_params", "critic_params", "target_critic_params",
                 "log_alpha"):
        got = jax.tree.leaves(getattr(new_state, name))
        want = jax.tree.leaves(getattr(naive_state, name))
        for g, w_ in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w_), rtol=2e-5, atol=2e-6,
                err_msg=name,
            )


def test_fused_update_matches_naive_chained(setup):
    learner, state, t = setup
    s_fused = s_naive = state
    for i in range(5):
        key = jax.random.key(100 + i)
        s_fused, _ = learner.update(s_fused, key, t)
        s_naive = _naive_update(learner, s_naive, key, t)
    for g, w_ in zip(
        jax.tree.leaves(s_fused.actor_params),
        jax.tree.leaves(s_naive.actor_params),
    ):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w_), rtol=1e-4, atol=1e-5
        )
    np.testing.assert_allclose(
        np.asarray(s_fused.log_alpha), np.asarray(s_naive.log_alpha),
        rtol=1e-5, atol=1e-7,
    )
