"""SAC update: twin soft-Q TD with automatic temperature, absorbing masks.

Semantics parity with reference `sac_update` (training.py:14-54), including
its exact sequencing (critic step -> actor loss against the *updated*
critic -> temperature step -> Polyak) and the DAC absorbing-state machinery:
- next actions zeroed at absorbing states (training.py:23), log-probs taken
  *before* the rewrite to avoid NaNs (training.py:22);
- no entropy in the target at absorbing states (training.py:24);
- actor and temperature losses masked by (1 - absorbing) (training.py:38,45);
- importance weights multiply the critic MSE and the entropy terms exactly
  as in the reference (the Q-value term of the actor loss is unweighted,
  training.py:38).

TPU-native design: the three backward passes fuse into ONE jitted function
over an explicit `SACState`; donate the state at the call site and the
whole update is an in-place HBM pass with zero host sync.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from iltpu.models.actor import SoftActor
from iltpu.models.critic import TwinCritic, polyak_update
from iltpu.models import distributions as D
from iltpu.utils.pytree import pytree_dataclass


@pytree_dataclass
class SACState:
    actor_params: dict
    critic_params: dict
    target_critic_params: dict
    log_alpha: jax.Array
    actor_opt: tuple
    critic_opt: tuple
    alpha_opt: tuple


class SACLearner:
    def __init__(
        self,
        actor: SoftActor,
        critic: TwinCritic,
        *,
        learning_rate: float = 3e-4,
        weight_decay: float = 0.0,
        discount: float = 0.99,
        entropy_target: float = -3.0,
        polyak_factor: float = 0.995,
        min_alpha: float = 0.0,
    ):
        self.actor = actor
        self.critic = critic
        self.discount = discount
        self.entropy_target = entropy_target
        self.polyak_factor = polyak_factor
        # Opt-in temperature floor (reinforcement.min_alpha; 0 = exact
        # reference semantics). Late-training hopper runs anneal alpha to
        # ~0.005 and then oscillate between expert plateaus and collapses
        # (docs/DECAY_ROOTCAUSE.md); flooring the alpha USED by the critic
        # target and actor loss keeps exploration alive while the raw
        # log_alpha keeps its own dynamics (so it can rise back above the
        # floor — a hard clamp on log_alpha would zero its gradient and
        # pin it).
        self.min_alpha = min_alpha
        # recorded for the fused Pallas update path (iltpu/ops/pallas_sac.py)
        self.lr = learning_rate
        self.weight_decay = weight_decay
        self.alpha_lr = learning_rate
        # torch AdamW parity for actor/critic, plain Adam for the temperature
        # (train.py:66). optax.flatten runs the elementwise Adam math on one
        # flat vector per optimiser instead of per-leaf ops — the update is
        # op-overhead-bound on TPU, and AdamW is elementwise so the math is
        # unchanged.
        self.actor_optim = optax.flatten(
            optax.adamw(learning_rate, weight_decay=weight_decay)
        )
        self.critic_optim = optax.flatten(
            optax.adamw(learning_rate, weight_decay=weight_decay)
        )
        self.alpha_optim = optax.adam(learning_rate)

    def init(self, key: jax.Array) -> SACState:
        ka, kc = jax.random.split(key)
        actor_params = self.actor.init(ka)
        critic_params = self.critic.init(kc)
        log_alpha = jnp.zeros((1,), jnp.float32)
        return SACState(
            actor_params=actor_params,
            critic_params=critic_params,
            # Real buffer copy (not identity): the trainer donates the whole
            # state pytree, and aliased leaves break XLA donation.
            target_critic_params=jax.tree.map(jnp.copy, critic_params),
            log_alpha=log_alpha,
            actor_opt=self.actor_optim.init(actor_params),
            critic_opt=self.critic_optim.init(critic_params),
            alpha_opt=self.alpha_optim.init(log_alpha),
        )

    def update(
        self, state: SACState, key: jax.Array, transitions: Dict[str, jax.Array]
    ) -> Tuple[SACState, Dict[str, jax.Array]]:
        s = transitions["states"]
        a = transitions["actions"]
        r = transitions["rewards"]
        s2 = transitions["next_states"]
        term = transitions["terminals"]
        w = transitions["weights"]
        absorbing = transitions["absorbing"]
        alpha = jnp.exp(state.log_alpha)[0]
        if self.min_alpha > 0.0:
            alpha = jnp.maximum(alpha, self.min_alpha)

        # --- Shared actor forward ------------------------------------------
        # The TD target needs pi(s') (no grad) and the actor loss needs
        # pi(s) (grad w.r.t. actor params); both use the SAME pre-update
        # params, so run ONE batched forward over concat([s', s]) under
        # jax.vjp. The update is op-latency-bound on TPU (tiny matmuls), so
        # halving the number of MLP chains matters more than the extra rows.
        # Exactness: the s' half receives zero cotangents, so actor grads
        # equal the separate-forward formulation (tests/test_updates.py
        # checks equivalence against the naive two-pass version).
        k_next, k_new = jax.random.split(key)
        batch = s.shape[0]
        s_all = jnp.concatenate([s2, s], axis=0)
        (mean_all, ls_all), dist_vjp = jax.vjp(
            lambda p: self.actor.dist(p, s_all), state.actor_params
        )
        next_mean, mean = mean_all[:batch], mean_all[batch:]
        next_log_std, log_std = ls_all[:batch], ls_all[batch:]

        # --- TD target (no-grad region; training.py:19-25) ------------------
        z2 = D.sample_pretanh(k_next, next_mean, next_log_std)
        next_action = jnp.tanh(z2)
        next_log_prob = D.log_prob_from_pretanh(next_mean, next_log_std, z2)
        next_action = (1.0 - absorbing[:, None]) * next_action

        # Target critic on (s', a') and online critic on (s, a) run as ONE
        # stacked forward (the target slot is a constant w.r.t. the online
        # params, so its cotangents are zero and the critic gradient is
        # exactly the separate-forward formulation — same op-count argument
        # as the shared actor forward above).
        target_params = state.target_critic_params
        s_in = jnp.stack([s2, s])
        a_in = jnp.stack([next_action, a])

        def stacked_critic_fwd(online_params):
            stacked = jax.tree.map(
                lambda t, c: jnp.stack([t, c]), target_params, online_params
            )
            return jax.vmap(self.critic.apply)(stacked, s_in, a_in)

        (q1s, q2s), critic_vjp = jax.vjp(stacked_critic_fwd, state.critic_params)
        tq1, tq2 = q1s[0], q2s[0]
        target_v = jnp.minimum(tq1, tq2) - (1.0 - absorbing) * alpha * next_log_prob
        td_target = jax.lax.stop_gradient(r + (1.0 - term) * self.discount * target_v)

        # --- Critic step (training.py:26-31) --------------------------------
        def critic_head(q1, q2):
            loss = jnp.mean(w * (q1 - td_target) ** 2) + jnp.mean(
                w * (q2 - td_target) ** 2
            )
            return loss, jnp.minimum(q1, q2)

        (critic_loss, min_q_batch), (g_q1, g_q2) = jax.value_and_grad(
            critic_head, argnums=(0, 1), has_aux=True
        )(q1s[1], q2s[1])
        zeros_q = jnp.zeros_like(tq1)
        (critic_grads,) = critic_vjp(
            (jnp.stack([zeros_q, g_q1]), jnp.stack([zeros_q, g_q2]))
        )
        critic_updates, critic_opt = self.critic_optim.update(
            critic_grads, state.critic_opt, state.critic_params
        )
        critic_params = optax.apply_updates(state.critic_params, critic_updates)

        # --- Actor + temperature losses, ONE backward -----------------------
        # Actor loss against the *updated* critic (training.py:33-42) and the
        # temperature loss (training.py:44-49) share a single reverse pass:
        # the actor term uses stop_gradient(alpha) and the temperature term
        # uses stop_gradient(log_prob), so the joint gradient w.r.t.
        # (mean, log_std, log_alpha) decomposes exactly into the reference's
        # two separate steps. Note the temperature grad uses the PRE-update
        # log_alpha variable, as in the reference sequencing.
        def head_loss(mean_h, log_std_h, log_alpha):
            z = D.sample_pretanh(k_new, mean_h, log_std_h)
            new_action = jnp.tanh(z)
            log_prob = D.log_prob_from_pretanh(mean_h, log_std_h, z)
            q1, q2 = self.critic.apply(critic_params, s, new_action)
            new_values = jnp.minimum(q1, q2)
            actor_loss = jnp.mean(
                w * (1.0 - absorbing) * jax.lax.stop_gradient(alpha) * log_prob
                - new_values
            )
            lp_detached = jax.lax.stop_gradient(log_prob)
            a_ = jnp.exp(log_alpha)[0]
            alpha_loss = -jnp.mean(
                w * (1.0 - absorbing) * a_ * (lp_detached + self.entropy_target)
            )
            return actor_loss + alpha_loss, (actor_loss, lp_detached)

        (g_mean, g_log_std, alpha_grads), (actor_loss, lp_detached) = jax.grad(
            head_loss, argnums=(0, 1, 2), has_aux=True
        )(mean, log_std, state.log_alpha)
        actor_grads = dist_vjp(
            (
                jnp.concatenate([jnp.zeros_like(g_mean), g_mean], axis=0),
                jnp.concatenate([jnp.zeros_like(g_log_std), g_log_std], axis=0),
            )
        )[0]
        actor_updates, actor_opt = self.actor_optim.update(
            actor_grads, state.actor_opt, state.actor_params
        )
        actor_params = optax.apply_updates(state.actor_params, actor_updates)

        alpha_updates, alpha_opt = self.alpha_optim.update(
            alpha_grads, state.alpha_opt, state.log_alpha
        )
        log_alpha = optax.apply_updates(state.log_alpha, alpha_updates)

        # --- Polyak target update (training.py:52) --------------------------
        target_critic_params = polyak_update(
            critic_params, state.target_critic_params, self.polyak_factor
        )

        new_state = SACState(
            actor_params=actor_params,
            critic_params=critic_params,
            target_critic_params=target_critic_params,
            log_alpha=log_alpha,
            actor_opt=actor_opt,
            critic_opt=critic_opt,
            alpha_opt=alpha_opt,
        )
        aux = {
            "log_probs": lp_detached,
            "Q_values": jax.lax.stop_gradient(min_q_batch),
            "critic_loss": critic_loss,
            "actor_loss": actor_loss,
            "alpha": alpha,
        }
        return new_state, aux
