"""Adversarial (GAIL/AIRL/FAIRL) discriminator update.

Capability parity with reference `adversarial_imitation_update`
(training.py:85-134):
- three loss functions: weighted BCE (training.py:97-99), nn-PUGAIL
  positive-unlabelled with class prior + non-negative margin clamp
  (training.py:100-102), and Mixup on convex combinations of expert/policy
  tuples with epsilon ~ Beta(alpha, alpha) (training.py:105-114);
- gradient penalty: squared L2 norm of the discriminator's input gradients
  w.r.t. interpolated (state, action), weighted by the mixed importance
  weights (training.py:117-127);
- entropy bonus maximising the Bernoulli(logits=D) entropy
  (training.py:130-132);
- the actor's log-policy contribution to discriminator inputs is a constant
  (built under no_grad in the reference, training.py:94,109,123).

TPU-native design: the reference accumulates three separate `.backward()`
passes into `.grad` buffers and then steps the optimiser; here all terms
form ONE scalar loss differentiated once — the gradient-penalty term is an
inner `jax.grad` w.r.t. inputs nested inside the outer parameter grad
(second-order autodiff, which XLA fuses into the same compiled step). One
difference from torch's spectral-norm parametrization: the reference runs a
power iteration on every *forward* in train mode (so 2-3 per update); we run
exactly one explicit power-iteration step per update via
`GAILDiscriminator.update_sn`, which converges to the same sigma.
"""

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from iltpu.models.actor import SoftActor
from iltpu.rewards.gail import GAILDiscriminator


@dataclass(frozen=True)
class AdversarialConfig:
    """Static (trace-time) knobs; defaults follow conf/algorithm/GAIL.yaml."""

    loss_function: str = "BCE"  # BCE | PUGAIL | Mixup
    grad_penalty: float = 1.0
    mixup_alpha: float = 1.0
    entropy_bonus: float = 0.0
    pos_class_prior: float = 0.7
    nonnegative_margin: float = float("inf")

    def __post_init__(self):
        assert self.loss_function in ("BCE", "PUGAIL", "Mixup")


def _bce_with_logits(logits: jax.Array, target: float) -> jax.Array:
    """Per-element binary cross-entropy from logits:
    softplus(-x) + (1 - z) * x (numerically stable form)."""
    return jax.nn.softplus(-logits) + (1.0 - target) * logits


def _bernoulli_entropy(logits: jax.Array) -> jax.Array:
    p = jax.nn.sigmoid(logits)
    return p * jax.nn.softplus(-logits) + (1.0 - p) * jax.nn.softplus(logits)


def _mix(x1: jax.Array, x2: jax.Array, eps: jax.Array) -> jax.Array:
    """Convex combination with broadcast over trailing dims
    (reference `_mix_vars`, training.py:79-81)."""
    mix = eps[:, None] if x1.ndim == 2 else eps
    return mix * x1 + (1.0 - mix) * x2


def adversarial_imitation_update(
    discriminator: GAILDiscriminator,
    actor: SoftActor,
    actor_params: dict,
    disc_params: dict,
    opt_state: tuple,
    optim: optax.GradientTransformation,
    transitions: Dict[str, jax.Array],
    expert_transitions: Dict[str, jax.Array],
    key: jax.Array,
    cfg: AdversarialConfig,
) -> Tuple[dict, tuple, Dict[str, jax.Array]]:
    """One discriminator optimisation step. Returns
    (new_disc_params, new_opt_state, aux)."""
    e_s, e_a = expert_transitions["states"], expert_transitions["actions"]
    e_s2, e_term = expert_transitions["next_states"], expert_transitions["terminals"]
    e_w = expert_transitions["weights"]
    p_s, p_a = transitions["states"], transitions["actions"]
    p_s2, p_term = transitions["next_states"], transitions["terminals"]
    p_w = transitions["weights"]

    shaping = discriminator.reward_shaping
    sub_logpi = discriminator.subtract_log_policy
    k_mixup, k_gp = jax.random.split(key)
    batch_size = p_term.shape[0]

    def log_pi(s, a):
        if not sub_logpi:
            return None
        return jax.lax.stop_gradient(actor.log_prob(actor_params, s, a))

    # Constants w.r.t. disc params; precompute outside the grad.
    lp_e, lp_p = log_pi(e_s, e_a), log_pi(p_s, p_a)

    if cfg.loss_function == "Mixup":
        # Beta(1,1) IS Uniform(0,1): jax.random.beta goes through TWO gamma
        # rejection samplers (while_loops of transcendentals) — measured to
        # dominate the whole fused update scan on TPU (~200x) — so take the
        # exact closed form at the default/tuned alpha=1.
        if cfg.mixup_alpha == 1.0:
            eps_mix = jax.random.uniform(k_mixup, (batch_size,))
        else:
            eps_mix = jax.random.beta(
                k_mixup, cfg.mixup_alpha, cfg.mixup_alpha, (batch_size,)
            )
        m_s, m_a = _mix(e_s, p_s, eps_mix), _mix(e_a, p_a, eps_mix)
        m_s2, m_term = _mix(e_s2, p_s2, eps_mix), _mix(e_term, p_term, eps_mix)
        m_w = _mix(e_w, p_w, eps_mix)
        lp_m = log_pi(m_s, m_a)

    if cfg.grad_penalty > 0:
        eps_gp = jax.random.uniform(k_gp, (batch_size,))
        g_s, g_a = _mix(e_s, p_s, eps_gp), _mix(e_a, p_a, eps_gp)
        g_s2, g_term = _mix(e_s2, p_s2, eps_gp), _mix(e_term, p_term, eps_gp)
        g_w = _mix(e_w, p_w, eps_gp)
        lp_g = log_pi(g_s, g_a)

    if cfg.loss_function in ("BCE", "PUGAIL"):
        # One 2B-row forward instead of two B-row forwards: the update scan
        # is op-dispatch-bound on TPU (tiny matmuls), so halving the number
        # of discriminator applies beats the (negligible) extra FLOPs.
        c_s = jnp.concatenate([e_s, p_s])
        c_a = jnp.concatenate([e_a, p_a])
        c_s2 = jnp.concatenate([e_s2, p_s2])
        c_term = jnp.concatenate([e_term, p_term])
        lp_c = None if lp_e is None else jnp.concatenate([lp_e, lp_p])

    def loss_fn(params):
        aux = {}
        if cfg.loss_function in ("BCE", "PUGAIL"):
            d = discriminator.forward(params, c_s, c_a, c_s2, c_term, lp_c)
            d_e, d_p = d[:batch_size], d[batch_size:]
            if cfg.loss_function == "BCE":
                expert_loss = jnp.mean(e_w * _bce_with_logits(d_e, 1.0))
                policy_loss = jnp.mean(p_w * _bce_with_logits(d_p, 0.0))
            else:  # nn-PUGAIL (training.py:100-102)
                prior = cfg.pos_class_prior
                expert_loss = prior * jnp.mean(e_w * _bce_with_logits(d_e, 1.0))
                policy_loss = jnp.clip(
                    prior * jnp.mean(e_w * _bce_with_logits(d_e, 0.0))
                    - jnp.mean(p_w * _bce_with_logits(d_p, 0.0)),
                    min=-cfg.nonnegative_margin,
                )
            loss = expert_loss + policy_loss
            aux["expert_loss"], aux["policy_loss"] = expert_loss, policy_loss
            entropy_terms = [(d_e, e_w), (d_p, p_w)]
        else:  # Mixup (training.py:105-114)
            d_m = discriminator.forward(params, m_s, m_a, m_s2, m_term, lp_m)
            per = eps_mix * m_w * _bce_with_logits(d_m, 1.0) + (
                1.0 - eps_mix
            ) * m_w * _bce_with_logits(d_m, 0.0)
            loss = jnp.mean(per)
            aux["mix_loss"] = loss
            entropy_terms = [(d_m, m_w)]

        if cfg.grad_penalty > 0:
            def d_of_inputs(s, a):
                return jnp.sum(
                    discriminator.forward(params, s, a, g_s2, g_term, lp_g)
                )

            gs, ga = jax.grad(d_of_inputs, argnums=(0, 1))(g_s, g_a)
            sq_norms = jnp.sum(gs**2, axis=-1) + jnp.sum(ga**2, axis=-1)
            gp = cfg.grad_penalty * jnp.mean(g_w * sq_norms)
            loss = loss + gp
            aux["grad_penalty"] = gp

        if cfg.entropy_bonus > 0:
            ent = -cfg.entropy_bonus * jnp.mean(
                sum(w * _bernoulli_entropy(d) for d, w in entropy_terms)
            )
            loss = loss + ent
            aux["entropy_bonus"] = ent

        return loss, aux

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(disc_params)
    updates, new_opt = optim.update(grads, opt_state, disc_params)
    new_params = optax.apply_updates(disc_params, updates)
    new_params = discriminator.update_sn(new_params)
    aux["discriminator_loss"] = loss
    return new_params, new_opt, aux
