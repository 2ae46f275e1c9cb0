"""Fused Pallas TPU kernel for the GAIL discriminator step + reward head.

One `pl.pallas_call` performs the whole per-update discriminator program
(reference training.py:85-134 + train.py:177-198 ordering):

  BCE loss on one fused expert+policy forward  ->  input-gradient penalty
  (double autodiff, traced *inside* the kernel)  ->  AdamW  ->  spectral-norm
  power iteration  ->  reward prediction with the UPDATED parameters.

Unlike the SAC kernel (pallas_sac.py, hand-derived backward), the
discriminator gradients — including the grad-penalty's second-order term —
come from `jax.value_and_grad` traced inside the kernel body: autodiff is a
trace-time transformation, so the kernel still lowers to plain
matmul/elementwise Mosaic ops.

Scope (asserted by the wrapper): the production BCE configuration AND the
tuned quality configuration — loss in {BCE, Mixup(alpha)} with optional
entropy bonus and any of the GAIL/AIRL/FAIRL reward heads — no PUGAIL, no
reward shaping, no subtract-log-pi, state+action input, depth-1 relu
g-network. AdamW matches optax.flatten(optax.adamw) exactly (same
bias-correction counts), and the spectral-norm step replicates
`update_spectral_norm` (fcnn.py).

Equivalence is pinned by tests/test_pallas_gail.py against
`adversarial_imitation_update` + `predict_reward`.
"""

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from iltpu.ops.pallas_sac import _adam_step, _adam_state, _rebuild_opt_state


def _gail_core(static, gv, batch):
    """The whole discriminator step + reward head on plain VALUES: state
    dict `gv` ({p, sn, m, v, t} as in gail_state_to_leaves) + batch tuple
    (e_s, e_a, e_w, p_s, p_a, p_w, eps_gp, tgt) -> (new state dict,
    loss(1,), rewards(B,)). Shared by the single-update kernel and the
    K-blocked kernel (pallas_fused_block.py)."""
    (B, grad_penalty, lr, wd, spectral_norm, reward_function,
     loss_function, entropy_bonus) = static
    (e_s, e_a, e_w, p_s, p_a, p_w, eps_gp, tgt_op) = batch
    if loss_function == "BCE":
        # (2B,) [targets | weights] stacked as (2, 2B) to keep operands
        # 2D-ish:
        tgt = tgt_op[0]
        w_all = tgt_op[1]
    else:  # Mixup: tgt_op carries eps ~ Beta(alpha, alpha), shape (1, B)
        eps_mix = tgt_op[0]
    if spectral_norm:
        u1, v1, u2, v2 = gv["sn"]

    def fwd(params, s, a):
        w1, b1, w2, b2 = params
        if spectral_norm:
            # sigma = v^T W u without 1D dots (Mosaic needs 2D contractions):
            # elementwise outer-product reduction on the VPU.
            w1 = w1 / jnp.sum((v1[:, None] * w1) * u1[None, :])
            w2 = w2 / jnp.sum((v2[:, None] * w2) * u2[None, :])
        x = jnp.concatenate([s, a], axis=-1)
        h = jnp.maximum(
            jnp.dot(x, w1, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT) + b1, 0.0
        )
        return (jnp.dot(h, w2, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT) + b2)[:, 0]

    if loss_function == "BCE":
        c_s = jnp.concatenate([e_s, p_s])
        c_a = jnp.concatenate([e_a, p_a])
    else:  # Mixup (training.py:105-114): convex combos of expert/policy
        c_s = eps_mix[:, None] * e_s + (1.0 - eps_mix[:, None]) * p_s
        c_a = eps_mix[:, None] * e_a + (1.0 - eps_mix[:, None]) * p_a
        m_w = eps_mix * e_w + (1.0 - eps_mix) * p_w
    g_s = eps_gp[:, None] * e_s + (1.0 - eps_gp[:, None]) * p_s
    g_a = eps_gp[:, None] * e_a + (1.0 - eps_gp[:, None]) * p_a
    g_w = eps_gp * e_w + (1.0 - eps_gp) * p_w

    def loss_fn(params):
        d = fwd(params, c_s, c_a)
        if loss_function == "BCE":
            # mean(e_w*bce(d_e,1)) + mean(p_w*bce(d_p,0)) written WITHOUT
            # slicing d (the slice backward emits a 1D concat Mosaic cannot
            # lower): one weighted sum against a [1]*B+[0]*B target vector.
            loss = jnp.sum(w_all * (jax.nn.softplus(-d) + (1.0 - tgt) * d)) / B
            ent_w = w_all
        else:
            # w*(eps*bce(d,1) + (1-eps)*bce(d,0)) = w*(softplus(-d)+(1-eps)d)
            # — BCE-with-logits against the SOFT target eps, exactly the
            # same algebraic form as the hard-target row above.
            loss = (
                jnp.sum(m_w * (jax.nn.softplus(-d) + (1.0 - eps_mix) * d)) / B
            )
            ent_w = m_w
        if entropy_bonus > 0.0:
            # -beta * mean(w * H(Bernoulli(logits=d))) over the same logits
            # the loss used (training.py:130-132); H = softplus(d) - d*sig(d).
            ent = jax.nn.softplus(d) - d * jax.nn.sigmoid(d)
            loss = loss - entropy_bonus * jnp.sum(ent_w * ent) / B
        if grad_penalty > 0.0:
            def d_sum(s, a):
                return jnp.sum(fwd(params, s, a))

            gs, ga = jax.grad(d_sum, argnums=(0, 1))(g_s, g_a)
            sq = jnp.sum(gs * gs, axis=-1) + jnp.sum(ga * ga, axis=-1)
            loss = loss + grad_penalty * jnp.mean(g_w * sq)
        return loss

    params = gv["p"]
    loss, grads = jax.value_and_grad(loss_fn)(params)

    # (1,) vectors for scalar state: Mosaic cannot store scalars to VMEM.
    t_v = gv["t"] + 1.0
    t = t_v[0]
    new_params, new_m, new_v = [], [], []
    for i in range(4):
        p, m, v = _adam_step(params[i], grads[i], gv["m"][i], gv["v"][i], t, lr, wd)
        new_params.append(p)
        new_m.append(m)
        new_v.append(v)

    # Spectral-norm power iteration on the UPDATED weights (fcnn.py
    # update_spectral_norm: v <- normalize(W u); u <- normalize(W^T v)).
    new_sn = ()
    if spectral_norm:
        def power_iter(w, u):
            # 2D column vectors throughout: Mosaic lowers 2D matmuls and
            # full (to-scalar) reductions, but not 1D matvecs/norms.
            u_col = u[:, None]  # (out, 1)
            v_col = jnp.dot(w, u_col, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
            v_col = v_col / (jnp.sqrt(jnp.sum(v_col * v_col)) + 1e-12)
            u_col = jax.lax.dot_general(  # w^T v without a transpose op
                w, v_col, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            u_col = u_col / (jnp.sqrt(jnp.sum(u_col * u_col)) + 1e-12)
            return u_col[:, 0], v_col[:, 0]

        nu1, nv1 = power_iter(new_params[0], u1)
        nu2, nv2 = power_iter(new_params[2], u2)
        new_sn = (nu1, nv1, nu2, nv2)
        u1, v1, u2, v2 = nu1, nv1, nu2, nv2

    # Reward head with the updated parameters (train.py:177-198 ordering;
    # models.py:177-180 reward functions) on the policy batch.
    f = fwd(tuple(new_params), p_s, p_a)
    D = jax.nn.sigmoid(f)
    if reward_function == "GAIL":
        r = -jnp.log1p(-D + 1e-6)
    else:
        r = jnp.log(D + 1e-6) - jnp.log1p(-D + 1e-6)
        if reward_function == "FAIRL":
            r = jnp.exp(r) * -r
    new_gv = {
        "p": tuple(new_params),
        "sn": new_sn,
        "m": tuple(new_m),
        "v": tuple(new_v),
        "t": t_v,
    }
    return new_gv, loss * jnp.ones((1,), jnp.float32), r


def _gail_kernel(static, *refs):
    spectral_norm = static[4]
    it = iter(range(len(refs)))

    def take(n):
        return [refs[next(it)] for _ in range(n)]

    p4 = take(4)
    sn = take(4) if spectral_norm else []  # u1, v1, u2, v2
    m4 = take(4)
    v4 = take(4)
    (t_ref,) = take(1)
    batch_refs = take(8)  # e_s, e_a, e_w, p_s, p_a, p_w, eps_gp, tgt
    o_params = take(4)
    o_sn = take(4) if spectral_norm else []
    o_m = take(4)
    o_v = take(4)
    (o_t,) = take(1)
    (o_loss, o_rewards) = take(2)

    gv = {
        "p": tuple(r_[...] for r_ in p4),
        "sn": tuple(r_[...] for r_ in sn),
        "m": tuple(r_[...] for r_ in m4),
        "v": tuple(r_[...] for r_ in v4),
        "t": t_ref[...],
    }
    new_gv, loss, rewards = _gail_core(
        static, gv, tuple(r_[...] for r_ in batch_refs)
    )
    for i in range(4):
        o_params[i][...] = new_gv["p"][i]
        o_m[i][...] = new_gv["m"][i]
        o_v[i][...] = new_gv["v"][i]
    if spectral_norm:
        for i in range(4):
            o_sn[i][...] = new_gv["sn"][i]
    o_t[...] = new_gv["t"]
    o_loss[...] = loss
    o_rewards[...] = rewards


def _leaves4(ls):
    return (ls[0]["w"], ls[0]["b"], ls[1]["w"], ls[1]["b"])


def gail_state_to_leaves(disc_params: Dict, opt_state):
    """(params, optax state) -> kernel leaf layout, ONCE per update scan.

    Returns (leaves, (mu_full, nu_full)): the full unravelled moment
    trees are handed back so `gail_leaves_to_state` can restore the u/v
    spectral-norm moment slots (which adamw never moves — their grads
    are zero — but optax.flatten still tracks) without a per-step
    unravel."""
    from jax.flatten_util import ravel_pytree

    layers = disc_params["g"]["layers"]
    spectral_norm = "u" in layers[0]
    _, unravel = ravel_pytree(disc_params)
    ast = _adam_state(opt_state)
    mu_full = unravel(ast.mu)
    nu_full = unravel(ast.nu)
    lv = {
        "p": _leaves4(layers),
        "sn": (
            (layers[0]["u"], layers[0]["v"], layers[1]["u"], layers[1]["v"])
            if spectral_norm
            else ()
        ),
        "m": _leaves4(mu_full["g"]["layers"]),
        "v": _leaves4(nu_full["g"]["layers"]),
        "t": jnp.reshape(jnp.asarray(ast.count, jnp.float32), (1,)),
    }
    return lv, (mu_full, nu_full)


def gail_leaves_to_state(opt_state, lv: Dict, n_updates: int, moment_trees):
    """Leaf layout -> (disc_params, optax state), ONCE after the scan.
    Counts increment in int32 here (authority; the f32 leaf clock is
    bias-correction-only, exact below 2^24)."""
    from jax.flatten_util import ravel_pytree

    mu_full, nu_full = moment_trees
    np4 = lv["p"]
    l0 = {"w": np4[0], "b": np4[1]}
    l1 = {"w": np4[2], "b": np4[3]}
    if lv["sn"]:
        l0 = {**l0, "u": lv["sn"][0], "v": lv["sn"][1]}
        l1 = {**l1, "u": lv["sn"][2], "v": lv["sn"][3]}
    new_params = {"g": {"layers": (l0, l1)}}

    def put_moments(full, w1, b1, w2, b2):
        ls = full["g"]["layers"]
        m0 = {**ls[0], "w": w1, "b": b1}
        m1 = {**ls[1], "w": w2, "b": b2}
        return {"g": {"layers": (m0, m1)}}

    ast = _adam_state(opt_state)
    new_opt = _rebuild_opt_state(
        opt_state,
        ast.count + n_updates,
        ravel_pytree(put_moments(mu_full, *lv["m"]))[0],
        ravel_pytree(put_moments(nu_full, *lv["v"]))[0],
    )
    return new_params, new_opt


def gail_update_pallas_leaves(
    discriminator,
    lv: Dict,
    expert_batch,
    policy_batch,
    eps_gp: jax.Array,
    tgt_op: jax.Array,
    *,
    grad_penalty: float,
    learning_rate: float,
    weight_decay: float,
    loss_function: str,
    entropy_bonus: float,
    interpret: bool = False,
):
    """One fused discriminator step + reward head on the leaf layout.

    Pure kernel step: no moment unravel/ravel, no RNG — eps_gp (the
    grad-penalty interpolation draw) and tgt_op (BCE targets|weights or
    the Mixup eps row, see gail_update_pallas) come precomputed from the
    caller's one vmapped pass. expert_batch/policy_batch are (s, a, w)
    triples. Returns (new_leaves, loss(1,), rewards(B,))."""
    e_s, e_a, e_w = expert_batch
    p_s, p_a, p_w = policy_batch
    B = p_s.shape[0]
    spectral_norm = bool(lv["sn"])
    batch = (e_s, e_a, e_w, p_s, p_a, p_w, eps_gp, tgt_op)
    operands = (*lv["p"], *lv["sn"], *lv["m"], *lv["v"], lv["t"], *batch)
    n_state = 4 + len(lv["sn"]) + 4 + 4 + 1
    out_shapes = [
        jax.ShapeDtypeStruct(o.shape, jnp.float32) for o in operands[:n_state]
    ] + [
        jax.ShapeDtypeStruct((1,), jnp.float32),  # loss
        jax.ShapeDtypeStruct((B,), jnp.float32),  # rewards
    ]
    static = (
        B,
        float(grad_penalty),
        float(learning_rate),
        float(weight_decay),
        spectral_norm,
        discriminator.reward_function,
        loss_function,
        float(entropy_bonus),
    )
    outs = pl.pallas_call(
        partial(_gail_kernel, static),
        out_shape=out_shapes,
        input_output_aliases={i: i for i in range(n_state)},
        interpret=interpret,
    )(*operands)
    off = 4 + len(lv["sn"])
    new_lv = {
        "p": tuple(outs[0:4]),
        "sn": tuple(outs[4:off]) if spectral_norm else (),
        "m": tuple(outs[off : off + 4]),
        "v": tuple(outs[off + 4 : off + 8]),
        "t": outs[off + 8],  # f32 clock advances across scan steps
    }
    return new_lv, outs[off + 9], outs[off + 10]


def gail_update_pallas(
    discriminator,
    disc_params: Dict,
    opt_state,
    transitions: Dict[str, jax.Array],
    expert_transitions: Dict[str, jax.Array],
    key: jax.Array,
    *,
    grad_penalty: float,
    learning_rate: float,
    weight_decay: float,
    loss_function: str = "BCE",
    mixup_alpha: float = 1.0,
    entropy_bonus: float = 0.0,
    interpret: bool = False,
) -> Tuple[Dict, tuple, Dict[str, jax.Array], jax.Array]:
    """Fused replacement for `adversarial_imitation_update` + the GAIL
    `predict_reward` pass. Returns (new_params, new_opt_state, aux,
    rewards-for-the-policy-batch). Covers the BCE production config AND
    the tuned quality config (Mixup loss + entropy bonus + AIRL head)."""
    from jax.flatten_util import ravel_pytree

    g = discriminator.g
    assert not discriminator.reward_shaping and not discriminator.state_only
    assert not discriminator.subtract_log_policy
    assert g.depth == 1 and g.activation == "relu"
    assert g.dropout == 0.0 and g.input_dropout == 0.0
    assert loss_function in ("BCE", "Mixup")

    layers = disc_params["g"]["layers"]
    spectral_norm = "u" in layers[0]
    B = transitions["terminals"].shape[0]

    # Key convention of adversarial_imitation_update: (k_mixup, k_gp) split,
    # eps_mix ~ Beta(alpha, alpha)^B from k_mixup, eps_gp ~ U(0,1)^B from
    # k_gp.
    k_mixup, k_gp = jax.random.split(key)
    eps_gp = jax.random.uniform(k_gp, (B,))

    _, unravel = ravel_pytree(disc_params)
    ast = _adam_state(opt_state)
    mu_t = unravel(ast.mu)["g"]["layers"]
    nu_t = unravel(ast.nu)["g"]["layers"]

    def leaves4(ls):
        return (ls[0]["w"], ls[0]["b"], ls[1]["w"], ls[1]["b"])

    p4 = leaves4(layers)
    sn4 = (
        (layers[0]["u"], layers[0]["v"], layers[1]["u"], layers[1]["v"])
        if spectral_norm
        else ()
    )
    m4 = leaves4(mu_t)
    v4 = leaves4(nu_t)
    count = jnp.reshape(jnp.asarray(ast.count, jnp.float32), (1,))
    if loss_function == "BCE":
        tgt_op = jnp.stack(
            [
                jnp.concatenate([jnp.ones((B,)), jnp.zeros((B,))]),
                jnp.concatenate(
                    [expert_transitions["weights"], transitions["weights"]]
                ),
            ]
        )  # (2, 2B): [BCE targets | weights] for the fused forward
    else:
        # (B,) then reshape: the draw must be bit-identical to the XLA
        # path's (adversarial.py). Beta(1,1) == Uniform(0,1) exactly; the
        # closed form avoids jax.random.beta's double gamma rejection
        # sampler, which dominates the fused update scan on TPU.
        if mixup_alpha == 1.0:
            eps = jax.random.uniform(k_mixup, (B,))
        else:
            eps = jax.random.beta(k_mixup, mixup_alpha, mixup_alpha, (B,))
        tgt_op = eps.reshape(1, B)
    batch = (
        expert_transitions["states"],
        expert_transitions["actions"],
        expert_transitions["weights"],
        transitions["states"],
        transitions["actions"],
        transitions["weights"],
        eps_gp,
        tgt_op,
    )
    operands = (*p4, *sn4, *m4, *v4, count, *batch)
    n_state = 4 + len(sn4) + 4 + 4 + 1
    out_shapes = [
        jax.ShapeDtypeStruct(o.shape, jnp.float32) for o in operands[:n_state]
    ] + [
        jax.ShapeDtypeStruct((1,), jnp.float32),  # loss
        jax.ShapeDtypeStruct((B,), jnp.float32),  # rewards
    ]
    static = (
        B,
        float(grad_penalty),
        float(learning_rate),
        float(weight_decay),
        spectral_norm,
        discriminator.reward_function,
        loss_function,
        float(entropy_bonus),
    )
    outs = pl.pallas_call(
        partial(_gail_kernel, static),
        out_shape=out_shapes,
        input_output_aliases={i: i for i in range(n_state)},
        interpret=interpret,
    )(*operands)

    np4 = outs[0:4]
    off = 4
    if spectral_norm:
        nsn = outs[off : off + 4]
        off += 4
    nm4 = outs[off : off + 4]
    nv4 = outs[off + 4 : off + 8]
    n_t = outs[off + 8]
    loss = outs[off + 9]
    rewards = outs[off + 10]

    l0 = {"w": np4[0], "b": np4[1]}
    l1 = {"w": np4[2], "b": np4[3]}
    if spectral_norm:
        l0 = {**l0, "u": nsn[0], "v": nsn[1]}
        l1 = {**l1, "u": nsn[2], "v": nsn[3]}
    new_params = {"g": {"layers": (l0, l1)}}
    # optax.flatten moments are over the FULL param tree (incl. u/v slots,
    # which adamw never moves because their grads are zero via stop_gradient
    # — but flatten still tracks them). Preserve the original u/v moment
    # values from the flat vectors rather than zeros.
    mu_full = unravel(ast.mu)
    nu_full = unravel(ast.nu)

    def put_moments(full, w1, b1, w2, b2):
        ls = full["g"]["layers"]
        l0 = {**ls[0], "w": w1, "b": b1}
        l1 = {**ls[1], "w": w2, "b": b2}
        return {"g": {"layers": (l0, l1)}}

    new_mu = put_moments(mu_full, *nm4)
    new_nu = put_moments(nu_full, *nv4)
    new_opt = _rebuild_opt_state(
        opt_state,
        ast.count + 1,  # int32 authority; the kernel's f32 t is bias-corr only
        ravel_pytree(new_mu)[0],
        ravel_pytree(new_nu)[0],
    )
    aux = {"discriminator_loss": loss[0]}
    return new_params, new_opt, aux, rewards
