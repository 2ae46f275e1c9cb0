"""K-blocked fused GAIL+SAC update kernel: K consecutive full update
steps (discriminator step + reward head -> SAC step, reference
train.py:176-198 + training.py:14-54 ordering) as ONE Pallas kernel.

Why: even with the per-update fused kernels (pallas_sac.py,
pallas_gail.py) the update scan pays, per scan step, two kernel
launches and an HBM round-trip of the full ~3 MB parameter+moment
carry. At ~91 us/update the loop is op-latency-bound (docs/PERF.md), so
amortising that fixed cost over K sequential micro-updates — with the
ENTIRE state resident in VMEM across all K — attacks the dominant term
directly. The sequential semantics are preserved exactly: micro-update
k+1 sees micro-update k's parameters, the same dependency chain the
per-step scan enforces.

The math is shared, not duplicated: this kernel runs `_gail_core` and
`_sac_core` (the value-level bodies of the single-update kernels)
inside a `lax.fori_loop`, so the per-update pins in
tests/test_pallas_{sac,gail}.py cover the arithmetic and
tests/test_fused_scan.py pins the K-blocked path against the per-step
scan to float rounding.

VMEM budget (hopper, batch 256, K=16): ~3.1 MB state + moments, ~0.4 MB
batch slabs, a few 256x256 activation temporaries — comfortably inside
a v5e core's VMEM.
"""

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from iltpu.ops.pallas_gail import _gail_core
from iltpu.ops.pallas_sac import SACHyper, _sac_core


def _kblock_kernel(hyper: SACHyper, gail_static, sizes, K, spectral_norm,
                   *refs):
    it = iter(range(len(refs)))

    def take(n):
        return [refs[next(it)] for _ in range(n)]

    # --- SAC state refs (order matches pallas_sac operand layout) -------
    sac_keys = ("a", "am", "av", "c", "cm", "cv", "t")
    sac_in = {k: take(6) for k in sac_keys}
    (la_ref, lam_ref, lav_ref) = take(3)
    (ta_ref, tc_ref, tal_ref) = take(3)
    # --- GAIL state refs ------------------------------------------------
    gp4 = take(4)
    gsn = take(4) if spectral_norm else []
    gm4 = take(4)
    gv4 = take(4)
    (gt_ref,) = take(1)
    # --- K-stacked batch refs -------------------------------------------
    (ps_ref, pa_ref, pw_ref, s2_ref, term_ref, ab_ref) = take(6)
    (es_ref, ea_ref, ew_ref) = take(3)
    (epsgp_ref, tgt_ref, eps2_ref, epsn_ref) = take(4)
    # --- outputs (state aliased) + last-micro-update aux ----------------
    sac_out = {k: take(6) for k in sac_keys}
    (o_la, o_lam, o_lav) = take(3)
    (o_ta, o_tc, o_tal) = take(3)
    o_gp = take(4)
    o_gsn = take(4) if spectral_norm else []
    o_gm = take(4)
    o_gv = take(4)
    (o_gt,) = take(1)
    (o_loss, o_rew, o_lp, o_minq, o_alpha) = take(5)

    sv_raw = {k: tuple(r_[...] for r_ in sac_in[k]) for k in sac_keys}
    sv_raw.update(
        la=la_ref[...], lam=lam_ref[...], lav=lav_ref[...],
        ta=ta_ref[...], tc=tc_ref[...], tal=tal_ref[...],
    )
    gv_raw = {
        "p": tuple(r_[...] for r_ in gp4),
        "sn": tuple(r_[...] for r_ in gsn),
        "m": tuple(r_[...] for r_ in gm4),
        "v": tuple(r_[...] for r_ in gv4),
        "t": gt_ref[...],
    }
    (S, A, B) = sizes

    # Mosaic's loop-carry layout assignment rejects RANK-1 arrays
    # (layout.h "arr.size() >= layout_rank(implicit_dim)"), so every 1-D
    # leaf (biases, spectral-norm vectors, (1,) temperature/count
    # scalars) rides the fori_loop carry as (1, N) and is squeezed back
    # to the cores' native shapes at the loop-body boundary. The masks
    # are computed from the ORIGINAL trees so a genuine (1, N) rank-2
    # leaf can never be mis-squeezed.
    sv_mask = jax.tree.map(lambda v: v.ndim == 1, sv_raw)
    gv_mask = jax.tree.map(lambda v: v.ndim == 1, gv_raw)

    def up_t(tree, mask):
        return jax.tree.map(lambda v, m: v[None] if m else v, tree, mask)

    def dn_t(tree, mask):
        return jax.tree.map(lambda v, m: v[0] if m else v, tree, mask)

    sv0 = up_t(sv_raw, sv_mask)
    gv0 = up_t(gv_raw, gv_mask)

    def body(k, carry):
        sv, gvs = carry
        sv = dn_t(sv, sv_mask)
        gvs = dn_t(gvs, gv_mask)
        # Per-micro-update rows load straight from the K-stacked VMEM
        # refs: dynamic indexing is only legal on the UNTILED leading dim
        # (Mosaic cannot dynamic-slice materialised values), so every
        # slab is shipped 3D — (K, B, D) columns, (K, 1, B) rows.
        p_s, p_a, s2 = ps_ref[k], pa_ref[k], s2_ref[k]
        e_s, e_a = es_ref[k], ea_ref[k]
        eps2, eps_new = eps2_ref[k], epsn_ref[k]
        tgt = tgt_ref[k]
        p_w, term, ab = pw_ref[k][0], term_ref[k][0], ab_ref[k][0]
        e_w, eps_gp = ew_ref[k][0], epsgp_ref[k][0]
        gvs, loss, rewards = _gail_core(
            gail_static, gvs, (e_s, e_a, e_w, p_s, p_a, p_w, eps_gp, tgt)
        )
        sv, (lp, min_q, alpha_pre) = _sac_core(
            hyper, sizes, sv,
            (p_s, p_a, rewards, s2, term, p_w, ab, eps2, eps_new),
        )
        # Aux goes straight to the output refs, overwritten every
        # micro-update so the LAST one's values remain — keeping the
        # (B,)/(1,) aux vectors out of the loop carry entirely.
        o_loss[...] = loss
        o_rew[...] = rewards
        o_lp[...] = lp
        o_minq[...] = min_q
        o_alpha[...] = alpha_pre
        return up_t(sv, sv_mask), up_t(gvs, gv_mask)

    sv, gvs = jax.lax.fori_loop(0, K, body, (sv0, gv0))
    sv = dn_t(sv, sv_mask)
    gvs = dn_t(gvs, gv_mask)

    for k2 in sac_keys:
        for i in range(6):
            sac_out[k2][i][...] = sv[k2][i]
    o_la[...] = sv["la"]
    o_lam[...] = sv["lam"]
    o_lav[...] = sv["lav"]
    o_ta[...] = sv["ta"]
    o_tc[...] = sv["tc"]
    o_tal[...] = sv["tal"]
    for i in range(4):
        o_gp[i][...] = gvs["p"][i]
        o_gm[i][...] = gvs["m"][i]
        o_gv[i][...] = gvs["v"][i]
    if spectral_norm:
        for i in range(4):
            o_gsn[i][...] = gvs["sn"][i]
    o_gt[...] = gvs["t"]


def gail_sac_update_kblock(
    learner,
    discriminator,
    sac_lv: Dict,
    gail_lv: Dict,
    policy: Dict[str, jax.Array],
    expert: Dict[str, jax.Array],
    eps_gp: jax.Array,
    tgt_op: jax.Array,
    eps2: jax.Array,
    eps_new: jax.Array,
    *,
    grad_penalty: float,
    learning_rate: float,
    weight_decay: float,
    loss_function: str,
    entropy_bonus: float,
    interpret: bool = False,
) -> Tuple[Dict, Dict, Dict[str, jax.Array]]:
    """K sequential (disc step + reward -> SAC step) updates as one
    kernel, on the leaf layouts of sac_state_to_leaves /
    gail_state_to_leaves. All batch inputs are K-stacked along axis 0
    (policy/expert: (K, B, ...) transition columns; eps/tgt: the same
    pre-derived randomness the per-step fast path uses). Returns
    (new_sac_leaves, new_gail_leaves, aux-of-the-LAST-micro-update) —
    the same aux the update scan keeps (trainer keeps only [-1])."""
    K, B = policy["states"].shape[:2]
    S = learner.actor.state_size
    A = learner.actor.action_size
    spectral_norm = bool(gail_lv["sn"])

    sac_keys = ("a", "am", "av", "c", "cm", "cv", "t")
    sac_state_ops = tuple(x for k in sac_keys for x in sac_lv[k]) + (
        sac_lv["la"], sac_lv["lam"], sac_lv["lav"],
        sac_lv["ta"], sac_lv["tc"], sac_lv["tal"],
    )
    gail_state_ops = (
        *gail_lv["p"], *gail_lv["sn"], *gail_lv["m"], *gail_lv["v"],
        gail_lv["t"],
    )
    def row3(x):  # (K, B) row operands -> (K, 1, B): dynamic indexing is
        return x.reshape(K, 1, B)  # only legal on the untiled leading dim

    batch_ops = (
        policy["states"], policy["actions"], row3(policy["weights"]),
        policy["next_states"], row3(policy["terminals"]),
        row3(policy["absorbing"]),
        expert["states"], expert["actions"], row3(expert["weights"]),
        row3(eps_gp), tgt_op, eps2, eps_new,
    )
    operands = (*sac_state_ops, *gail_state_ops, *batch_ops)
    n_state = len(sac_state_ops) + len(gail_state_ops)
    out_shapes = [
        jax.ShapeDtypeStruct(o.shape, jnp.float32) for o in operands[:n_state]
    ] + [
        jax.ShapeDtypeStruct((1,), jnp.float32),  # disc loss
        jax.ShapeDtypeStruct((B,), jnp.float32),  # rewards
        jax.ShapeDtypeStruct((B,), jnp.float32),  # log_probs
        jax.ShapeDtypeStruct((B,), jnp.float32),  # min Q
        jax.ShapeDtypeStruct((1,), jnp.float32),  # alpha (pre-update)
    ]
    hyper = SACHyper(
        lr=learner.lr,
        weight_decay=learner.weight_decay,
        alpha_lr=learner.alpha_lr,
        discount=learner.discount,
        entropy_target=learner.entropy_target,
        polyak=learner.polyak_factor,
        min_alpha=learner.min_alpha,
    )
    gail_static = (
        B,
        float(grad_penalty),
        float(learning_rate),
        float(weight_decay),
        spectral_norm,
        discriminator.reward_function,
        loss_function,
        float(entropy_bonus),
    )
    kernel = partial(
        _kblock_kernel, hyper, gail_static, (S, A, B), K, spectral_norm
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        input_output_aliases={i: i for i in range(n_state)},
        interpret=interpret,
    )(*operands)

    o = iter(outs)

    def take(n):
        return tuple(next(o) for _ in range(n))

    new_sac = {k: take(6) for k in sac_keys}
    (new_sac["la"],) = take(1)
    (new_sac["lam"],) = take(1)
    (new_sac["lav"],) = take(1)
    (new_sac["ta"],) = take(1)
    (new_sac["tc"],) = take(1)
    (new_sac["tal"],) = take(1)
    new_gail = {"p": take(4)}
    new_gail["sn"] = take(4) if spectral_norm else ()
    new_gail["m"] = take(4)
    new_gail["v"] = take(4)
    (new_gail["t"],) = take(1)
    loss, rewards, lp, min_q, alpha = take(5)
    aux = {
        "discriminator_loss": loss[0],
        "predicted_rewards": rewards,
        "alphas": alpha[0],
        "entropies": -lp,
        "Q_values": min_q,
    }
    return new_sac, new_gail, aux
