"""Fused Pallas TPU kernel for the complete SAC update step.

One `pl.pallas_call` executes everything `SACLearner.update`
(iltpu/updates/sac.py, reference training.py:14-54) does per update:

  TD target (actor fwd on s' + target-critic fwd)  ->  critic fwd/bwd +
  AdamW  ->  actor fwd + critic input-grad + hand-derived tanh-Gaussian
  backward + AdamW  ->  temperature grad + Adam  ->  Polyak.

Why: at batch 256 with 2x256 MLPs every constituent XLA op is far below
MXU/VPU saturation, so the XLA update is op-latency-bound (~60 us on the
bench chip, docs/PERF.md). Fusing the whole update into ONE kernel keeps
all activations and parameters in VMEM (~3 MB total) and removes the
per-op overhead entirely.

Exactness: the backward passes are hand-derived; `tests/test_pallas_sac.py`
pins the kernel (interpret mode off-TPU) against `SACLearner.update` leaf
by leaf, single-step and chained. Key derivatives for the reparameterised
tanh-Gaussian with z = mu + sigma*eps and
lp = sum[-0.5(eps^2 + 2*ls + log 2pi)] - sum[2(log2 - z - softplus(-2z))]:

  d lp / d mu = 2 tanh(z)          (density and reparam terms cancel)
  d lp / d ls = -1 + 2 sigma eps tanh(z)
  d a  / d mu = 1 - tanh^2(z),   d a / d ls = (1 - tanh^2(z)) sigma eps

Scope (asserted): depth-2 relu MLPs, no dropout, no spectral norm — the
SAC/GAIL production configuration. AdamW math matches
optax.flatten(optax.adamw) (eps=1e-8, eps_root=0, decoupled wd inside the
lr scaling); the temperature uses plain Adam (train.py:66 parity).
"""

from functools import partial
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

LOG2PI = float(np.log(2.0 * np.pi))
ADAM_B1, ADAM_B2, ADAM_EPS = 0.9, 0.999, 1e-8


class SACHyper(NamedTuple):
    lr: float
    weight_decay: float
    alpha_lr: float
    discount: float
    entropy_target: float
    polyak: float
    # Opt-in temperature floor (reinforcement.min_alpha; 0 = exact
    # reference SAC). Floors the alpha USED by the TD target and the
    # actor's entropy term — the temperature's own gradient keeps the
    # raw exp(log_alpha) so log_alpha can rise back above the floor
    # (updates/sac.py:113-203 semantics).
    min_alpha: float = 0.0


# --------------------------------------------------------------------------
# In-kernel building blocks (all operate on concrete jnp arrays)


def _mlp_fwd(x, Ws, bs):
    """Depth-2 relu MLP forward; returns (out, cache for backward)."""
    z1 = jnp.dot(x, Ws[0], preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT) + bs[0]
    h1 = jnp.maximum(z1, 0.0)
    z2 = jnp.dot(h1, Ws[1], preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT) + bs[1]
    h2 = jnp.maximum(z2, 0.0)
    out = jnp.dot(h2, Ws[2], preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT) + bs[2]
    return out, (x, z1, h1, z2, h2)


def _mlp_bwd(dout, cache, Ws):
    """Backward of _mlp_fwd. Returns (param grads [dW,db]x3, dx)."""
    x, z1, h1, z2, h2 = cache
    dW3 = jnp.dot(h2.T, dout, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
    db3 = jnp.sum(dout, axis=0)
    dh2 = jnp.dot(dout, Ws[2].T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
    dz2 = dh2 * (z2 > 0.0)
    dW2 = jnp.dot(h1.T, dz2, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
    db2 = jnp.sum(dz2, axis=0)
    dh1 = jnp.dot(dz2, Ws[1].T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
    dz1 = dh1 * (z1 > 0.0)
    dW1 = jnp.dot(x.T, dz1, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
    db1 = jnp.sum(dz1, axis=0)
    dx = jnp.dot(dz1, Ws[0].T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
    return (dW1, db1, dW2, db2, dW3, db3), dx


def _adam_step(p, g, m, v, t, lr, wd):
    """One AdamW step (optax.adamw semantics). Returns (p', m', v').
    b**t is written exp(t log b): Mosaic has no powf legalization."""
    m = ADAM_B1 * m + (1.0 - ADAM_B1) * g
    v = ADAM_B2 * v + (1.0 - ADAM_B2) * g * g
    mh = m / (1.0 - jnp.exp(t * np.log(ADAM_B1)))
    vh = v / (1.0 - jnp.exp(t * np.log(ADAM_B2)))
    p = p - lr * (mh / (jnp.sqrt(vh) + ADAM_EPS) + wd * p)
    return p, m, v


def _tanh_gaussian(o, eps, action_size):
    """Split MLP head output into (mu, clipped log-std) and sample."""
    mu = o[:, :action_size]
    l_raw = o[:, action_size:]
    ls = jnp.clip(l_raw, -20.0, 2.0)
    sigma = jnp.exp(ls)
    z = mu + sigma * eps
    return mu, l_raw, ls, sigma, z


def _log_prob(ls, eps, z):
    """lp = normal_log_prob + |d tanh/dz| correction, summed over actions
    (distributions.py:18-43, with z - mu = sigma * eps substituted)."""
    n = -0.5 * (eps * eps + 2.0 * ls + LOG2PI)
    t = 2.0 * (jnp.log(2.0) - z - jax.nn.softplus(-2.0 * z))
    return jnp.sum(n - t, axis=-1)


def twin_stacked_to_cat(st6):
    """(2, ...)-stacked twin-critic leaves -> the kernel's CAT layout:
    ONE block-diagonal 3-layer MLP — W1 (in, 2H) side-by-side, W2
    (2H, 2H) and W3 (2H, 2) block-diagonal with exact zeros. The update
    is op-LATENCY-bound (tiny matmuls, docs/PERF.md), so evaluating both
    twins as one matmul chain halves the dependent-op depth; the zero
    blocks add only exact-zero products (x + 0 == x in every float
    format), so per-twin results match the two-chain formulation to
    accumulation-order rounding. Runs OUTSIDE the kernel (plain XLA,
    once per update scan): Mosaic cannot lane-slice beyond the first
    128-tile, so the kernel keeps the cat layout end-to-end and the
    stacked<->cat conversions live here."""
    W1 = jnp.concatenate([st6[0][0], st6[0][1]], axis=1)
    b1 = jnp.concatenate([st6[1][0], st6[1][1]])
    z2 = jnp.zeros_like(st6[2][0])
    W2 = jnp.concatenate(
        [
            jnp.concatenate([st6[2][0], z2], axis=1),
            jnp.concatenate([z2, st6[2][1]], axis=1),
        ],
        axis=0,
    )
    b2 = jnp.concatenate([st6[3][0], st6[3][1]])
    z3 = jnp.zeros_like(st6[4][0])
    W3 = jnp.concatenate(
        [
            jnp.concatenate([st6[4][0], z3], axis=1),
            jnp.concatenate([z3, st6[4][1]], axis=1),
        ],
        axis=0,
    )
    b3 = jnp.concatenate([st6[5][0], st6[5][1]])
    return (W1, b1, W2, b2, W3, b3)


def twin_cat_to_stacked(c6):
    """Inverse of twin_stacked_to_cat (plain XLA, outside the kernel)."""
    H = c6[1].shape[0] // 2
    return (
        jnp.stack([c6[0][:, :H], c6[0][:, H:]]),
        jnp.stack([c6[1][:H], c6[1][H:]]),
        jnp.stack([c6[2][:H, :H], c6[2][H:, H:]]),
        jnp.stack([c6[3][:H], c6[3][H:]]),
        jnp.stack([c6[4][:H, 0:1], c6[4][H:, 1:2]]),
        jnp.stack([c6[5][0:1], c6[5][1:2]]),
    )


def _twin_block_masks(Hc):
    """In-kernel {0,1} masks for the W2 (2H, 2H) / W3 (2H, 2) grads: the
    cat backward's cross-twin blocks are NOT real parameters and must
    stay exactly zero through AdamW (masked grad -> m = v = 0 -> p stays
    0 with decoupled wd*0). Built from 2D broadcasted_iota — no slicing,
    which Mosaic cannot lower past the first lane tile."""
    H = Hc // 2
    ri = jax.lax.broadcasted_iota(jnp.int32, (Hc, Hc), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (Hc, Hc), 1)
    mask2 = ((ri // H) == (ci // H)).astype(jnp.float32)
    r3 = jax.lax.broadcasted_iota(jnp.int32, (Hc, 2), 0)
    c3 = jax.lax.broadcasted_iota(jnp.int32, (Hc, 2), 1)
    mask3 = ((r3 // H) == c3).astype(jnp.float32)
    return mask2, mask3


def _twin_bwd_input(dq2, cache, Ws):
    """Input-gradient-only backward of the block-diagonal twin net: the
    3-matmul dh chain, no parameter grads. The 2H contraction of the
    final dx sums both twins' input-gradients — exactly the
    `da = da + dx_k` accumulation of the two-chain formulation."""
    x, z1, h1, z2, h2 = cache
    dh2 = jnp.dot(dq2, Ws[2].T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)
    dz2 = dh2 * (z2 > 0.0)
    dh1 = jnp.dot(dz2, Ws[1].T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)
    dz1 = dh1 * (z1 > 0.0)
    return jnp.dot(dz1, Ws[0].T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.DEFAULT)


# --------------------------------------------------------------------------
# The kernel


def _sac_core(hyper: SACHyper, sizes, sv, batch):
    """The whole SAC update on plain VALUES (no refs): state dict `sv`
    (keys as in sac_state_to_leaves; critic leaves in the block-diagonal
    CAT layout, twin_stacked_to_cat) + batch tuple -> (new state dict,
    (log_probs, min_q, alpha_pre)).
    Shared by the single-update kernel and the K-blocked kernel
    (pallas_fused_block.py), where it runs inside a fori_loop with the
    state resident in VMEM."""
    (S, A, B) = sizes
    lr, wd, alpha_lr = hyper.lr, hyper.weight_decay, hyper.alpha_lr
    discount, H_target, rho = hyper.discount, hyper.entropy_target, hyper.polyak
    (s, a, r, s2, term, wgt, ab, eps2, eps_new) = batch
    aw, am, av = sv["a"], sv["am"], sv["av"]
    cw, cm, cv = sv["c"], sv["cm"], sv["cv"]
    tw = sv["t"]
    log_alpha_v = sv["la"]
    alpha_raw = jnp.exp(log_alpha_v[0])
    alpha = (
        jnp.maximum(alpha_raw, hyper.min_alpha)
        if hyper.min_alpha > 0.0
        else alpha_raw
    )

    actor_W = [aw[0], aw[2], aw[4]]
    actor_b = [aw[1], aw[3], aw[5]]

    # Critic leaves arrive in the CAT layout (twin_stacked_to_cat): both
    # twins as one block-diagonal chain, conversions done OUTSIDE the
    # kernel. Masks keep the non-parameter cross-twin blocks exactly 0.
    mask2, mask3 = _twin_block_masks(cw[1].shape[0])

    # ---- TD target (training.py:19-25): no gradients anywhere ----------
    o2, _ = _mlp_fwd(s2, actor_W, actor_b)
    _, _, ls2, _, z2 = _tanh_gaussian(o2, eps2, A)
    lp2 = _log_prob(ls2, eps2, z2)
    na = (1.0 - ab[:, None]) * jnp.tanh(z2)
    x2 = jnp.concatenate([s2, na], axis=-1)
    tout, _ = _mlp_fwd(x2, [tw[0], tw[2], tw[4]], [tw[1], tw[3], tw[5]])
    tq = jnp.minimum(tout[:, 0], tout[:, 1])
    target_v = tq - (1.0 - ab) * alpha * lp2
    td_target = r + (1.0 - term) * discount * target_v

    # ---- Critic step (training.py:26-31), both twins as ONE chain ------
    x = jnp.concatenate([s, a], axis=-1)
    CWs = [cw[0], cw[2], cw[4]]
    cout, ccache = _mlp_fwd(x, CWs, [cw[1], cw[3], cw[5]])
    q1, q2 = cout[:, 0], cout[:, 1]
    min_q = jnp.minimum(q1, q2)
    t_c_v = sv["tc"] + 1.0
    t_c = t_c_v[0]
    dq2 = (2.0 / B) * wgt[:, None] * (cout - td_target[:, None])
    (dW1, db1, dW2, db2, dW3, db3), _ = _mlp_bwd(dq2, ccache, CWs)
    # W1/bias cat-grads have no cross-twin terms (side-by-side columns /
    # per-unit sums); only the block-diagonal W2/W3 grads need masking.
    cg = (dW1, db1, dW2 * mask2, db2, dW3 * mask3, db3)
    new_c, new_cm, new_cv = [], [], []
    for i in range(6):
        p, m, v = _adam_step(cw[i], cg[i], cm[i], cv[i], t_c, lr, wd)
        new_c.append(p)
        new_cm.append(m)
        new_cv.append(v)

    # ---- Actor + temperature (training.py:33-49), vs the UPDATED critic -
    o1, cache1 = _mlp_fwd(s, actor_W, actor_b)
    _, l_raw1, ls1, sg1, z1 = _tanh_gaussian(o1, eps_new, A)
    lp1 = _log_prob(ls1, eps_new, z1)
    a_new = jnp.tanh(z1)
    xn = jnp.concatenate([s, a_new], axis=-1)
    UWs = [new_c[0], new_c[2], new_c[4]]
    uout, ucache = _mlp_fwd(xn, UWs, [new_c[1], new_c[3], new_c[5]])
    qn1, qn2 = uout[:, 0], uout[:, 1]
    # d(-mean(min(q1,q2)))/dq_k -> backprop to the action input only; the
    # cat net's input-gradient sums both twins' selector-masked chains.
    sel1 = (qn1 <= qn2).astype(jnp.float32)
    dq2n = (-1.0 / B) * jnp.stack([sel1, 1.0 - sel1], axis=1)
    dx = _twin_bwd_input(dq2n, ucache, UWs)
    da = dx[:, S:]
    tanh_z = jnp.tanh(z1)
    sech2 = 1.0 - tanh_z * tanh_z
    c_ent = (wgt * (1.0 - ab) * alpha / B)[:, None]
    g_mu = c_ent * (2.0 * tanh_z) + da * sech2
    g_ls = c_ent * (-1.0 + 2.0 * sg1 * eps_new * tanh_z) + da * sech2 * sg1 * eps_new
    g_ls = g_ls * ((l_raw1 >= -20.0) & (l_raw1 <= 2.0)).astype(jnp.float32)
    do = jnp.concatenate([g_mu, g_ls], axis=-1)
    ag, _ = _mlp_bwd(do, cache1, actor_W)
    t_a_v = sv["ta"] + 1.0
    t_a = t_a_v[0]
    new_aw, new_am, new_av = [], [], []
    for i in range(6):
        p, m, v = _adam_step(aw[i], ag[i], am[i], av[i], t_a, lr, wd)
        new_aw.append(p)
        new_am.append(m)
        new_av.append(v)

    # Temperature: plain Adam on the PRE-update log_alpha (training.py:44-49).
    # Uses the RAW alpha even under a min_alpha floor (the floor clamps
    # only the alpha consumed by the losses, never log_alpha's dynamics).
    g_la = (
        -jnp.sum(wgt * (1.0 - ab) * (lp1 + H_target), keepdims=True)
        / B
        * alpha_raw
    )  # (1,)
    t_al_v = sv["tal"] + 1.0
    la_new, lam_new, lav_new = _adam_step(
        log_alpha_v, g_la, sv["lam"], sv["lav"], t_al_v[0], alpha_lr, 0.0
    )

    new_sv = {
        "a": tuple(new_aw),
        "am": tuple(new_am),
        "av": tuple(new_av),
        "c": tuple(new_c),
        "cm": tuple(new_cm),
        "cv": tuple(new_cv),
        "t": tuple(
            rho * tw[i] + (1.0 - rho) * new_c[i] for i in range(6)
        ),
        "la": la_new,
        "lam": lam_new,
        "lav": lav_new,
        "ta": t_a_v,
        "tc": t_c_v,
        "tal": t_al_v,
    }
    # aux alpha mirrors the XLA path: the FLOORED pre-update value
    # (max with 0.0 is the identity when no floor is set — exp > 0).
    return new_sv, (lp1, min_q, jnp.maximum(jnp.exp(log_alpha_v), hyper.min_alpha))


def _sac_kernel(hyper: SACHyper, sizes, *refs):
    it = iter(range(len(refs)))

    def take(n):
        return [refs[next(it)] for _ in range(n)]

    # Operand order must match the wrapper's `operands` tuple.
    aw = take(6)          # actor W1,b1,W2,b2,W3,b3
    am = take(6)          # actor adam m (same layout)
    av = take(6)          # actor adam v
    cw = take(6)          # critic stacked (2,...) W1,b1,W2,b2,W3,b3
    cm = take(6)
    cv = take(6)
    tw = take(6)          # target critic stacked
    (la_ref, lam_ref, lav_ref) = take(3)   # log_alpha + adam m/v (1,)
    (ta_ref, tc_ref, tal_ref) = take(3)    # adam step counts (1,) f32
    (s_ref, a_ref, r_ref, s2_ref, term_ref, w_ref, ab_ref) = take(7)
    (eps2_ref, epsn_ref) = take(2)
    # outputs (aliased to the state inputs) + aux
    o_aw = take(6)
    o_am = take(6)
    o_av = take(6)
    o_cw = take(6)
    o_cm = take(6)
    o_cv = take(6)
    o_tw = take(6)
    (o_la, o_lam, o_lav) = take(3)
    (o_ta, o_tc, o_tal) = take(3)
    (o_lp, o_minq, o_alpha) = take(3)

    # Mosaic cannot load/store scalars to VMEM — every scalar state lives
    # in (1,) vectors; values are extracted with [0] (a value slice, legal).
    sv = {
        "a": tuple(r_[...] for r_ in aw),
        "am": tuple(r_[...] for r_ in am),
        "av": tuple(r_[...] for r_ in av),
        "c": tuple(r_[...] for r_ in cw),
        "cm": tuple(r_[...] for r_ in cm),
        "cv": tuple(r_[...] for r_ in cv),
        "t": tuple(r_[...] for r_ in tw),
        "la": la_ref[...],
        "lam": lam_ref[...],
        "lav": lav_ref[...],
        "ta": ta_ref[...],
        "tc": tc_ref[...],
        "tal": tal_ref[...],
    }
    batch = (
        s_ref[...], a_ref[...], r_ref[...], s2_ref[...], term_ref[...],
        w_ref[...], ab_ref[...], eps2_ref[...], epsn_ref[...],
    )
    new_sv, (lp1, min_q, alpha_pre) = _sac_core(hyper, sizes, sv, batch)

    # ---- Writes ---------------------------------------------------------
    for i in range(6):
        o_aw[i][...] = new_sv["a"][i]
        o_am[i][...] = new_sv["am"][i]
        o_av[i][...] = new_sv["av"][i]
        o_cw[i][...] = new_sv["c"][i]
        o_cm[i][...] = new_sv["cm"][i]
        o_cv[i][...] = new_sv["cv"][i]
        o_tw[i][...] = new_sv["t"][i]
    o_la[...] = new_sv["la"]
    o_lam[...] = new_sv["lam"]
    o_lav[...] = new_sv["lav"]
    o_ta[...] = new_sv["ta"]
    o_tc[...] = new_sv["tc"]
    o_tal[...] = new_sv["tal"]
    o_lp[...] = lp1
    o_minq[...] = min_q
    o_alpha[...] = alpha_pre


# --------------------------------------------------------------------------
# Host-side wrapper


def _leaves6(params: Dict) -> Tuple:
    """MLP params {'layers': ({'w','b'},)*3} -> (W1,b1,W2,b2,W3,b3)."""
    ls = params["layers"]
    assert len(ls) == 3, "pallas SAC kernel supports depth-2 MLPs only"
    return (ls[0]["w"], ls[0]["b"], ls[1]["w"], ls[1]["b"], ls[2]["w"], ls[2]["b"])


def _tree6(leaves) -> Dict:
    return {
        "layers": (
            {"w": leaves[0], "b": leaves[1]},
            {"w": leaves[2], "b": leaves[3]},
            {"w": leaves[4], "b": leaves[5]},
        )
    }


def _adam_state(opt_state):
    """Locate the ScaleByAdamState in an optax chain state."""
    for s in jax.tree.leaves(opt_state, is_leaf=lambda x: hasattr(x, "mu")):
        if hasattr(s, "mu"):
            return s
    raise ValueError("no ScaleByAdamState in optimiser state")


def _rebuild_opt_state(opt_state, count, mu, nu):
    import optax

    def rep(s):
        if hasattr(s, "mu"):
            return s._replace(count=count, mu=mu, nu=nu)
        return s

    return jax.tree.map(rep, opt_state, is_leaf=lambda x: hasattr(x, "mu"))


def sac_state_to_leaves(state) -> Dict:
    """SACState -> the kernel's flat leaf layout, ONCE.

    The optax.flatten moments are unravelled to per-layer leaves and the
    int32 Adam counts cast to (1,) f32 (the kernel's bias-correction
    clock). Pulling this out of the per-update path lets an update scan
    carry the leaf pytree directly instead of paying the ~30 slice/
    reshape/concat glue ops per scan step (docs/PERF.md: the update loop
    is op-latency-bound)."""
    from jax.flatten_util import ravel_pytree

    _, unravel_a = ravel_pytree(state.actor_params)
    _, unravel_c = ravel_pytree(state.critic_params)
    ast = _adam_state(state.actor_opt)
    cst = _adam_state(state.critic_opt)
    alst = _adam_state(state.alpha_opt)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return {
        "a": _leaves6(state.actor_params),
        "am": _leaves6(unravel_a(ast.mu)),
        "av": _leaves6(unravel_a(ast.nu)),
        # Critic leaves travel in the block-diagonal CAT layout (one
        # matmul chain for both twins inside the kernel; conversions out
        # here in plain XLA where slicing is unrestricted).
        "c": twin_stacked_to_cat(_leaves6(state.critic_params)),
        "cm": twin_stacked_to_cat(_leaves6(unravel_c(cst.mu))),
        "cv": twin_stacked_to_cat(_leaves6(unravel_c(cst.nu))),
        "t": twin_stacked_to_cat(_leaves6(state.target_critic_params)),
        "la": state.log_alpha,
        "lam": jnp.reshape(alst.mu, (1,)),
        "lav": jnp.reshape(alst.nu, (1,)),
        "ta": f32(ast.count).reshape(1),
        "tc": f32(cst.count).reshape(1),
        "tal": f32(alst.count).reshape(1),
    }


def sac_leaves_to_state(state, lv: Dict, n_updates: int):
    """Rebuild a SACState from the leaf layout after n_updates kernel
    steps, ONCE. Counts increment in int32 here (the authority — the
    leaf layout's f32 clock is bias-correction-only; both agree exactly
    below 2^24 updates, and the f32 clock is re-derived from int32 at
    every sac_state_to_leaves call)."""
    from jax.flatten_util import ravel_pytree

    ast = _adam_state(state.actor_opt)
    cst = _adam_state(state.critic_opt)
    alst = _adam_state(state.alpha_opt)
    return state.replace(
        actor_params=_tree6(lv["a"]),
        critic_params=_tree6(twin_cat_to_stacked(lv["c"])),
        target_critic_params=_tree6(twin_cat_to_stacked(lv["t"])),
        log_alpha=lv["la"],
        actor_opt=_rebuild_opt_state(
            state.actor_opt, ast.count + n_updates,
            ravel_pytree(_tree6(lv["am"]))[0], ravel_pytree(_tree6(lv["av"]))[0],
        ),
        critic_opt=_rebuild_opt_state(
            state.critic_opt, cst.count + n_updates,
            ravel_pytree(_tree6(twin_cat_to_stacked(lv["cm"])))[0],
            ravel_pytree(_tree6(twin_cat_to_stacked(lv["cv"])))[0],
        ),
        alpha_opt=_rebuild_opt_state(
            state.alpha_opt, alst.count + n_updates, lv["lam"], lv["lav"]
        ),
    )


def sac_update_pallas_leaves(
    learner,
    lv: Dict,
    transitions: Dict[str, jax.Array],
    eps2: jax.Array,
    eps_new: jax.Array,
    *,
    interpret: bool = False,
):
    """One fused SAC update on the leaf layout (sac_state_to_leaves).

    Pure kernel step: no moment unravel/ravel, no RNG — the caller
    provides the reparameterisation noise (eps2 for the TD-target
    sample, eps_new for the actor sample), which an update scan derives
    for ALL its steps in one vmapped pass. Returns (new_leaves, aux)
    with the same aux contract as sac_update_pallas."""
    S = learner.actor.state_size
    A = learner.actor.action_size
    B = transitions["states"].shape[0]
    batch = (
        transitions["states"],
        transitions["actions"],
        transitions["rewards"],
        transitions["next_states"],
        transitions["terminals"],
        transitions["weights"],
        transitions["absorbing"],
    )
    operands = (
        *lv["a"], *lv["am"], *lv["av"], *lv["c"], *lv["cm"], *lv["cv"],
        *lv["t"], lv["la"], lv["lam"], lv["lav"], lv["ta"], lv["tc"],
        lv["tal"], *batch, eps2, eps_new,
    )
    n_state = 6 * 7 + 3 + 3
    out_shapes = [
        jax.ShapeDtypeStruct(o.shape, jnp.float32) for o in operands[:n_state]
    ] + [
        jax.ShapeDtypeStruct((B,), jnp.float32),  # log_probs
        jax.ShapeDtypeStruct((B,), jnp.float32),  # min Q (critic-loss batch)
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
    kernel = partial(_sac_kernel, hyper, (S, A, B))
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        input_output_aliases={i: i for i in range(n_state)},
        interpret=interpret,
    )(*operands)
    new_lv = {
        "a": tuple(outs[0:6]), "am": tuple(outs[6:12]), "av": tuple(outs[12:18]),
        "c": tuple(outs[18:24]), "cm": tuple(outs[24:30]), "cv": tuple(outs[30:36]),
        "t": tuple(outs[36:42]),
        "la": outs[42], "lam": outs[43], "lav": outs[44],
        # The kernel's +1.0 count outputs ARE the carry here: the f32
        # clock advances across scan steps (exact below 2^24; the int32
        # authority is restored by sac_leaves_to_state).
        "ta": outs[45], "tc": outs[46], "tal": outs[47],
    }
    aux = {"log_probs": outs[48], "Q_values": outs[49], "alpha": outs[50][0]}
    return new_lv, aux


def sac_update_pallas(
    learner,
    state,
    key: jax.Array,
    transitions: Dict[str, jax.Array],
    *,
    interpret: bool = False,
):
    """Drop-in replacement for `SACLearner.update` running the whole update
    as one Pallas kernel. Same (state, aux) contract."""
    actor_net = learner.actor.net
    critic_net = learner.critic.critic.net
    assert actor_net.depth == 2 and critic_net.depth == 2
    assert actor_net.activation == "relu" and critic_net.activation == "relu"
    assert actor_net.dropout == 0.0 and actor_net.input_dropout == 0.0
    assert not actor_net.spectral_norm and not critic_net.spectral_norm

    S = learner.actor.state_size
    A = learner.actor.action_size
    B = transitions["states"].shape[0]

    k_next, k_new = jax.random.split(key)
    eps2 = jax.random.normal(k_next, (B, A), jnp.float32)
    eps_new = jax.random.normal(k_new, (B, A), jnp.float32)

    # One round trip through the shared leaf layout (cat-form critics,
    # unravelled moments) — the same path the fused update scan carries.
    lv = sac_state_to_leaves(state)
    new_lv, aux = sac_update_pallas_leaves(
        learner, lv, transitions, eps2, eps_new, interpret=interpret
    )
    return sac_leaves_to_state(state, new_lv, 1), aux
