"""Training orchestrator: the TPU-native counterpart of the reference's
`train()` monolith (train.py:26-243).

Lifecycle parity (config validation -> seeding -> env + expert data -> agent
-> per-algorithm reward module -> BC pretraining (+ BC early exit) ->
discriminator pretraining -> interact/update loop -> periodic eval/plots ->
save) with a TPU-first execution model:

- the entire update step — replay sampling, discriminator training, reward
  prediction, optional BC auxiliary loss, SAC update — is ONE jitted
  function over an explicit state pytree (the reference runs ~6 separate
  torch graphs per step, train.py:171-203);
- replay and expert data live in HBM (`iltpu.data.replay`);
- acting is batched over `num_envs` vectorised envs, one device call per
  step; with `env_backend: jax` the env itself is a pure function;
- algorithm dispatch happens once at build time (closures), not per step —
  the reference re-branches on `cfg.algorithm` strings inside its hot loop
  (train.py:175-198);
- checkpoint/resume of the FULL training state (params, optimiser moments,
  replay, PRNG) — a capability gap in the reference, which only saves final
  weights (train.py:232-239).
"""

import os
import pickle
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from iltpu.config import DotDict, validate_config
from iltpu.data import (
    build_expert_transitions,
    load_d4rl_hdf5,
    replay_append_batch,
    replay_from_transitions,
    replay_init,
    replay_sample,
    replay_transfer,
)
from iltpu.data.synthetic import random_d4rl_dataset
from iltpu.envs import (
    JAX_ENVS,
    SPECS,
    HostVecEnv,
    VecEnv,
    evaluate_policy,
)
from iltpu.models import SoftActor, TwinCritic
from iltpu.parallel import constrain_batch, make_mesh
from iltpu.rewards import (
    GAILDiscriminator,
    GMMILDiscriminator,
    PWILDiscriminator,
    REDDiscriminator,
    init_relabeller,
    mix_expert_agent_transitions,
    resample_and_relabel,
)
from iltpu.rewards.gail import make_gail_input
from iltpu.updates import (
    AdversarialConfig,
    SACLearner,
    adversarial_imitation_update,
    behavioural_cloning_update,
    target_estimation_update,
)
from iltpu.utils.checkpoint import load_checkpoint, save_checkpoint
from iltpu.utils.plotting import lineplot

TRAINABLE_DISCRIMINATORS = ("DRIL", "GAIL", "RED")


class _JaxEnvAdapter:
    """Drives a pure-JAX VecEnv with the same host-facing interface as
    HostVecEnv (reset/step/obs_size/...); the step itself is jitted."""

    def __init__(self, env_name: str, num_envs: int, *, absorbing: bool, seed: int):
        assert env_name in JAX_ENVS, f"unknown jax env {env_name}"
        self.env = JAX_ENVS[env_name]()
        self.venv = VecEnv(self.env, num_envs, absorbing=absorbing)
        self.num_envs = num_envs
        self._seed = seed
        self._step = jax.jit(self.venv.step)
        self._state = None

    obs_size = property(lambda self: self.venv.obs_size)
    action_size = property(lambda self: self.venv.action_size)
    max_episode_steps = property(lambda self: self.venv.max_episode_steps)
    ref_min_score = property(lambda self: getattr(self.env, "ref_min_score", 0.0))
    ref_max_score = property(lambda self: getattr(self.env, "ref_max_score", 1.0))

    def reset(self, seed: Optional[int] = None) -> np.ndarray:
        self._state = self.venv.reset(jax.random.key(seed or self._seed))
        return np.asarray(self._state.obs)

    def step(self, actions):
        obs_before = self._state.obs
        self._state, out = self._step(self._state, jnp.asarray(actions))
        return (
            np.asarray(out.next_obs),
            np.asarray(out.reward),
            np.asarray(out.terminal),
            np.asarray(out.timeout),
            np.asarray(self._state.obs),
        )

    def close(self):
        pass


def _make_env(cfg: DotDict, num_envs: int, seed: int):
    if cfg.env_backend == "jax":
        return _JaxEnvAdapter(
            cfg.env, num_envs, absorbing=cfg.imitation.absorbing, seed=seed
        )
    if cfg.env_backend in ("native", "auto"):
        from iltpu.envs.native import NativeVecEnv, native_available

        if cfg.env_backend == "native" or native_available():
            return NativeVecEnv(
                cfg.env, num_envs, absorbing=cfg.imitation.absorbing, seed=seed
            )
    return HostVecEnv(
        cfg.env, num_envs, absorbing=cfg.imitation.absorbing, seed=seed
    )


def _load_expert_dataset(cfg: DotDict, env) -> Dict[str, np.ndarray]:
    src = cfg.expert_data.source
    if src == "hdf5":
        return load_d4rl_hdf5(cfg.expert_data.path)
    if src == "npz" or str(src).endswith(".npz") or (
        cfg.expert_data.path or ""
    ).endswith(".npz"):
        path = src if str(src).endswith(".npz") else cfg.expert_data.path
        with np.load(path) as data:
            return {k: data[k] for k in data.files}
    assert src == "synthetic", f"unknown expert_data.source {src}"
    # Self-sufficient fallback (no D4RL downloads in this environment):
    # random-walk trajectories with the env's dimensions.
    raw_obs = env.obs_size - (1 if cfg.imitation.absorbing else 0)
    n_traj = max(cfg.imitation.trajectories, 10)
    length = min(env.max_episode_steps, 100)
    return random_d4rl_dataset(
        np.random.default_rng(cfg.seed),
        [length] * n_traj,
        raw_obs,
        env.action_size,
    )


class Trainer:
    def __init__(self, cfg: Dict, out_dir: str = ".", file_prefix: str = ""):
        self.cfg = cfg = validate_config(cfg)
        self.out_dir = out_dir
        self.prefix = file_prefix
        os.makedirs(out_dir, exist_ok=True)

        np.random.seed(cfg.seed)
        # PRNG implementation: 'rbg' swaps threefry's bit-twiddling op chains
        # for the TPU hardware RNG instruction — the fused update scan is
        # op-dispatch-bound, so per-update key derivation is a visible cost.
        # Keys created here propagate their impl through every split/fold_in.
        if cfg.get("prng", "threefry") != "threefry":
            jax.config.update("jax_default_prng_impl", cfg.prng)
        self.key = jax.random.key(cfg.seed)
        alg = cfg.algorithm
        self.alg = alg

        # --- Envs (train + eval share dynamics; eval is built per call) ----
        self.env = _make_env(cfg, cfg.num_envs, cfg.seed)
        S, A = self.env.obs_size, self.env.action_size
        self.state_size, self.action_size = S, A
        if cfg.env_backend == "jax":
            self.norm_min = self.env.ref_min_score
            self.norm_max = self.env.ref_max_score
        else:
            spec = SPECS[cfg.env]
            self.norm_min, self.norm_max = spec.ref_min_score, spec.ref_max_score

        # --- Expert data ---------------------------------------------------
        raw = _load_expert_dataset(cfg, self.env)
        if cfg.expert_data.get("terminals_to_timeouts", False):
            # Make generated demos distribution-match the reference's D4RL
            # expert-v2 data, whose trajectories end at the TIME LIMIT: ends
            # become timeouts, so no absorbing wrap rewards the expert's
            # death states (see conf/train.yaml expert_data docs).
            raw = dict(raw)
            t = np.asarray(raw["terminals"]).astype(bool)
            raw["timeouts"] = (
                np.asarray(raw["timeouts"]).astype(bool) | t
            ).astype(np.float32)
            raw["terminals"] = np.zeros_like(raw["timeouts"])
        transitions, n_traj = build_expert_transitions(
            raw,
            trajectories=cfg.imitation.trajectories,
            subsample=cfg.imitation.subsample,
            absorbing=cfg.imitation.absorbing,
            rng=np.random.default_rng(cfg.seed),
        )
        self.expert = replay_from_transitions(
            transitions, n_traj, cfg.imitation.absorbing
        )

        # --- Agent ---------------------------------------------------------
        rcfg = cfg.reinforcement
        self.actor = SoftActor(
            S, A, rcfg.actor.hidden_size, rcfg.actor.depth, rcfg.actor.activation
        )
        self.critic = TwinCritic(
            S,
            A,
            hidden_size=rcfg.critic.hidden_size,
            depth=rcfg.critic.depth,
            activation=rcfg.critic.activation,
        )
        self.learner = SACLearner(
            self.actor,
            self.critic,
            learning_rate=cfg.training.learning_rate,
            weight_decay=cfg.training.weight_decay,
            discount=rcfg.discount,
            entropy_target=rcfg.target_temperature * A,  # train.py:65 heuristic
            polyak_factor=rcfg.polyak_factor,
            min_alpha=float(rcfg.get("min_alpha", 0.0) or 0.0),
        )
        self.key, k = jax.random.split(self.key)
        sac = self.learner.init(k)

        # Fused Pallas SAC update (iltpu/ops/pallas_sac.py): the entire
        # update step as ONE kernel — perf mode for the latency-bound
        # production configuration (depth-2 relu MLPs, no actor dropout).
        self._sac_pallas = bool(cfg.training.get("sac_pallas", False))
        if self._sac_pallas:
            an, cn = self.actor.net, self.critic.critic.net
            supported = (
                an.depth == 2 and cn.depth == 2
                and an.activation == "relu" and cn.activation == "relu"
                and an.dropout == 0.0 and an.input_dropout == 0.0
                and not an.spectral_norm and not cn.spectral_norm
            )
            if not supported:
                raise ValueError(
                    "training.sac_pallas=true requires depth-2 relu "
                    "actor/critic MLPs without dropout or spectral norm "
                    f"(algorithm={self.alg})"
                )
            # reinforcement.min_alpha is supported: SACHyper.min_alpha
            # floors the loss-side alpha inside the kernel (raw
            # exp(log_alpha) keeps driving the temperature update).
        # Fused Pallas GAIL discriminator step (iltpu/ops/pallas_gail.py):
        # the production BCE configuration and the tuned quality
        # configuration (Mixup + entropy bonus + any reward head).
        self._disc_pallas = bool(cfg.training.get("disc_pallas", False))
        if self._disc_pallas:
            supported = self.alg == "GAIL"
            if supported:
                d = cfg.imitation.discriminator
                supported = (
                    cfg.imitation.loss_function in ("BCE", "Mixup")
                    and not d.reward_shaping
                    and not d.subtract_log_policy
                    and not cfg.imitation.state_only
                    and d.depth == 1
                    and d.activation == "relu"
                    and cfg.imitation.mix_expert_data == "none"
                )
            if not supported:
                raise ValueError(
                    "training.disc_pallas=true supports the BCE and Mixup "
                    "GAIL configurations (depth-1 relu, no shaping/log-pi/"
                    "state-only/mixing); got "
                    f"algorithm={self.alg}"
                )

        # --- State pytree + per-algorithm reward modules -------------------
        state = {
            "sac": sac,
            "replay": replay_init(cfg.memory.size, S, A, cfg.imitation.absorbing),
            "expert": self.expert,
        }
        icfg = cfg.imitation
        self.disc = None
        if alg == "GAIL":
            d = icfg.discriminator
            self.disc = GAILDiscriminator(
                S,
                A,
                state_only=icfg.state_only,
                reward_shaping=d.reward_shaping,
                subtract_log_policy=d.subtract_log_policy,
                reward_function=d.reward_function,
                hidden_size=d.hidden_size,
                depth=d.depth,
                activation=d.activation,
                spectral_norm=icfg.spectral_norm,
                discount=rcfg.discount,
            )
            self.key, k = jax.random.split(self.key)
            # optax.flatten: run the Adam math on ONE flat vector instead
            # of per-leaf ops (the update scan is op-overhead-bound on TPU).
            self.disc_optim = optax.flatten(
                optax.adamw(icfg.learning_rate, weight_decay=icfg.weight_decay)
            )
            state["disc"] = self.disc.init(k)
            state["disc_opt"] = self.disc_optim.init(state["disc"])
            self.adv_cfg = AdversarialConfig(
                loss_function=icfg.loss_function,
                grad_penalty=icfg.grad_penalty,
                mixup_alpha=icfg.mixup_alpha,
                entropy_bonus=icfg.entropy_bonus,
                pos_class_prior=icfg.pos_class_prior,
                nonnegative_margin=icfg.nonnegative_margin,
            )
        elif alg == "DRIL":
            d = icfg.discriminator
            self.disc = SoftActor(
                S,
                A,
                d.hidden_size,
                d.depth,
                d.activation,
                input_dropout=d.input_dropout,
                dropout=d.dropout,
            )
            self.key, k = jax.random.split(self.key)
            # optax.flatten: run the Adam math on ONE flat vector instead
            # of per-leaf ops (the update scan is op-overhead-bound on TPU).
            self.disc_optim = optax.flatten(
                optax.adamw(icfg.learning_rate, weight_decay=icfg.weight_decay)
            )
            state["disc"] = self.disc.init(k)
            state["disc_opt"] = self.disc_optim.init(state["disc"])
            state["dril_threshold"] = jnp.zeros(())
        elif alg == "RED":
            d = icfg.discriminator
            self.disc = REDDiscriminator(
                S,
                A,
                state_only=icfg.state_only,
                hidden_size=d.hidden_size,
                depth=d.depth,
                activation=d.activation,
                input_dropout=d.input_dropout,
                dropout=d.dropout,
                reward_bandwidth_scale=icfg.reward_bandwidth_scale,
            )
            self.key, k = jax.random.split(self.key)
            # optax.flatten: run the Adam math on ONE flat vector instead
            # of per-leaf ops (the update scan is op-overhead-bound on TPU).
            self.disc_optim = optax.flatten(
                optax.adamw(icfg.learning_rate, weight_decay=icfg.weight_decay)
            )
            state["disc"] = self.disc.init(k)
            state["disc_opt"] = self.disc_optim.init(state["disc"].predictor)
        elif alg == "GMMIL":
            self.disc = GMMILDiscriminator(S, A, state_only=icfg.state_only)
            state["disc"] = self.disc.init()
        elif alg == "PWIL":
            self.disc = PWILDiscriminator(
                S,
                A,
                state_only=icfg.state_only,
                reward_scale=icfg.reward_scale,
                reward_bandwidth_scale=icfg.reward_bandwidth_scale,
                time_horizon=self.env.max_episode_steps,
                expert_states=self.expert.states,
                expert_actions=self.expert.actions,
            )
            # one atom pool per vectorised env
            pool = self.disc.init()
            state["disc"] = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (cfg.num_envs, *x.shape)), pool
            )
        elif alg == "AdRIL":
            state["relabel"] = init_relabeller()

        self.state = state
        self._build_jit_fns()
        if self.mesh is not None and cfg.parallel.get("shard_params", False):
            # Opt-in tensor-parallel layout (SURVEY.md §2.3: not needed at
            # these widths, rules exposed anyway): weights shard their last
            # axis over the mesh; GSPMD propagates through the update.
            from iltpu.parallel import param_shardings

            self.state = jax.device_put(
                self.state,
                param_shardings(self.mesh, self.state, cfg.parallel.data_axis),
            )

        # --- Metrics (train.py:86-88) --------------------------------------
        self.metrics = dict(
            train_steps=[],
            train_returns=[],
            test_steps=[],
            test_returns=[],
            test_returns_normalized=[],
            update_steps=[],
            predicted_rewards=[],
            alphas=[],
            entropies=[],
            Q_values=[],
        )
        self.score = []
        self._log_queue = []
        self.start_step = 0
        # Floor for the agent_best compare, seeded lazily from an existing
        # snapshot's saved score: a resumed run whose restored history ends
        # before the snapshot's best eval must not overwrite a better
        # agent_best with its first (possibly worse) post-resume eval.
        self._best_prior = float("-inf")
        self._best_seeded = False

        if cfg.checkpointing.resume:
            self._resume(cfg.checkpointing.resume)

    # ------------------------------------------------------------------ jit

    def _build_jit_fns(self):
        cfg, alg = self.cfg, self.alg
        actor, learner, disc = self.actor, self.learner, self.disc
        icfg = cfg.imitation
        B = cfg.training.batch_size

        # Data-parallel mesh: batches shard over the data axis inside the
        # jitted update; XLA all-reduces the gradients (iltpu.parallel).
        data_axis = cfg.parallel.data_axis
        self.mesh = (
            make_mesh(cfg.parallel.get("num_devices"), axis=data_axis)
            if data_axis
            else None
        )
        if self.mesh is not None:
            n_dev = self.mesh.devices.size
            assert B % n_dev == 0, (
                f"batch_size {B} must divide the {n_dev}-device data mesh"
            )

        # Fused update SCAN (GAIL fast path): carry the Pallas kernels'
        # leaf-layout state through the per-iteration update scan and
        # derive ALL per-update RNG in one vmapped pass before the scan.
        # The per-step path pays ~30 moment unravel/ravel glue ops plus a
        # 4-deep key-split chain per scan step — pure op latency on an
        # op-latency-bound loop (docs/PERF.md). Matches the per-step
        # Pallas path to float rounding (same kernels, same operands,
        # same key derivation; pinned by tests/test_fused_scan.py).
        self._fused_scan = bool(cfg.training.get("fused_update_scan", False))
        # K-blocked update kernel (training.update_block=K > 1, fast path
        # only): K sequential micro-updates per Pallas kernel, state in
        # VMEM across all K (iltpu/ops/pallas_fused_block.py). Iterations
        # whose update count K does not divide fall back to the per-step
        # fused scan.
        self._update_block = int(cfg.training.get("update_block", 1) or 1)
        if self._fused_scan:
            supported = (
                alg == "GAIL"
                and self._sac_pallas
                and self._disc_pallas
                and not icfg.bc_aux_loss
                and self.mesh is None
            )
            if not supported:
                raise ValueError(
                    "training.fused_update_scan=true requires algorithm=GAIL "
                    "with training.sac_pallas and training.disc_pallas, no "
                    "bc_aux_loss, and a single-device (mesh-free) run"
                )

        # Acting: per-step keys derived on device via fold_in (no host-side
        # key splitting in the hot loop).
        self._interact = jax.jit(
            lambda p, base, step, s: actor.sample(
                p, jax.random.fold_in(base, step), s
            )[0]
        )
        # Acting straight off the packed step buffer (pipeline mode): the
        # post-reset observation lives in packed[:, -1-S:-1], so the hot
        # loop ships ONE h2d buffer per iteration instead of re-sending
        # obs_after separately (every extra transfer pays tunnel latency).
        self._interact_packed = jax.jit(
            lambda p, base, step, packed, S: actor.sample(
                p,
                jax.random.fold_in(base, step),
                packed[:, -1 - S : -1],
            )[0],
            static_argnums=(4,),
        )
        self._greedy = jax.jit(actor.greedy_action)
        self._append = jax.jit(replay_append_batch)

        pwil_step = None
        if alg == "PWIL":
            pwil_one = disc.compute_reward

            def pwil_step(pool, states, actions, dones):
                new_pool, rewards = jax.vmap(pwil_one)(pool, states, actions)
                fresh = disc.init()  # unbatched pool, broadcast against N envs

                def reset_where_done(new, f):
                    mask = dones.reshape(dones.shape + (1,) * (new.ndim - 1))
                    return jnp.where(mask, f[None], new)

                new_pool = jax.tree.map(reset_where_done, new_pool, fresh)
                return new_pool, rewards

            self._pwil_step = jax.jit(pwil_step)

            def pwil_relabel_expert(expert):
                """Sequential greedy rewards over the expert rows, pool reset
                at trajectory ends (train.py:135-141)."""

                def body(pool, row):
                    pool, r = pwil_one(pool, row["states"], row["actions"])
                    end = (row["terminals"] + row["timeouts"]) > 0
                    pool = jax.tree.map(
                        lambda p, f: jnp.where(end, f, p), pool, disc.init()
                    )
                    return pool, r

                rows = {
                    "states": expert.states,
                    "actions": expert.actions,
                    "terminals": expert.terminals,
                    "timeouts": expert.timeouts,
                }
                _, rewards = jax.lax.scan(body, disc.init(), rows)
                return expert.replace(rewards=rewards)

            self._pwil_relabel_expert = jax.jit(pwil_relabel_expert)

        def update_fn(state, key, step, transitions=None, expert_transitions=None):
            k_s, k_e, k_disc, k_rew, k_bc, k_sac = jax.random.split(key, 6)
            # Batches may be pre-sampled in bulk by the caller (the update
            # scan hoists all its gathers into one, see transition_core);
            # standalone calls sample here.
            if transitions is None:
                transitions = replay_sample(state["replay"], k_s, B)
            if expert_transitions is None:
                expert_transitions = replay_sample(state["expert"], k_e, B)
            if self.mesh is not None:
                transitions = constrain_batch(transitions, self.mesh, data_axis)
                expert_transitions = constrain_batch(
                    expert_transitions, self.mesh, data_axis
                )
            out = dict(state)
            aux = {}

            # Discriminator training (train.py:176-180)
            fused_rewards = None
            if alg == "GAIL":
                if self._disc_pallas:
                    # Fused kernel: disc step + reward head in ONE program
                    # (iltpu/ops/pallas_gail.py; reference ordering intact —
                    # rewards come from the updated discriminator).
                    from iltpu.ops.pallas_gail import gail_update_pallas

                    (
                        out["disc"],
                        out["disc_opt"],
                        d_aux,
                        fused_rewards,
                    ) = gail_update_pallas(
                        disc,
                        state["disc"],
                        state["disc_opt"],
                        transitions,
                        expert_transitions,
                        k_disc,
                        grad_penalty=icfg.grad_penalty,
                        learning_rate=icfg.learning_rate,
                        weight_decay=icfg.weight_decay,
                        loss_function=icfg.loss_function,
                        mixup_alpha=icfg.mixup_alpha,
                        entropy_bonus=icfg.entropy_bonus,
                        interpret=jax.default_backend() != "tpu",
                    )
                else:
                    out["disc"], out["disc_opt"], d_aux = (
                        adversarial_imitation_update(
                            disc,
                            actor,
                            state["sac"].actor_params,
                            state["disc"],
                            state["disc_opt"],
                            self.disc_optim,
                            transitions,
                            expert_transitions,
                            k_disc,
                            self.adv_cfg,
                        )
                    )
                aux["discriminator_loss"] = d_aux["discriminator_loss"]

            # Optional expert mixing (train.py:183)
            if icfg.mix_expert_data == "mixed_batch" and alg != "AdRIL":
                transitions = mix_expert_agent_transitions(
                    transitions, expert_transitions
                )

            # Reward prediction (train.py:188-198); PWIL rewards are already
            # in the replay (computed online at env-step time).
            if alg == "AdRIL":
                # Diagnostics for the relabeller dynamics (Weak #1 of the
                # round-2 review): staleness fraction of the sampled policy
                # batch, live trajectory count, and post-relabel reward mean.
                # Computed on the raw policy batch BEFORE mixing so the value
                # is phase-independent of the balanced flip.
                if icfg.update_freq > 0:
                    _round = jnp.ceil(step / icfg.update_freq)
                    _stale = _round > jnp.ceil(
                        transitions["step"] / icfg.update_freq
                    )
                    aux["diag_adril_stale_frac"] = jnp.mean(
                        _stale.astype(jnp.float32)
                    )
                aux["diag_num_trajectories"] = state[
                    "replay"
                ].num_trajectories.astype(jnp.float32)
                out["relabel"], transitions = resample_and_relabel(
                    state["relabel"],
                    transitions,
                    expert_transitions,
                    step,
                    state["replay"].num_trajectories,
                    state["expert"].num_trajectories,
                    update_freq=icfg.update_freq,
                    balanced=icfg.balanced,
                )
                aux["diag_relabel_reward_mean"] = jnp.mean(
                    transitions["rewards"]
                )
            elif alg == "DRIL":
                transitions = dict(transitions)
                transitions["rewards"] = jax.lax.stop_gradient(
                    disc.dril_reward(
                        state["disc"],
                        k_rew,
                        transitions["states"],
                        transitions["actions"],
                        state["dril_threshold"],
                    )
                )
            elif alg == "GAIL":
                transitions = dict(transitions)
                if fused_rewards is not None:
                    transitions["rewards"] = jax.lax.stop_gradient(fused_rewards)
                else:
                    inp = make_gail_input(
                        transitions["states"],
                        transitions["actions"],
                        transitions["next_states"],
                        transitions["terminals"],
                        actor,
                        state["sac"].actor_params,
                        icfg.discriminator.reward_shaping,
                        icfg.discriminator.subtract_log_policy,
                    )
                    transitions["rewards"] = jax.lax.stop_gradient(
                        disc.predict_reward(
                            out["disc"],
                            inp["state"],
                            inp["action"],
                            inp.get("next_state"),
                            inp.get("terminal"),
                            inp.get("log_policy"),
                        )
                    )
            elif alg == "GMMIL":
                out["disc"], rewards = disc.predict_reward(
                    state["disc"],
                    transitions["states"],
                    transitions["actions"],
                    expert_transitions["states"],
                    expert_transitions["actions"],
                    transitions["weights"],
                    expert_transitions["weights"],
                )
                transitions = dict(transitions)
                transitions["rewards"] = jax.lax.stop_gradient(rewards)
            elif alg == "RED":
                transitions = dict(transitions)
                transitions["rewards"] = jax.lax.stop_gradient(
                    disc.predict_reward(
                        state["disc"], transitions["states"], transitions["actions"]
                    )
                )

            sac = state["sac"]
            # Optional BC auxiliary loss on the main actor optimiser
            # (train.py:201 uses actor_optimiser, not a separate one).
            if icfg.bc_aux_loss:
                new_actor, new_opt, _ = behavioural_cloning_update(
                    actor,
                    sac.actor_params,
                    sac.actor_opt,
                    learner.actor_optim,
                    expert_transitions,
                    rng=k_bc,
                )
                sac = sac.replace(actor_params=new_actor, actor_opt=new_opt)

            if self._sac_pallas:
                from iltpu.ops.pallas_sac import sac_update_pallas

                sac, sac_aux = sac_update_pallas(
                    learner, sac, k_sac, transitions,
                    interpret=jax.default_backend() != "tpu",
                )
            else:
                sac, sac_aux = learner.update(sac, k_sac, transitions)
            out["sac"] = sac
            aux.update(
                predicted_rewards=transitions["rewards"],
                alphas=sac_aux["alpha"],
                entropies=-sac_aux["log_probs"],
                Q_values=sac_aux["Q_values"],
            )
            return out, aux

        self._update = jax.jit(update_fn)

        S_obs, A_act = self.env.obs_size, self.env.action_size

        def transition_core(
            state,
            base_key,
            step,
            obs,
            actions,
            rewards,
            next_obs,
            terminals,
            timeouts,
            n_updates,
        ):
            """PWIL online reward -> ring append (absorbing wrap inline) ->
            n_updates full update steps. Shared by the host-driven post_step
            and the fully on-device scan loop."""
            state = dict(state)
            dones = (terminals + timeouts) > 0
            store_rewards = rewards
            if alg == "PWIL":  # online reward at env-step time (train.py:156)
                state["disc"], store_rewards = pwil_step(
                    state["disc"], obs, actions, dones
                )
            n = obs.shape[0]
            step_ids = jnp.full((n,), 0.0, jnp.float32) + (step + 1)
            state["replay"] = replay_append_batch(
                state["replay"],
                step_ids,
                obs,
                actions,
                store_rewards,
                next_obs,
                terminals,
                timeouts,
            )
            aux = {"pwil_rewards": store_rewards} if alg == "PWIL" else {}
            if n_updates > 0:
                # lax.scan traces the update body ONCE regardless of
                # n_updates (vs a Python unroll, which inflates both the
                # HLO and compile time when num_envs > 1).
                keys = jax.vmap(
                    lambda i: jax.random.fold_in(
                        jax.random.fold_in(base_key, 0x5AC + i), step
                    )
                )(jnp.arange(n_updates))
                # Hoist the replay gathers: ONE bulk sample for all updates
                # this iteration instead of 2x8 gathers per scan step (the
                # ring contents don't change inside the scan — all appends
                # happened above — so the distribution is identical).
                kb = jax.random.fold_in(base_key, step + 0xB17C)
                kp, ke = jax.random.split(kb)
                batches = jax.tree.map(
                    lambda x: x.reshape((n_updates, B) + x.shape[1:]),
                    replay_sample(state["replay"], kp, n_updates * B),
                )
                expert_batches = jax.tree.map(
                    lambda x: x.reshape((n_updates, B) + x.shape[1:]),
                    replay_sample(state["expert"], ke, n_updates * B),
                )

                if self._fused_scan:
                    from iltpu.ops.pallas_gail import (
                        gail_leaves_to_state,
                        gail_state_to_leaves,
                        gail_update_pallas_leaves,
                    )
                    from iltpu.ops.pallas_sac import (
                        sac_leaves_to_state,
                        sac_state_to_leaves,
                        sac_update_pallas_leaves,
                    )

                    interp = jax.default_backend() != "tpu"
                    mixup = icfg.loss_function == "Mixup"

                    # ALL per-update randomness in ONE vmapped pass,
                    # reproducing update_fn's exact key derivation
                    # (split(key, 6) -> k_disc/k_sac; the kernels'
                    # (k_mixup, k_gp) and (k_next, k_new) sub-splits) so
                    # the draws are bit-identical to the per-step path.
                    def derive_rng(k):
                        _, _, k_disc, _, _, k_sac = jax.random.split(k, 6)
                        k_mixup, k_gp = jax.random.split(k_disc)
                        k_next, k_new = jax.random.split(k_sac)
                        out = {
                            "eps_gp": jax.random.uniform(k_gp, (B,)),
                            "eps2": jax.random.normal(
                                k_next, (B, A_act), jnp.float32
                            ),
                            "eps_new": jax.random.normal(
                                k_new, (B, A_act), jnp.float32
                            ),
                        }
                        if mixup:
                            # Beta(1,1) == Uniform closed form, as in
                            # gail_update_pallas.
                            out["mix"] = (
                                jax.random.uniform(k_mixup, (B,))
                                if icfg.mixup_alpha == 1.0
                                else jax.random.beta(
                                    k_mixup,
                                    icfg.mixup_alpha,
                                    icfg.mixup_alpha,
                                    (B,),
                                )
                            )
                        return out

                    rngs = jax.vmap(derive_rng)(keys)
                    if mixup:
                        tgt_op = rngs.pop("mix").reshape(n_updates, 1, B)
                    else:
                        tgt_op = jnp.stack(
                            [
                                jnp.broadcast_to(
                                    jnp.concatenate(
                                        [jnp.ones((B,)), jnp.zeros((B,))]
                                    ),
                                    (n_updates, 2 * B),
                                ),
                                jnp.concatenate(
                                    [
                                        expert_batches["weights"],
                                        batches["weights"],
                                    ],
                                    axis=1,
                                ),
                            ],
                            axis=1,
                        )  # (n_updates, 2, 2B): [BCE targets | weights]
                    sac_lv0 = sac_state_to_leaves(state["sac"])
                    disc_lv0, moment_trees = gail_state_to_leaves(
                        state["disc"], state["disc_opt"]
                    )

                    block = self._update_block
                    if block > 1 and n_updates % block == 0:
                        # K-blocked: K sequential micro-updates per kernel
                        # with the whole state resident in VMEM
                        # (iltpu/ops/pallas_fused_block.py) — removes the
                        # per-update kernel-launch + carry HBM round-trip.
                        from iltpu.ops.pallas_fused_block import (
                            gail_sac_update_kblock,
                        )

                        nch = n_updates // block

                        def resh(x):
                            return x.reshape((nch, block) + x.shape[1:])

                        def one_chunk(c, xs):
                            s_lv, d_lv = c
                            tb, eb, gp, tg, e2, en = xs
                            s_lv, d_lv, up_aux = gail_sac_update_kblock(
                                learner,
                                disc,
                                s_lv,
                                d_lv,
                                tb,
                                eb,
                                gp,
                                tg,
                                e2,
                                en,
                                grad_penalty=icfg.grad_penalty,
                                learning_rate=icfg.learning_rate,
                                weight_decay=icfg.weight_decay,
                                loss_function=icfg.loss_function,
                                entropy_bonus=icfg.entropy_bonus,
                                interpret=interp,
                            )
                            return (s_lv, d_lv), up_aux

                        (sac_lv, disc_lv), upd_aux = jax.lax.scan(
                            one_chunk,
                            (sac_lv0, disc_lv0),
                            (
                                jax.tree.map(resh, batches),
                                jax.tree.map(resh, expert_batches),
                                resh(rngs["eps_gp"]),
                                resh(tgt_op),
                                resh(rngs["eps2"]),
                                resh(rngs["eps_new"]),
                            ),
                        )
                        state["sac"] = sac_leaves_to_state(
                            state["sac"], sac_lv, n_updates
                        )
                        state["disc"], state["disc_opt"] = (
                            gail_leaves_to_state(
                                state["disc_opt"], disc_lv, n_updates,
                                moment_trees,
                            )
                        )
                        aux.update(jax.tree.map(lambda x: x[-1], upd_aux))
                        return state, aux

                    def one_update_fast(c, xs):
                        s_lv, d_lv = c
                        tb, eb, rng, tgt = xs
                        d_lv, d_loss, rewards = gail_update_pallas_leaves(
                            disc,
                            d_lv,
                            (eb["states"], eb["actions"], eb["weights"]),
                            (tb["states"], tb["actions"], tb["weights"]),
                            rng["eps_gp"],
                            tgt,
                            grad_penalty=icfg.grad_penalty,
                            learning_rate=icfg.learning_rate,
                            weight_decay=icfg.weight_decay,
                            loss_function=icfg.loss_function,
                            entropy_bonus=icfg.entropy_bonus,
                            interpret=interp,
                        )
                        tb = dict(tb)
                        tb["rewards"] = jax.lax.stop_gradient(rewards)
                        s_lv, sac_aux = sac_update_pallas_leaves(
                            learner,
                            s_lv,
                            tb,
                            rng["eps2"],
                            rng["eps_new"],
                            interpret=interp,
                        )
                        up_aux = {
                            "discriminator_loss": d_loss[0],
                            "predicted_rewards": tb["rewards"],
                            "alphas": sac_aux["alpha"],
                            "entropies": -sac_aux["log_probs"],
                            "Q_values": sac_aux["Q_values"],
                        }
                        return (s_lv, d_lv), up_aux

                    (sac_lv, disc_lv), upd_aux = jax.lax.scan(
                        one_update_fast,
                        (sac_lv0, disc_lv0),
                        (batches, expert_batches, rngs, tgt_op),
                    )
                    state["sac"] = sac_leaves_to_state(
                        state["sac"], sac_lv, n_updates
                    )
                    state["disc"], state["disc_opt"] = gail_leaves_to_state(
                        state["disc_opt"], disc_lv, n_updates, moment_trees
                    )
                    aux.update(jax.tree.map(lambda x: x[-1], upd_aux))
                    return state, aux

                # Narrow the scan carry to the keys update_fn can write
                # (models/optimisers/relabel state). The replay and expert
                # buffers (tens of MB) are read-only inside the update —
                # batches were bulk-sampled above — so keep them as
                # loop-invariant free variables rather than carried state,
                # guaranteeing XLA never materialises a per-iteration copy.
                invariant = {
                    k2: state[k2] for k2 in ("replay", "expert") if k2 in state
                }
                carry0 = {
                    k2: v for k2, v in state.items() if k2 not in invariant
                }

                def one_update(c, xs):
                    k, tb, eb = xs
                    full, up_aux = update_fn(
                        {**invariant, **c}, k, step.astype(jnp.float32), tb, eb
                    )
                    return {k2: full[k2] for k2 in c}, up_aux

                carry, upd_aux = jax.lax.scan(
                    one_update, carry0, (keys, batches, expert_batches)
                )
                state.update(carry)
                aux.update(jax.tree.map(lambda x: x[-1], upd_aux))
            return state, aux

        self._transition_core = transition_core

        def post_step(state, base_key, packed, n_updates):
            """Everything after env.step, fused into one device program:
            transition_core -> next actions. The state pytree is DONATED at
            the jit boundary, so replay writes and optimiser updates happen
            in-place in HBM instead of copying the ring every step. All
            per-step host data arrives as ONE packed (N, D) f32 buffer — on
            the tunneled-TPU link every separate transfer pays full link
            latency, so argument count is a first-order cost.
            Layout: [obs | actions | reward | next_obs | terminal | timeout |
            obs_after | step]."""
            ofs = 0

            def take(n):
                nonlocal ofs
                col = packed[:, ofs : ofs + n]
                ofs += n
                return col

            obs = take(S_obs)
            actions = take(A_act)
            rewards = take(1)[:, 0]
            next_obs = take(S_obs)
            terminals = take(1)[:, 0]
            timeouts = take(1)[:, 0]
            next_policy_obs = take(S_obs)
            step = take(1)[0, 0].astype(jnp.int32)
            n = obs.shape[0]
            state, aux = transition_core(
                state, base_key, step, obs, actions, rewards, next_obs,
                terminals, timeouts, n_updates,
            )
            # NEXT step's actions, sampled with the freshly-updated actor
            # (reference ordering: act uses params updated through this
            # step, train.py:152,203). Folding acting into this program
            # keeps the hot loop at ONE device call per iteration — on a
            # high-latency link (tunneled TPU: ~27 ms/call) the sync count,
            # not compute, bounds throughput.
            next_actions = actor.sample(
                state["sac"].actor_params,
                jax.random.fold_in(base_key, step + n),  # == fold at next step id
                next_policy_obs,
            )[0]
            return state, aux, next_actions

        self._post_step = jax.jit(
            post_step, static_argnames=("n_updates",), donate_argnums=(0,)
        )

        if cfg.env_backend == "jax":
            venv = self.env.venv
            N_envs = cfg.num_envs

            def scan_chunk(
                state, env_state, base_key, start_step, n_iters, updates_per_iter
            ):
                """Fully on-device training: act -> env physics -> replay ->
                updates, ALL inside one lax.scan — zero host involvement for
                n_iters iterations. This is the TPU-native endgame the pure-
                JAX envs exist for: the Python<->device boundary (the entire
                bottleneck of the reference loop, train.py:149-158) is
                crossed once per chunk instead of once per step."""

                def body(carry, i):
                    state, env_state = carry
                    step = start_step + i * N_envs
                    obs = env_state.obs
                    actions = actor.sample(
                        state["sac"].actor_params,
                        jax.random.fold_in(base_key, step),
                        obs,
                    )[0]
                    env_state, out = venv.step(env_state, actions)
                    state, aux = transition_core(
                        state,
                        base_key,
                        step,
                        obs,
                        actions,
                        out.reward,
                        out.next_obs,
                        out.terminal,
                        out.timeout,
                        updates_per_iter,
                    )
                    return (state, env_state), (out.reward, out.done, aux)

                (state, env_state), (rewards, dones, aux) = jax.lax.scan(
                    body, (state, env_state), jnp.arange(n_iters)
                )
                last_aux = jax.tree.map(lambda a: a[-1], aux)
                return state, env_state, rewards, dones, last_aux

            self._scan_chunk = jax.jit(
                scan_chunk,
                static_argnames=("n_iters", "updates_per_iter"),
                donate_argnums=(0, 1),
            )

    # ------------------------------------------------------------ phases

    def _expert_batches(self, key, iterations: int, batch_size: int):
        for i in range(iterations):
            yield replay_sample(self.expert, jax.random.fold_in(key, i), batch_size)

    # Pretraining iterations per fused device call. A lax.scan traces the
    # update body once, so compile time is chunk-size independent while the
    # dispatch count drops from `iterations` (50k-100k in the reference
    # configs, conf/algorithm/{BC,DRIL,RED}.yaml) to iterations/chunk — on a
    # high-latency device link per-call overhead, not compute, dominates
    # these loops.
    PRETRAIN_CHUNK = 2000

    def _run_pretrain_chunks(self, carry, step_one, iterations: int):
        """Run `step_one(carry, i)` for i in [0, iterations) as chunked
        on-device lax.scans over the expert buffer."""

        def chunk_fn(carry, start, n):
            def body(c, i):
                return step_one(c, start + i), None

            carry, _ = jax.lax.scan(body, carry, jnp.arange(n))
            return carry

        chunk_jit = jax.jit(chunk_fn, static_argnames=("n",), donate_argnums=(0,))
        done = 0
        while done < iterations:
            n = min(self.PRETRAIN_CHUNK, iterations - done)
            carry = chunk_jit(carry, jnp.asarray(done, jnp.int32), n)
            done += n
        return carry

    def bc_pretrain(self):
        """BC pretraining with a separate optimiser (train.py:93-98)."""
        cfg = self.cfg
        optim = optax.flatten(
            optax.adamw(
                cfg.bc_pretraining.learning_rate,
                weight_decay=cfg.bc_pretraining.weight_decay,
            )
        )
        sac = self.state["sac"]
        B = cfg.training.batch_size
        expert = self.expert
        self.key, k = jax.random.split(self.key)

        def step_one(carry, i):
            params, opt = carry
            batch = replay_sample(expert, jax.random.fold_in(k, i), B)
            params, opt, _ = behavioural_cloning_update(
                self.actor, params, opt, optim, batch
            )
            return (params, opt)

        params, _ = self._run_pretrain_chunks(
            (sac.actor_params, optim.init(sac.actor_params)),
            step_one,
            cfg.bc_pretraining.iterations,
        )
        self.state["sac"] = sac.replace(actor_params=params)

    def pretrain_discriminator(self):
        """DRIL ensemble BC / RED predictor regression (train.py:115-128)."""
        cfg, alg = self.cfg, self.alg
        iters = cfg.imitation.pretraining.iterations
        B = cfg.training.batch_size
        expert = self.expert
        self.key, k, k2 = jax.random.split(self.key, 3)
        if alg == "DRIL":

            def step_one(carry, i):
                params, opt = carry
                batch = replay_sample(expert, jax.random.fold_in(k, i), B)
                params, opt, _ = behavioural_cloning_update(
                    self.disc,
                    params,
                    opt,
                    self.disc_optim,
                    batch,
                    rng=jax.random.fold_in(k2, i),
                    train_dropout=True,
                )
                return (params, opt)

            params, opt = self._run_pretrain_chunks(
                (self.state["disc"], self.state["disc_opt"]), step_one, iters
            )
            self.state["disc"], self.state["disc_opt"] = params, opt
            self.state["dril_threshold"] = self.disc.uncertainty_threshold(
                params,
                k2,
                self.expert.states,
                self.expert.actions,
                cfg.imitation.quantile_cutoff,
            )
        elif alg == "RED":

            def step_one(carry, i):
                red, opt = carry
                batch = replay_sample(expert, jax.random.fold_in(k, i), B)
                red, opt, _ = target_estimation_update(
                    self.disc,
                    red,
                    opt,
                    self.disc_optim,
                    batch,
                    rng=jax.random.fold_in(k2, i),
                )
                return (red, opt)

            red, opt = self._run_pretrain_chunks(
                (self.state["disc"], self.state["disc_opt"]), step_one, iters
            )
            # sigma estimated on one minibatch (train.py:128)
            red = self.disc.set_sigma(
                red, self.expert.states[:B], self.expert.actions[:B]
            )
            self.state["disc"], self.state["disc_opt"] = red, opt

    def _greedy_fn(self):
        """Greedy-policy callable for host-driven loops. With
        `evaluation.on_host` (default) the MLP forward runs in numpy from a
        one-time params fetch — zero device round-trips inside eval/render
        loops, which on a high-latency link otherwise dominate wall-clock."""
        params = self.state["sac"].actor_params
        if self.cfg.evaluation.get("on_host", True):
            from iltpu.models.host_inference import host_greedy_fn

            return host_greedy_fn(self.actor, params)
        return lambda obs: np.asarray(self._greedy(params, jnp.asarray(obs)))

    def evaluate(self):
        cfg = self.cfg
        greedy = self._greedy_fn()
        if cfg.env_backend == "jax":
            adapter = _JaxEnvAdapter(
                cfg.env,
                cfg.evaluation.episodes,
                absorbing=cfg.imitation.absorbing,
                seed=cfg.seed + 7919,
            )
            obs = adapter.reset()
            done = np.zeros(cfg.evaluation.episodes, bool)
            returns = np.zeros(cfg.evaluation.episodes)
            while not done.all():
                _, r, term, tout, obs = adapter.step(greedy(obs))
                returns += np.where(done, 0.0, r)
                done |= (term + tout) > 0
            return returns.tolist()
        return evaluate_policy(
            cfg.env,
            greedy,
            cfg.evaluation.episodes,
            absorbing=cfg.imitation.absorbing,
            seed=cfg.seed + 7919,
            env_cls=type(self.env) if cfg.env_backend in ("native", "auto") else None,
        )

    def _normalized(self, returns):
        return (
            (np.asarray(returns) - self.norm_min) / (self.norm_max - self.norm_min)
        ).tolist()

    _LOG_KEYS = ("predicted_rewards", "alphas", "entropies", "Q_values")

    def _enqueue_log(self, step: int, aux):
        """Capture update diagnostics without syncing: keep the device
        arrays (they are jit outputs, never donated) and kick off async
        device->host copies; `_flush_logs` materialises them later."""
        entry = {k: aux[k] for k in self._LOG_KEYS}
        # Algorithm-specific scalar diagnostics ride along under diag_* keys
        # (e.g. the AdRIL staleness/trajectory-count instrumentation).
        entry.update({k: v for k, v in aux.items() if k.startswith("diag_")})
        for v in entry.values():
            if hasattr(v, "copy_to_host_async"):
                v.copy_to_host_async()
        self._log_queue.append((step, entry))

    def _flush_logs(self):
        for step, entry in self._log_queue:
            self.metrics["update_steps"].append(step)
            self.metrics["predicted_rewards"].append(
                np.asarray(entry["predicted_rewards"]).tolist()
            )
            self.metrics["alphas"].append(float(entry["alphas"]))
            self.metrics["entropies"].append(
                np.asarray(entry["entropies"]).tolist()
            )
            self.metrics["Q_values"].append(np.asarray(entry["Q_values"]).tolist())
            for k, v in entry.items():
                if k.startswith("diag_"):
                    self.metrics.setdefault(k, []).append(float(v))
        self._log_queue.clear()

    def _record_eval(self, step: int):
        self._flush_logs()
        test_returns = self.evaluate()
        normalized = self._normalized(test_returns)
        self.score.append(float(np.mean(normalized)))
        self.metrics["test_steps"].append(step)
        self.metrics["test_returns"].append(test_returns)
        self.metrics["test_returns_normalized"].append(normalized)
        # Keep the BEST-eval agent snapshot alongside the final one the
        # reference saves (train.py:237 saves only at the end — on spiky
        # envs like hopper the final snapshot can be a dip, which is the
        # wrong artifact for demo generation or deployment).
        # Strict improvement after the first save: `>=` rewrote the
        # snapshot on every tying eval (e.g. repeated 0.0 early scores),
        # paying host syncs + I/O for no new information. The floor also
        # honours the score stored INSIDE an existing agent_best snapshot
        # (this run's in-memory history alone would let the first
        # post-resume eval clobber a better pre-resume best).
        if not self._best_seeded:
            self._best_seeded = True
            best_path = os.path.join(self.out_dir, self.prefix + "agent_best")
            if os.path.exists(os.path.join(best_path, "header.pkl")):
                try:
                    prior, _ = load_checkpoint(best_path)
                    self._best_prior = float(np.asarray(prior["score"]))
                except Exception:  # unreadable/legacy snapshot: no floor
                    pass
        if self.score[-1] > max(
            max(self.score[:-1], default=float("-inf")), self._best_prior
        ):
            sac = self.state["sac"]
            save_checkpoint(
                os.path.join(self.out_dir, self.prefix + "agent_best"),
                {
                    "actor": sac.actor_params,
                    "critic": sac.critic_params,
                    "log_alpha": sac.log_alpha,
                    "step": np.asarray(step),
                    "score": np.asarray(self.score[-1]),
                },
            )
        self._plots()

    def _plots(self):
        m, pre = self.metrics, os.path.join(self.out_dir, self.prefix)
        cfg = self.cfg
        title = f"{cfg.algorithm}: {cfg.env}"
        if m["test_steps"]:
            lineplot(m["test_steps"], m["test_returns"], pre + "test_returns", title=title)
        if m["train_steps"]:
            lineplot(
                m["train_steps"], m["train_returns"], pre + "train_returns", title=title
            )
        if m["update_steps"]:
            if cfg.algorithm != "SAC":
                lineplot(
                    m["update_steps"],
                    m["predicted_rewards"],
                    pre + "predicted_rewards",
                    yaxis="Predicted Reward",
                    title=title,
                )
            lineplot(m["update_steps"], m["alphas"], pre + "sac_alpha", yaxis="Alpha", title=title)
            lineplot(
                m["update_steps"], m["entropies"], pre + "sac_entropy", yaxis="Entropy", title=title
            )
            lineplot(m["update_steps"], m["Q_values"], pre + "Q_values", yaxis="Q-value", title=title)

    def _save(self):
        pre = os.path.join(self.out_dir, self.prefix)
        sac = self.state["sac"]
        save_checkpoint(
            pre + "agent",
            {
                "actor": sac.actor_params,
                "critic": sac.critic_params,
                "log_alpha": sac.log_alpha,
            },
        )
        if self.alg in TRAINABLE_DISCRIMINATORS:
            save_checkpoint(pre + "discriminator", self.state["disc"])
        with open(pre + "metrics.pkl", "wb") as f:
            pickle.dump(self.metrics, f)

    def _checkpoint(self, step: int):
        self._flush_logs()
        save_checkpoint(
            os.path.join(self.out_dir, self.prefix + "checkpoint"),
            self.state,
            aux={
                "step": step,
                "metrics": self.metrics,
                "score": self.score,
                "key": np.asarray(jax.random.key_data(self.key)),
            },
        )

    def _resume(self, path: str):
        state, aux = load_checkpoint(path)
        # restore static fields lost in flatten/unflatten round trip
        self.state = jax.tree.map(jnp.asarray, state)
        self.metrics = aux["metrics"]
        self.score = aux["score"]
        self.start_step = aux["step"]
        self.key = jax.random.wrap_key_data(jnp.asarray(aux["key"]))

    # ---------------------------------------------------------------- run

    def run(self) -> float:
        cfg = self.cfg
        start_time = time.time()

        if cfg.bc_pretraining.iterations > 0 and self.start_step == 0:
            self.bc_pretrain()
            if self.alg == "BC":  # early-exit path (train.py:100-112)
                if cfg.check_time_usage:
                    self.metrics["pre_training_time"] = time.time() - start_time
                test_returns = self.evaluate()
                normalized = self._normalized(test_returns)
                self.metrics["test_steps"] = [0]
                self.metrics["test_returns"] = [test_returns]
                self.metrics["test_returns_normalized"] = [normalized]
                self._plots()
                self._save()
                return float(np.mean(normalized))

        if self.alg in ("DRIL", "RED") and self.start_step == 0:
            self.pretrain_discriminator()
            if cfg.check_time_usage:
                self.metrics["pre_training_time"] = time.time() - start_time
                start_time = time.time()

        if self.start_step == 0:
            # PWIL expert reward rewrite + prefill (train.py:134-143)
            if self.alg == "PWIL" and cfg.imitation.mix_expert_data != "none":
                self.state["expert"] = self._pwil_relabel_expert(self.state["expert"])
                self.expert = self.state["expert"]
            if cfg.imitation.mix_expert_data == "prefill_memory":
                self.state["replay"] = replay_transfer(
                    self.state["replay"], self.state["expert"]
                )

        if cfg.env_backend == "jax" and cfg.training.get("on_device_loop", False):
            self._device_loop()
        else:
            self._host_loop()

        if cfg.check_time_usage:
            self.metrics["training_time"] = time.time() - start_time
            self._record_eval(self.step_done)

        return self._finish()

    def _host_loop(self):
        """Reference-ordering interact/update loop: one fused device call
        per iteration, env physics on the host (MuJoCo) or host-driven
        jitted env."""
        cfg = self.cfg
        N = cfg.num_envs
        obs = self.env.reset(cfg.seed)
        train_return = np.zeros(N)
        updates_done = 0
        evals_done = self.start_step // cfg.evaluation.interval
        logs_done = 0
        step = self.start_step

        # jax.profiler window over the steady-state hot loop (SURVEY.md §5:
        # the reference's only perf hook is a wall-clock mode; here the
        # device timeline is the first-class tool).
        prof = cfg.get("profiling") or {}
        prof_dir = prof.get("trace_dir")
        prof_start = int(prof.get("start_step", 2000))
        prof_stop = prof_start + int(prof.get("steps", 200))
        profiling = False
        pipeline = bool(cfg.training.get("pipeline", False))
        host_act = bool(cfg.training.get("host_acting", False))
        # Steady-state throughput window (benchmarks): timing from the first
        # step >= skip excludes trace/compile-cache-load and warmup physics.
        timing_skip = int(cfg.training.get("timing_skip_steps", 0) or 0)
        steady_t0 = steady_step0 = None
        # training.timing_marks=K: record K+1 synced (step, wall-clock)
        # marks across the steady region so a single invocation yields K
        # independent throughput windows (bench.py reports their median —
        # one draw no longer samples chip time-of-day weather).
        timing_marks = int(cfg.training.get("timing_marks", 0) or 0)
        mark_every = next_mark = 0

        base_key = self.key  # per-step keys are fold_in(base, step) on device
        if host_act:
            # Perf mode: numpy acting over async-synced params. No device
            # round-trip anywhere on the acting path; params stale by one
            # fused update program (same staleness as `pipeline`).
            from iltpu.models.host_inference import HostActor

            host_actor = HostActor(self.actor, self.state["sac"].actor_params)
            act_rng = np.random.default_rng(
                np.random.SeedSequence([cfg.seed, 0xAC7])
            )
            actions = host_actor.sample(obs, act_rng)
        else:
            # Bootstrap: first actions from the standalone acting program;
            # every subsequent iteration gets its actions from the fused
            # post_step call (ONE device round-trip per loop iteration — on
            # the tunneled-TPU link the per-call latency, not compute,
            # bounds throughput).
            actions = self._interact(
                self.state["sac"].actor_params,
                base_key,
                jnp.asarray(step, jnp.int32),
                jnp.asarray(obs),
            )
        while step < cfg.steps:
            if prof_dir and not profiling and step >= prof_start:
                jax.profiler.start_trace(prof_dir)
                profiling = True
            if profiling and step >= prof_stop:
                jax.profiler.stop_trace()
                profiling = False
                prof_dir = None
            actions_host = np.asarray(actions, np.float32)
            next_obs, rewards, terminals, timeouts, obs_after = self.env.step(
                actions_host
            )
            dones = (terminals + timeouts) > 0
            # train_return tracks the TRUE env reward even when PWIL
            # overwrites the stored reward (train.py:154-156 ordering).
            train_return += rewards
            new_step = step + N

            # Updates owed this iteration: preserve the reference's
            # 1-update-per-interval-env-steps ratio regardless of num_envs
            # (SURVEY.md §7 hard part (c)).
            n_updates = 0
            if new_step >= cfg.training.start:
                target = (new_step - cfg.training.start) // cfg.training.interval + 1
                n_updates = int(target - updates_done)
                updates_done = target

            # Fused device program: PWIL reward -> append -> updates ->
            # next actions, with the state donated (in-place HBM ring
            # writes) and all step data shipped as one packed transfer.
            packed = np.concatenate(
                [
                    np.asarray(obs, np.float32),
                    actions_host,
                    np.asarray(rewards, np.float32)[:, None],
                    np.asarray(next_obs, np.float32),
                    np.asarray(terminals, np.float32)[:, None],
                    np.asarray(timeouts, np.float32)[:, None],
                    np.asarray(obs_after, np.float32),
                    np.full((N, 1), float(step), np.float32),
                ],
                axis=1,
            )
            if host_act:
                # refresh BEFORE the donating dispatch (see HostActor docs),
                # then sample next actions on the host while the device
                # chews on the update program — nothing below blocks.
                host_actor.refresh()
                self.state, aux, _ = self._post_step(
                    self.state, base_key, jnp.asarray(packed), n_updates=n_updates
                )
                host_actor.start_sync(self.state["sac"].actor_params)
                actions = host_actor.sample(obs_after, act_rng)
            elif pipeline:
                # Perf mode: dispatch next-step acting BEFORE the update
                # program. The device executes them in queue order (acting
                # reads the pre-update params, then the update donates the
                # state), so the actions d2h transfer and the host env step
                # overlap with the update's device time. Acting params are
                # stale by this iteration's updates. The packed buffer is
                # shipped ONCE and both programs read it on device.
                packed_dev = jax.device_put(packed)
                actions = self._interact_packed(
                    self.state["sac"].actor_params,
                    base_key,
                    jnp.asarray(new_step, jnp.int32),
                    packed_dev,
                    self.state_size,
                )
                self.state, aux, _ = self._post_step(
                    self.state, base_key, packed_dev, n_updates=n_updates
                )
            else:
                self.state, aux, actions = self._post_step(
                    self.state, base_key, jnp.asarray(packed), n_updates=n_updates
                )
            step = new_step
            obs = obs_after
            if steady_t0 is None and timing_skip and step >= timing_skip:
                jax.block_until_ready(self.state["sac"].log_alpha)
                steady_t0, steady_step0 = time.time(), step
                if timing_marks > 0:
                    mark_every = max(N, (cfg.steps - steady_step0) // timing_marks)
                    next_mark = steady_step0 + mark_every
                    self.metrics["steady_marks"] = [[int(step), steady_t0]]
            elif steady_t0 is not None and timing_marks > 0 and step >= next_mark:
                jax.block_until_ready(self.state["sac"].log_alpha)
                self.metrics["steady_marks"].append([int(step), time.time()])
                while next_mark <= step:
                    next_mark += mark_every

            for i in np.flatnonzero(dones):
                self.metrics["train_steps"].append(step)
                self.metrics["train_returns"].append([float(train_return[i])])
                train_return[i] = 0.0

            if n_updates > 0:
                if (
                    cfg.logging.interval > 0
                    and step // cfg.logging.interval > logs_done
                ):
                    logs_done = step // cfg.logging.interval
                    # Deferred: hold device handles + async d2h; materialise
                    # at the next eval/checkpoint boundary instead of
                    # blocking the hot loop on a round-trip per log.
                    self._enqueue_log(step, aux)

            if (
                step // cfg.evaluation.interval > evals_done
                and not cfg.check_time_usage
            ):
                evals_done = step // cfg.evaluation.interval
                self._record_eval(step)

            if (
                cfg.checkpointing.interval > 0
                and step % cfg.checkpointing.interval < N
            ):
                self._checkpoint(step)

        if profiling:
            jax.profiler.stop_trace()
        if steady_t0 is not None:
            jax.block_until_ready(self.state["sac"].log_alpha)
            self.metrics["steady_env_steps"] = step - steady_step0
            self.metrics["steady_time"] = time.time() - steady_t0
            if timing_marks > 0 and step > self.metrics["steady_marks"][-1][0]:
                self.metrics["steady_marks"].append(
                    [int(step), steady_t0 + self.metrics["steady_time"]]
                )
        self.step_done = step

    def _device_loop(self):
        """Fully on-device training for pure-JAX envs: chunks of the whole
        act/step/append/update cycle run as single XLA programs (lax.scan),
        with host involvement only at metric/eval/checkpoint boundaries.
        Chunk lengths are quantized to powers of two to bound the number of
        compiled (n_iters, updates_per_iter) variants."""
        cfg = self.cfg
        N = cfg.num_envs
        interval = cfg.training.interval
        assert N % interval == 0 or interval >= N, (
            f"num_envs {N} must be compatible with training.interval {interval}"
        )
        upi_steady = max(N // interval, 1) if interval <= N else 1
        env_state = self.env.venv.reset(jax.random.key(cfg.seed))
        train_return = np.zeros(N)
        evals_done = self.start_step // cfg.evaluation.interval
        logs_done = 0
        checks_done = (
            self.start_step // cfg.checkpointing.interval
            if cfg.checkpointing.interval > 0
            else 0
        )
        step = self.start_step
        base_key = self.key
        # Steady-state throughput window (same contract as the host loop's
        # training.timing_skip_steps, measured at chunk granularity).
        timing_skip = int(cfg.training.get("timing_skip_steps", 0) or 0)
        steady_t0 = steady_step0 = None
        # Multi-window marks — same contract as the host loop (bench median).
        timing_marks = int(cfg.training.get("timing_marks", 0) or 0)
        mark_every = next_mark = 0

        # One steady-state chunk size (single compile per updates_per_iter
        # variant); metric/eval/checkpoint cadences tolerate overshoot the
        # same way the host loop does (step // interval > done). Only
        # training.start and the end of training clip a chunk.
        cadences = [] if cfg.check_time_usage else [cfg.evaluation.interval]
        if cfg.logging.interval > 0:
            cadences.append(cfg.logging.interval)
        if cfg.checkpointing.interval > 0:
            cadences.append(cfg.checkpointing.interval)
        base_iters = min(max(1, min(cadences) // N) if cadences else 1024, 1024)
        steady = 1 << (base_iters.bit_length() - 1)  # pow2 <= base_iters

        while step < cfg.steps:
            limit = cfg.training.start if step < cfg.training.start else cfg.steps
            want = min(steady, max(1, -(-(limit - step) // N)))
            n_iters = 1 << (want.bit_length() - 1)  # pow2 <= want
            upi = upi_steady if step >= cfg.training.start else 0
            self.state, env_state, rewards, dones, aux = self._scan_chunk(
                self.state,
                env_state,
                base_key,
                jnp.asarray(step, jnp.int32),
                n_iters=n_iters,
                updates_per_iter=upi,
            )
            rewards = np.asarray(rewards)  # (n_iters, N)
            dones = np.asarray(dones)
            for i in range(n_iters):
                train_return += rewards[i]
                for e in np.flatnonzero(dones[i]):
                    self.metrics["train_steps"].append(step + (i + 1) * N)
                    self.metrics["train_returns"].append([float(train_return[e])])
                    train_return[e] = 0.0
            step += n_iters * N
            if steady_t0 is None and timing_skip and step >= timing_skip:
                jax.block_until_ready(self.state["sac"].log_alpha)
                steady_t0, steady_step0 = time.time(), step
                if timing_marks > 0:
                    mark_every = max(N, (cfg.steps - steady_step0) // timing_marks)
                    next_mark = steady_step0 + mark_every
                    self.metrics["steady_marks"] = [[int(step), steady_t0]]
            elif steady_t0 is not None and timing_marks > 0 and step >= next_mark:
                # np.asarray(rewards) above fetch-synced this chunk already.
                self.metrics["steady_marks"].append([int(step), time.time()])
                while next_mark <= step:
                    next_mark += mark_every

            if (
                upi > 0
                and cfg.logging.interval > 0
                and step // cfg.logging.interval > logs_done
            ):
                logs_done = step // cfg.logging.interval
                self.metrics["update_steps"].append(step)
                self.metrics["predicted_rewards"].append(
                    np.asarray(aux["predicted_rewards"]).tolist()
                )
                self.metrics["alphas"].append(float(aux["alphas"]))
                self.metrics["entropies"].append(np.asarray(aux["entropies"]).tolist())
                self.metrics["Q_values"].append(np.asarray(aux["Q_values"]).tolist())
                # Algorithm diagnostics (diag_*: AdRIL staleness etc.) ride
                # along here too, mirroring _enqueue_log — on_device_loop
                # runs previously lacked what adril_diagnosis.py reads.
                for k, v in aux.items():
                    if k.startswith("diag_"):
                        self.metrics.setdefault(k, []).append(float(v))

            if (
                step // cfg.evaluation.interval > evals_done
                and not cfg.check_time_usage
            ):
                evals_done = step // cfg.evaluation.interval
                self._record_eval(step)

            if (
                cfg.checkpointing.interval > 0
                and step // cfg.checkpointing.interval > checks_done
            ):
                checks_done = step // cfg.checkpointing.interval
                self._checkpoint(step)

        if steady_t0 is not None:
            # np.asarray(rewards) above already fetch-synced the last chunk
            # (block_until_ready is not a reliable sync on this platform,
            # docs/PERF.md), so wall-clock here closes the window exactly.
            self.metrics["steady_env_steps"] = step - steady_step0
            self.metrics["steady_time"] = time.time() - steady_t0
            if timing_marks > 0 and step > self.metrics["steady_marks"][-1][0]:
                self.metrics["steady_marks"].append(
                    [int(step), steady_t0 + self.metrics["steady_time"]]
                )
        self.step_done = step

    def _finish(self):
        cfg = self.cfg
        self._flush_logs()
        # The hot loop donated self.state each iteration, deleting the buffers
        # any pre-loop alias (self.expert) pointed at; re-sync from live state.
        self.expert = self.state["expert"]

        if cfg.render and cfg.env_backend != "jax":
            from iltpu.envs.host import render_rollout

            greedy = self._greedy_fn()
            try:
                render_rollout(
                    cfg.env,
                    greedy,
                    os.path.join(self.out_dir, self.prefix + "rollout.npz"),
                    absorbing=cfg.imitation.absorbing,
                    seed=cfg.seed + 39916801,
                    gif_path=os.path.join(
                        self.out_dir, self.prefix + "rollout.gif"
                    ),
                )
            except Exception as e:  # headless hosts without EGL etc.
                print(f"render skipped: {e}")

        if cfg.save_trajectories and cfg.env_backend != "jax":
            greedy = self._greedy_fn()
            _, trajectories = evaluate_policy(
                cfg.env,
                greedy,
                cfg.evaluation.episodes,
                absorbing=cfg.imitation.absorbing,
                seed=cfg.seed + 104729,
                return_trajectories=True,
            )
            with open(
                os.path.join(self.out_dir, self.prefix + "trajectories.pkl"), "wb"
            ) as f:
                pickle.dump(trajectories, f)

        self._save()
        self.env.close()
        return float(np.mean(self.score)) if self.score else 0.0


def train(cfg: Dict, out_dir: str = ".", file_prefix: str = "") -> float:
    """Functional entry point (reference train.py:26): returns the mean
    normalized score — the HP-optimisation objective."""
    return Trainer(cfg, out_dir, file_prefix).run()
