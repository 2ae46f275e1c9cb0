"""End-to-end trainer tests: short runs of every algorithm on the in-jit
PointMass env (SURVEY.md §4: integration test = few-hundred-step run per
algorithm on a tiny env), the BC early-exit path, checkpoint/resume, and a
host-MuJoCo smoke run."""

import os

import numpy as np
import pytest

from iltpu.config import load_config
from iltpu.trainer import Trainer, train

FAST = [
    "env=pointmass",
    "env_backend=jax",
    "steps=300",
    "training.start=100",
    "evaluation.interval=150",
    "evaluation.episodes=2",
    "logging.interval=50",
    "memory.size=1000",
    "imitation.trajectories=4",
    "training.batch_size=32",
]


def _cfg(*extra):
    return load_config(FAST + list(extra))


@pytest.mark.parametrize(
    "alg,extra",
    [
        ("SAC", []),
        ("GAIL", []),
        ("GMMIL", []),
        ("PWIL", []),
        ("AdRIL", []),
        ("DRIL", ["imitation.pretraining.iterations=20"]),
        ("RED", ["imitation.pretraining.iterations=20"]),
    ],
)
def test_trainer_all_algorithms_smoke(alg, extra, tmp_path):
    score = train(_cfg(f"algorithm={alg}", *extra), str(tmp_path))
    assert np.isfinite(score)
    # final artifacts exist (train.py:232-239 parity)
    assert os.path.isdir(tmp_path / "agent")
    assert os.path.isfile(tmp_path / "metrics.pkl")
    if alg in ("DRIL", "GAIL", "RED"):
        assert os.path.isdir(tmp_path / "discriminator")


def test_bc_early_exit(tmp_path):
    cfg = _cfg("algorithm=BC", "bc_pretraining.iterations=50")
    score = train(cfg, str(tmp_path))
    assert np.isfinite(score)
    import pickle

    with open(tmp_path / "metrics.pkl", "rb") as f:
        metrics = pickle.load(f)
    # BC evaluates once at step 0 and never enters the main loop
    assert metrics["test_steps"] == [0]
    assert metrics["update_steps"] == []


def test_gail_mixed_batch_and_state_only(tmp_path):
    cfg = _cfg(
        "algorithm=GAIL",
        "imitation.mix_expert_data=mixed_batch",
        "imitation.state_only=true",
        "imitation.discriminator.reward_shaping=true",
        "imitation.discriminator.subtract_log_policy=true",
        "imitation.loss_function=Mixup",
    )
    assert np.isfinite(train(cfg, str(tmp_path)))


def test_prefill_memory_path(tmp_path):
    cfg = _cfg("algorithm=GMMIL", "imitation.mix_expert_data=prefill_memory")
    t = Trainer(cfg, str(tmp_path))
    assert int(t.state["replay"].idx) == 0
    score = t.run()
    assert np.isfinite(score)


def test_pwil_prefill_rewrites_expert_rewards(tmp_path):
    cfg = _cfg("algorithm=PWIL", "imitation.mix_expert_data=prefill_memory")
    t = Trainer(cfg, str(tmp_path))
    before = np.asarray(t.state["expert"].rewards).copy()
    assert (before == 0).all()  # zeroed at load (env.py:124)
    t.run()
    after = np.asarray(t.expert.rewards)
    assert (after > 0).any()  # PWIL rewrite happened (train.py:135-141)


def test_checkpoint_resume_continues(tmp_path):
    cfg = _cfg("algorithm=SAC", "checkpointing.interval=100")
    t = Trainer(cfg, str(tmp_path))
    t.run()
    ckpt = str(tmp_path / "checkpoint")
    assert os.path.isdir(ckpt)
    # resume from the checkpoint and run to completion again
    cfg2 = _cfg("algorithm=SAC", f"checkpointing.resume={ckpt}", "steps=400")
    t2 = Trainer(cfg2, str(tmp_path / "resumed"))
    assert t2.start_step > 0
    assert np.isfinite(t2.run())


def test_num_envs_batched_acting(tmp_path):
    cfg = _cfg("algorithm=SAC", "num_envs=4")
    score = train(cfg, str(tmp_path))
    assert np.isfinite(score)


@pytest.mark.slow
def test_mujoco_backend_smoke(tmp_path):
    cfg = load_config(
        [
            "algorithm=SAC",
            "env=hopper",
            "steps=120",
            "training.start=50",
            "evaluation.interval=100",
            "evaluation.episodes=1",
            "logging.interval=50",
            "memory.size=500",
            "training.batch_size=16",
        ]
    )
    assert np.isfinite(train(cfg, str(tmp_path)))


def test_pipeline_mode_runs(tmp_path):
    cfg = _cfg("algorithm=GAIL", "training.pipeline=true")
    assert np.isfinite(train(cfg, str(tmp_path)))


def test_host_acting_mode_runs(tmp_path):
    """Perf mode: numpy acting over async-synced params (host_inference.py)
    trains end-to-end and produces populated metrics."""
    cfg = _cfg("algorithm=GAIL", "training.host_acting=true")
    trainer = Trainer(cfg, str(tmp_path))
    score = trainer.run()
    assert np.isfinite(score)
    assert trainer.metrics["update_steps"]  # deferred logs were flushed
    assert trainer.metrics["Q_values"]


def test_steady_state_timing_window(tmp_path):
    """training.timing_skip_steps records steady_env_steps/steady_time."""
    cfg = _cfg("algorithm=SAC", "training.timing_skip_steps=150")
    trainer = Trainer(cfg, str(tmp_path))
    trainer.run()
    assert trainer.metrics["steady_env_steps"] == 150  # 300 total - 150 skip
    assert trainer.metrics["steady_time"] > 0


def test_interact_packed_matches_interact(tmp_path):
    """Pipeline mode acts straight off the packed step buffer; the
    obs_after column slice must select exactly what _interact would get."""
    import jax
    import jax.numpy as jnp

    cfg = _cfg("algorithm=SAC", "num_envs=4")
    t = Trainer(cfg, str(tmp_path))
    N, S, A = 4, t.state_size, t.action_size
    rng = np.random.default_rng(0)
    obs = rng.normal(size=(N, S)).astype(np.float32)
    obs_after = rng.normal(size=(N, S)).astype(np.float32)
    packed = np.concatenate(
        [
            obs,
            rng.normal(size=(N, A)).astype(np.float32),
            np.zeros((N, 1), np.float32),
            rng.normal(size=(N, S)).astype(np.float32),
            np.zeros((N, 1), np.float32),
            np.zeros((N, 1), np.float32),
            obs_after,
            np.full((N, 1), 7.0, np.float32),
        ],
        axis=1,
    )
    key = jax.random.key(3)
    step = jnp.asarray(11, jnp.int32)
    a_packed = t._interact_packed(
        t.state["sac"].actor_params, key, step, jnp.asarray(packed), S
    )
    a_direct = t._interact(
        t.state["sac"].actor_params, key, step, jnp.asarray(obs_after)
    )
    np.testing.assert_allclose(
        np.asarray(a_packed), np.asarray(a_direct), rtol=1e-6, atol=1e-6
    )


def test_sac_pallas_update_path(tmp_path):
    """training.sac_pallas=true (fused Pallas SAC update) trains end-to-end
    and matches the default path's run structure."""
    cfg = _cfg("algorithm=GAIL", "training.sac_pallas=true")
    trainer = Trainer(cfg, str(tmp_path))
    score = trainer.run()
    assert np.isfinite(score)
    assert trainer.metrics["Q_values"]


def test_sac_pallas_rejects_unsupported_net(tmp_path):
    """The kernel is specialised to depth-2 relu nets; anything else must
    fail loudly at construction, not silently diverge."""
    import pytest as _pytest

    cfg = _cfg(
        "algorithm=SAC",
        "training.sac_pallas=true",
        "reinforcement.actor.depth=1",
    )
    with _pytest.raises(ValueError, match="sac_pallas"):
        Trainer(cfg, str(tmp_path))


def test_disc_pallas_update_path(tmp_path):
    """training.disc_pallas=true (fused GAIL discriminator kernel) trains
    end-to-end, together with the fused SAC kernel."""
    cfg = _cfg(
        "algorithm=GAIL",
        "training.disc_pallas=true",
        "training.sac_pallas=true",
    )
    trainer = Trainer(cfg, str(tmp_path))
    score = trainer.run()
    assert np.isfinite(score)
    assert trainer.metrics["Q_values"]


def test_on_device_loop_with_pallas_kernels(tmp_path):
    """The fused kernels compose with the fully on-device lax.scan loop
    (env_backend=jax + training.on_device_loop)."""
    cfg = _cfg(
        "algorithm=GAIL",
        "training.on_device_loop=true",
        "training.sac_pallas=true",
        "training.disc_pallas=true",
        "num_envs=4",
    )
    trainer = Trainer(cfg, str(tmp_path))
    assert np.isfinite(trainer.run())


def test_tuned_overlays_reach_the_update_consumers(tmp_path):
    """Round-2 review #4: assert the composed tuned config is applied
    transition-for-transition — every knob the tuned overlays change must
    land in the object that consumes it (learner, adv_cfg, discriminator
    modules), and the batch the update actually samples must have the tuned
    batch size."""
    import math
    import yaml

    import iltpu

    conf = os.path.join(
        os.path.dirname(iltpu.__file__), "config", "conf", "tuned.yaml"
    )
    with open(conf) as f:
        tuned = yaml.safe_load(f)
    base = [
        "env=pointmass",
        "env_backend=jax",
        "num_envs=4",
        "evaluation.interval=100000",
        "evaluation.episodes=2",
        "memory.size=2000",
    ]

    # --- GAIL@10: end-to-end — tuned batch size reaches the sampled batch
    ov = tuned["GAIL"][10]
    cfg = load_config(
        base + ["algorithm=GAIL", "imitation.trajectories=10", "steps=1100",
                "logging.interval=50"],
        use_tuned=True,
    )
    assert cfg.training.start == ov["training"]["start"]
    t = Trainer(cfg, str(tmp_path / "gail"))
    assert t.adv_cfg.loss_function == ov["imitation"]["loss_function"]
    assert t.adv_cfg.grad_penalty == ov["imitation"]["grad_penalty"]
    assert t.adv_cfg.entropy_bonus == ov["imitation"]["entropy_bonus"]
    d = ov["imitation"]["discriminator"]
    assert t.disc.g.hidden_size == d["hidden_size"]
    assert t.disc.g.depth == d["depth"]
    assert not t.disc.g.spectral_norm  # tuned GAIL@10: spectral_norm false
    assert t.disc.reward_function == d["reward_function"]
    assert t.learner.discount == ov["reinforcement"]["discount"]
    assert t.learner.polyak_factor == ov["reinforcement"]["polyak_factor"]
    assert t.learner.entropy_target == pytest.approx(
        ov["reinforcement"]["target_temperature"] * t.env.action_size
    )
    assert t.learner.lr == ov["training"]["learning_rate"]
    t.run()
    # the update consumed batches of the tuned size (train.py:173 parity)
    assert len(t.metrics["predicted_rewards"][0]) == ov["training"]["batch_size"]

    # --- GMMIL@10: overlay only moves SAC hyperparameters
    ov = tuned["GMMIL"][10]
    cfg = load_config(
        base + ["algorithm=GMMIL", "imitation.trajectories=10", "steps=10"],
        use_tuned=True,
    )
    t = Trainer(cfg, str(tmp_path / "gmmil"))
    assert t.learner.discount == ov["reinforcement"]["discount"]
    assert t.learner.entropy_target == pytest.approx(
        ov["reinforcement"]["target_temperature"] * t.env.action_size
    )
    assert t.learner.lr == ov["training"]["learning_rate"]
    assert cfg.training.batch_size == ov["training"]["batch_size"]

    # --- PWIL@10: reward scale/bandwidth must reach the discriminator
    ov = tuned["PWIL"][10]
    cfg = load_config(
        base + ["algorithm=PWIL", "imitation.trajectories=10", "steps=10"],
        use_tuned=True,
    )
    t = Trainer(cfg, str(tmp_path / "pwil"))
    assert t.disc.reward_scale == ov["imitation"]["reward_scale"]
    dim = t.env.obs_size + t.env.action_size
    assert t.disc.reward_bandwidth == pytest.approx(
        ov["imitation"]["reward_bandwidth_scale"]
        * t.env.max_episode_steps
        / math.sqrt(dim)
    )
    assert t.learner.polyak_factor == ov["reinforcement"]["polyak_factor"]

    # --- DRIL@10: ensemble architecture + dropout + quantile + disc lr
    ov = tuned["DRIL"][10]
    cfg = load_config(
        base + ["algorithm=DRIL", "imitation.trajectories=10", "steps=10"],
        use_tuned=True,
    )
    t = Trainer(cfg, str(tmp_path / "dril"))
    d = ov["imitation"]["discriminator"]
    assert t.disc.net.hidden_size == d["hidden_size"]
    assert t.disc.net.depth == d["depth"]
    assert t.disc.net.dropout == d["dropout"]
    assert t.disc.net.input_dropout == d["input_dropout"]
    assert cfg.imitation.quantile_cutoff == ov["imitation"]["quantile_cutoff"]
    assert cfg.imitation.pretraining.iterations == ov["imitation"]["pretraining"]["iterations"]
    assert cfg.imitation.learning_rate == ov["imitation"]["learning_rate"]
    assert cfg.imitation.weight_decay == ov["imitation"]["weight_decay"]


def test_best_eval_agent_checkpoint(tmp_path):
    """The best-eval agent snapshot is saved alongside the final agent
    (the reference saves only the final one, train.py:237 — a dip on
    spiky envs)."""
    cfg = _cfg("algorithm=SAC")
    t = Trainer(cfg, str(tmp_path))
    t.run()
    assert os.path.isdir(tmp_path / "agent_best")
    from iltpu.utils.checkpoint import load_checkpoint

    ck, _ = load_checkpoint(str(tmp_path / "agent_best"))
    assert "actor" in ck and "score" in ck
    assert float(ck["score"]) == max(t.score)


def test_best_agent_floor_survives_resume(tmp_path):
    """A resumed run's first eval must NOT clobber a better existing
    agent_best: the compare is floored by the score stored inside the
    snapshot, not just this run's in-memory history (ADVICE r4 #5)."""
    from iltpu.utils.checkpoint import load_checkpoint

    cfg = _cfg("algorithm=SAC")
    t = Trainer(cfg, str(tmp_path))
    t.run()
    prior, _ = load_checkpoint(str(tmp_path / "agent_best"))
    prior_score = float(prior["score"])

    # Fresh trainer in the SAME out_dir (empty history, as after a resume
    # whose checkpoint predates the best eval). Force a worse eval score.
    t2 = Trainer(cfg, str(tmp_path))
    t2._normalized = lambda returns: [prior_score - 1.0]
    t2.evaluate = lambda: [[0.0]]
    t2._record_eval(step=999)
    kept, _ = load_checkpoint(str(tmp_path / "agent_best"))
    assert float(kept["score"]) == prior_score  # not overwritten

    # ...and a strictly better eval DOES overwrite.
    t2._normalized = lambda returns: [prior_score + 1.0]
    t2._record_eval(step=1000)
    new, _ = load_checkpoint(str(tmp_path / "agent_best"))
    assert float(new["score"]) == prior_score + 1.0


def test_steady_timing_marks_device_loop(tmp_path):
    """training.timing_marks=K records K+1 monotone (step, time) marks
    spanning the steady region in the on-device loop — the bench median's
    data source (bench.py multi-window fix, VERDICT r4 #1)."""
    cfg = _cfg(
        "algorithm=SAC",
        "training.on_device_loop=true",
        "training.timing_skip_steps=100",
        "training.timing_marks=3",
    )
    t = Trainer(cfg, str(tmp_path))
    t.run()
    marks = t.metrics["steady_marks"]
    assert len(marks) >= 3  # >= 2 windows even with chunk quantisation
    steps_m = [s for s, _ in marks]
    times_m = [tt for _, tt in marks]
    assert steps_m == sorted(steps_m) and len(set(steps_m)) == len(steps_m)
    assert all(t1 >= t0 for t0, t1 in zip(times_m, times_m[1:]))
    # marks span the whole steady step range; their time span excludes
    # in-loop eval/checkpoint overhead after the last chunk, so it can only
    # be tighter than the whole-region steady_time
    assert steps_m[-1] - steps_m[0] == t.metrics["steady_env_steps"]
    assert times_m[-1] - times_m[0] <= t.metrics["steady_time"] + 1e-6


def test_device_loop_records_adril_diagnostics(tmp_path):
    """On-device-loop AdRIL runs log the same diag_* metrics the host loop
    does (adril_diagnosis.py reads them; ADVICE r4 #5 — they were silently
    absent from scan-loop runs)."""
    cfg = _cfg(
        "algorithm=AdRIL",
        "training.on_device_loop=true",
        "logging.interval=50",
    )
    t = Trainer(cfg, str(tmp_path))
    t.run()
    diag = [k for k in t.metrics if k.startswith("diag_")]
    assert "diag_adril_stale_frac" in diag
    assert "diag_relabel_reward_mean" in diag
    assert all(len(t.metrics[k]) > 0 for k in diag)


def test_steady_timing_marks_host_loop(tmp_path):
    """Same contract in the host loop (pipeline mode)."""
    cfg = _cfg(
        "algorithm=SAC",
        "training.pipeline=true",
        "training.timing_skip_steps=100",
        "training.timing_marks=3",
    )
    t = Trainer(cfg, str(tmp_path))
    t.run()
    marks = t.metrics["steady_marks"]
    assert len(marks) >= 4  # >= 3 windows at N=1 (mark every 66 steps)
    steps_m = [s for s, _ in marks]
    assert steps_m == sorted(steps_m) and len(set(steps_m)) == len(steps_m)
    assert steps_m[-1] - steps_m[0] == t.metrics["steady_env_steps"]
