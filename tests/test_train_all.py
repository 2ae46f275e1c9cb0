"""Multi-env runner (C20) smoke tests on the tiny in-jit pointmass env."""

import json
import os

import numpy as np

import train_all


def _tiny_overrides():
    return [
        "algorithm=SAC",
        "env=pointmass",
        "env_backend=jax",
        "steps=150",
        "training.start=50",
        "training.batch_size=32",
        "evaluation.interval=100",
        "evaluation.episodes=2",
        "logging.interval=0",
        "memory.size=400",
        "imitation.trajectories=2",
    ]


def test_run_trial_serial_min_over_envs(tmp_path, monkeypatch):
    monkeypatch.setattr(train_all, "ENVS", ["pointmass"])
    monkeypatch.setattr(train_all, "_run_one", lambda packed: {"pointmass": 0.7}[packed[0]])
    score, per_env = train_all.run_trial([], str(tmp_path), serial=True)
    assert score == 0.7
    assert per_env == {"pointmass": 0.7}


def test_run_trial_real_training(tmp_path, monkeypatch):
    monkeypatch.setattr(train_all, "ENVS", ["pointmass"])
    score, per_env = train_all.run_trial(
        ["seed=0"] + _tiny_overrides(), str(tmp_path), serial=True
    )
    assert np.isfinite(score)
    assert os.path.isdir(tmp_path / "pointmass")


def test_main_single_trial(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(train_all, "ENVS", ["pointmass"])
    score = train_all.main(_tiny_overrides() + ["--serial"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rec["min_score"] == score
    assert "pointmass" in rec["per_env"]


def test_envs_flag_restricts_objective(tmp_path, monkeypatch, capsys):
    """--envs subset: the trial objective covers only the listed envs
    (cheap single-env sweeps) without touching the ENVS default."""
    monkeypatch.chdir(tmp_path)
    calls = []

    def fake_run_one(packed):
        calls.append(packed[0])
        return {"pointmass": 0.6, "pendulum": 0.1}[packed[0]]

    monkeypatch.setattr(train_all, "_run_one", fake_run_one)
    score = train_all.main(["--serial", "--envs", "pointmass"])
    assert calls == ["pointmass"]
    assert score == 0.6


def test_sweep_records_acquisition_method(tmp_path, monkeypatch):
    """sweep.jsonl rows carry the acquisition label (--envs subset +
    --early-stop plumbed through the sweep loop)."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(train_all, "_run_one", lambda packed: 0.5)
    train_all.main(
        ["algorithm=GAIL", "--serial", "--sweep", "3", "--envs", "pointmass",
         "--early-stop", "99"]
    )
    with open("outputs/all_GAIL/sweep.jsonl") as f:
        rows = [json.loads(l) for l in f]
    assert len(rows) == 3
    assert all(r["method"] == "sobol" for r in rows)  # inside Sobol init
    assert all(r["per_env"] == {"pointmass": 0.5} for r in rows)


def test_bayesopt_gp_acquisition_after_sobol():
    """The GP/EI path engages once the Sobol budget is spent and labels
    its trials gp-ei."""
    from iltpu.sweep import BayesOpt, space_from_config

    space = space_from_config(
        {"x": {"type": "range", "bounds": [0.0, 1.0]},
         "y": {"type": "range", "bounds": [0.0, 1.0]}}
    )
    opt = BayesOpt(space=space, total_trials=6, sobol_trials=3,
                   early_stop_epochs=99)
    methods = []
    while not opt.should_stop:
        t = opt.ask()
        methods.append(t.method)
        opt.tell(t, -(t.params["x"] - 0.3) ** 2 - (t.params["y"] - 0.7) ** 2)
    assert methods[:3] == ["sobol"] * 3
    assert methods[3:] == ["gp-ei"] * 3
