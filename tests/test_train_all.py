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
