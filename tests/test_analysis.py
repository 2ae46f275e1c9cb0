"""Seed-sweep aggregation (C22) and HP-opt sweeper (C21) tests."""

import json
import os
import pickle

import numpy as np
import pytest

from iltpu.analysis import collect_seed_sweep, iqm, stratified_bootstrap_ci
from iltpu.sweep import BayesOpt, Param, space_from_config


def test_iqm_matches_hand_computed():
    # Middle 50% of 0..7 is {2,3,4,5} -> mean 3.5.
    assert iqm(np.arange(8.0)) == pytest.approx(3.5)


def test_iqm_axis():
    x = np.stack([np.arange(8.0), np.arange(8.0) + 10])
    np.testing.assert_allclose(iqm(x, axis=1), [3.5, 13.5])


def test_bootstrap_ci_contains_point_and_tightens():
    rng = np.random.default_rng(0)
    scores = rng.normal(1.0, 0.1, size=(10, 4))
    point, lo, hi = stratified_bootstrap_ci(scores, reps=2000, seed=1)
    assert lo <= point <= hi
    assert hi - lo < 0.4
    # 4x the runs -> narrower interval.
    big = rng.normal(1.0, 0.1, size=(40, 4))
    _, lo2, hi2 = stratified_bootstrap_ci(big, reps=2000, seed=1)
    assert (hi2 - lo2) < (hi - lo)


def _write_run(root, alg, env, stamp, curve):
    d = os.path.join(root, f"{alg}_{env}", stamp)
    os.makedirs(d)
    metrics = {
        "test_steps": list(range(0, 10000 * len(curve), 10000)),
        "test_returns_normalized": [[c] * 4 for c in curve],
    }
    with open(os.path.join(d, "metrics.pkl"), "wb") as f:
        pickle.dump(metrics, f)


def test_collect_seed_sweep_builds_tensor(tmp_path):
    root = str(tmp_path)
    for env in ("hopper", "walker2d"):
        for seed in range(3):
            _write_run(root, "GAIL", env, f"run{seed}", [0.1 * seed, 0.2 * seed])
    steps, tensor, dirs = collect_seed_sweep(root, "GAIL", ["hopper", "walker2d"])
    assert tensor.shape == (3, 2, 2)
    assert list(steps) == [0, 10000]
    # run0's curve is all zeros in both envs
    np.testing.assert_allclose(tensor[0], 0.0)


def test_seed_sweep_script_end_to_end(tmp_path):
    from scripts.print_plot_seed_sweep_results import main

    root = str(tmp_path / "outputs")
    for env in ("hopper", "walker2d"):
        for seed in range(3):
            _write_run(
                root, "BC", env, f"run{seed}", [0.5 + 0.01 * seed, 0.6 + 0.01 * seed]
            )
    out = str(tmp_path / "fig.png")
    results = main(
        [
            "--root", root,
            "--algorithms", "BC",
            "--envs", "hopper", "walker2d",
            "--reps", "500",
            "--out", out,
        ]
    )
    assert os.path.isfile(out)
    assert 0.5 < results["BC"]["iqm"] < 0.7


def test_hp_opt_script_end_to_end(tmp_path):
    from scripts.print_plot_hp_opt_results import main

    sweep = tmp_path / "sweep.jsonl"
    rng = np.random.default_rng(0)
    with open(sweep, "w") as f:
        for t in range(8):
            rec = {
                "trial": t,
                "params": {
                    "training.learning_rate": float(10 ** rng.uniform(-4, -3)),
                    "imitation.balanced": bool(t % 2),
                    # string categorical: pandas>=3 gives these a dedicated
                    # `str` dtype (not object) — regression for _numeric
                    "imitation.loss_function": ["BCE", "Mixup", "PUGAIL"][t % 3],
                },
                "min_score": float(rng.uniform()),
                "per_env": {"hopper": 0.5},
            }
            f.write(json.dumps(rec) + "\n")
    out = str(tmp_path / "hp.png")
    ranked = main([str(sweep), "--out", out])
    assert os.path.isfile(out)
    assert ranked["min_score"].is_monotonic_decreasing


# ----------------------------------------------------------------- sweeper


def _quad_space():
    return [
        Param("x", "range", bounds=(-1.0, 1.0)),
        Param("y", "range", bounds=(-1.0, 1.0)),
    ]


def test_bayes_opt_finds_quadratic_max():
    opt = BayesOpt(space=_quad_space(), total_trials=25, sobol_trials=8,
                   early_stop_epochs=100, seed=0)
    while not opt.should_stop:
        t = opt.ask()
        value = -((t.params["x"] - 0.3) ** 2) - (t.params["y"] + 0.2) ** 2
        opt.tell(t, value)
    best = opt.best_trial()
    assert best.value > -0.05  # close to the optimum at (0.3, -0.2)


def test_bayes_opt_early_stop():
    opt = BayesOpt(space=_quad_space(), total_trials=100, sobol_trials=2,
                   early_stop_epochs=3, seed=0)
    n = 0
    while not opt.should_stop:
        t = opt.ask()
        opt.tell(t, -1.0)  # never improves after the first
        n += 1
    assert n <= 5  # 1 first + <=3 non-improving + slack


def test_bayes_opt_minimize():
    opt = BayesOpt(space=_quad_space(), total_trials=15, sobol_trials=6,
                   minimize=True, early_stop_epochs=100, seed=1)
    while not opt.should_stop:
        t = opt.ask()
        opt.tell(t, (t.params["x"] - 0.5) ** 2 + t.params["y"] ** 2)
    assert opt.best_trial().value < 0.1


def test_space_from_yaml_config():
    import yaml

    path = os.path.join(
        os.path.dirname(__file__), "..", "iltpu", "config", "conf",
        "search_space.yaml",
    )
    with open(path) as f:
        spaces = yaml.safe_load(f)
    for alg, entries in spaces.items():
        space = space_from_config(entries)
        assert space, alg
        opt = BayesOpt(space=space, total_trials=3, sobol_trials=3)
        t = opt.ask()
        # every declared param gets a value of the declared type
        for p in space:
            assert p.name in t.params
            if p.type == "choice":
                assert t.params[p.name] in p.values
            elif p.type == "range":
                assert p.bounds[0] <= t.params[p.name] <= p.bounds[1]
        opt.tell(t, 0.0)
