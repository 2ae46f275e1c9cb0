"""CLI tests: single-run entry + Hydra-style `-m` multirun expansion
(reference train.py:21-23, README.md:66-98; multirun sweeps README.md:89-98)."""

import train as train_cli


def test_expand_multirun_cartesian_product():
    jobs = train_cli.expand_multirun(["seed=1,2,3", "algorithm=GAIL,PWIL", "env=hopper"])
    assert len(jobs) == 6
    assert jobs[0] == ["seed=1", "algorithm=GAIL", "env=hopper"]
    assert jobs[-1] == ["seed=3", "algorithm=PWIL", "env=hopper"]
    # CLI-order job ordering (first axis varies slowest)
    assert jobs[1] == ["seed=1", "algorithm=PWIL", "env=hopper"]


def test_expand_multirun_ignores_bracketed_commas():
    jobs = train_cli.expand_multirun(["hidden=[64,64]", "seed=1,2"])
    assert len(jobs) == 2
    assert jobs[0][0] == "hidden=[64,64]"


def test_expand_multirun_no_sweep_is_single_job():
    jobs = train_cli.expand_multirun(["algorithm=BC", "env=hopper"])
    assert jobs == [["algorithm=BC", "env=hopper"]]


def test_multirun_end_to_end(tmp_path, monkeypatch):
    """Two-seed sweep writes per-job dirs + multirun.yaml and returns scores."""
    calls = []

    def fake_train(cfg, out_dir):
        calls.append((cfg["seed"], out_dir))
        return float(cfg["seed"])

    import iltpu.trainer

    monkeypatch.setattr(iltpu.trainer, "train", fake_train)
    scores = train_cli.main(
        [
            "-m",
            "algorithm=BC",
            "env=pointmass",
            "env_backend=jax",
            "seed=1,2",
            f"output_dir={tmp_path}",
        ]
    )
    assert scores == [1.0, 2.0]
    assert [c[0] for c in calls] == [1, 2]
    roots = list((tmp_path / "multirun").iterdir())
    assert len(roots) == 1
    assert (roots[0] / "multirun.yaml").exists()
    assert (roots[0] / "0" / "config.yaml").exists()
    assert (roots[0] / "1" / "config.yaml").exists()
