"""Config engine tests: composition order, overrides, tuned overlays,
validation invariants."""

import pytest

from iltpu.config import (
    ALGORITHMS,
    get_by_path,
    load_config,
    parse_overrides,
    to_flat,
    validate_config,
)


def test_defaults_match_reference_base():
    cfg = load_config([])
    assert cfg.algorithm == "SAC"
    assert cfg.steps == 1000000
    assert cfg.training.batch_size == 256
    assert cfg.reinforcement.actor.hidden_size == 256
    assert cfg.imitation.absorbing is True
    assert cfg.imitation.mix_expert_data == "none"


def test_algorithm_overlay_composition():
    cfg = load_config(["algorithm=GAIL"])
    assert cfg.reinforcement.discount == 0.97
    assert cfg.imitation.discriminator.reward_function == "AIRL"
    assert cfg.imitation.nonnegative_margin == float("inf")
    assert cfg.imitation.spectral_norm is True
    # base keys survive the merge
    assert cfg.training.batch_size == 256

    adril = load_config(["algorithm=AdRIL"])
    assert adril.imitation.mix_expert_data == "mixed_batch"
    assert adril.imitation.update_freq == 1250


def test_cli_overrides_win_and_parse_yaml_scalars():
    cfg = load_config(
        [
            "algorithm=GAIL",
            "training.learning_rate=1e-4",
            "imitation.grad_penalty=0",
            "check_time_usage=true",
            "env=hopper",
        ]
    )
    assert cfg.training.learning_rate == pytest.approx(1e-4)
    assert cfg.imitation.grad_penalty == 0
    assert cfg.check_time_usage is True
    assert cfg.env == "hopper"


def test_tuned_overlay_applies_per_trajectory_count():
    cfg = load_config(
        ["algorithm=GAIL", "imitation.trajectories=5"], use_tuned=True
    )
    # tuned GAIL@5 uses Mixup and batch size 1024
    assert cfg.imitation.loss_function == "Mixup"
    assert cfg.training.batch_size == 1024
    # untuned count: no overlay
    cfg2 = load_config(
        ["algorithm=GAIL", "imitation.trajectories=7"], use_tuned=True
    )
    assert cfg2.imitation.loss_function == "BCE"


def test_reference_optimised_hyperparameters_syntax():
    # The reference's exact CLI (README.md:73-76) must work verbatim:
    # optimised_hyperparameters=<ALG>_<N>_trajectories implies the tuned
    # overlay AND imitation.trajectories=N.
    cfg = load_config(
        ["algorithm=GAIL", "optimised_hyperparameters=GAIL_5_trajectories"]
    )
    assert cfg.imitation.trajectories == 5
    assert cfg.imitation.loss_function == "Mixup"
    assert cfg.training.batch_size == 1024
    # explicit trajectories override still wins over the implied count
    cfg2 = load_config(
        [
            "algorithm=GAIL",
            "optimised_hyperparameters=GAIL_5_trajectories",
            "imitation.trajectories=5",
        ]
    )
    assert cfg2.imitation.trajectories == 5
    # mismatched algorithm is rejected (the reference requires both flags)
    with pytest.raises(AssertionError):
        load_config(
            ["algorithm=BC", "optimised_hyperparameters=GAIL_5_trajectories"]
        )
    with pytest.raises(AssertionError):
        load_config(["algorithm=GAIL", "optimised_hyperparameters=bogus"])


def test_named_overlay_wins_over_trajectory_override():
    # Hydra semantics: the NAMED overlay's hyperparameters apply; an explicit
    # imitation.trajectories override changes only the count (round-2
    # advisor finding on core.py:151).
    cfg = load_config(
        [
            "algorithm=GAIL",
            "optimised_hyperparameters=GAIL_5_trajectories",
            "imitation.trajectories=10",
        ]
    )
    assert cfg.imitation.trajectories == 10  # the count override wins
    # ...but the GAIL_5 overlay's hyperparameters apply (GAIL_10 uses BCE
    # with batch 256; GAIL_5 uses Mixup with batch 1024)
    assert cfg.imitation.loss_function == "Mixup"
    assert cfg.training.batch_size == 1024


def test_named_overlay_missing_fails_fast():
    # optimised_hyperparameters naming an absent (alg, N) pair must raise,
    # not silently run untuned (round-2 advisor finding on core.py:159).
    with pytest.raises(AssertionError):
        load_config(
            ["algorithm=GAIL", "optimised_hyperparameters=GAIL_7_trajectories"]
        )
    # the `null` sentinel still parses to no-op
    cfg = load_config(["algorithm=GAIL", "optimised_hyperparameters=null"])
    assert cfg.imitation.loss_function == "BCE"


@pytest.mark.parametrize("alg", ALGORITHMS)
def test_all_algorithms_validate(alg):
    cfg = load_config([f"algorithm={alg}"])
    v = validate_config(cfg)
    assert v.algorithm == alg
    # memory clamp (train.py:30)
    v2 = validate_config(load_config([f"algorithm={alg}", "steps=5000"]))
    assert get_by_path(v2, "memory.size") == 5000


def test_validation_rejects_bad_configs():
    with pytest.raises(AssertionError):
        validate_config(load_config(["algorithm=AdRIL", "imitation.mix_expert_data=none"]))
    with pytest.raises(AssertionError):
        validate_config(load_config(["algorithm=GAIL", "imitation.loss_function=WGAN"]))
    with pytest.raises(AssertionError):
        validate_config(
            load_config(["algorithm=GAIL", "imitation.mix_expert_data=prefill_memory"])
        )
    with pytest.raises(AssertionError):
        load_config(["algorithm=NotAnAlg"])
    with pytest.raises(AssertionError):
        parse_overrides(["no_equals_sign"])


def test_to_flat_round_trip():
    cfg = load_config(["algorithm=RED"])
    flat = to_flat(cfg)
    assert flat["imitation.discriminator.hidden_size"] == 32
    assert flat["algorithm"] == "RED"
