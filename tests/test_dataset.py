"""Expert-dataset pipeline tests with hand-computed expected outputs
(reference semantics: environments.py:63-125)."""

import numpy as np

from iltpu.data.dataset import build_expert_transitions, expert_replay
from iltpu.data.synthetic import random_d4rl_dataset


def _tiny_dataset():
    """Two trajectories: len-3 terminal-ended, len-2 timeout-ended. S=2, A=1."""
    obs = np.array(
        [[0, 0], [1, 0], [2, 0], [10, 1], [11, 1]], np.float32
    )
    next_obs = obs + np.array([1, 0], np.float32)
    acts = np.arange(5, dtype=np.float32).reshape(5, 1) / 10
    terminals = np.array([0, 0, 1, 0, 0], np.float32)
    timeouts = np.array([0, 0, 0, 0, 1], np.float32)
    return {
        "observations": obs,
        "actions": acts,
        "next_observations": next_obs,
        "terminals": terminals,
        "timeouts": timeouts,
    }


def test_split_and_truncate_no_absorbing():
    tr, n_traj = build_expert_transitions(
        _tiny_dataset(), trajectories=0, subsample=1, absorbing=False
    )
    assert n_traj == 2
    assert tr["states"].shape == (5, 2)
    np.testing.assert_allclose(tr["terminals"], [0, 0, 1, 0, 0])
    np.testing.assert_allclose(tr["timeouts"], [0, 0, 0, 0, 1])
    np.testing.assert_allclose(tr["weights"], np.ones(5))
    np.testing.assert_allclose(tr["rewards"], np.zeros(5))  # rewards zeroed

    tr1, n1 = build_expert_transitions(
        _tiny_dataset(), trajectories=1, subsample=1, absorbing=False
    )
    assert n1 == 1
    assert tr1["states"].shape == (3, 2)


def test_absorbing_wrap_semantics():
    tr, n_traj = build_expert_transitions(
        _tiny_dataset(), trajectories=0, subsample=1, absorbing=True
    )
    assert n_traj == 2
    # Terminal-ended trajectory gains one absorbing self-loop row: 3+1 + 2 = 6
    assert tr["states"].shape == (6, 3)  # +1 absorbing indicator dim
    absorbing_state = np.array([0, 0, 1], np.float32)
    # original final transition of traj 0 redirected to absorbing state
    np.testing.assert_allclose(tr["next_states"][2], absorbing_state)
    assert tr["terminals"][2] == 0.0  # terminal cleared
    # appended self-loop
    np.testing.assert_allclose(tr["states"][3], absorbing_state)
    np.testing.assert_allclose(tr["next_states"][3], absorbing_state)
    np.testing.assert_allclose(tr["actions"][3], [0.0])
    # no terminals anywhere after wrapping (traj 1 ends in timeout)
    np.testing.assert_allclose(tr["terminals"], np.zeros(6))
    np.testing.assert_allclose(tr["timeouts"], [0, 0, 0, 0, 0, 1])
    # timeout trajectory obs got the indicator bit but no rewrite
    np.testing.assert_allclose(tr["states"][4], [10, 1, 0])
    np.testing.assert_allclose(tr["next_states"][5], [12, 1, 0])


def test_absorbing_weights_are_inverse_subsample():
    tr, _ = build_expert_transitions(
        _tiny_dataset(), trajectories=1, subsample=1, absorbing=True
    )
    # subsample=1 -> absorbing weights are 1/1 = 1
    np.testing.assert_allclose(tr["weights"], np.ones(4))

    rng = np.random.default_rng(0)
    data = random_d4rl_dataset(rng, [10, 10], 3, 2)
    tr2, _ = build_expert_transitions(
        data, trajectories=0, subsample=4, absorbing=True, rng=rng
    )
    # the two rows per trajectory around the absorbing pair carry weight 1/4
    w = tr2["weights"]
    assert (w == 0.25).sum() >= 4  # wrapped transition + self-loop per traj
    assert set(np.unique(w)) <= {0.25, 1.0}


def test_subsample_keeps_absorbing_pair_and_period():
    rng = np.random.default_rng(42)
    data = random_d4rl_dataset(rng, [20], 2, 1)
    tr, _ = build_expert_transitions(
        data, trajectories=0, subsample=5, absorbing=True, rng=rng
    )
    # wrapped length T=21; subsampled indices = {start, start+5, ...} | {19, 20}
    T = 21
    n = tr["states"].shape[0]
    possible = {len(sorted(set(range(s, T, 5)) | {T - 2, T - 1})) for s in range(5)}
    assert n in possible
    # absorbing self-loop must be present (last row)
    np.testing.assert_allclose(tr["states"][-1][-1], 1.0)
    np.testing.assert_allclose(tr["next_states"][-1][-1], 1.0)


def test_subsample_no_absorbing():
    rng = np.random.default_rng(1)
    data = random_d4rl_dataset(rng, [12], 2, 1, timeout_flags=[True])
    tr, _ = build_expert_transitions(
        data, trajectories=0, subsample=3, absorbing=False, rng=rng
    )
    assert tr["states"].shape[0] == 4  # 12 / 3


def test_expert_replay_roundtrip():
    rng = np.random.default_rng(2)
    data = random_d4rl_dataset(rng, [8, 8, 8], 3, 2)
    rs = expert_replay(data, trajectories=2, subsample=1, absorbing=True, rng=rng)
    assert rs.size == 2 * 9  # 8 + absorbing self-loop, per trajectory
    assert int(rs.num_trajectories) == 2
    assert bool(rs.full)
    assert rs.states.shape[1] == 4  # 3 + indicator


def test_hdf5_roundtrip_matches_direct_arrays(tmp_path):
    """Golden contract (reference loader environments.py:63-125): HDF5 ->
    build_expert_transitions equals the same arrays fed directly."""
    import h5py

    rng = np.random.default_rng(7)
    data = random_d4rl_dataset(rng, [9, 6, 11], 3, 2)
    path = tmp_path / "expert.hdf5"
    with h5py.File(path, "w") as f:
        for k, v in data.items():
            f.create_dataset(k, data=v)

    from iltpu.data.dataset import load_d4rl_hdf5

    loaded = load_d4rl_hdf5(str(path))
    for k in data:
        np.testing.assert_array_equal(loaded[k], data[k])
    tr_h5, n_h5 = build_expert_transitions(
        loaded, trajectories=2, subsample=2, absorbing=True,
        rng=np.random.default_rng(3),
    )
    tr_direct, n_direct = build_expert_transitions(
        data, trajectories=2, subsample=2, absorbing=True,
        rng=np.random.default_rng(3),
    )
    assert n_h5 == n_direct
    for k in tr_direct:
        np.testing.assert_array_equal(tr_h5[k], tr_direct[k])


def test_hdf5_next_obs_reconstruction_respects_trajectory_boundaries(tmp_path):
    """When next_observations is absent, the reconstruction must NOT leak
    the first observation of trajectory k+1 into the last transition of
    trajectory k (the round-2 review's Weak #6)."""
    import h5py

    data = _tiny_dataset()
    path = tmp_path / "no_next.hdf5"
    with h5py.File(path, "w") as f:
        for k, v in data.items():
            if k != "next_observations":
                f.create_dataset(k, data=v)

    from iltpu.data.dataset import load_d4rl_hdf5

    loaded = load_d4rl_hdf5(str(path))
    obs = data["observations"]
    next_obs = loaded["next_observations"]
    # interior transitions: shifted within the trajectory
    np.testing.assert_array_equal(next_obs[0], obs[1])
    np.testing.assert_array_equal(next_obs[1], obs[2])
    np.testing.assert_array_equal(next_obs[3], obs[4])
    # trajectory-final transitions (terminal idx 2, timeout idx 4): must be
    # their OWN observation, not obs[3] (= the next trajectory's start)
    np.testing.assert_array_equal(next_obs[2], obs[2])
    np.testing.assert_array_equal(next_obs[4], obs[4])


def test_hdf5_reconstructed_timeout_selfloops_are_zero_weighted(tmp_path):
    """The HDF5 fallback fabricates self-loop next_obs at timeout
    boundaries; those rows must carry weight 0 all the way through
    build_expert_transitions so they never contribute a biased TD target
    in mixed critic batches (ADVICE r4 #3). True-terminal boundaries keep
    weight 1 — their patched next_obs is masked by (1-terminal) anyway."""
    import h5py

    data = _tiny_dataset()
    path = tmp_path / "no_next.hdf5"
    with h5py.File(path, "w") as f:
        for k, v in data.items():
            if k != "next_observations":
                f.create_dataset(k, data=v)

    from iltpu.data.dataset import load_d4rl_hdf5

    loaded = load_d4rl_hdf5(str(path))
    # row 2 is a true terminal (weight 1); row 4 a timeout boundary (0)
    np.testing.assert_array_equal(loaded["weights"], [1, 1, 1, 1, 0])

    tr, _ = build_expert_transitions(
        loaded, trajectories=0, subsample=1, absorbing=True
    )
    # layout after absorbing wrap: traj1 rows 0-2 + absorbing self-loop,
    # traj2 rows 3-4 (timeout-ended, no wrap). The reconstructed timeout
    # row is the ONLY zero-weight row.
    assert tr["states"].shape[0] == 6
    np.testing.assert_array_equal(tr["weights"], [1, 1, 1, 1, 1, 0])

    # datasets that DO ship next_observations are untouched (all-ones)
    tr_full, _ = build_expert_transitions(
        data, trajectories=0, subsample=1, absorbing=True
    )
    np.testing.assert_array_equal(tr_full["weights"], np.ones(6))


def test_terminals_to_timeouts_reclassification():
    """expert_data.terminals_to_timeouts: trajectory ENDS become timeouts,
    so the absorbing wrap adds no self-loops at expert death states (the
    AdRIL/SQIL data-distribution repair; conf/train.yaml)."""
    data = _tiny_dataset()
    t = data["terminals"].astype(bool)
    fixed = dict(data)
    fixed["timeouts"] = (data["timeouts"].astype(bool) | t).astype(np.float32)
    fixed["terminals"] = np.zeros_like(fixed["timeouts"])

    tr, n = build_expert_transitions(
        fixed, trajectories=0, subsample=1, absorbing=True
    )
    assert n == 2  # trajectory count preserved (split on terminal|timeout)
    assert tr["states"].shape[0] == 5  # NO absorbing self-loops appended
    assert float(tr["states"][:, -1].sum()) == 0.0  # no absorbing rows
    assert float(tr["terminals"].sum()) == 0.0
    assert float(tr["timeouts"].sum()) == 2.0

    # unfixed: the terminal-ended trajectory gets wrapped (+1 row, absorbing)
    tr0, _ = build_expert_transitions(
        data, trajectories=0, subsample=1, absorbing=True
    )
    assert tr0["states"].shape[0] == 6
    assert float(tr0["states"][:, -1].sum()) > 0
