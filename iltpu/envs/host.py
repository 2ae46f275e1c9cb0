"""Host-side vectorised MuJoCo environments.

Replaces the reference's one-env `D4RLEnv` adapter (environments.py:20-61)
with an N-way vectorised adapter designed for a device-resident learner:
- one (N, S) float32 observation block per step (a single host->device
  transfer feeds batched policy inference for all envs);
- per-env auto-reset with the TRUE pre-reset next observation returned for
  replay (the post-reset observation is what the policy acts on next);
- action clipping to the space bounds (environments.py:36);
- DAC absorbing augmentation: a zero indicator bit appended to every live
  observation (environments.py:27,32,39) — the absorbing-state rewrite
  itself happens in the replay buffer, as in the reference;
- terminals exclude time-limit truncations, which are flagged separately
  (train.py:157 stores `terminal and t != max_episode_steps` plus a timeout
  flag).

The physics runs in MuJoCo's C engine on host threads; this module is the
host half of the host-actor/device-learner split. The fully-on-device path
lives in `iltpu.envs.jaxenv`.
"""

from typing import Optional, Tuple

import numpy as np

from iltpu.envs.scores import SPECS, EnvSpec


def _make_env(spec: EnvSpec):
    import gymnasium as gym

    return gym.make(spec.gym_id, **spec.gym_kwargs)


class HostVecEnv:
    """N synchronous MuJoCo envs behind one batched interface."""

    def __init__(
        self,
        env_name: str,
        num_envs: int = 1,
        *,
        absorbing: bool = True,
        seed: int = 0,
    ):
        assert env_name in SPECS, f"unsupported env {env_name}; one of {list(SPECS)}"
        self.env_name = env_name
        self.spec = SPECS[env_name]
        self.num_envs = num_envs
        self.absorbing = absorbing
        self._envs = [_make_env(self.spec) for _ in range(num_envs)]
        self._seed = seed
        low = self._envs[0].action_space.low.astype(np.float32)
        high = self._envs[0].action_space.high.astype(np.float32)
        self.action_low, self.action_high = low, high
        self._obs = np.zeros((num_envs, self.obs_size), np.float32)
        # mujoco's mj_step releases the GIL, so a small thread pool steps
        # envs concurrently (this backend is the fallback/eval path when
        # the in-repo C++ stepper isn't built; a serial Python loop left
        # ~half the host cores idle during 30-episode evals).
        self._pool = None
        if num_envs > 1:
            import concurrent.futures
            import os as _os

            self._workers = min(num_envs, _os.cpu_count() or 2)
            # one contiguous chunk of envs per worker: task-dispatch
            # overhead is per-chunk, not per-env (per-env futures measured
            # SLOWER than the serial loop on a 2-core host)
            self._chunks = [
                range(w * num_envs // self._workers,
                      (w + 1) * num_envs // self._workers)
                for w in range(self._workers)
            ]
            self._pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=self._workers
            )

    @property
    def obs_size(self) -> int:
        return self.spec.obs_size + (1 if self.absorbing else 0)

    @property
    def action_size(self) -> int:
        return self.spec.action_size

    @property
    def max_episode_steps(self) -> int:
        return self.spec.time_limit

    def _augment(self, obs: np.ndarray) -> np.ndarray:
        obs = np.asarray(obs, np.float32)
        if self.absorbing:
            obs = np.concatenate([obs, np.zeros((*obs.shape[:-1], 1), np.float32)], -1)
        return obs

    def reset(self, seed: Optional[int] = None) -> np.ndarray:
        """Reset ALL envs; returns the (N, S) observation block."""
        base = self._seed if seed is None else seed
        for i, env in enumerate(self._envs):
            obs, _ = env.reset(seed=base + i)
            self._obs[i] = self._augment(obs)
        self._seed = base + self.num_envs  # fresh seeds on the next full reset
        return self._obs.copy()

    def step(
        self, actions: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Step every env; auto-resets finished ones.

        Returns (true_next_obs, rewards, terminals, timeouts, obs) where
        `true_next_obs` is the pre-reset successor (what replay stores) and
        `obs` is what the policy should act on next (post-reset where an
        episode ended). `terminals` excludes timeouts.
        """
        actions = np.clip(
            np.asarray(actions, np.float32), self.action_low, self.action_high
        )
        n = self.num_envs
        next_obs = np.zeros_like(self._obs)
        rewards = np.zeros(n, np.float32)
        terminals = np.zeros(n, np.float32)
        timeouts = np.zeros(n, np.float32)
        def _step_one(i):
            env = self._envs[i]
            obs, r, terminated, truncated, _ = env.step(actions[i])
            next_obs[i] = self._augment(obs)
            rewards[i] = r
            # Gymnasium can truncate and terminate on the same step; the
            # reference's accounting (train.py:157) gives timeouts priority.
            terminals[i] = float(terminated and not truncated)
            timeouts[i] = float(truncated)
            if terminated or truncated:
                obs, _ = env.reset()
                self._obs[i] = self._augment(obs)
            else:
                self._obs[i] = next_obs[i]

        def _step_chunk(idx):
            for i in idx:
                _step_one(i)

        if self._pool is not None:
            # list() propagates any worker exception
            list(self._pool.map(_step_chunk, self._chunks))
        else:
            for i in range(n):
                _step_one(i)
        return next_obs, rewards, terminals, timeouts, self._obs.copy()

    def close(self):
        if self._pool is not None:
            # wait=True: if a prior step() raised in one worker chunk, other
            # chunks may still be mid mj_step — closing mujoco envs under a
            # live step risks a native crash. On the normal path the pool is
            # idle and the wait is free.
            self._pool.shutdown(wait=True)
            self._pool = None
        for env in self._envs:
            env.close()


def render_rollout(
    env_name: str,
    act_fn,
    out_path: str,
    *,
    absorbing: bool = True,
    seed: int = 0,
    max_frames: int = 500,
    gif_path: str = None,
    fps: int = 30,
) -> int:
    """Greedy rollout with rgb_array frame capture, saved as a compressed
    npz stack (reference `evaluation.py` renders live; headless TPU hosts
    save frames instead — pass `gif_path` for a watchable animated GIF).
    Returns the number of frames written."""
    import os

    os.environ.setdefault("MUJOCO_GL", "egl")  # headless GPU-less rendering
    import gymnasium as gym

    spec = SPECS[env_name]
    env = gym.make(spec.gym_id, render_mode="rgb_array", **spec.gym_kwargs)
    obs, _ = env.reset(seed=seed)
    frames = []
    for _ in range(max_frames):
        full = np.concatenate([obs, [0.0]]).astype(np.float32) if absorbing else obs
        action = np.asarray(act_fn(full[None]))[0]
        obs, _, terminated, truncated, _ = env.step(action)
        frames.append(env.render())
        if terminated or truncated:
            break
    env.close()
    stack = np.stack(frames).astype(np.uint8)
    np.savez_compressed(out_path, frames=stack)
    if gif_path:
        save_frames_gif(stack, gif_path, fps=fps)
    return len(frames)


def save_frames_gif(frames: np.ndarray, gif_path: str, fps: int = 30) -> None:
    """Write an (N, H, W, 3) uint8 frame stack as an animated GIF — the
    watchable form of the reference's live `env.render()` loop
    (evaluation.py:21,26) for headless hosts."""
    from PIL import Image

    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(
        gif_path,
        save_all=True,
        append_images=imgs[1:],
        duration=max(1000 // fps, 10),
        loop=0,
    )


def evaluate_policy(
    env_name: str,
    act_fn,
    num_episodes: int,
    *,
    absorbing: bool = True,
    seed: int = 0,
    return_trajectories: bool = False,
    env_cls=None,
):
    """Batched greedy evaluation (reference evaluation.py:11-35).

    The reference runs episodes serially with one policy call per step; here
    all `num_episodes` episodes run as a vectorised batch — one batched
    `act_fn((E, S)) -> (E, A)` device call per wall-clock step, finished
    episodes masked out. Returns a list of episode returns (plus optional
    trajectories with synthesised terminal flags, evaluation.py:30-33).
    """
    env_cls = HostVecEnv if env_cls is None else env_cls
    env = env_cls(env_name, num_episodes, absorbing=absorbing, seed=seed)
    obs = env.reset()
    done = np.zeros(num_episodes, bool)
    returns = np.zeros(num_episodes, np.float64)
    traj = [[] for _ in range(num_episodes)] if return_trajectories else None
    while not done.all():
        actions = np.asarray(act_fn(obs))
        next_obs, rewards, terminals, timeouts, obs_after = env.step(actions)
        for i in range(num_episodes):
            if done[i]:
                continue
            returns[i] += rewards[i]
            if return_trajectories:
                traj[i].append((obs[i], actions[i], rewards[i]))
            if terminals[i] or timeouts[i]:
                done[i] = True
        obs = obs_after
    env.close()
    if not return_trajectories:
        return returns.tolist()
    trajectories = []
    for ep in traj:
        states = np.stack([t[0] for t in ep])
        acts = np.stack([t[1] for t in ep])
        rews = np.asarray([t[2] for t in ep], np.float32)
        terms = np.zeros(len(ep), np.float32)
        terms[-1] = 1.0
        trajectories.append(
            {"states": states, "actions": acts, "rewards": rews, "terminals": terms}
        )
    return returns.tolist(), trajectories
