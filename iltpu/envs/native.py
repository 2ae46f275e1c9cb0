"""ctypes bindings for the native C++ vectorised MuJoCo stepper.

`NativeVecEnv` is a drop-in replacement for `iltpu.envs.host.HostVecEnv`
(same constructor and step contract) backed by `native/vecenv.cc`: one C
call per batched step does physics (thread pool over envs), Gym-v4 reward /
termination / observation computation, auto-reset, and the absorbing-bit
augmentation — eliminating the per-env Python loop of the host adapter and
the per-step Python overhead of the gymnasium stack (reference analogue:
the Python<->C env boundary at environments.py:35-40).

The shared library is compiled on demand with g++ against the mujoco pip
package's bundled libmujoco + headers (`ensure_built()`); if the toolchain
or library is unavailable, callers should fall back to HostVecEnv
(`native_available()`).
"""

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from iltpu.envs.scores import SPECS

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "vecenv.cc")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB = os.path.join(_BUILD_DIR, "libilvecenv.so")

# env_type enum in vecenv.cc + gymnasium asset/frame_skip mapping
# (frame skips: hopper_v4.py:84, walker2d_v4.py MujocoEnv.__init__ arg 4,
# half_cheetah_v4.py / ant_v4.py arg 5).
_NATIVE_SPEC = {
    "hopper": (0, "hopper.xml", 4),
    "walker2d": (1, "walker2d.xml", 4),
    "halfcheetah": (2, "half_cheetah.xml", 5),
    "ant": (3, "ant.xml", 5),
}


def _mujoco_paths() -> Tuple[str, str, str]:
    import mujoco

    pkg = os.path.dirname(mujoco.__file__)
    include = os.path.join(pkg, "include")
    libs = [f for f in os.listdir(pkg) if f.startswith("libmujoco.so")]
    if not libs:
        raise FileNotFoundError("libmujoco.so not found in mujoco package")
    return pkg, include, os.path.join(pkg, sorted(libs)[-1])


def ensure_built(force: bool = False) -> str:
    """Compile the stepper if missing or older than its source; return path."""
    if (
        not force
        and os.path.isfile(_LIB)
        and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)
    ):
        return _LIB
    pkg, include, libmujoco = _mujoco_paths()
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        f"-I{include}", _SRC, libmujoco,
        f"-Wl,-rpath,{pkg}", "-lpthread", "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _LIB


def native_available() -> bool:
    try:
        ensure_built()
        return True
    except Exception:
        return False


def _load():
    lib = ctypes.CDLL(ensure_built())
    lib.vecenv_create.restype = ctypes.c_void_p
    lib.vecenv_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_uint64, ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.vecenv_obs_size.argtypes = [ctypes.c_void_p]
    lib.vecenv_action_size.argtypes = [ctypes.c_void_p]
    lib.vecenv_dt.restype = ctypes.c_double
    lib.vecenv_dt.argtypes = [ctypes.c_void_p]
    f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.vecenv_reset.argtypes = [ctypes.c_void_p, ctypes.c_uint64, f32]
    lib.vecenv_step.argtypes = [ctypes.c_void_p, f32, f32, f32, f32, f32, f32]
    lib.vecenv_set_state.argtypes = [ctypes.c_void_p, ctypes.c_int, f64, f64]
    lib.vecenv_get_state.argtypes = [ctypes.c_void_p, ctypes.c_int, f64, f64]
    lib.vecenv_destroy.argtypes = [ctypes.c_void_p]
    return lib


_lib = None


def _gym_asset(xml_name: str) -> str:
    import gymnasium.envs.mujoco as m

    return os.path.join(os.path.dirname(m.__file__), "assets", xml_name)


class NativeVecEnv:
    """N MuJoCo envs stepped by one native call (HostVecEnv-compatible)."""

    def __init__(
        self,
        env_name: str,
        num_envs: int = 1,
        *,
        absorbing: bool = True,
        seed: int = 0,
    ):
        global _lib
        assert env_name in _NATIVE_SPEC, f"unsupported env {env_name}"
        if _lib is None:
            _lib = _load()
        self.env_name = env_name
        self.spec = SPECS[env_name]
        self.num_envs = num_envs
        self.absorbing = absorbing
        self._seed = seed
        env_type, xml, frame_skip = _NATIVE_SPEC[env_name]
        err = ctypes.create_string_buffer(512)
        self._h = _lib.vecenv_create(
            _gym_asset(xml).encode(), env_type, num_envs, frame_skip,
            self.spec.time_limit, int(absorbing), seed, err, len(err),
        )
        if not self._h:
            raise RuntimeError(f"vecenv_create failed: {err.value.decode()}")
        assert _lib.vecenv_obs_size(self._h) == self.obs_size, (
            _lib.vecenv_obs_size(self._h), self.obs_size,
        )
        assert _lib.vecenv_action_size(self._h) == self.action_size
        S = self.obs_size
        self._next_obs = np.zeros((num_envs, S), np.float32)
        self._rewards = np.zeros(num_envs, np.float32)
        self._terminals = np.zeros(num_envs, np.float32)
        self._timeouts = np.zeros(num_envs, np.float32)
        self._obs_after = np.zeros((num_envs, S), np.float32)

    @property
    def obs_size(self) -> int:
        return self.spec.obs_size + (1 if self.absorbing else 0)

    @property
    def action_size(self) -> int:
        return self.spec.action_size

    @property
    def max_episode_steps(self) -> int:
        return self.spec.time_limit

    def reset(self, seed: Optional[int] = None) -> np.ndarray:
        base = self._seed if seed is None else seed
        self._seed = base + self.num_envs
        obs = np.zeros((self.num_envs, self.obs_size), np.float32)
        _lib.vecenv_reset(self._h, base, obs)
        return obs

    def step(self, actions: np.ndarray):
        actions = np.ascontiguousarray(actions, np.float32)
        _lib.vecenv_step(
            self._h, actions, self._next_obs, self._rewards,
            self._terminals, self._timeouts, self._obs_after,
        )
        return (
            self._next_obs.copy(),
            self._rewards.copy(),
            self._terminals.copy(),
            self._timeouts.copy(),
            self._obs_after.copy(),
        )

    # ------------------------------------------------------- test hooks
    def set_state(self, i: int, qpos: np.ndarray, qvel: np.ndarray):
        _lib.vecenv_set_state(
            self._h,
            i,
            np.ascontiguousarray(qpos, np.float64),
            np.ascontiguousarray(qvel, np.float64),
        )

    def get_state(self, i: int, nq: int, nv: int):
        qpos = np.zeros(nq, np.float64)
        qvel = np.zeros(nv, np.float64)
        _lib.vecenv_get_state(self._h, i, qpos, qvel)
        return qpos, qvel

    def close(self):
        if getattr(self, "_h", None):
            _lib.vecenv_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
