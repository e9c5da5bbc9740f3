"""A dependency-free SimplerEnv stand-in emitting ManiSkill-shaped obs dicts.

The reference has no test fixtures at all (SURVEY.md §4); this fake env lets
the full closed-loop eval stack (EvalAgent + adapters + collectors) run and be
tested without the SimplerEnv/ManiSkill installation, and is selected
automatically when simpler_env is unavailable or the task starts with
"fake_".
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class _Spec:
    max_episode_steps: int = 12


class FakeSimplerEnv:
    """Deterministic per-episode dynamics; success decided by a hash of the
    episode id so success-rate summaries are reproducible."""

    def __init__(self, task: str = "fake_widowx_carrot_on_plate", image_hw=(480, 640)):
        self.task = task
        self.spec = _Spec()
        self._episode_id = 0
        self._step = 0
        self._rng = np.random.RandomState(0)
        self._image_hw = image_hw

    # -- api surface used by EvalAgent -------------------------------------
    def reset(self, options=None, seed=None):
        options = options or {}
        self._episode_id = int(
            (options.get("obj_init_options") or {}).get("episode_id", 0)
        )
        self._step = 0
        self._rng = np.random.RandomState(self._episode_id + (seed or 0))
        reset_info = {"scene_name": "fake_bridge_table", "episode_id": self._episode_id}
        return self._obs(), reset_info

    def get_language_instruction(self) -> str:
        return "put the carrot on the plate"

    def is_final_subtask(self) -> bool:
        return True

    def step(self, action):
        action = np.asarray(action)
        assert action.shape == (7,), action.shape
        assert np.isfinite(action).all(), "non-finite action"
        self._step += 1
        truncated = self._step >= self.spec.max_episode_steps
        success = truncated and (self._episode_id % 3 == 0)
        reward = float(success)
        return self._obs(), reward, success, truncated, {}

    # -- internals ----------------------------------------------------------
    def _obs(self):
        h, w = self._image_hw
        img = self._rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        quat_wxyz = np.array([1.0, 0.0, 0.0, 0.0])
        eef = np.concatenate(
            [self._rng.rand(3) * 0.3, quat_wxyz, [self._rng.rand()]]
        )
        return {"agent": {"eef_pos": eef}, "image": img}


def make_env(task: str):
    """simpler_env.make when available and not a fake task; FakeSimplerEnv
    otherwise."""
    if not task.startswith("fake"):
        try:
            import simpler_env

            return simpler_env.make(task)
        except ImportError:
            import logging

            logging.getLogger(__name__).warning(
                "simpler_env not installed; using FakeSimplerEnv for task %s", task
            )
    return FakeSimplerEnv(task)
