"""Env-adapter parity vs the reference's actual adapter code (reference
src/agent/env_adapter/{base,simpler}.py): action denormalization +
euler→axangle conversion + gripper logic, including the EDR sticky-gripper
STATE MACHINE driven over a scripted multi-chunk sequence.

The reference module imports simpler_env (not installed) only for the video
frame grabber; a one-function stub satisfies the import. Both sides are
constructed via ``__new__`` with identical dataset statistics (the shipped
bridge/fractal JSONs — verbatim copies of the reference's), so no tokenizer
or env is needed.
"""

import json
import sys
import types
from pathlib import Path

import numpy as np
import pytest

from blurr_tpu.utils.reference_bridge import reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

from blurr_tpu.utils.reference_bridge import load_reference  # noqa: E402

load_reference()  # sys.path + omegaconf/hydra stubs

if "simpler_env" not in sys.modules:  # video-frame grabber import only
    se = types.ModuleType("simpler_env")
    ou = types.ModuleType("simpler_env.utils.env.observation_utils")
    ou.get_image_from_maniskill2_obs_dict = lambda env, obs: None
    sys.modules["simpler_env"] = se
    sys.modules["simpler_env.utils"] = types.ModuleType("simpler_env.utils")
    sys.modules["simpler_env.utils.env"] = types.ModuleType("simpler_env.utils.env")
    sys.modules["simpler_env.utils.env.observation_utils"] = ou

import importlib  # noqa: E402

ref_simpler = importlib.import_module("src.agent.env_adapter.simpler")

from blurr_tpu.agent.env_adapter import simpler as my_simpler  # noqa: E402

STATS_DIR = Path(__file__).resolve().parents[1] / "blurr_tpu" / "config"


def _make_pair(ref_cls, my_cls, stats_file, norm_type):
    with open(STATS_DIR / stats_file) as f:
        stats = json.load(f)

    ref = ref_cls.__new__(ref_cls)
    ref.dataset_statistics = stats
    ref.action_normalization_type = norm_type

    mine = my_cls.__new__(my_cls)
    mine.dataset_statistics = stats
    mine._stats = {
        field: {k: np.asarray(v, np.float64) for k, v in stats[field].items()}
        for field in ("action", "proprio")
    }
    mine.action_normalization_type = norm_type
    return ref, mine


class TestBridgeAdapter:
    def _pair(self):
        ref, mine = _make_pair(
            ref_simpler.BridgeSimplerAdapter,
            my_simpler.BridgeSimplerAdapter,
            "bridge_statistics.json",
            "bound",
        )
        rot = np.array([[0, 0, 1.0], [0, 1.0, 0], [-1.0, 0, 0]])
        ref.default_rot = rot
        mine.default_rot = rot
        return ref, mine

    def test_postprocess_chunks(self):
        ref, mine = self._pair()
        rng = np.random.RandomState(0)
        for _ in range(5):
            chunk = np.clip(rng.randn(4, 7) * 0.7, -1, 1)
            chunk[:, -1] = rng.rand(4)  # gripper in [0, 1]
            np.testing.assert_allclose(
                np.asarray(mine.postprocess(chunk)),
                np.asarray(ref.postprocess(chunk.copy())),
                atol=1e-10,
                rtol=1e-10,
            )

    def test_preprocess_proprio(self):
        ref, mine = self._pair()
        rng = np.random.RandomState(1)
        for _ in range(5):
            q = rng.randn(4)
            q /= np.linalg.norm(q)
            obs = {
                "agent": {
                    "eef_pos": np.concatenate([rng.randn(3), q, [rng.rand()]])
                }
            }
            np.testing.assert_allclose(
                mine.preprocess_proprio(obs),
                ref.preprocess_proprio(obs),
                atol=1e-10,
            )


class TestEDRAdapter:
    def _pair(self):
        ref, mine = _make_pair(
            ref_simpler.EDRSimplerAdapter,
            my_simpler.EDRSimplerAdapter,
            "fractal_statistics.json",
            "gaussian",
        )
        for a in (ref, mine):
            a.sticky_gripper_num_repeat = 15
            a.sticky_action_is_on = False
            a.gripper_action_repeat = 0
            a.sticky_gripper_action = 0.0
        return ref, mine

    def test_sticky_gripper_state_machine_sequence(self):
        """The sticky-gripper logic is STATEFUL across sub-steps; a scripted
        45-action sequence (open→close→open→noise) must produce identical
        gripper commands and identical internal state on both sides."""
        ref, mine = self._pair()
        rng = np.random.RandomState(2)
        script = np.concatenate([
            np.full(5, 0.9),           # open
            np.full(20, 0.05),         # close -> sticky engages
            np.full(10, 0.95),         # open during sticky window
            rng.rand(10),              # noise
        ])
        for i, g in enumerate(script):
            out_ref = ref.postprocess_gripper(float(g))
            out_mine = mine.postprocess_gripper(float(g))
            assert out_mine == pytest.approx(out_ref, abs=1e-12), f"step {i}"
            assert mine.sticky_action_is_on == ref.sticky_action_is_on, f"step {i}"
            assert mine.gripper_action_repeat == ref.gripper_action_repeat, f"step {i}"

    def test_postprocess_chunks_gaussian(self):
        ref, mine = self._pair()
        rng = np.random.RandomState(3)
        chunk = rng.randn(4, 7)
        chunk[:, -1] = rng.rand(4)
        np.testing.assert_allclose(
            np.asarray(mine.postprocess(chunk)),
            np.asarray(ref.postprocess(chunk.copy())),
            atol=1e-10,
            rtol=1e-10,
        )

    def test_preprocess_proprio(self):
        ref, mine = self._pair()
        rng = np.random.RandomState(4)
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        obs = {"agent": {"eef_pos": np.concatenate([rng.randn(3), q, [0.3]])}}
        np.testing.assert_allclose(
            mine.preprocess_proprio(obs), ref.preprocess_proprio(obs), atol=1e-12
        )


def test_normalization_roundtrip_parity():
    """base.py normalize/denormalize pairs, both modes."""
    ref = ref_simpler.BaseEnvAdapter()
    mine = my_simpler.BaseEnvAdapter()
    rng = np.random.RandomState(5)
    data = rng.randn(6, 7)
    lo, hi = data.min(0) - 0.5, data.max(0) + 0.5
    mean, std = data.mean(0), data.std(0) + 0.1
    np.testing.assert_allclose(
        mine.normalize_bound(data, lo, hi), ref.normalize_bound(data, lo, hi)
    )
    np.testing.assert_allclose(
        mine.denormalize_bound(data, lo, hi), ref.denormalize_bound(data, lo, hi)
    )
    np.testing.assert_allclose(
        mine.normalize_gaussian(data, mean, std),
        ref.normalize_gaussian(data, mean, std),
    )
    np.testing.assert_allclose(
        mine.denormalize_gaussian(data, mean, std),
        ref.denormalize_gaussian(data, mean, std),
    )


class TestPreprocessImagePath:
    def test_full_preprocess_pixel_exact(self, monkeypatch):
        """The whole preprocess pipeline — cv2 LANCZOS4 resize, prompt
        tokenization, pixel normalization, proprio bound-normalization —
        must produce identical tensors for the same raw observation."""
        from blurr_tpu.models.pi0.processing import (
            StubTokenizer,
            VLAProcessor as MyProcessor,
        )

        ref_proc_mod = importlib.import_module("src.model.vla.processing")

        ref, mine = _make_pair(
            ref_simpler.BridgeSimplerAdapter,
            my_simpler.BridgeSimplerAdapter,
            "bridge_statistics.json",
            "bound",
        )
        rot = np.array([[0, 0, 1.0], [0, 1.0, 0], [-1.0, 0, 0]])
        ref.default_rot = rot
        mine.default_rot = rot
        for a in (ref, mine):
            a.image_size = (32, 32)
            a.proprio_normalization_type = "bound"
        ref.processor = ref_proc_mod.VLAProcessor(
            StubTokenizer(), num_image_tokens=3, max_seq_len=12
        )
        mine.processor = MyProcessor(
            StubTokenizer(), num_image_tokens=3, max_seq_len=12
        )

        rng = np.random.RandomState(6)
        frame = rng.randint(0, 256, (48, 64, 3), dtype=np.uint8)
        monkeypatch.setattr(
            ref_simpler, "get_image_from_maniskill2_obs_dict",
            lambda env, obs: frame,
        )
        monkeypatch.setattr(
            my_simpler, "get_image_from_obs", lambda env, obs: frame
        )
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        obs = {"agent": {"eef_pos": np.concatenate([rng.randn(3), q, [0.4]])}}

        out_ref = ref.preprocess(None, obs, "pick up the fork")
        out_mine = mine.preprocess(None, obs, "pick up the fork")

        np.testing.assert_array_equal(
            np.asarray(out_mine["input_ids"]), np.asarray(out_ref["input_ids"])
        )
        np.testing.assert_array_equal(
            np.asarray(out_mine["attention_mask"]),
            np.asarray(out_ref["attention_mask"]),
        )
        np.testing.assert_allclose(
            np.asarray(out_mine["pixel_values"]),
            out_ref["pixel_values"].numpy(),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(out_mine["proprios"]),
            out_ref["proprios"].numpy(),
            atol=1e-6,
        )
