"""MAIN-LOOP differential: the reference's eval_hf_vla_simpler.py episode
loop (reference scripts/eval_hf_vla_simpler.py:804-1034) driven end-to-end
vs this repo's scripts/eval_hf_vla_simpler.py — same deterministic fake
policy, same fake env dynamics, whole trajectories compared.

Round-3 verdict Next #3: the helper layer is already fully differential
(test_reference_parity_hf_eval.py); this file closes the last gap — the
loop choreography itself:

- initial-states modes (ref :816-822: episode_id options vs seeded resets
  with the eval/train seed bases),
- num_steps_wait dummy-action stepping (ref :837-841),
- action-chunk sub-stepping with the mid-chunk max_steps break (:963-987),
- the OFT-kwargs ValueError fallback (:935-952),
- per-task/avg success accounting and summary.json (:999-1025).

Both mains run with their model swapped for a SHARED deterministic fake
policy whose action chunk depends on (call index, processed image), so the
loops stay CLOSED: a choreography difference (wrong step budget, wrong
reset seeding, chunk consumed in the wrong order) changes the observation
stream and diverges the trajectories. The pre/post helpers each side uses
are its own production ones (differentially validated at the unit level).
"""

from __future__ import annotations

import importlib.util
import json
import sys
import types
from pathlib import Path

import numpy as np
import pytest

from blurr_tpu.utils.reference_bridge import reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

from blurr_tpu.agent.fake_env import FakeSimplerEnv  # noqa: E402
from blurr_tpu.utils.reference_bridge import load_reference_script  # noqa: E402

RH = load_reference_script("eval_hf_vla_simpler")

import torch  # noqa: E402

REPO_ROOT = Path(__file__).resolve().parents[1]

# -- simpler_env stub (upgrade in place if another module installed one) -----
if "simpler_env" not in sys.modules:
    sys.modules["simpler_env"] = types.ModuleType("simpler_env")
    sys.modules["simpler_env.utils"] = types.ModuleType("simpler_env.utils")
    sys.modules["simpler_env.utils.env"] = types.ModuleType(
        "simpler_env.utils.env")
    sys.modules["simpler_env.utils.env.observation_utils"] = types.ModuleType(
        "simpler_env.utils.env.observation_utils")
sys.modules["simpler_env.utils.env.observation_utils"].get_image_from_maniskill2_obs_dict = (  # noqa: E501
    lambda env, obs: obs["image"]
)


def _load_my_script():
    name = "blurr_my_script_eval_hf_vla_simpler"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, REPO_ROOT / "scripts" / "eval_hf_vla_simpler.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


MY = _load_my_script()

NORM_STATS = {
    "bridge_orig": {
        "action": {
            "q01": [-0.12, -0.1, -0.11, -0.3, -0.25, -0.2, 0.0],
            "q99": [0.13, 0.11, 0.1, 0.28, 0.26, 0.22, 1.0],
            "mask": [True] * 6 + [False],
        }
    }
}


# -- the shared deterministic policy -----------------------------------------


def shared_chunk(call_idx: int, pixel_values, chunk_len: int) -> np.ndarray:
    """[chunk_len, 7] actions as a function of (call index, processed
    image). The image coupling is quantized so helper-level float noise
    between the two stacks cannot flip it, while a CHOREOGRAPHY difference
    (different obs at the same call index) still diverges the run."""
    px = np.asarray(pixel_values, np.float32)
    m = float(np.floor(px.mean() * 100.0) / 100.0)
    rs = np.random.RandomState(10_000 + call_idx)
    chunk = rs.uniform(-0.8, 0.8, (chunk_len, 7)).astype(np.float32)
    chunk[:, :6] += (0.1 * np.sin(np.arange(6) + m * 7.0)).astype(np.float32)
    chunk[:, 6] = np.clip(chunk[:, 6], -1.0, 1.0)
    return chunk


class SharedProcessor:
    """Stands in for BOTH processors: tokenizes the prompt by hash and
    scales the (already preprocessed) image to [0, 1] CHW."""

    def __init__(self, torch_tensors: bool):
        self.torch_tensors = torch_tensors

    def __call__(self, prompt, image, return_tensors=None):
        ids = np.frombuffer(
            (prompt * 4).encode()[:64].ljust(64), np.uint8
        ).astype(np.int32)[None]
        px = np.asarray(image, np.float32)
        if px.ndim == 3 and px.shape[-1] == 3:
            px = np.moveaxis(px, -1, 0)
        px = (px / 255.0)[None]
        if self.torch_tensors:
            return {
                "input_ids": torch.as_tensor(ids),
                "pixel_values": torch.as_tensor(px),
            }
        return {"input_ids": ids, "pixel_values": px}


class _RecordingEnv(FakeSimplerEnv):
    def __init__(self, task, sink):
        super().__init__(task)
        self._sink = sink

    def step(self, action):
        self._sink.append(np.array(action, np.float64, copy=True))
        return super().step(action)


# -- reference side -----------------------------------------------------------


class RefFakeVLA:
    """Duck-typed AutoModelForVision2Seq: predict_action returns the shared
    chunk; optionally rejects OFT kwargs once like older remote code."""

    def __init__(self, chunk_len: int, reject_oft_kwargs: bool):
        self.norm_stats = json.loads(json.dumps(NORM_STATS))
        self.chunk_len = chunk_len
        self.reject_oft_kwargs = reject_oft_kwargs
        self.calls = 0

    def to(self, *a, **k):
        return self

    def eval(self):
        return self

    def get_action_stats(self, key):
        return self.norm_stats[key]["action"]

    def predict_action(self, input_ids=None, pixel_values=None, **kw):
        if self.reject_oft_kwargs and any(
            k in kw for k in ("action_head", "proprio", "proprio_projector")
        ):
            raise ValueError(
                "The following `model_kwargs` are not used by the model: "
                "['action_head']"
            )
        chunk = shared_chunk(
            self.calls, pixel_values.detach().cpu().float().numpy(),
            self.chunk_len)
        self.calls += 1
        return torch.as_tensor(chunk)


def _run_reference(tmp_path, monkeypatch, *, argv_extra, chunk_len,
                   reject_oft_kwargs=False, fake_oft_head=False):
    log_dir = tmp_path / "ref"
    sink: list = []
    model = RefFakeVLA(chunk_len, reject_oft_kwargs)

    real_device = torch.device
    monkeypatch.setattr(torch, "device", lambda *a, **k: real_device("cpu"))
    monkeypatch.setattr(torch.cuda, "is_available", lambda: True)
    # keep ensure_open_pi_zero_on_path real (the loop's action bridge imports
    # src.utils.geometry lazily); only the cwd side effect is neutralized
    monkeypatch.setattr(RH.os, "chdir", lambda p: None)
    monkeypatch.setattr(RH, "_set_cuda_fastpaths", lambda: None)
    monkeypatch.setattr(
        RH, "_inject_dataset_statistics_into_norm_stats", lambda m, mid: None)
    # fake model ids must not hit the HF hub (zero-egress environment; the
    # retry loop burns minutes before failing)
    monkeypatch.setattr(RH, "_load_dataset_stats", lambda mid: {})
    monkeypatch.setattr(RH, "_infer_center_crop_default", lambda mid: False)
    monkeypatch.setattr(RH, "_maybe_load_lora_adapter",
                        lambda m, mid, device: m)
    monkeypatch.setattr(RH, "_infer_resize_size_from_model",
                        lambda *a, **k: 224)

    class _AutoModel:
        @staticmethod
        def from_pretrained(*a, **k):
            return model

    class _AutoProc:
        @staticmethod
        def from_pretrained(*a, **k):
            return SharedProcessor(torch_tensors=True)

    monkeypatch.setattr(RH, "AutoModelForVision2Seq", _AutoModel)
    monkeypatch.setattr(RH, "AutoProcessor", _AutoProc)
    if fake_oft_head:
        head = RH._OFTActionHead(in_dim=8, hidden_dim=8, out_dim=7, n_blocks=1)
        monkeypatch.setattr(RH, "_load_oft_aux_modules",
                            lambda mid, device, dtype: (head, None))
    else:
        monkeypatch.setattr(RH, "_load_oft_aux_modules",
                            lambda mid, device, dtype: (None, None))

    monkeypatch.setattr(
        sys.modules["simpler_env"], "make",
        lambda task: _RecordingEnv(task, sink), raising=False)

    argv = ["eval_hf_vla_simpler.py", "--model-id", "fake-vla",
            "--preset", "baseline", "--log-dir", str(log_dir)] + argv_extra
    monkeypatch.setattr(sys, "argv", argv)
    RH.main()
    summary = json.loads((log_dir / "summary.json").read_text())
    run_log = (log_dir / "run.log").read_text()
    return sink, summary, run_log


# -- this repo's side ---------------------------------------------------------


class MyFakeVLA:
    def __init__(self, chunk_len: int):
        self.chunk_len = chunk_len
        self.calls = 0
        self.spec = types.SimpleNamespace(
            siglip=types.SimpleNamespace(image_size=224), action_dim=7)

    # referenced by main() for the jit boundary; never traced (predict_action
    # below ignores the _jitted_tokens kwarg)
    def predict_action_tokens(self, *a, **k):  # pragma: no cover
        raise AssertionError("fake is driven through predict_action")

    def predict_action(self, params, input_ids, pixel_values, **kw):
        chunk = shared_chunk(self.calls, pixel_values, self.chunk_len)
        self.calls += 1
        return chunk


def _run_mine(tmp_path, monkeypatch, *, argv_extra, chunk_len):
    log_dir = tmp_path / "mine"
    sink: list = []
    model = MyFakeVLA(chunk_len)

    def fake_build(args, dtype):
        return (model, None, SharedProcessor(torch_tensors=False),
                json.loads(json.dumps(NORM_STATS)), {}, False, None)

    monkeypatch.setattr(MY, "_build_model", fake_build)

    import blurr_tpu.agent.fake_env as fake_env_mod

    monkeypatch.setattr(fake_env_mod, "make_env",
                        lambda task: _RecordingEnv(task, sink))

    argv = ["eval_hf_vla_simpler.py", "--model-id", "fake-vla",
            "--preset", "baseline", "--log-dir", str(log_dir)] + argv_extra
    monkeypatch.setattr(sys, "argv", argv)
    MY.main()
    summary = json.loads((log_dir / "summary.json").read_text())
    run_log = (log_dir / "run.log").read_text()
    return sink, summary, run_log


# The fields the two stacks intentionally report differently: mine records
# its TPU preset facts (jit always on, jax dtype strings, the quantization
# tier the reference does not have).
SUMMARY_EXCLUDE = {"dtype", "torch_compile", "quantization"}


def _assert_summaries_equal(mine, ref):
    ref_cmp = {k: v for k, v in ref.items() if k not in SUMMARY_EXCLUDE}
    mine_cmp = {k: v for k, v in mine.items() if k not in SUMMARY_EXCLUDE}
    assert mine_cmp == ref_cmp


def _assert_trajectories_equal(mine, ref):
    assert len(mine) == len(ref) > 0
    for t, (a, b) in enumerate(zip(ref, mine)):
        np.testing.assert_allclose(
            b, a, atol=1e-5 * (1 + 0.5 * t), rtol=1e-4,
            err_msg=f"env action diverged at step {t}")


def _both(tmp_path, monkeypatch, argv_extra, chunk_len, **ref_kw):
    ref_sink, ref_sum, ref_log = _run_reference(
        tmp_path, monkeypatch, argv_extra=argv_extra, chunk_len=chunk_len,
        **ref_kw)
    my_sink, my_sum, my_log = _run_mine(
        tmp_path, monkeypatch, argv_extra=argv_extra, chunk_len=chunk_len)
    return (ref_sink, ref_sum, ref_log), (my_sink, my_sum, my_log)


# -- tests --------------------------------------------------------------------


def test_hf_loop_episode_id_mode_two_tasks(tmp_path, monkeypatch):
    """episode_id reset mode over TWO tasks x 3 episodes: whole trajectories,
    per-task success dict, avg_success, summary.json (ref :816-819,
    :999-1025)."""
    # max_steps 14 > the fake env's 12-step truncation so episodes end on
    # `truncated` and the success path (episode_id % 3 == 0) is exercised
    argv = ["--task", "fake_widowx_carrot_on_plate", "fake_widowx_spoon",
            "--n-eval-episode", "3", "--initial-states", "episode_id",
            "--max-steps", "14", "--num-steps-wait", "0"]
    (ref_a, ref_s, _), (my_a, my_s, _) = _both(
        tmp_path, monkeypatch, argv, chunk_len=2)
    _assert_trajectories_equal(my_a, ref_a)
    _assert_summaries_equal(my_s, ref_s)
    # FakeSimplerEnv succeeds iff episode_id % 3 == 0 and truncated
    assert ref_s["per_task_success"] == {
        "fake_widowx_carrot_on_plate": pytest.approx(1 / 3),
        "fake_widowx_spoon": pytest.approx(1 / 3),
    }


@pytest.mark.parametrize("mode", ["eval", "train"])
def test_hf_loop_seeded_reset_modes(tmp_path, monkeypatch, mode):
    """eval/train modes reset via env.reset(seed=base+episode) with base
    1000/0 (ref :820-822) — a wrong base or a fall-through to episode_id
    options changes the env's state stream and diverges trajectories."""
    argv = ["--task", "fake_widowx_carrot_on_plate", "--n-eval-episode", "2",
            "--initial-states", mode, "--max-steps", "8",
            "--num-steps-wait", "0"]
    (ref_a, ref_s, _), (my_a, my_s, _) = _both(
        tmp_path, monkeypatch, argv, chunk_len=1)
    _assert_trajectories_equal(my_a, ref_a)
    _assert_summaries_equal(my_s, ref_s)
    assert ref_s["initial_states"] == mode


def test_hf_loop_wait_steps_and_midchunk_truncation(tmp_path, monkeypatch):
    """num_steps_wait dummy-action stepping (ref :837-841) + the sub-step
    loop breaking mid-chunk at the max_steps budget (ref :963-965): budget
    7 (+2 wait) with chunk_len 3 forces a 1-action partial final chunk."""
    argv = ["--task", "fake_widowx_carrot_on_plate", "--n-eval-episode", "2",
            "--initial-states", "episode_id", "--max-steps", "7",
            "--num-steps-wait", "2"]
    (ref_a, ref_s, _), (my_a, my_s, _) = _both(
        tmp_path, monkeypatch, argv, chunk_len=3)
    _assert_trajectories_equal(my_a, ref_a)
    _assert_summaries_equal(my_s, ref_s)
    # first actions of each episode are the dummy wait action
    dummy = np.array([0, 0, 0, 0, 0, 0, -1], np.float64)
    np.testing.assert_array_equal(ref_a[0], dummy)
    np.testing.assert_array_equal(my_a[0], dummy)


def test_hf_loop_oft_kwargs_fallback(tmp_path, monkeypatch):
    """Older-remote-code recovery (ref :935-952): the model rejects OFT
    kwargs with the transformers 'model_kwargs are not used' ValueError; the
    reference loop must drop them, warn once, and continue — landing on the
    SAME trajectory as this repo's plain path (which never sends OFT kwargs
    for a non-OFT model)."""
    argv = ["--task", "fake_widowx_carrot_on_plate", "--n-eval-episode", "2",
            "--initial-states", "episode_id", "--max-steps", "6",
            "--num-steps-wait", "0", "--use-oft-action-head", "on"]
    (ref_a, ref_s, ref_log), (my_a, my_s, _) = _both(
        tmp_path, monkeypatch, argv, chunk_len=2,
        reject_oft_kwargs=True, fake_oft_head=True)
    assert "disabling OFT extras" in ref_log
    _assert_trajectories_equal(my_a, ref_a)
    ref_cmp = {k: v for k, v in ref_s.items()
               if k not in SUMMARY_EXCLUDE | {"use_oft_action_head"}}
    my_cmp = {k: v for k, v in my_s.items()
              if k not in SUMMARY_EXCLUDE | {"use_oft_action_head"}}
    assert my_cmp == ref_cmp
