"""MAIN-LOOP differential: the reference's eval_prismatic_vla_simpler.py
episode loop (reference scripts/eval_prismatic_vla_simpler.py:287-357)
driven end-to-end vs this repo's scripts/eval_prismatic_vla_simpler.py.

Round-3 verdict Next #3 (second half). Both mains run with the prismatic
VLA swapped for a SHARED deterministic fake policy whose single-step action
is a byte-identical function of (call index, raw env image): the reference's
``_extract_rgb`` hardwires the octo128 pipeline (JPEG roundtrip +
128 -> 224 LANCZOS) and this repo's CLI applies the byte-equal
``octo_style_preprocess`` in its default mode, so both policies see the
same 224px uint8 pixels and the loops stay CLOSED — any
choreography difference (reset seeding, wait-step budget, step accounting)
diverges the trajectories.

Covered: initial-states modes (ref :303-308), num_steps_wait settle steps
(:324-327), single-action stepping (:329-343), dataset_statistics.json
discovery from the checkpoint run dir (:250-252), unnorm-key inference,
success accounting, and summary.json equality on shared keys (:360-372).
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

RP = load_reference_script("eval_prismatic_vla_simpler")

import torch  # noqa: E402

REPO_ROOT = Path(__file__).resolve().parents[1]

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
    name = "blurr_my_script_eval_prismatic_vla_simpler"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, REPO_ROOT / "scripts" / "eval_prismatic_vla_simpler.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


MYP = _load_my_script()

ACTION_STATS = {
    "q01": [-0.1, -0.09, -0.12, -0.3, -0.28, -0.26, 0.0],
    "q99": [0.11, 0.1, 0.13, 0.31, 0.27, 0.25, 1.0],
    "mask": [True] * 6 + [False],
}


def shared_action(call_idx: int, raw_image: np.ndarray) -> np.ndarray:
    """[7] normalized action from (call index, RAW uint8 env frame) — both
    sides receive the identical frame, so the coupling is byte-exact."""
    m = int(np.asarray(raw_image, np.uint8).sum() % 97)
    rs = np.random.RandomState(20_000 + call_idx * 131 + m)
    a = rs.uniform(-0.9, 0.9, 7).astype(np.float32)
    a[6] = np.clip(a[6], -1.0, 1.0)
    return a


class _RecordingEnv(FakeSimplerEnv):
    def __init__(self, task, sink):
        super().__init__(task)
        self._sink = sink

    def step(self, action):
        self._sink.append(np.array(action, np.float64, copy=True))
        return super().step(action)


@pytest.fixture()
def checkpoint_dir(tmp_path):
    """run_dir/checkpoints/step100.pt + run_dir/dataset_statistics.json —
    the layout BOTH loaders walk (ref :245-252, mine :158-167)."""
    run_dir = tmp_path / "run"
    (run_dir / "checkpoints").mkdir(parents=True)
    pt = run_dir / "checkpoints" / "step100.pt"
    torch.save({"model": {}}, pt)
    (run_dir / "dataset_statistics.json").write_text(
        json.dumps({"bridge_dataset": {"action": ACTION_STATS}}))
    return pt


# -- reference side -----------------------------------------------------------


class RefFakePrismaticVLA:
    def __init__(self):
        self.norm_stats = {"bridge_dataset": {
            "action": json.loads(json.dumps(ACTION_STATS))}}
        self.calls = 0
        self.vision_backbone = types.SimpleNamespace(
            half_precision_dtype=torch.float32,
            to=lambda *a, **k: None)
        self.llm_backbone = types.SimpleNamespace(
            half_precision_dtype=torch.float32,
            to=lambda *a, **k: None)

    def to(self, *a, **k):
        return self

    def eval(self):
        return self

    def predict_action(self, image, prompt, unnorm_key=None, do_sample=False):
        a = shared_action(self.calls, np.asarray(image))
        self.calls += 1
        return a


def _run_reference(tmp_path, monkeypatch, *, ckpt, argv_extra):
    log_dir = tmp_path / "ref"
    sink: list = []
    vla = RefFakePrismaticVLA()

    real_device = torch.device
    monkeypatch.setattr(torch, "device", lambda *a, **k: real_device("cpu"))
    monkeypatch.setattr(torch.cuda, "is_available", lambda: True)
    monkeypatch.setattr(RP.os, "chdir", lambda p: None)
    monkeypatch.setattr(RP, "_set_cuda_fastpaths", lambda: None)

    mini_root = tmp_path / "openvla-mini"
    mini_root.mkdir(exist_ok=True)

    # the reference imports `from prismatic.models.load import load_vla`
    # inside main; route it to the fake through sys.modules
    loadmod = types.ModuleType("prismatic.models.load")
    loadmod.load_vla = lambda path, hf_token=None, load_for_training=False: vla
    prisma = sys.modules.get("prismatic") or types.ModuleType("prismatic")
    models = getattr(prisma, "models", None) or types.ModuleType(
        "prismatic.models")
    monkeypatch.setitem(sys.modules, "prismatic", prisma)
    monkeypatch.setitem(sys.modules, "prismatic.models", models)
    monkeypatch.setitem(sys.modules, "prismatic.models.load", loadmod)
    monkeypatch.setattr(prisma, "models", models, raising=False)
    monkeypatch.setattr(models, "load", loadmod, raising=False)

    monkeypatch.setattr(
        sys.modules["simpler_env"], "make",
        lambda task: _RecordingEnv(task, sink), raising=False)

    argv = ["eval_prismatic_vla_simpler.py", "--checkpoint", str(ckpt),
            "--openvla-mini-root", str(mini_root),
            "--log-dir", str(log_dir)] + argv_extra
    monkeypatch.setattr(sys, "argv", argv)
    RP.main()
    summary = json.loads((log_dir / "summary.json").read_text())
    return sink, summary


# -- this repo's side ---------------------------------------------------------


class MyFakePrismaticVLA:
    """Duck-typed OpenVLA: constructed by main() as OpenVLA(spec, norm_stats)
    via the monkeypatched symbol; predict_action returns the shared action."""

    def __init__(self, spec, norm_stats=None):
        self.spec = spec
        self.norm_stats = norm_stats or {}
        self.calls = 0

    def init_params(self, rng, dtype):
        return {}

    def predict_action_tokens(self, *a, **k):  # pragma: no cover
        raise AssertionError("fake is driven through predict_action")

    def predict_action(self, params, input_ids, pixel_values, **kw):
        # pixel_values comes from the shared raw-image processor: recover
        # the uint8 frame exactly (round-trip through /255 is exact for
        # uint8 values in float32)
        raw = np.moveaxis(np.asarray(pixel_values)[0], 0, -1) * 255.0
        a = shared_action(self.calls, np.round(raw).astype(np.uint8))
        self.calls += 1
        return a


class MySharedProcessor:
    """OpenVLAProcessor stand-in: keeps the raw pixels (no resize) so the
    policy coupling is byte-identical to the reference's raw PIL frame."""

    def __init__(self, tokenizer, image_size=224, fused=False):
        pass

    def __call__(self, prompt, image):
        ids = np.frombuffer(
            (prompt * 4).encode()[:64].ljust(64), np.uint8
        ).astype(np.int32)[None]
        px = np.moveaxis(np.asarray(image, np.float32), -1, 0)[None] / 255.0
        return {"input_ids": ids, "pixel_values": px}


def _run_mine(tmp_path, monkeypatch, *, ckpt, argv_extra):
    log_dir = tmp_path / "mine"
    sink: list = []

    import blurr_tpu.agent.fake_env as fake_env_mod
    import blurr_tpu.models.openvla.model as model_mod
    import blurr_tpu.models.openvla.processing as proc_mod

    monkeypatch.setattr(model_mod, "OpenVLA", MyFakePrismaticVLA)
    monkeypatch.setattr(proc_mod, "OpenVLAProcessor", MySharedProcessor)
    monkeypatch.setattr(fake_env_mod, "make_env",
                        lambda task: _RecordingEnv(task, sink))

    # default --image-preproc octo128 matches the reference's hardwired
    # _extract_rgb pipeline (JPEG roundtrip + 128 -> 224 LANCZOS, ref
    # :130-157); the shared policy then sees byte-identical 224px frames
    argv = ["eval_prismatic_vla_simpler.py", "--checkpoint", str(ckpt),
            "--log-dir", str(log_dir)] + argv_extra
    monkeypatch.setattr(sys, "argv", argv)
    MYP.main()
    summary = json.loads((log_dir / "summary.json").read_text())
    return sink, summary


SUMMARY_EXCLUDE = {"dtype"}  # mine records the jax preset dtype


def _both(tmp_path, monkeypatch, checkpoint, argv_extra):
    ref_a, ref_s = _run_reference(
        tmp_path, monkeypatch, ckpt=checkpoint, argv_extra=argv_extra)
    my_a, my_s = _run_mine(
        tmp_path, monkeypatch, ckpt=checkpoint, argv_extra=argv_extra)
    assert len(my_a) == len(ref_a) > 0
    for t, (a, b) in enumerate(zip(ref_a, my_a)):
        np.testing.assert_allclose(
            b, a, atol=1e-5 * (1 + 0.5 * t), rtol=1e-4,
            err_msg=f"env action diverged at step {t}")
    ref_cmp = {k: v for k, v in ref_s.items() if k not in SUMMARY_EXCLUDE}
    my_cmp = {k: v for k, v in my_s.items() if k not in SUMMARY_EXCLUDE}
    assert my_cmp == ref_cmp
    return ref_s


def test_prismatic_loop_episode_id_mode(tmp_path, monkeypatch, checkpoint_dir):
    """episode_id resets, 3 episodes past env truncation: trajectories,
    success accounting (episode_id % 3), unnorm-key inference from the run
    dir's dataset_statistics.json, summary.json."""
    s = _both(tmp_path, monkeypatch, checkpoint_dir,
              ["--task", "fake_widowx_carrot_on_plate",
               "--n-eval-episode", "3", "--initial-states", "episode_id",
               "--max-steps", "14"])
    assert s["unnorm_key"] == "bridge_dataset"
    assert s["per_task_success"] == {
        "fake_widowx_carrot_on_plate": pytest.approx(1 / 3)}


@pytest.mark.parametrize("mode", ["eval", "train"])
def test_prismatic_loop_seeded_reset_modes(tmp_path, monkeypatch,
                                           checkpoint_dir, mode):
    s = _both(tmp_path, monkeypatch, checkpoint_dir,
              ["--task", "fake_widowx_carrot_on_plate",
               "--n-eval-episode", "2", "--initial-states", mode,
               "--max-steps", "7"])
    assert s["initial_states"] == mode


def test_prismatic_loop_wait_steps(tmp_path, monkeypatch, checkpoint_dir):
    """num_steps_wait settle stepping (ref :324-327): the first actions of
    each episode are the dummy [0,...,-1]."""
    ref_a, ref_s = _run_reference(
        tmp_path, monkeypatch, ckpt=checkpoint_dir,
        argv_extra=["--task", "fake_widowx_carrot_on_plate",
                    "--n-eval-episode", "1", "--initial-states", "episode_id",
                    "--max-steps", "5", "--num-steps-wait", "2"])
    my_a, my_s = _run_mine(
        tmp_path, monkeypatch, ckpt=checkpoint_dir,
        argv_extra=["--task", "fake_widowx_carrot_on_plate",
                    "--n-eval-episode", "1", "--initial-states", "episode_id",
                    "--max-steps", "5", "--num-steps-wait", "2"])
    dummy = np.array([0, 0, 0, 0, 0, 0, -1], np.float64)
    for a in (ref_a, my_a):
        np.testing.assert_array_equal(a[0], dummy)
        np.testing.assert_array_equal(a[1], dummy)
    assert len(ref_a) == len(my_a) == 7  # 2 wait + 5 policy steps
    for t, (a, b) in enumerate(zip(ref_a, my_a)):
        np.testing.assert_allclose(b, a, atol=1e-5 * (1 + 0.5 * t), rtol=1e-4)
    assert my_s["num_steps_wait"] == ref_s["num_steps_wait"] == 2
