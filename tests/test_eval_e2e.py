"""Closed-loop e2e: EvalAgent + FakeSimplerEnv + BridgeSimplerAdapter on a
tiny random-init model, plus the log-format contract the collectors rely on."""

import logging
import re

import numpy as np
import pytest

from blurr_tpu.config.core import Config
from tests.util import tiny_pi0_cfg


def eval_cfg(tmp_path, n_episodes=2):
    cfg = tiny_pi0_cfg()
    cfg.update(
        {
            "log_dir": str(tmp_path),
            "n_eval_episode": n_episodes,
            "n_video": 0,
            "seed": 42,
            "act_steps": 4,
            "use_bf16": False,
            "use_prefix_kv_cache": True,
            "checkpoint_path": None,
            "env": Config.wrap(
                {
                    "task": "fake_widowx_carrot_on_plate",
                    "adapter": {
                        "_target_": "blurr_tpu.agent.env_adapter.simpler.BridgeSimplerAdapter",
                        "dataset_statistics_path": "config/bridge_statistics.json",
                        "pretrained_model_path": "(stub)",
                        "tokenizer_padding": "max_length",
                        "max_seq_len": cfg.max_seq_len,
                        "num_image_tokens": cfg.vision.config.num_image_tokens,
                        "image_size": [
                            cfg.vision.config.image_size,
                            cfg.vision.config.image_size,
                        ],
                    },
                }
            ),
        }
    )
    return cfg


def test_eval_agent_closed_loop(tmp_path, caplog):
    from blurr_tpu.agent.eval_agent import EvalAgent

    cfg = eval_cfg(tmp_path)
    # image_token_index must match the stub tokenizer's id; vocab must
    # exceed it so the embedding gather stays in-bounds
    cfg.image_token_index = 257152
    cfg.vocab_size = 258000
    with caplog.at_level(logging.INFO):
        agent = EvalAgent(cfg)
        rate = agent.run()
    assert 0.0 <= rate <= 1.0
    text = caplog.text
    # collector contract (collect_bridge_eval_results.py regexes)
    assert re.search(r"Success rate:\s*([0-9.]+)", text)
    assert re.search(r"Number of episodes:\s*([0-9]+)", text)


def test_collector_parses_run_log(tmp_path):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    from collect_bridge_eval_results import collect

    run_dir = tmp_path / "blurr_42" / "widowx_carrot_on_plate_2026-01-01_00-00-00"
    run_dir.mkdir(parents=True)
    (run_dir / "run.log").write_text(
        "2026 | INFO | agent | ============ Evaluation Summary ============\n"
        "2026 | INFO | agent | Number of episodes: 10\n"
        "2026 | INFO | agent | Success rate: 0.7\n"
    )
    rows = collect(tmp_path)
    assert rows == [
        {
            "model": "blurr_42",
            "task": "widowx_carrot_on_plate",
            "success_rate": 0.7,
            "episodes": 10,
            "run_dir": str(run_dir),
        }
    ]


def test_bridge_adapter_normalization_roundtrip():
    """denormalize(normalize(x)) == x within the p01/p99 bounds."""
    from blurr_tpu.agent.env_adapter.base import BaseEnvAdapter

    a = BaseEnvAdapter()
    rng = np.random.RandomState(0)
    lo, hi = -np.ones(6), np.ones(6) * 2
    x = rng.uniform(-0.9, 1.9, (5, 6))
    normed = a.normalize_bound(x, lo, hi)
    back = a.denormalize_bound(normed, lo, hi)
    np.testing.assert_allclose(back, x, atol=1e-6)


def test_edr_sticky_gripper_state_machine():
    from blurr_tpu.agent.env_adapter.simpler import EDRSimplerAdapter

    adapter = EDRSimplerAdapter.__new__(EDRSimplerAdapter)
    adapter.sticky_gripper_num_repeat = 3
    adapter.reset = lambda: None
    adapter.sticky_action_is_on = False
    adapter.gripper_action_repeat = 0
    adapter.sticky_gripper_action = 0.0

    # closing command (action near 1 -> relative -1) triggers sticky
    out1 = adapter.postprocess_gripper(1.0)
    assert out1 == -1.0 and adapter.sticky_action_is_on
    # subsequent opposite command still returns the sticky action
    out2 = adapter.postprocess_gripper(0.0)
    assert out2 == -1.0
    out3 = adapter.postprocess_gripper(0.0)
    assert out3 == -1.0 and not adapter.sticky_action_is_on  # repeat cap hit


def test_eval_reproducible_across_runs(tmp_path):
    """Same seed -> identical action trajectories (the reference relies on
    global torch.manual_seed; here the PRNG key is threaded explicitly)."""
    from blurr_tpu.agent.eval_agent import EvalAgent

    def run_once(subdir):
        cfg = eval_cfg(tmp_path / subdir, n_episodes=1)
        cfg.image_token_index = 257152
        cfg.vocab_size = 258000
        agent = EvalAgent(cfg)
        seen = []
        orig = agent.env_adapter.postprocess

        def spy(actions):
            seen.append(np.array(actions, copy=True))
            return orig(actions)

        agent.env_adapter.postprocess = spy
        agent.run()
        return np.concatenate(seen)

    a = run_once("r1")
    b = run_once("r2")
    np.testing.assert_array_equal(a, b)


def test_fake_env_action_coupled_dynamics():
    """Obs are a deterministic function of the integrated action history:
    identical action streams reproduce identical obs; a perturbed action
    changes every subsequent observation (closed-loop feedback)."""
    from blurr_tpu.agent.fake_env import FakeSimplerEnv

    def rollout(perturb: float):
        env = FakeSimplerEnv(image_hw=(60, 80))
        obs, _ = env.reset(options={"obj_init_options": {"episode_id": 3}}, seed=7)
        frames, eefs = [obs["image"]], [obs["agent"]["eef_pos"]]
        for t in range(4):
            a = np.full(7, 0.1)
            if t == 1:
                a = a + perturb
            obs, _, _, _, _ = env.step(a)
            frames.append(obs["image"])
            eefs.append(obs["agent"]["eef_pos"])
        return frames, eefs

    f0, e0 = rollout(0.0)
    f1, e1 = rollout(0.0)
    for a, b in zip(f0, f1):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(e0, e1):
        np.testing.assert_array_equal(a, b)

    f2, e2 = rollout(0.05)
    # pre-perturbation obs identical; post-perturbation obs diverge and the
    # divergence persists (the env integrates, not resamples)
    np.testing.assert_array_equal(f0[1], f2[1])
    for t in (2, 3, 4):
        assert not np.array_equal(e0[t], e2[t])
        assert not np.array_equal(f0[t], f2[t])


def test_async_pipeline_closed_loop(tmp_path, caplog):
    """Async-pipelined control: next chunk dispatched mid-chunk and fetched
    after env stepping. Episodes complete, success accounting works, and the
    pipeline log line appears (act_steps=2 on the tiny config)."""
    cfg = eval_cfg(tmp_path)
    cfg.image_token_index = 257152
    cfg.vocab_size = 258000
    cfg["act_steps"] = 2
    cfg["async_pipeline"] = True
    from blurr_tpu.agent.eval_agent import EvalAgent

    with caplog.at_level(logging.INFO):
        agent = EvalAgent(cfg)
        rate = agent.run()
    assert 0.0 <= rate <= 1.0
    assert "Async pipeline: residual fetch wait" in caplog.text


def _instrument(agent):
    """Record the interleaving of device dispatch/fetch and env stepping."""
    events = []
    orig_dispatch, orig_fetch = agent._dispatch, agent._fetch
    agent._dispatch = lambda inputs: (events.append("dispatch"), orig_dispatch(inputs))[1]
    agent._fetch = lambda p: (events.append("fetch"), orig_fetch(p))[1]
    orig_step = agent.env.step

    def step(a):
        events.append("env_step")
        return orig_step(a)

    agent.env.step = step
    return events


def test_async_pipeline_overlap_ordering(tmp_path):
    """Pins the overlap choreography (docs/results/async_pipeline_v5e.csv is
    the measured counterpart): the prefetch dispatch is issued MID-CHUNK
    (immediately after an env step) and its fetch happens only after at least
    one more env step ran — i.e. the device computes while the env steps."""
    from blurr_tpu.agent.eval_agent import EvalAgent

    cfg = eval_cfg(tmp_path, n_episodes=1)
    cfg.image_token_index = 257152
    cfg.vocab_size = 258000
    cfg["act_steps"] = 2
    cfg["async_pipeline"] = True
    agent = EvalAgent(cfg)
    events = _instrument(agent)
    agent.run()

    # the first inference is synchronous: dispatch immediately fetched
    assert events[0:2] == ["dispatch", "fetch"]
    for i in range(2, len(events)):
        if events[i] != "dispatch":
            continue
        # prefetch is issued right after the chunk's first env step
        assert events[i - 1] == "env_step", events[: i + 1]
        # ... and fetched only after >=1 further env step (or discarded at
        # episode end: the final prefetch has no fetch)
        tail = events[i + 1:]
        if "fetch" in tail:
            k = tail.index("fetch")
            assert "env_step" in tail[:k], events[i: i + k + 2]


def test_sync_mode_has_no_overlap(tmp_path):
    """Control: without async_pipeline every dispatch is immediately followed
    by its fetch — no env step in between."""
    from blurr_tpu.agent.eval_agent import EvalAgent

    cfg = eval_cfg(tmp_path, n_episodes=1)
    cfg.image_token_index = 257152
    cfg.vocab_size = 258000
    cfg["act_steps"] = 2
    agent = EvalAgent(cfg)
    events = _instrument(agent)
    agent.run()
    for i, e in enumerate(events):
        if e == "dispatch":
            assert events[i + 1] == "fetch", events[i: i + 2]


def test_async_pipeline_requires_act_steps(tmp_path):
    cfg = eval_cfg(tmp_path)
    cfg.image_token_index = 257152
    cfg.vocab_size = 258000
    cfg["act_steps"] = 1
    cfg["async_pipeline"] = True
    from blurr_tpu.agent.eval_agent import EvalAgent

    agent = EvalAgent(cfg)
    assert agent.async_pipeline is False  # auto-disabled with a warning


def test_eval_hf_vla_cli_snapshot_dir_e2e(tmp_path, monkeypatch, capsys):
    """Full eval_hf_vla_simpler CLI against a SYNTHETIC HF snapshot dir:
    exercises the directory branch end-to-end — blurr_spec.json sidecar,
    safetensors bridge, dataset-statistics injection, fake env loop,
    summary.json contract."""
    import dataclasses
    import json
    import sys

    from blurr_tpu.models.openvla.model import OpenVLASpec
    from tests.test_openvla_checkpoint import synth_hf_snapshot

    spec = OpenVLASpec.tiny()
    snap = tmp_path / "snapshot"
    snap.mkdir()
    synth_hf_snapshot(snap, spec)

    def vit_json(v):
        return {k: getattr(v, k) for k in (
            "hidden_size", "intermediate_size", "num_layers", "num_heads",
            "image_size", "cls_token", "reg_tokens", "layerscale",
            "feature_layer")}

    (snap / "blurr_spec.json").write_text(json.dumps({
        "llama": dataclasses.asdict(spec.llama),
        "dinov2": vit_json(spec.dinov2),
        "siglip": vit_json(spec.siglip),
        "use_fused_vision": True,
    }))

    import scripts.eval_hf_vla_simpler as cli

    log_dir = tmp_path / "run"
    argv = ["eval_hf_vla_simpler.py", "--model-id", str(snap),
            "--preset", "blurr", "--task", "fake_widowx_carrot_on_plate",
            "--n-eval-episode", "1", "--max-steps", "2",
            "--log-dir", str(log_dir)]
    monkeypatch.setattr(sys, "argv", argv)
    cli.main()
    run_log = (log_dir / "run.log").read_text()
    assert "Success rate:" in run_log
    summary = json.loads((log_dir / "summary.json").read_text())
    assert "avg_success" in summary and "per_task_success" in summary


def test_eval_hf_vla_cli_oft_snapshot_e2e(tmp_path, monkeypatch):
    """eval_hf_vla_simpler CLI with OFT aux checkpoints in the snapshot:
    parallel-decoding head + proprio projector load shape-driven (incl.
    chunk_len derived from the head's input width) and the closed loop
    completes."""
    import dataclasses
    import json
    import sys

    import torch

    from blurr_tpu.models.openvla.model import OpenVLASpec
    from tests.test_openvla_checkpoint import synth_hf_snapshot

    spec = OpenVLASpec.tiny()
    snap = tmp_path / "snapshot"
    snap.mkdir()
    synth_hf_snapshot(snap, spec)

    def vit_json(v):
        return {k: getattr(v, k) for k in (
            "hidden_size", "intermediate_size", "num_layers", "num_heads",
            "image_size", "cls_token", "reg_tokens", "layerscale",
            "feature_layer")}

    (snap / "blurr_spec.json").write_text(json.dumps({
        "llama": dataclasses.asdict(spec.llama),
        "dinov2": vit_json(spec.dinov2),
        "siglip": vit_json(spec.siglip),
        "use_fused_vision": True,
    }))

    # OFT aux files: chunk_len=2 head (in = 2 * action_dim * hidden)
    rng = np.random.RandomState(5)
    t = lambda *s: torch.tensor(rng.randn(*s).astype(np.float32) * 0.05)
    chunk_len, hidden = 2, spec.llama.hidden_size
    n_tok = chunk_len * spec.action_dim
    in_dim = n_tok * hidden
    head = {
        "module.model.layer_norm1.weight": t(in_dim),
        "module.model.layer_norm1.bias": t(in_dim),
        "module.model.fc1.weight": t(hidden, in_dim),
        "module.model.fc1.bias": t(hidden),
        "module.model.layer_norm2.weight": t(hidden),
        "module.model.layer_norm2.bias": t(hidden),
        "module.model.fc2.weight": t(n_tok, hidden),
        "module.model.fc2.bias": t(n_tok),
    }
    for i in range(2):
        head[f"module.model.mlp_resnet_blocks.{i}.ffn.0.weight"] = t(hidden)
        head[f"module.model.mlp_resnet_blocks.{i}.ffn.0.bias"] = t(hidden)
        head[f"module.model.mlp_resnet_blocks.{i}.ffn.1.weight"] = t(hidden, hidden)
        head[f"module.model.mlp_resnet_blocks.{i}.ffn.1.bias"] = t(hidden)
    torch.save(head, snap / "action_head--1000_checkpoint.pt")
    # proprio checkpoints use the "module." prefix (reference
    # eval_hf_vla_simpler.py:119-128), NOT "module.model."
    torch.save({
        "module.fc1.weight": t(hidden, 8),
        "module.fc1.bias": t(hidden),
        "module.fc2.weight": t(hidden, hidden),
        "module.fc2.bias": t(hidden),
    }, snap / "proprio_projector--1000_checkpoint.pt")

    import scripts.eval_hf_vla_simpler as cli

    log_dir = tmp_path / "run_oft"
    argv = ["eval_hf_vla_simpler.py", "--model-id", str(snap),
            "--preset", "blurr", "--task", "fake_widowx_carrot_on_plate",
            "--n-eval-episode", "1", "--max-steps", "2",
            "--log-dir", str(log_dir)]
    monkeypatch.setattr(sys, "argv", argv)
    cli.main()
    run_log = (log_dir / "run.log").read_text()
    assert "Success rate:" in run_log
    summary = json.loads((log_dir / "summary.json").read_text())
    assert summary.get("use_oft_action_head") in ("auto", "on", True)


def test_verify_checkpoint_cli(tmp_path, monkeypatch, capsys):
    """verify_checkpoint.py reports a clean match for a bridge-format .pt
    and flags an injected shape mismatch."""
    import sys

    import torch

    from blurr_tpu.config.core import load_yaml
    from blurr_tpu.paths import config_root
    from tests.test_checkpoint_bridge import synth_torch_state

    # build the synthetic state from the SAME config the CLI will check
    cfg = load_yaml(config_root() / "eval" / "bridge_tiny.yaml")
    state = synth_torch_state(cfg)
    path = tmp_path / "ok.pt"
    torch.save({"model": state}, path)

    import importlib

    cli = importlib.import_module("scripts.verify_checkpoint")

    # tiny config lives in the package config tree
    monkeypatch.setattr(sys, "argv", [
        "verify_checkpoint.py", "--checkpoint", str(path),
        "--kind", "pi0", "--config", "config/eval/bridge_tiny.yaml",
    ])
    try:
        rc = cli.main()
    except SystemExit as e:  # clean run may sys.exit(0)
        rc = e.code
    out = capsys.readouterr().out
    assert rc in (0, None)
    assert "matches the config" in out

    # corrupt one tensor's shape -> must be reported
    state_bad = dict(state)
    state_bad["action_decoder.weight"] = torch.zeros(3, 3)
    bad = tmp_path / "bad.pt"
    torch.save({"model": state_bad}, bad)
    monkeypatch.setattr(sys, "argv", [
        "verify_checkpoint.py", "--checkpoint", str(bad),
        "--kind", "pi0", "--config", "config/eval/bridge_tiny.yaml",
    ])
    with pytest.raises(SystemExit) as exc:
        cli.main()
    assert exc.value.code not in (0, None)
    assert "mismatch" in capsys.readouterr().out.lower()


def test_train_cli_save_then_resume(tmp_path, monkeypatch):
    """train_pi0_flow e2e: train 2 steps saving to orbax, then resume from
    the saved tree — the resumed run must start from the saved weights
    (different first-step loss than a fresh random init)."""
    import sys

    import scripts.train_pi0_flow as cli

    save_dir = tmp_path / "ckpt"
    base = ["train_pi0_flow.py", "--config", "config/eval/bridge_tiny.yaml",
            "--steps", "2", "--batch-size", "2"]
    monkeypatch.setattr(sys, "argv", base + ["--save-dir", str(save_dir)])
    cli.main()
    assert save_dir.exists()

    monkeypatch.setattr(
        sys, "argv", base + ["--resume", str(save_dir)]
    )
    cli.main()  # resume path loads the orbax tree without error


def test_train_cli_exact_state_resume(tmp_path, monkeypatch):
    """4 straight steps == (2 steps → save full state → resume → 2 more):
    the final params are bitwise identical — optimizer moments, the PRNG
    chain, the LR schedule position, and the batch stream all survive the
    interruption (--save-state / --resume-state / --stop-after)."""
    import sys

    import jax

    import scripts.train_pi0_flow as cli
    from blurr_tpu.models.pi0.checkpoint import restore_params

    base = ["train_pi0_flow.py", "--config", "config/eval/bridge_tiny.yaml",
            "--batch-size", "2", "--steps", "4"]
    d_full = tmp_path / "full"
    monkeypatch.setattr(sys, "argv", base + ["--save-dir", str(d_full)])
    cli.main()

    st = tmp_path / "state"
    monkeypatch.setattr(
        sys, "argv", base + ["--stop-after", "2", "--save-state", str(st)]
    )
    cli.main()

    d_res = tmp_path / "resumed"
    monkeypatch.setattr(
        sys, "argv",
        base + ["--resume-state", str(st), "--save-dir", str(d_res)],
    )
    cli.main()

    full = restore_params(str(d_full))
    res = restore_params(str(d_res))
    for a, b in zip(jax.tree.leaves(full), jax.tree.leaves(res)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_cli_periodic_checkpoint_crash_resume(tmp_path, monkeypatch):
    """--save-every writes step-numbered ASYNC checkpoints with retention
    mid-run; a crash-restart (--resume-state <same root>) resumes from the
    latest complete step and reproduces the uninterrupted 6-step run
    bitwise — the crash-safety layer the end-of-run --save-state cannot
    provide."""
    import os
    import sys

    import jax

    import scripts.train_pi0_flow as cli
    from blurr_tpu.models.pi0.checkpoint import restore_params

    base = ["train_pi0_flow.py", "--config", "config/eval/bridge_tiny.yaml",
            "--batch-size", "2", "--steps", "6"]
    d_full = tmp_path / "full"
    monkeypatch.setattr(sys, "argv", base + ["--save-dir", str(d_full)])
    cli.main()

    st = tmp_path / "mgr"
    monkeypatch.setattr(sys, "argv", base + [
        "--stop-after", "4", "--save-every", "2", "--keep-checkpoints", "2",
        "--save-state", str(st)])
    cli.main()  # "crash" at step 4
    kept = sorted(int(e) for e in os.listdir(st) if e.isdigit())
    assert kept == [2, 4]  # periodic saves landed; retention capped at 2

    d_res = tmp_path / "resumed"
    monkeypatch.setattr(sys, "argv", base + [
        "--resume-state", str(st), "--save-every", "2",
        "--keep-checkpoints", "2", "--save-state", str(st),
        "--save-dir", str(d_res)])
    cli.main()  # restart with the SAME command + --resume-state
    kept = sorted(int(e) for e in os.listdir(st) if e.isdigit())
    assert kept[-1] == 6 and len(kept) <= 2

    full = restore_params(str(d_full))
    res = restore_params(str(d_res))
    for a, b in zip(jax.tree.leaves(full), jax.tree.leaves(res)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_cli_pipeline_parallel(monkeypatch):
    """--pp 2 end-to-end: joint stacks sharded over a ('pipe',) mesh,
    microbatches rotating via ppermute — the CLI wiring on top of the
    step-level equality proven in tests/test_pipeline.py."""
    import sys

    import scripts.train_pi0_flow as cli

    monkeypatch.setattr(
        sys, "argv",
        ["train_pi0_flow.py", "--config", "config/eval/bridge_tiny_pp.yaml",
         "--steps", "2", "--batch-size", "2", "--pp", "2"],
    )
    cli.main()


def test_train_cli_grad_clip_and_metrics_csv(tmp_path, monkeypatch):
    """--grad-clip trains to a finite loss (the clip chain sits inside the
    parameter-group mask) and --metrics-csv appends the per-step metrics
    rows with the documented header."""
    import csv
    import sys

    import scripts.train_pi0_flow as cli

    mcsv = tmp_path / "metrics.csv"
    monkeypatch.setattr(
        sys, "argv",
        ["train_pi0_flow.py", "--config", "config/eval/bridge_tiny.yaml",
         "--steps", "3", "--batch-size", "2", "--log-every", "1",
         "--grad-clip", "1.0", "--metrics-csv", str(mcsv)],
    )
    cli.main()
    rows = list(csv.reader(mcsv.open()))
    assert rows[0] == ["step", "loss", "lr", "wall_s", "samples_per_s",
                       "val_loss"]
    assert len(rows) == 4  # header + 3 logged steps
    assert all(float(r[1]) == float(r[1]) for r in rows[1:])  # finite losses


def test_train_cli_ema_save(tmp_path, monkeypatch):
    """--ema-decay saves a loadable EMA tree next to the params; EMA differs
    from the final params (it lags the trajectory) but shares the pytree
    structure."""
    import sys

    import jax
    import numpy as np

    import scripts.train_pi0_flow as cli
    from blurr_tpu.models.pi0.checkpoint import restore_params

    save = tmp_path / "ck"
    monkeypatch.setattr(
        sys, "argv",
        ["train_pi0_flow.py", "--config", "config/eval/bridge_tiny.yaml",
         "--steps", "3", "--batch-size", "2", "--lr", "1e-2",
         "--ema-decay", "0.9", "--save-dir", str(save)],
    )
    cli.main()
    final = restore_params(str(save))
    ema = restore_params(str(save) + "_ema")
    assert jax.tree.structure(final) == jax.tree.structure(ema)
    diffs = [
        float(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max())
        for a, b in zip(jax.tree.leaves(final), jax.tree.leaves(ema))
    ]
    assert max(diffs) > 0  # the EMA lags the trained weights


def test_train_cli_lora_exact_state_resume(tmp_path, monkeypatch):
    """--lora-rank composes with exact resume: the adapter factor dicts ride
    the training-state checkpoint (params + moments + PRNG + stream), and
    an interrupted LoRA run continues bitwise-identically. The saved
    --save-dir tree is MERGED (plain weights, no adapter dicts)."""
    import sys

    import jax

    import scripts.train_pi0_flow as cli
    from blurr_tpu.models.pi0.checkpoint import restore_params
    from blurr_tpu.ops.lora import is_lora_dict

    base = ["train_pi0_flow.py", "--config", "config/eval/bridge_tiny.yaml",
            "--batch-size", "2", "--steps", "4", "--lora-rank", "2",
            "--train-scope", "action_expert"]
    d_full = tmp_path / "full"
    monkeypatch.setattr(sys, "argv", base + ["--save-dir", str(d_full)])
    cli.main()

    st = tmp_path / "state"
    monkeypatch.setattr(
        sys, "argv", base + ["--stop-after", "2", "--save-state", str(st)]
    )
    cli.main()

    d_res = tmp_path / "resumed"
    monkeypatch.setattr(
        sys, "argv",
        base + ["--resume-state", str(st), "--save-dir", str(d_res)],
    )
    cli.main()

    full = restore_params(str(d_full))
    res = restore_params(str(d_res))
    assert not any(
        is_lora_dict(x)
        for x in jax.tree.leaves(full, is_leaf=is_lora_dict)
    )
    for a, b in zip(jax.tree.leaves(full), jax.tree.leaves(res)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

def test_record_dataset_full_loop(tmp_path, monkeypatch):
    """collect -> train -> validate, all in-repo and all on ONE config:
    the eval CLI records its rollout as a sharded dataset (model-ready
    keys pass through the loader with no transform), train_pi0_flow
    fine-tunes on it, and eval_openloop scores the result."""
    import json
    import sys as _sys

    from blurr_tpu.data import ShardedDataset

    CFG = "config/eval/bridge_tiny.yaml"
    ds_dir = tmp_path / "rollout"

    import scripts.eval_pi0_simpler as eval_cli

    monkeypatch.setattr(_sys, "argv", [
        "eval_pi0_simpler.py", "--task", "widowx_spoon_on_towel",
        "--checkpoint", "random", "--config", CFG, "--preset", "blurr",
        "--n-eval-episode", "1", "--n-video", "0",
        "--log-dir", str(tmp_path / "log"),
        "--record-dataset", str(ds_dir),
    ])
    eval_cli.main()

    ds = ShardedDataset(ds_dir)
    assert ds.num_examples >= 2  # >= 2 control steps in one fake episode
    row = ds.gather_batch(np.arange(1))
    assert row["input_ids"].ndim == 2
    assert row["pixel_values"].shape[1] == 3
    assert row["actions"].ndim == 3
    assert np.isfinite(row["actions"]).all()

    import scripts.train_pi0_flow as train_cli

    n = ds.num_examples
    bs = str(min(2, n))
    monkeypatch.setattr(_sys, "argv", [
        "train_pi0_flow.py", "--config", CFG,
        "--steps", "2", "--batch-size", bs,
        "--data", str(ds_dir), "--save-dir", str(tmp_path / "ft"),
    ])
    train_cli.main()

    import scripts.eval_openloop as ol_cli

    out = tmp_path / "ol.json"
    monkeypatch.setattr(_sys, "argv", [
        "eval_openloop.py", "--config", CFG,
        "--checkpoint", str(tmp_path / "ft"), "--data", str(ds_dir),
        "--examples", str(n), "--batch-size", bs,
        "--output-json", str(out),
    ])
    ol_cli.main()
    with open(out) as f:
        got = json.load(f)
    assert got["examples"] == n and np.isfinite(got["mse"])
