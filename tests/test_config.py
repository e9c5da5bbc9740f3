"""Config system: interpolation, defaults inheritance, registry, presets."""

import os

import pytest

from blurr_tpu.config.core import Config, deep_merge, load_yaml, resolve_interpolations
from blurr_tpu.paths import config_root


def test_bridge_config_loads_with_dims():
    cfg = load_yaml(config_root() / "eval" / "bridge.yaml")
    assert cfg.max_seq_len == 276
    assert cfg.mixture.vlm.hidden_size == 2048
    assert cfg.joint.config.num_hidden_layers == 18
    # interpolations resolved
    assert cfg.max_image_text_tokens == 276
    assert cfg.joint.config.mixture.vlm.hidden_size == 2048
    assert cfg.mixture.proprio.rope_theta == 10000.0


def test_defaults_inheritance_pool64():
    cfg = load_yaml(config_root() / "eval" / "bridge_pool64_steps2.yaml")
    # overridden
    assert cfg.num_inference_steps == 2
    assert cfg.vision.config.image_size == 112
    assert cfg.vision.config.num_image_tokens == 64
    assert cfg.action_quantization.mode == "int8"
    # inherited
    assert cfg.mixture.vlm.hidden_size == 2048
    assert cfg.joint.config.head_dim == 256
    # two-level inheritance
    cfg1 = load_yaml(config_root() / "eval" / "bridge_pool64_steps1.yaml")
    assert cfg1.num_inference_steps == 1
    assert cfg1.vision.config.image_size == 112


def test_env_interpolation(monkeypatch):
    monkeypatch.setenv("BLURR_TEST_VAR", "hello")
    cfg = Config.wrap({"a": "${oc.env:BLURR_TEST_VAR}", "b": "${oc.env:MISSING_X,dflt}"})
    out = resolve_interpolations(cfg, cfg)
    assert out.a == "hello"
    assert out.b == "dflt"


def test_deep_merge_nested():
    base = Config.wrap({"a": {"x": 1, "y": 2}, "b": 3})
    over = Config.wrap({"a": {"y": 20, "z": 30}})
    out = deep_merge(base, over)
    assert out.a.x == 1 and out.a.y == 20 and out.a.z == 30 and out.b == 3


def test_registry_instantiate():
    from blurr_tpu.config.core import instantiate
    import blurr_tpu.agent.env_adapter.simpler  # noqa: F401

    adapter = instantiate(
        {
            "_target_": "src.agent.env_adapter.simpler.BridgeSimplerAdapter",
            "dataset_statistics_path": "config/bridge_statistics.json",
            "pretrained_model_path": "(stub)",
            "tokenizer_padding": "max_length",
            "max_seq_len": 12,
            "num_image_tokens": 4,
            "image_size": [28, 28],
        }
    )
    # reference _target_ strings resolve through the trailing class name
    assert adapter.__class__.__name__ == "BridgeSimplerAdapter"


def test_preset_semantics():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    from eval_pi0_simpler import _apply_preset

    cfg = load_yaml(config_root() / "eval" / "bridge.yaml")
    _apply_preset(cfg, "baseline")
    assert not cfg.use_prefix_kv_cache and not cfg.use_bf16
    assert cfg.num_inference_steps == 10
    _apply_preset(cfg, "blurr")
    assert cfg.use_prefix_kv_cache and cfg.use_bf16
    assert cfg.num_inference_steps == 1
    with pytest.raises(ValueError):
        _apply_preset(cfg, "nope")


def test_fractal_configs_load():
    for name in ("fractal_coke", "fractal_apple", "fractal_drawer", "fractal_move"):
        cfg = load_yaml(config_root() / "eval" / f"{name}.yaml")
        assert cfg.proprio_dim == 8  # POS_QUAT
        assert cfg.act_steps == 2
        assert "EDRSimplerAdapter" in cfg.env.adapter._target_
        assert cfg.mixture.vlm.hidden_size == 2048
    assert load_yaml(config_root() / "eval" / "fractal_coke.yaml").n_eval_episode == 1000


def test_w8a8_preset_loads():
    cfg = load_yaml(config_root() / "eval" / "bridge_w8a8_steps1.yaml")
    assert cfg.vlm_quantization.mode == "w8a8"
    assert cfg.vlm_quantization.include_vision is True
    assert cfg.num_inference_steps == 1


def test_pool64_w8a8_preset_loads():
    cfg = load_yaml(config_root() / "eval" / "bridge_pool64_w8a8_steps1.yaml")
    assert cfg.vlm_quantization.mode == "w8a8"
    assert cfg.action_quantization.mode == "w8a8"
    assert cfg.kv_quantization.mode is None
    assert cfg.num_inference_steps == 1
    # 64 vision tokens, static 96-token pad threaded through the adapter
    assert cfg.vision.config.num_image_tokens == 64
    assert cfg.max_seq_len == 96
    assert cfg.max_image_text_tokens == 96
    assert cfg.env.adapter.max_seq_len == 96
    assert cfg.env.adapter.num_image_tokens == 64


def test_pool64_w4a8_preset_loads():
    cfg = load_yaml(config_root() / "eval" / "bridge_pool64_w4a8_steps1.yaml")
    assert cfg.vlm_quantization.mode == "w4a8"
    assert cfg.action_quantization.mode == "w4a8"
    assert cfg.max_seq_len == 96 and cfg.vision.config.num_image_tokens == 64


def test_per_mixture_activation_clip_from_yaml(tmp_path):
    """A YAML setting mixture.<name>.activation_clip must reach the
    MixtureSpec (config-schema round-trip; the clip gates quantized matmuls
    per mixture)."""
    import yaml as _yaml

    from blurr_tpu.config.core import load_yaml
    from blurr_tpu.models.pi0.joint import JointSpec

    cfg = {
        "num_hidden_layers": 2,
        "num_attention_heads": 2,
        "num_key_value_heads": 1,
        "head_dim": 8,
        "mixture": {
            "vlm": {"hidden_size": 16, "intermediate_size": 32,
                    "activation_clip": 2.5},
            "action": {"hidden_size": 16, "intermediate_size": 32},
        },
    }
    p = tmp_path / "joint.yaml"
    p.write_text(_yaml.safe_dump(cfg))
    spec = JointSpec.from_config(load_yaml(p))
    assert spec.mixtures["vlm"].activation_clip == 2.5
    assert spec.mixtures["action"].activation_clip is None


def test_kv_dtype_float16_warns_and_maps_to_bf16(caplog):
    import logging

    import jax.numpy as jnp

    from blurr_tpu.models.pi0.pizero import PiZero
    from tests.util import tiny_pi0_cfg

    cfg = tiny_pi0_cfg(
        kv_quantization={"mode": "int8", "dtype": "float16",
                         "activation_clip": 1.0}
    )
    with caplog.at_level(logging.WARNING, logger="blurr_tpu.models.pi0.pizero"):
        model = PiZero(cfg)
    assert model.kv_dequant_dtype == jnp.bfloat16
    assert "float16" in caplog.text and "bfloat16" in caplog.text


def test_embedded_interpolation_resolves_recursively(monkeypatch):
    """A composite string's looked-up value may itself interpolate
    (OmegaConf semantics): '${base}/run' with base: '${oc.env:X,runs}' must
    not leak literal '${...}' text into the result."""
    from blurr_tpu.config.core import Config, resolve_interpolations

    monkeypatch.delenv("BLURR_TEST_DIR", raising=False)
    cfg = Config.wrap({
        "base": "${oc.env:BLURR_TEST_DIR,runs}",
        "seed": 7,
        "run_dir": "${base}/run_${seed}",
    })
    out = resolve_interpolations(cfg, cfg)
    assert out["run_dir"] == "runs/run_7"
    monkeypatch.setenv("BLURR_TEST_DIR", "/tmp/x")
    out = resolve_interpolations(cfg, cfg)
    assert out["run_dir"] == "/tmp/x/run_7"
