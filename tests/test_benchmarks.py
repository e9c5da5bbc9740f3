"""Benchmark harness: presets, analytic FLOPs sanity, bench plumbing."""

import numpy as np
import pytest

import blurr_tpu.benchmarks as B
from blurr_tpu.utils.flops import (
    llama_layer_flops,
    openvla_forward_flops,
    pi0_forward_flops,
    vit_flops,
)
from tests.util import tiny_pi0_cfg


def test_preset_toggles_match_reference_semantics():
    base = B.preset_toggles("baseline")
    assert base == {
        "use_prefix_kv_cache": False,
        "use_bf16": False,
        "use_fp16": False,
        "use_torch_compile": False,
        "num_inference_steps": 10,
    }
    blurr = B.preset_toggles("blurr")
    assert blurr["use_prefix_kv_cache"] and blurr["use_bf16"]
    assert blurr["num_inference_steps"] == 1
    assert B.preset_toggles("step1") == blurr
    with pytest.raises(ValueError):
        B.preset_toggles("bogus")


def test_pi0_flops_monotonic_in_steps_and_cache():
    cfg = tiny_pi0_cfg()
    cfg["num_inference_steps"] = 1
    f1 = pi0_forward_flops(cfg, use_cache=True)
    cfg10 = tiny_pi0_cfg()
    cfg10["num_inference_steps"] = 10
    f10 = pi0_forward_flops(cfg10, use_cache=True)
    assert f10 > f1
    # naive path re-runs the full stack per step -> far more FLOPs
    f10_naive = pi0_forward_flops(cfg10, use_cache=False)
    assert f10_naive > 3 * f10


def test_openvla_flops_scale():
    from blurr_tpu.models.openvla.model import OpenVLASpec

    tiny = OpenVLASpec.tiny()
    f = openvla_forward_flops(tiny, prompt_len=10)
    assert f > 0
    # the 7B spec dwarfs the tiny one
    assert openvla_forward_flops(OpenVLASpec(), prompt_len=10) > 100 * f


def test_full_pi0_flops_plausible():
    """Full bridge dims, blurr preset: prefill-dominated, order ~1-2 TFLOP."""
    cfg = B.load_cfg("config/eval/bridge.yaml")
    cfg["num_inference_steps"] = 1
    total = pi0_forward_flops(cfg, use_cache=True)
    assert 0.5e12 < total < 5e12, total


def test_bench_runs_on_tiny(tmp_path):
    import jax.numpy as jnp

    cfg = B.load_cfg("config/eval/bridge_tiny.yaml")
    model, params = B.load_model(cfg, "random", jnp.float32)
    inputs = B.prepare_inputs(cfg, "move the cube", "", jnp.float32)
    res = B.bench(
        model, params, inputs, use_prefix_kv_cache=True, warmup=1, iters=2,
        skip_flops=False,
    )
    assert res.latency_ms > 0
    assert res.gflops and res.gflops > 0
