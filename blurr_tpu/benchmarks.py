"""Shared Pi-0 benchmarking harness used by scripts/benchmark_pi0.py and the
paper microbench suite (reference scripts/paper/pi0_microbench.py helpers)."""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from blurr_tpu.config.core import Config, load_yaml
from blurr_tpu.models.pi0.pizero import PiZeroInference
from blurr_tpu.models.pi0.processing import StubTokenizer, VLAProcessor
from blurr_tpu.paths import config_root
from blurr_tpu.utils.flops import pi0_forward_flops
from blurr_tpu.utils.monitor import (
    compiled_hbm_gb,
    peak_tpu_memory_gb,
    timed_call,
)


@dataclasses.dataclass
class BenchResult:
    latency_ms: float
    peak_reserved_gb: float
    gflops: Optional[float]
    flops_note: Optional[str] = None

    @property
    def latency_s(self) -> float:
        return self.latency_ms / 1000.0


def preset_toggles(name: str) -> Dict[str, Any]:
    """Named preset table (reference pi0_microbench.py:331-349). Accepts the
    same presets/aliases as scripts/eval_pi0_simpler.py so any eval
    configuration can be paired with a microbench measurement."""
    name = name.strip().lower()
    if name in {"baseline", "vanilla"}:
        return {
            "use_prefix_kv_cache": False,
            "use_bf16": False,
            "use_fp16": False,
            "use_torch_compile": False,
            "num_inference_steps": 10,
        }
    if name in {"prefix_cache", "cached"}:
        return {
            "use_prefix_kv_cache": True,
            "use_bf16": False,
            "use_fp16": False,
            "use_torch_compile": False,
            "num_inference_steps": 10,
        }
    if name in {"blurr", "step1", "blurr_step1"}:
        return {
            "use_prefix_kv_cache": True,
            "use_bf16": True,
            "use_fp16": False,
            "use_torch_compile": True,
            "num_inference_steps": 1,
        }
    raise ValueError(f"Unknown preset: {name}")


def load_cfg(config: str) -> Config:
    cfg_path = Path(config)
    if not cfg_path.is_absolute() and not cfg_path.exists():
        cfg_path = config_root().parent / config
    return load_yaml(cfg_path)


def select_dtype(use_bf16: bool, use_fp16: bool = False):
    return jnp.bfloat16 if (use_bf16 or use_fp16) else jnp.float32


def load_model(cfg, checkpoint_path: str, dtype):
    """(model, params): torch checkpoint via the bridge, or random init."""
    model = PiZeroInference(cfg)
    if str(checkpoint_path).lower() in {"random", "none", ""}:
        params = model.init_params(jax.random.PRNGKey(0), dtype=dtype)
        params = model.tie_action_proprio_weights(params)
    else:
        from blurr_tpu.models.pi0.checkpoint import load_pizero_params_auto

        # torch .pt OR an orbax dir from train_pi0_flow --save-dir
        params = load_pizero_params_auto(checkpoint_path, dtype=dtype)
    params = model.enable_action_quantization(params)
    params = model.enable_vlm_quantization(params)
    return model, params


def build_processor(cfg):
    try:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(
            cfg["pretrained_model_path"],
            padding_side=cfg.get("tokenizer_padding_side", "right"),
        )
    except Exception:
        tokenizer = StubTokenizer(image_token_id=cfg["image_token_index"])
    return VLAProcessor(
        tokenizer,
        cfg["vision"]["config"]["num_image_tokens"],
        cfg["max_seq_len"],
        tokenizer_padding=cfg.get("tokenizer_padding", "max_length"),
    )


def load_image(path: str, image_size: int) -> np.ndarray:
    if path and Path(path).exists():
        from PIL import Image

        img = Image.open(path).convert("RGB").resize((image_size, image_size))
        arr = np.array(img, dtype=np.uint8)
    else:
        arr = np.random.RandomState(0).randint(
            0, 256, (image_size, image_size, 3), dtype=np.uint8
        )
    return arr.transpose(2, 0, 1)[None]


def prepare_inputs(cfg, prompt: str, image_path: str, dtype, proprio_mode="zeros",
                   processor=None):
    processor = processor or build_processor(cfg)
    image = load_image(image_path, cfg["vision"]["config"]["image_size"])
    processed = processor(text=[prompt], images=image)
    shape = (1, cfg["cond_steps"], cfg["proprio_dim"])
    proprios = (
        jnp.asarray(np.random.RandomState(1).rand(*shape), dtype)
        if proprio_mode == "random"
        else jnp.zeros(shape, dtype)
    )
    noise = jax.random.normal(
        jax.random.PRNGKey(0), (1, cfg["horizon_steps"], cfg["action_dim"]), dtype
    )
    return {
        "input_ids": processed["input_ids"],
        "attention_mask": processed["attention_mask"],
        "pixel_values": processed["pixel_values"].astype(dtype),
        "proprios": proprios,
        "noise": noise,
    }


def bench(model, params, inputs, *, use_prefix_kv_cache: bool, warmup: int,
          iters: int, skip_flops: bool) -> BenchResult:
    fn = model.infer_action if use_prefix_kv_cache else model.infer_action_naive
    args = (
        params,
        inputs["input_ids"],
        inputs["attention_mask"],
        inputs["pixel_values"],
        inputs["proprios"],
        inputs["noise"],
    )
    # AOT-compile once: the compiled program is both timed and inspected for
    # its exact HBM footprint (memory_stats() is empty over the axon tunnel)
    step = jax.jit(fn).lower(*args).compile()
    hbm = compiled_hbm_gb(step)
    latency, _, _ = timed_call(step, *args, warmup=warmup, iters=iters)
    gflops = None
    if not skip_flops:
        total = pi0_forward_flops(model.cfg, use_cache=use_prefix_kv_cache)
        gflops = total / latency / 1e9
    return BenchResult(
        latency_ms=latency * 1000.0,
        peak_reserved_gb=hbm.get("peak_gb") or peak_tpu_memory_gb(),
        gflops=gflops,
    )


def first_call_seconds(model, params, inputs, *, use_prefix_kv_cache: bool) -> float:
    """Wall-clock of the FIRST call (includes XLA compilation — the
    torch.compile-warmup analogue)."""
    import time

    from blurr_tpu.utils.monitor import _fetch_scalar

    fn = model.infer_action if use_prefix_kv_cache else model.infer_action_naive
    step = jax.jit(fn)
    t0 = time.perf_counter()
    out = step(
        params,
        inputs["input_ids"],
        inputs["attention_mask"],
        inputs["pixel_values"],
        inputs["proprios"],
        inputs["noise"],
    )
    _fetch_scalar(out)
    return time.perf_counter() - t0


def device_name() -> str:
    try:
        d = jax.devices()[0]
        return f"{d.platform}:{d.device_kind}"
    except Exception:
        return "unknown"
