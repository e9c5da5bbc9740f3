#!/usr/bin/env python3
"""Evaluate an OpenVLA-family VLA on SimplerEnv Bridge tasks, TPU-native.

Flag/behavior/summary-format parity with reference
scripts/eval_hf_vla_simpler.py; the model is this framework's native JAX
OpenVLA (or OFT) stack instead of HF remote code. ``--model-id`` accepts an
HF snapshot directory (checkpoint bridge), or 'random'/'random-7b' for
random-init smoke runs; without simpler_env the fake env is used.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np
from PIL import Image

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from blurr_tpu.agent.hf_vla_utils import (
    bridge_action_to_simpler,
    center_crop_and_resize_back,
    infer_center_crop_default,
    inject_dataset_statistics_into_norm_stats,
    normalize_proprio,
    octo_style_preprocess,
    simpler_eef_pos_to_bridge_proprio,
    simpler_eef_pos_to_bridge_proprio_padded,
)
from blurr_tpu.paths import repo_root

log = logging.getLogger("eval_hf_vla_simpler")


def _default_log_dir(*, tag: str, seed: int, task: Optional[str] = None) -> Path:
    stamp = time.strftime("%Y-%m-%d_%H-%M-%S")
    base = repo_root() / "runs" / "eval_bridge" / f"{tag}_{seed}"
    return base / (f"{task}_{stamp}" if task else stamp)


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(
        description="Evaluate a VLA (e.g., OpenVLA) on SimplerEnv Bridge tasks."
    )
    p.add_argument("--model-id", type=str, required=True)
    p.add_argument(
        "--preset", type=str, default="baseline", choices=["baseline", "blurr"],
        help="baseline=FP32; blurr=BF16 (+jit, always on).",
    )
    p.add_argument("--task", type=str, nargs="+", required=True)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--gpu-id", type=int, default=0)
    p.add_argument("--n-eval-episode", type=int, default=100)
    p.add_argument(
        "--initial-states", type=str, default="eval",
        choices=["eval", "train", "episode_id"],
    )
    p.add_argument("--max-steps", type=int, default=150)
    p.add_argument("--num-steps-wait", type=int, default=0)
    p.add_argument("--log-dir", type=str, default="")
    p.add_argument(
        "--prompt-template", type=str,
        default="In: What action should the robot take to {instruction}?\nOut:",
    )
    p.add_argument("--unnorm-key", type=str, default=None)
    p.add_argument("--attn-implementation", type=str, default="")
    p.add_argument("--use-bf16", action="store_true")
    p.add_argument(
        "--quantization", type=str, default="none",
        choices=["none", "w8a8", "w4a8"],
        help="Quantize the Llama decoder (TPU extension; same tiers as "
        "benchmark_hf_vla.py). Experimental — validate success rates.",
    )
    p.add_argument("--use-fp16", action="store_true")
    p.add_argument("--use-torch-compile", action="store_true")
    p.add_argument("--no-torch-compile", action="store_true")
    p.add_argument("--use-lora", type=str, default="auto", choices=["auto", "on", "off"])
    p.add_argument("--center-crop", type=str, default="auto", choices=["auto", "on", "off"])
    p.add_argument("--center-crop-scale", type=float, default=0.9)
    p.add_argument(
        "--image-preproc", type=str, default="octo128", choices=["octo128", "raw"]
    )
    p.add_argument(
        "--normalize-proprio", type=str, default="auto", choices=["auto", "on", "off"]
    )
    p.add_argument(
        "--use-oft-action-head", type=str, default="auto", choices=["auto", "on", "off"]
    )
    p.add_argument(
        "--use-oft-proprio", type=str, default="auto", choices=["auto", "on", "off"]
    )
    return p.parse_args()


def _build_model(args, dtype):
    """Returns (model, params, processor, norm_stats, dataset_stats, is_oft,
    oft_proj). ``dataset_stats`` (dataset_statistics.json) participates in
    unnorm-key inference (reference eval_hf_vla_simpler.py:270-288)."""
    import jax

    from blurr_tpu.models.openvla.model import OpenVLA, OpenVLAOFT, OpenVLASpec
    from blurr_tpu.models.openvla.processing import (
        OpenVLAProcessor,
        load_hf_tokenizer,
    )

    model_path = Path(args.model_id).expanduser()
    oft_head = oft_proj = None
    norm_stats: Dict[str, Any] = {}
    dataset_stats: Dict[str, Any] = {}
    if model_path.is_dir():
        from blurr_tpu.models.openvla.checkpoint import (
            load_dataset_statistics,
            load_oft_aux_params,
            openvla_params_from_hf_dir,
        )

        spec = OpenVLASpec.from_snapshot_dir(model_path)
        # dataset_statistics.json ONLY — a config.json norm_stats fallback
        # here would contaminate both the injection and the key preference
        # (reference _load_dataset_stats, eval_hf_vla_simpler.py:190-198)
        dataset_stats = load_dataset_statistics(str(model_path)) or {}
        cfg_stats_path = model_path / "config.json"
        if cfg_stats_path.exists():
            cfg_raw = json.load(open(cfg_stats_path))
            norm_stats = cfg_raw.get("norm_stats") or {}
        norm_stats = inject_dataset_statistics_into_norm_stats(
            norm_stats, dataset_stats
        )
        if args.use_oft_action_head != "off":
            oft_head, oft_proj = load_oft_aux_params(str(model_path), dtype)
        if args.use_oft_proprio == "off":
            oft_proj = None  # ablate proprio conditioning even when shipped
        if oft_head is not None:
            # chunk length derives from the head's own input width (the
            # reference reconstructs the head shape-driven; the flattened
            # input is chunk_len * action_dim * llama_hidden)
            per_tok = spec.action_dim * spec.llama.hidden_size
            in_dim = int(oft_head["fc1_w"].shape[0])
            chunk_len = max(1, in_dim // per_tok)
            if chunk_len * per_tok != in_dim:
                log.warning(
                    "OFT head input width %d is not a multiple of "
                    "action_dim*hidden=%d; using chunk_len=%d.",
                    in_dim, per_tok, chunk_len,
                )
            model = OpenVLAOFT(spec, norm_stats, chunk_len=chunk_len,
                               use_proprio=oft_proj is not None)
        else:
            model = OpenVLA(spec, norm_stats)
        params = openvla_params_from_hf_dir(
            str(model_path), spec, dtype, merge_lora=args.use_lora != "off"
        )
        if oft_head is not None:
            params["action_head"] = oft_head
        if oft_proj is not None:
            params["proprio_projector"] = oft_proj
        tokenizer = load_hf_tokenizer(str(model_path))
    else:
        spec = (
            OpenVLASpec() if args.model_id == "random-7b" else OpenVLASpec.tiny()
        )
        model = OpenVLA(spec)
        params = model.init_params(jax.random.PRNGKey(args.seed), dtype)
        tokenizer = None
    if getattr(args, "quantization", "none") != "none":
        if args.model_id == "random-7b":
            # rebuild directly in quantized form (quantizing a resident bf16
            # 7B tree transiently OOMs the 16 GB chip)
            import gc

            from blurr_tpu.models.openvla.llama import (
                init_llama_params_w4a8,
                init_llama_params_w8a8,
            )

            params["llama"] = None
            gc.collect()
            init_q = (
                init_llama_params_w8a8 if args.quantization == "w8a8"
                else init_llama_params_w4a8
            )
            params["llama"] = init_q(jax.random.PRNGKey(args.seed), spec.llama, dtype)
        elif model_path.is_dir():
            # checkpoint-loaded 7B: memory-bounded streaming quantization
            # (frees each bf16 tensor as its quantized form lands)
            from blurr_tpu.models.openvla.llama import quantize_llama_streaming

            params["llama"] = quantize_llama_streaming(
                params["llama"], args.quantization
            )
        else:
            from blurr_tpu.models.openvla.llama import (
                quantize_llama_w4a8,
                quantize_llama_w8a8,
            )

            qfn = (
                quantize_llama_w8a8 if args.quantization == "w8a8"
                else quantize_llama_w4a8
            )
            params["llama"] = qfn(params["llama"])
    processor = OpenVLAProcessor(
        tokenizer, image_size=spec.siglip.image_size, fused=spec.use_fused_vision
    )
    return (model, params, processor, norm_stats, dataset_stats,
            oft_head is not None, oft_proj)


def main() -> None:
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from blurr_tpu.agent.fake_env import make_env
    from blurr_tpu.models.openvla.checkpoint import infer_unnorm_key

    tasks = list(args.task)
    if "{instruction}" not in args.prompt_template:
        raise ValueError("--prompt-template must contain '{instruction}'")

    use_bf16 = args.use_bf16 or args.preset == "blurr"
    dtype = jnp.bfloat16 if (use_bf16 or args.use_fp16) else jnp.float32

    log_dir = (
        Path(args.log_dir).expanduser()
        if args.log_dir
        else _default_log_dir(tag=f"hf_{args.preset}", seed=args.seed)
    )
    log_dir.mkdir(parents=True, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        handlers=[
            logging.FileHandler(log_dir / "run.log"),
            logging.StreamHandler(sys.stdout),
        ],
        force=True,
    )

    (model, params, processor, norm_stats, dataset_stats, is_oft,
     oft_proj) = _build_model(args, dtype)
    unnorm_key = None
    if norm_stats:
        try:
            # dataset_statistics.json participates in the key preference
            # (reference :270-288: bridge_orig > dataset-stats intersection
            # > first norm_stats key)
            unnorm_key = infer_unnorm_key(
                norm_stats, args.unnorm_key, dataset_stats=dataset_stats
            )
        except KeyError:
            unnorm_key = next(iter(norm_stats), None)
    action_stats = (norm_stats.get(unnorm_key) or {}).get("action") if unnorm_key else None

    do_center_crop = args.center_crop == "on"
    if args.center_crop == "auto":
        do_center_crop = infer_center_crop_default(args.model_id)

    resize_size = model.spec.siglip.image_size

    # jit boundary: one compiled program per control step
    if is_oft:
        jitted = jax.jit(model.predict_action_continuous)
    else:
        jitted = jax.jit(model.predict_action_tokens)

    rng = np.random.default_rng(args.seed)
    dummy_action = np.array([0, 0, 0, 0, 0, 0, -1], np.float32)
    per_task: Dict[str, float] = {}
    for task in tasks:
        log.info("Creating SimplerEnv env with task='%s'...", task)
        env = make_env(task)
        successes = []
        for episode_id in range(args.n_eval_episode):
            if args.initial_states == "episode_id":
                obs, reset_info = env.reset(
                    options={"obj_init_options": {"episode_id": episode_id}}
                )
            else:
                seed_base = 1000 if args.initial_states == "eval" else 0
                try:
                    obs, reset_info = env.reset(seed=seed_base + episode_id)
                except TypeError:
                    obs, reset_info = env.reset(
                        options={"obj_init_options": {"episode_id": episode_id}}
                    )
            instruction = env.get_language_instruction()
            log.info(
                "[%s] Episode %d reset: instruction='%s'", task, episode_id, instruction
            )

            step_in_episode = 0
            terminated = truncated = False
            while (
                step_in_episode < args.max_steps + args.num_steps_wait
                and not (terminated or truncated)
            ):
                if step_in_episode < args.num_steps_wait:
                    obs, reward, terminated, truncated, info = env.step(dummy_action)
                    step_in_episode += 1
                    continue

                prompt = args.prompt_template.format(instruction=instruction)
                from blurr_tpu.agent.env_adapter.simpler import get_image_from_obs

                image = Image.fromarray(
                    np.asarray(get_image_from_obs(env, obs), np.uint8)
                ).convert("RGB")
                if args.image_preproc == "octo128":
                    image = octo_style_preprocess(
                        image, resize_size=resize_size, base_size=128
                    )
                if do_center_crop:
                    image = center_crop_and_resize_back(
                        image, crop_scale=args.center_crop_scale
                    )
                batch = processor(prompt, np.asarray(image))

                kwargs: Dict[str, Any] = {"unnorm_key": unnorm_key}
                if is_oft and oft_proj is not None:
                    eef = np.asarray(obs["agent"]["eef_pos"], np.float32).reshape(-1)
                    expected = int(oft_proj["fc1_w"].shape[0])
                    if expected == 7 and eef.shape[0] == 8:
                        pr = simpler_eef_pos_to_bridge_proprio(eef)
                    elif expected == 8 and eef.shape[0] == 8:
                        pr = simpler_eef_pos_to_bridge_proprio_padded(eef)
                    else:
                        pr = eef[:expected] if eef.shape[0] >= expected else None
                    if pr is not None and args.normalize_proprio != "off":
                        pr = normalize_proprio(
                            pr, norm_stats=norm_stats, unnorm_key=unnorm_key
                        )
                    if pr is not None:
                        kwargs["proprio"] = pr[None]
                action = model.predict_action(
                    params,
                    batch["input_ids"],
                    batch["pixel_values"].astype(dtype),  # keep ViT in preset dtype
                    **kwargs,
                    **({"_jitted": jitted} if is_oft else {"_jitted_tokens": jitted}),
                )
                action_seq = np.asarray(action, np.float32)
                if action_seq.ndim == 1:
                    action_seq = action_seq.reshape(1, -1)

                for sub_action in action_seq:
                    if step_in_episode >= args.max_steps + args.num_steps_wait:
                        break
                    env_action = bridge_action_to_simpler(
                        sub_action, action_stats=action_stats
                    )
                    if not np.isfinite(env_action).all():
                        env_action = np.nan_to_num(env_action)
                    obs, reward, terminated, truncated, info = env.step(env_action)
                    step_in_episode += 1
                    new_instruction = env.get_language_instruction()
                    if new_instruction != instruction:
                        instruction = new_instruction
                    if terminated or truncated:
                        break

            successes.append(bool(terminated))
            log.info(
                "[%s] Episode %d finished: success=%s steps=%d truncated=%s",
                task, episode_id, terminated, step_in_episode, truncated,
            )
        rate = float(np.mean(successes)) if successes else 0.0
        per_task[task] = rate
        log.info("[%s] Success rate: %.4f over %d episodes", task, rate, len(successes))

    avg_success = float(np.mean(list(per_task.values()))) if per_task else 0.0
    summary = {
        "model_id": args.model_id,
        "preset": args.preset,
        "quantization": args.quantization,
        "dtype": str(dtype),
        "torch_compile": True,
        "attn_implementation": args.attn_implementation,
        "image_preproc": args.image_preproc,
        "center_crop": args.center_crop,
        "center_crop_scale": float(args.center_crop_scale),
        "normalize_proprio": args.normalize_proprio,
        "use_oft_action_head": args.use_oft_action_head,
        "use_oft_proprio": args.use_oft_proprio,
        "seed": int(args.seed),
        "initial_states": args.initial_states,
        "max_steps": int(args.max_steps),
        "num_steps_wait": int(args.num_steps_wait),
        "episodes_per_task": int(args.n_eval_episode),
        "per_task_success": per_task,
        "avg_success": avg_success,
    }
    with open(log_dir / "summary.json", "w", encoding="utf-8") as f:
        json.dump(summary, f, indent=2, sort_keys=True)

    log.info("============ Evaluation Summary ============")
    log.info("Tasks: %s", ", ".join(tasks))
    log.info("Episodes per task: %d", args.n_eval_episode)
    log.info("Avg success: %.4f", avg_success)
    log.info("Wrote: %s", log_dir / "summary.json")
    log.info("============================================")
    print(f"\nDone. Logs written to: {log_dir}\n")


if __name__ == "__main__":
    main()
