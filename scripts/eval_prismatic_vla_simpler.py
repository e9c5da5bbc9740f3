#!/usr/bin/env python3
"""Evaluate a prismatic-style VLA (MiniVLA) on SimplerEnv Bridge tasks.

Parity surface: reference scripts/eval_prismatic_vla_simpler.py (which wraps
an external openvla-mini checkout and its ``load_vla`` .pt checkpoints). The
TPU build uses the native prismatic stack: single SigLIP tower -> projector
-> compact LLM backbone with the same greedy action-token decode. Passing a
prismatic ``.pt`` checkpoint loads it through the torch bridge when the key
layout matches; 'random' runs the random-init smoke path.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
from pathlib import Path
from typing import Dict

import numpy as np
from PIL import Image

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from blurr_tpu.agent.hf_vla_utils import (
    bridge_action_to_simpler,
    octo_style_preprocess,
)
from blurr_tpu.paths import repo_root

log = logging.getLogger("eval_prismatic_vla_simpler")

# token-id ceiling for action de-tokenization (discretized =
# action_token_vocab - token_id): the REAL tokenizer vocab, not the padded
# embedding rows. Known paddings: llama-2 32064 -> 32000, Qwen2/2.5
# 151936 -> 151643.
TOKENIZER_VOCAB_BY_EMBED_ROWS = {32064: 32000, 151936: 151643}


def minivla_spec(vocab_size: int = 32064):
    """MiniVLA-style prismatic spec (see OpenVLASpec.minivla; kept here as
    the historical import point for the bench/eval scripts)."""
    from blurr_tpu.models.openvla.model import OpenVLASpec

    return OpenVLASpec.minivla(vocab_size)


def _infer_unnorm_key(norm_stats, dataset_stats, override):
    """Reference semantics (eval_prismatic_vla_simpler.py:45-59): explicit
    override wins; else the first dataset-statistics key also present in
    norm_stats; else 'bridge_dataset'; else the first norm_stats key."""
    if override:
        return override
    norm_keys = list(norm_stats.keys())
    if dataset_stats:
        inter = [k for k in dataset_stats.keys() if k in norm_keys]
        if inter:
            return inter[0]
    if "bridge_dataset" in norm_keys:
        return "bridge_dataset"
    return norm_keys[0] if norm_keys else "bridge_dataset"


def parse_args():
    p = argparse.ArgumentParser(
        description="Evaluate a prismatic VLA (.pt) on SimplerEnv Bridge tasks."
    )
    p.add_argument("--checkpoint", type=str, required=True,
                   help="Prismatic .pt checkpoint, or 'random'.")
    p.add_argument("--task", type=str, nargs="+", required=True)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--n-eval-episode", type=int, default=100)
    p.add_argument("--max-steps", type=int, default=150)
    p.add_argument("--initial-states", type=str, default="eval",
                   choices=["eval", "train", "episode_id"])
    p.add_argument("--log-dir", type=str, default="")
    p.add_argument("--unnorm-key", type=str, default=None,
                   help="Explicit normalization-statistics key; inferred from "
                        "the checkpoint run dir's dataset_statistics.json "
                        "when omitted (reference semantics).")
    p.add_argument("--use-bf16", action="store_true", default=True)
    p.add_argument("--fp32", action="store_true",
                   help="Force float32 (--use-bf16 defaults on; this is the "
                        "only way to get an fp32 precision-ablation run).")
    p.add_argument(
        "--image-preproc", type=str, default="octo128", choices=["octo128", "raw"]
    )
    p.add_argument(
        "--num-steps-wait", type=int, default=0,
        help="No-op settle steps ([0,0,0,0,0,0,-1]) at episode start "
             "(reference eval_prismatic_vla_simpler.py:196-203).")
    p.add_argument(
        "--instruction-template", type=str, default="{instruction}",
        help="Prompt template; must contain '{instruction}'.")
    return p.parse_args()


def main() -> None:
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from blurr_tpu.agent.fake_env import make_env
    from blurr_tpu.models.openvla.model import EMPTY_TOKEN, OpenVLA
    from blurr_tpu.models.openvla.processing import OpenVLAProcessor

    log_dir = (
        Path(args.log_dir).expanduser()
        if args.log_dir
        else repo_root()
        / "runs"
        / "eval_bridge"
        / f"prismatic_{args.seed}"
        / time.strftime("%Y-%m-%d_%H-%M-%S")
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

    if "{instruction}" not in args.instruction_template:
        raise ValueError("--instruction-template must contain '{instruction}'")

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16

    # bundled Bridge statistics give the default unnorm ranges
    stats_path = (
        Path(__file__).resolve().parents[1]
        / "blurr_tpu" / "config" / "bridge_statistics.json"
    )
    bridge_stats = json.loads(stats_path.read_text())
    norm_stats = {
        "bridge_orig": {
            "action": {
                "q01": bridge_stats["action"]["p01"],
                "q99": bridge_stats["action"]["p99"],
                "mask": [True] * 6 + [False],
            }
        }
    }

    is_random = str(args.checkpoint).lower() in {"random", "none", ""}
    state = None
    dataset_stats = {}
    if not is_random:
        import torch

        ckpt = Path(args.checkpoint).expanduser()
        # run_dir layout: run_dir/checkpoints/*.pt next to
        # dataset_statistics.json (reference :250-252)
        run_dir = ckpt.parents[1] if ckpt.parent.name == "checkpoints" else ckpt.parent
        ds_path = run_dir / "dataset_statistics.json"
        if ds_path.is_file():
            try:
                dataset_stats = json.loads(ds_path.read_text())
            except Exception:
                dataset_stats = {}
        state = torch.load(args.checkpoint, map_location="cpu")
        state = state.get("model", state)
        # merge per-dataset action stats into norm_stats (the prismatic
        # checkpoint's vla.norm_stats equivalent)
        for key, st in (dataset_stats or {}).items():
            act = st.get("action", st) if isinstance(st, dict) else {}
            if isinstance(act, dict) and "q01" in act and "q99" in act:
                norm_stats[key] = {"action": act}

    spec = minivla_spec()
    if state is not None and "llm_backbone.llm.model.embed_tokens.weight" in state:
        vocab = int(state["llm_backbone.llm.model.embed_tokens.weight"].shape[0])
        from dataclasses import replace

        spec = minivla_spec(vocab_size=vocab)
        has_bias = any(k.endswith("self_attn.q_proj.bias") for k in state)
        tied = "llm_backbone.llm.lm_head.weight" not in state
        act_vocab = TOKENIZER_VOCAB_BY_EMBED_ROWS.get(vocab, vocab)
        if vocab not in TOKENIZER_VOCAB_BY_EMBED_ROWS:
            log.warning(
                "Unknown vocab padding for embedding rows=%d; assuming the "
                "action-token ceiling equals it (override with the spec if "
                "actions detokenize to constants).", vocab,
            )
        spec = replace(
            spec,
            llama=replace(spec.llama, qkv_bias=has_bias,
                          tie_word_embeddings=tied),
            action_token_vocab=act_vocab,
        )

    model = OpenVLA(spec, norm_stats)
    params = model.init_params(jax.random.PRNGKey(args.seed), dtype)
    if not is_random:
        from blurr_tpu.models.openvla.checkpoint import (
            llama_params_from_hf,
            prismatic_vision_params,
        )

        loaded, random_init = [], []
        try:
            params["llama"] = jax.tree.map(
                lambda a: jnp.asarray(a, dtype),
                llama_params_from_hf(state, prefix="llm_backbone.llm."),
            )
            loaded.append("llama")
        except Exception as exc:
            log.warning("LLM backbone layout not recognized (%s).", exc)
            random_init.append("llama")
        try:
            vis, proj = prismatic_vision_params(state, spec)
            params["siglip"] = jax.tree.map(lambda a: jnp.asarray(a, dtype), vis)
            params["projector"] = jax.tree.map(
                lambda a: jnp.asarray(a, dtype), proj
            )
            loaded.append("siglip+projector")
        except Exception as exc:
            log.warning("Vision/projector layout not recognized (%s).", exc)
            random_init.append("siglip+projector")
        if loaded:
            log.info("Loaded from %s: %s", args.checkpoint, ", ".join(loaded))
        if random_init:
            log.warning(
                "PARTIAL LOAD: %s stayed RANDOM-INIT — actions will be "
                "meaningless unless this is a smoke run.",
                ", ".join(random_init),
            )

    unnorm_key = _infer_unnorm_key(norm_stats, dataset_stats, args.unnorm_key)
    log.info("Using unnorm_key=%s", unnorm_key)

    processor = OpenVLAProcessor(None, image_size=spec.siglip.image_size, fused=False)
    jitted = jax.jit(model.predict_action_tokens)
    action_stats = norm_stats.get(unnorm_key, norm_stats["bridge_orig"])["action"]
    dummy_action = np.array([0, 0, 0, 0, 0, 0, -1], dtype=np.float32)

    per_task: Dict[str, float] = {}
    for task in args.task:
        env = make_env(task)
        successes = []
        for episode_id in range(args.n_eval_episode):
            if args.initial_states == "episode_id":
                obs, _ = env.reset(options={"obj_init_options": {"episode_id": episode_id}})
            else:
                base = 1000 if args.initial_states == "eval" else 0
                try:
                    obs, _ = env.reset(seed=base + episode_id)
                except TypeError:
                    obs, _ = env.reset(
                        options={"obj_init_options": {"episode_id": episode_id}}
                    )
            instruction = env.get_language_instruction()
            terminated = truncated = False
            steps = 0
            while (
                steps < args.max_steps + args.num_steps_wait
                and not (terminated or truncated)
            ):
                if steps < args.num_steps_wait:
                    # settle steps: no-op action while objects come to rest
                    obs, reward, terminated, truncated, info = env.step(dummy_action)
                    steps += 1
                    continue
                from blurr_tpu.agent.env_adapter.simpler import get_image_from_obs

                image = Image.fromarray(
                    np.asarray(get_image_from_obs(env, obs), np.uint8)
                ).convert("RGB")
                if args.image_preproc == "octo128":
                    image = octo_style_preprocess(
                        image, resize_size=spec.siglip.image_size
                    )
                templated = args.instruction_template.format(instruction=instruction)
                prompt = (
                    f"In: What action should the robot take to {templated.lower()}?\nOut:"
                )
                batch = processor(prompt, np.asarray(image))
                action = model.predict_action(
                    params,
                    batch["input_ids"],
                    batch["pixel_values"].astype(dtype),  # keep ViT in preset dtype
                    unnorm_key=unnorm_key,
                    _jitted_tokens=jitted,
                )
                env_action = bridge_action_to_simpler(
                    action, action_stats=action_stats, variant="prismatic"
                )
                if not np.isfinite(env_action).all():
                    env_action = np.nan_to_num(env_action)
                obs, reward, terminated, truncated, info = env.step(env_action)
                steps += 1
                new_instruction = env.get_language_instruction()
                if new_instruction != instruction:
                    instruction = new_instruction
            successes.append(bool(terminated))
            log.info(
                "[%s] Episode %d finished: success=%s steps=%d",
                task, episode_id, terminated, steps,
            )
        rate = float(np.mean(successes)) if successes else 0.0
        per_task[task] = rate
        log.info("[%s] Success rate: %.4f over %d episodes", task, rate, len(successes))

    avg = float(np.mean(list(per_task.values()))) if per_task else 0.0
    summary = {
        "checkpoint": args.checkpoint,
        "unnorm_key": unnorm_key,
        "num_steps_wait": int(args.num_steps_wait),
        "dtype": str(dtype),
        "seed": int(args.seed),
        "initial_states": args.initial_states,
        "max_steps": int(args.max_steps),
        "episodes_per_task": int(args.n_eval_episode),
        "per_task_success": per_task,
        "avg_success": avg,
    }
    with open(log_dir / "summary.json", "w") as f:
        json.dump(summary, f, indent=2, sort_keys=True)
    log.info("Avg success: %.4f", avg)
    log.info("Wrote: %s", log_dir / "summary.json")
    print(f"\nDone. Logs written to: {log_dir}\n")


if __name__ == "__main__":
    main()
