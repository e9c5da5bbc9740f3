"""Closed-loop BF16-vs-W8A8 divergence on the full-dims Pi-0 stack.

Open-loop, w8a8 actions deviate from bf16 by MAE ~0.003 (bench_w8a8 +
docs). The question that leaves open: does that noise COMPOUND through the
control loop? With the action-coupled FakeSimplerEnv (obs are a function of
the integrated action history), quantization noise now feeds back through
both proprio and pixels, so this measures the compounding, not just the
single-step error.

Protocol: identical random-init weights (same PRNG seed), identical episode
seeds and noise streams; roll E episodes x 12 steps with (a) bf16, (b) bf16
rerun [determinism control], (c) w8a8. Reports per-step EEF pose divergence
and the first-step action-chunk MAE.

Run on the TPU chip (full dims); ~6-8 min including compiles.
"""

import gc
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

import blurr_tpu.agent.env_adapter.simpler  # noqa: F401 (registers adapters)
from blurr_tpu.agent.fake_env import FakeSimplerEnv
from blurr_tpu.config.core import instantiate, load_yaml
from blurr_tpu.models.pi0.pizero import PiZeroInference
from blurr_tpu.paths import config_root

EPISODES = 2
SEED = 42


def build(w8a8: bool):
    cfg = load_yaml(config_root() / "eval" / "bridge.yaml")
    cfg["num_inference_steps"] = 1
    cfg["use_bf16"] = True
    cfg["act_steps"] = 4
    if w8a8:
        cfg["vlm_quantization"] = {"mode": "w8a8", "include_vision": True}
        cfg["action_quantization"] = {"mode": "w8a8"}
    model = PiZeroInference(cfg)
    params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params = model.tie_action_proprio_weights(params)
    params = model.enable_action_quantization(params)
    params = model.enable_vlm_quantization(params)
    adapter = instantiate(cfg["env"]["adapter"])
    infer = jax.jit(model.infer_action)
    return cfg, model, params, adapter, infer


def rollout(cfg, model, params, adapter, infer):
    """Returns (eef trajectory [T, 8], first action chunk)."""
    env = FakeSimplerEnv()
    rng = jax.random.PRNGKey(SEED)
    traj, first_chunk = [], None
    for ep in range(EPISODES):
        obs, _ = env.reset(options={"obj_init_options": {"episode_id": ep}})
        adapter.reset()
        instruction = env.get_language_instruction()
        truncated = False
        while not truncated:
            inputs = adapter.preprocess(env, obs, instruction)
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(
                sub,
                (1, model.spec.num_action_tokens, model.spec.action_dim),
                jnp.bfloat16,
            )
            actions = infer(
                params,
                inputs["input_ids"],
                inputs["attention_mask"],
                inputs["pixel_values"].astype(jnp.bfloat16),
                inputs["proprios"].astype(jnp.bfloat16),
                noise,
            )
            chunk = np.asarray(actions[0], np.float32)
            if first_chunk is None:
                first_chunk = chunk.copy()
            env_actions = adapter.postprocess(chunk)
            for a in env_actions[: cfg["act_steps"]]:
                obs, _, _, truncated, _ = env.step(a)
                traj.append(obs["agent"]["eef_pos"].copy())
                if truncated:
                    break
    return np.array(traj), first_chunk


def main():
    results = {}
    built = build(w8a8=False)
    for tag in ("bf16", "bf16_rerun"):  # same program twice: determinism control
        results[tag] = rollout(*built)
        print(f"{tag}: rolled {len(results[tag][0])} env steps", flush=True)
    del built
    gc.collect()
    built = build(w8a8=True)
    results["w8a8"] = rollout(*built)
    print(f"w8a8: rolled {len(results['w8a8'][0])} env steps", flush=True)
    del built

    t_ref, c_ref = results["bf16"]
    for tag in ("bf16_rerun", "w8a8"):
        t, c = results[tag]
        d = np.abs(t - t_ref)
        print(
            f"{tag:10s} vs bf16: first-chunk action MAE {np.abs(c - c_ref).mean():.5f} "
            f"max {np.abs(c - c_ref).max():.5f} | eef divergence per-step "
            f"mean {d.mean():.6f} max {d.max():.6f} final {d[-1].max():.6f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
