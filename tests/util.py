"""Shared test helpers: a layer-reduced Pi-0 config (BASELINE.json config #1
style: bridge.yaml schema with shrunk dims)."""

from blurr_tpu.config.core import Config


def tiny_pi0_cfg(**overrides) -> Config:
    cfg = {
        "max_seq_len": 12,
        "max_image_text_tokens": 12,
        "num_inference_steps": 4,
        "final_action_clip_value": 1.0,
        "flow_sig_min": 0.001,
        "cond_steps": 1,
        "horizon_steps": 4,
        "act_steps": 4,
        "action_dim": 7,
        "proprio_dim": 7,
        "image_token_index": 50,
        "vocab_size": 64,
        "pad_token_id": 0,
        "time_max_period": 10000.0,
        "action_expert_adaptive_mode": None,
        "time_hidden_size": 16,
        "use_bf16": False,
        "mixture": {
            "vlm": {
                "hidden_size": 32,
                "intermediate_size": 64,
                "use_final_norm": False,
                "cache": True,
                "adaptive_mode": None,
                "rope_theta": 10000.0,
            },
            "proprio": {
                "hidden_size": 16,
                "intermediate_size": 32,
                "use_final_norm": True,
                "cache": True,
                "adaptive_mode": None,
                "rope_theta": 10000.0,
            },
            "action": {
                "hidden_size": 16,
                "intermediate_size": 32,
                "use_final_norm": True,
                "cache": False,
                "adaptive_mode": None,
                "rope_theta": 10000.0,
            },
        },
        "vision": {
            "_target_": "blurr_tpu.models.pi0.siglip.SiglipVisionModel",
            "config": {
                "hidden_size": 24,
                "intermediate_size": 48,
                "num_hidden_layers": 2,
                "num_attention_heads": 2,
                "num_channels": 3,
                "image_size": 28,
                "patch_size": 14,
                "layer_norm_eps": 1e-6,
                "attention_dropout": 0.0,
                "num_image_tokens": 4,
            },
        },
        "vision_projector": {
            "_target_": "blurr_tpu.models.pi0.siglip.PaliGemmaMultiModalProjector",
            "config": {"vision_config": {"hidden_size": 24, "projection_dim": 32}},
        },
        "joint": {
            "_target_": "blurr_tpu.models.pi0.joint.JointModel",
            "config": {
                "action_expert_adaptive_mode": None,
                "time_hidden_size": 16,
                "num_hidden_layers": 3,
                "num_attention_heads": 2,
                "num_key_value_heads": 1,
                "head_dim": 16,
                "rms_norm_eps": 1e-6,
                "attention_bias": False,
                "attention_dropout": 0.0,
                "pad_token_id": 0,
                "use_flash_attn": False,
                "mixture": None,  # filled below
            },
        },
    }
    cfg["joint"]["config"]["mixture"] = cfg["mixture"]
    cfg = Config.wrap(cfg)
    for k, v in overrides.items():
        cfg[k] = v
    return cfg


def tiny_inputs(cfg, rng_seed=0, batch=2, n_text=3):
    """Random but deterministic model inputs for the tiny config."""
    import numpy as np

    import jax.numpy as jnp

    rng = np.random.RandomState(rng_seed)
    s_img = cfg.vision.config.num_image_tokens
    seq = cfg.max_image_text_tokens
    ids = np.zeros((batch, seq), np.int32)
    mask = np.zeros((batch, seq), np.int32)
    for b in range(batch):
        n_valid = s_img + 1 + n_text + b  # image + bos + text (varying length)
        ids[b, :s_img] = cfg.image_token_index
        text = rng.randint(3, cfg.vocab_size - 1, n_valid - s_img)
        # the random text span must not collide with the image token id:
        # VLAProcessor guarantees image tokens are a strict prefix, and the
        # reference's embed-merge scatter crashes on spurious mid-text ones
        text[text == cfg.image_token_index] = 3
        ids[b, s_img : n_valid] = text
        mask[b, :n_valid] = 1
    img_size = cfg.vision.config.image_size
    pixels = rng.rand(batch, 3, img_size, img_size).astype(np.float32) * 2 - 1
    proprios = rng.randn(batch, cfg.cond_steps, cfg.proprio_dim).astype(np.float32)
    noise = rng.randn(batch, cfg.horizon_steps, cfg.action_dim).astype(np.float32)
    return {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(mask),
        "pixel_values": jnp.asarray(pixels),
        "proprios": jnp.asarray(proprios),
        "noise": jnp.asarray(noise),
    }
