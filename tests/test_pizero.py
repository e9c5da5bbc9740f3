"""End-to-end Pi-0 invariants on a layer-reduced random-init model.

The reference's own informal invariant (src/agent/eval.py:213-214): cached
(infer_action) and naive (infer_action_naive) paths agree exactly in float32
given the same initial noise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blurr_tpu.models.pi0.pizero import PiZero
from tests.util import tiny_inputs, tiny_pi0_cfg


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_pi0_cfg()
    model = PiZero(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    params = model.tie_action_proprio_weights(params)
    return model, params


def test_cache_vs_naive_equivalence_fp32(model_and_params):
    model, params = model_and_params
    inputs = tiny_inputs(model.cfg)
    cached = model.infer_action(params, **inputs)
    naive = model.infer_action_naive(params, **inputs)
    assert cached.shape == (2, 4, 7)
    np.testing.assert_allclose(
        np.asarray(cached), np.asarray(naive), rtol=1e-4, atol=1e-5
    )


def test_actions_clipped(model_and_params):
    model, params = model_and_params
    inputs = tiny_inputs(model.cfg)
    actions = np.asarray(model.infer_action(params, **inputs))
    clip = model.spec.final_action_clip_value
    assert (actions <= clip).all() and (actions >= -clip).all()


def test_jit_compiles_and_matches_eager(model_and_params):
    model, params = model_and_params
    inputs = tiny_inputs(model.cfg)
    eager = model.infer_action(params, **inputs)
    jitted = jax.jit(model.infer_action)(params, **inputs)
    np.testing.assert_allclose(
        np.asarray(eager), np.asarray(jitted), rtol=1e-5, atol=1e-6
    )


def test_inference_steps_change_output(model_and_params):
    model, params = model_and_params
    inputs = tiny_inputs(model.cfg)
    a1 = np.asarray(model.infer_action(params, num_inference_steps=1, **inputs))
    a4 = np.asarray(model.infer_action(params, num_inference_steps=4, **inputs))
    assert not np.allclose(a1, a4)


def test_euler_integration_matches_manual_loop(model_and_params):
    """steps=N scan must equal an unfused python loop over single steps with
    the same velocity model."""
    model, params = model_and_params
    inputs = tiny_inputs(model.cfg)
    n = 3
    scan_out = np.asarray(
        model.infer_action(params, num_inference_steps=n, **inputs)
    )

    # Manual Euler loop via flow_loss internals: reuse infer_action with 1
    # step per call, feeding the integrated action back in as "noise" and the
    # correct time offset -- replicate by calling the naive path machinery.
    from blurr_tpu.models.pi0 import joint as joint_lib
    from blurr_tpu.ops import masks as mask_lib

    s = model.spec
    bsz = inputs["input_ids"].shape[0]
    prefix_mask = mask_lib.pi0_prefix_mask(
        inputs["attention_mask"], s.max_image_text_tokens, s.num_proprio_tokens
    )
    action_mask = mask_lib.pi0_action_mask(
        inputs["attention_mask"], s.max_image_text_tokens,
        s.num_proprio_tokens, s.num_action_tokens,
    )
    vlm_pos, prop_pos, act_pos = mask_lib.pi0_position_ids(
        bsz, s.max_image_text_tokens, s.num_proprio_tokens, s.num_action_tokens
    )
    embeds = model._embed_merge(params, inputs["input_ids"], inputs["pixel_values"])
    prop = model._encode_proprio(params, inputs["proprios"])
    cache = joint_lib.prefill(
        {"vlm": params["joint"]["vlm"], "proprio": params["joint"]["proprio"]},
        model.joint_spec,
        {"vlm": embeds, "proprio": prop},
        {"vlm": vlm_pos, "proprio": prop_pos},
        prefix_mask,
    )
    action = inputs["noise"]
    t = jnp.zeros((bsz,), jnp.float32)
    dt = 1.0 / n
    for _ in range(n):
        temb = model._time_embedding(t).astype(action.dtype)
        a_emb = model._encode_action(params, action, temb)
        hidden = joint_lib.decode(
            {"action": params["joint"]["action"]},
            model.joint_spec, a_emb, act_pos, cache, action_mask, None,
        )
        vel = model._decode_action(params, hidden)
        action = action + dt * vel
        t = t + dt
    manual = np.clip(np.asarray(action), -1.0, 1.0)
    np.testing.assert_allclose(scan_out, manual, rtol=1e-5, atol=1e-6)


def test_flow_loss_finite(model_and_params):
    model, params = model_and_params
    inputs = tiny_inputs(model.cfg)
    rng = np.random.RandomState(7)
    actions = jnp.asarray(rng.randn(2, 4, 7).astype(np.float32))
    t = jnp.asarray([0.3, 0.8], jnp.float32)
    loss = model.flow_loss(
        params,
        inputs["input_ids"],
        inputs["attention_mask"],
        inputs["pixel_values"],
        inputs["proprios"],
        actions,
        t,
        inputs["noise"],
    )
    assert np.isfinite(float(loss))


def test_text_generation_shapes(model_and_params):
    cfg = tiny_pi0_cfg()
    cfg.mixture.vlm.use_final_norm = True
    cfg.joint.config.mixture = cfg.mixture
    cfg.use_lm_head = True
    model = PiZero(cfg)
    params = model.init_params(jax.random.PRNGKey(1))
    inputs = tiny_inputs(cfg)
    max_len = 20
    logits, cache, cache_len = model.infer_text_prefill(
        params, inputs["input_ids"], inputs["pixel_values"], max_len
    )
    # prefill projects the LAST position only (generation reads [:, -1])
    assert logits.shape == (2, 1, cfg.vocab_size)
    tok = jnp.argmax(logits[:, -1, :], axis=-1)
    tok2, cache, cache_len = model.infer_text_decode_step(
        params, tok, cache, cache_len
    )
    assert tok2.shape == (2,)
    assert int(cache_len) == cfg.max_seq_len + 1


def test_infer_action_from_frame_fused_preprocessing(model_and_params):
    """In-graph resize+normalize path: valid output, and close to the host
    preprocessing path on a smooth image."""
    model, params = model_and_params
    inputs = tiny_inputs(model.cfg)
    size = model.vision_cfg["image_size"]
    # smooth gradient frame at camera resolution
    h, w = 60, 80
    yy, xx = np.meshgrid(np.linspace(0, 255, h), np.linspace(0, 255, w), indexing="ij")
    frame = np.stack([yy, xx, (yy + xx) / 2], -1).astype(np.uint8)[None]
    frame = np.broadcast_to(frame, (2, h, w, 3))

    fused = model.infer_action_from_frame(
        params,
        inputs["input_ids"],
        inputs["attention_mask"],
        jnp.asarray(frame),
        inputs["proprios"],
        inputs["noise"],
    )
    assert fused.shape == (2, 4, 7)
    assert np.isfinite(np.asarray(fused)).all()

    # host path: PIL resize + normalize
    from PIL import Image

    resized = np.stack(
        [
            np.array(Image.fromarray(frame[i]).resize((size, size), Image.LANCZOS))
            for i in range(2)
        ]
    )
    px = ((resized.astype(np.float32) / 255.0) - 0.5) / 0.5
    host = model.infer_action(
        params,
        inputs["input_ids"],
        inputs["attention_mask"],
        jnp.asarray(px.transpose(0, 3, 1, 2)),
        inputs["proprios"],
        inputs["noise"],
    )
    # different lanczos taps -> small drift allowed
    np.testing.assert_allclose(np.asarray(fused), np.asarray(host), atol=0.08)


@pytest.mark.parametrize("mode", ["adaLN", "adaLN-Zero"])
def test_adaptive_action_expert_modes(mode):
    """adaLN(-Zero) action expert: time conditioning enters via adaptive
    norms/layerscales instead of the action-encoder concat
    (reference pizero.py:80-98, modules.py:78-119)."""
    cfg = tiny_pi0_cfg()
    cfg.action_expert_adaptive_mode = mode
    for mix in ("proprio", "action"):
        cfg.mixture[mix].adaptive_mode = mode
    cfg.joint.config.mixture = cfg.mixture
    cfg.joint.config.action_expert_adaptive_mode = mode
    model = PiZero(cfg)
    assert model.spec.adaptive_mode == mode
    params = model.init_params(jax.random.PRNGKey(2))
    params = model.tie_action_proprio_weights(params)
    # adaptive param structure present
    an = params["joint"]["action"]["input_norm"]
    assert "to_gamma_w" in an and "to_beta_w" in an
    if mode == "adaLN-Zero":
        assert "post_scale" in params["joint"]["action"]
    # time-cond path: action encoder has NO time concat (w2 is square)
    assert params["action_encoder"]["w2"].shape[0] == params["action_encoder"]["w2"].shape[1]

    inputs = tiny_inputs(cfg)
    out = np.asarray(model.infer_action(params, **inputs))
    assert out.shape == (2, 4, 7)
    assert np.isfinite(out).all()
    # flow time must influence the output through the adaptive conditioning
    a1 = np.asarray(model.infer_action(params, num_inference_steps=1, **inputs))
    a4 = np.asarray(model.infer_action(params, num_inference_steps=4, **inputs))
    assert not np.allclose(a1, a4)


def test_text_generation_padded_batch_matches_unpadded():
    """Right-padded batched text generation must produce the SAME tokens as
    running the short prompt alone: the last-valid-position gather at
    prefill, the pad-column mask, and the pad-corrected RoPE positions in
    decode together make padding invisible (fp32)."""
    cfg = tiny_pi0_cfg()
    cfg.mixture.vlm.use_final_norm = True
    cfg.joint.config.mixture = cfg.mixture
    cfg.use_lm_head = True
    model = PiZero(cfg)
    params = model.init_params(jax.random.PRNGKey(3))
    inputs = tiny_inputs(cfg)
    ids = np.asarray(inputs["input_ids"])
    px = np.asarray(inputs["pixel_values"])
    q_len = ids.shape[1]
    n_valid = q_len - 3  # short prompt: 3 pad slots
    n_steps = 4
    max_len = q_len + n_steps + 1

    def gen(ids_b, px_b, am_b):
        logits, cache, cache_len = model.infer_text_prefill(
            params, jnp.asarray(ids_b), jnp.asarray(px_b), max_len,
            attention_mask=jnp.asarray(am_b),
        )
        tok = jnp.argmax(logits[:, -1, :], axis=-1)
        toks = [np.asarray(tok)]
        av = jnp.asarray(am_b)
        for _ in range(n_steps - 1):
            tok, cache, cache_len = model.infer_text_decode_step(
                params, tok, cache, cache_len, attn_valid=av
            )
            toks.append(np.asarray(tok))
        return np.stack(toks, axis=1)  # [B, n_steps]

    # batched: row 0 = full prompt, row 1 = short prompt right-padded
    ids_short = ids[1:2].copy()
    ids_short[:, n_valid:] = 0
    am = np.ones((2, q_len), np.int32)
    am[1, n_valid:] = 0
    batch_out = gen(
        np.concatenate([ids[0:1], ids_short]),
        np.concatenate([px[0:1], px[1:2]]),
        am,
    )

    # the short prompt alone, unpadded (trim to its true length)
    am_solo = np.ones((1, n_valid), np.int32)
    solo_out = gen(ids_short[:, :n_valid], px[1:2], am_solo)

    np.testing.assert_array_equal(batch_out[1], solo_out[0])


def test_activation_clip_is_per_mixture():
    """action_quantization.activation_clip must apply to the action/proprio
    mixtures only — never to a quantized VLM mixture (and
    kv_quantization.dtype must reject non-int8 values)."""
    cfg = tiny_pi0_cfg()
    cfg["action_quantization"] = {"mode": "w8a8", "activation_clip": 2.0}
    cfg["vlm_quantization"] = {"mode": "w8a8"}
    model = PiZero(cfg)
    ms = model.joint_spec.mixtures
    assert ms["action"].activation_clip == 2.0
    assert ms["proprio"].activation_clip == 2.0
    assert ms["vlm"].activation_clip is None

    cfg2 = tiny_pi0_cfg()
    cfg2["kv_quantization"] = {"mode": "int8", "dtype": "int4"}
    with pytest.raises(ValueError, match="kv_quantization.dtype"):
        PiZero(cfg2)


def test_use_flash_attn_toggle_equivalence():
    """cfg.use_flash_attn=True routes attention through the Pallas kernel
    (interpret mode on CPU) and must produce the same actions as the XLA
    path to kernel tolerance — the reference's SDPA toggle analogue."""
    cfg = tiny_pi0_cfg()
    base = PiZero(cfg)
    params = base.tie_action_proprio_weights(
        base.init_params(jax.random.PRNGKey(0))
    )
    inputs = tiny_inputs(cfg)
    a_xla = np.asarray(base.infer_action(params, **inputs))

    cfg2 = tiny_pi0_cfg()
    cfg2.joint.config.use_flash_attn = True
    flash_model = PiZero(cfg2)
    assert flash_model.joint_spec.attn_impl == "pallas"
    a_flash = np.asarray(flash_model.infer_action(params, **inputs))
    np.testing.assert_allclose(a_flash, a_xla, atol=5e-3)
