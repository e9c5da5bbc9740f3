"""OpenVLA checkpoint bridge on synthetic HF-format files: prismatic
safetensors layout, OFT aux .pt reconstruction, norm-stats loading."""

import json

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from blurr_tpu.models.openvla.checkpoint import (
    infer_unnorm_key,
    load_norm_stats,
    load_oft_aux_params,
    openvla_params_from_hf_dir,
)
from blurr_tpu.models.openvla.model import OpenVLA, OpenVLASpec, oft_action_head_forward


def synth_hf_snapshot(tmp_path, spec):
    """Write safetensors with the prismatic key layout for the tiny spec."""
    from safetensors.torch import save_file

    rng = np.random.RandomState(0)
    t = lambda *shape: torch.tensor(rng.randn(*shape).astype(np.float32) * 0.05)
    state = {}
    ls = spec.llama
    state["language_model.model.embed_tokens.weight"] = t(ls.vocab_size, ls.hidden_size)
    state["language_model.model.norm.weight"] = t(ls.hidden_size)
    state["language_model.lm_head.weight"] = t(ls.vocab_size, ls.hidden_size)
    for i in range(ls.num_layers):
        lp = f"language_model.model.layers.{i}."
        state[lp + "self_attn.q_proj.weight"] = t(ls.num_heads * ls.head_dim, ls.hidden_size)
        state[lp + "self_attn.k_proj.weight"] = t(ls.num_kv_heads * ls.head_dim, ls.hidden_size)
        state[lp + "self_attn.v_proj.weight"] = t(ls.num_kv_heads * ls.head_dim, ls.hidden_size)
        state[lp + "self_attn.o_proj.weight"] = t(ls.hidden_size, ls.num_heads * ls.head_dim)
        state[lp + "mlp.gate_proj.weight"] = t(ls.intermediate_size, ls.hidden_size)
        state[lp + "mlp.up_proj.weight"] = t(ls.intermediate_size, ls.hidden_size)
        state[lp + "mlp.down_proj.weight"] = t(ls.hidden_size, ls.intermediate_size)
        state[lp + "input_layernorm.weight"] = t(ls.hidden_size)
        state[lp + "post_attention_layernorm.weight"] = t(ls.hidden_size)

    def vit_state(prefix, vs, cls_reg):
        d, inter = vs.hidden_size, vs.intermediate_size
        state[prefix + "patch_embed.proj.weight"] = t(d, 3, vs.patch_size, vs.patch_size)
        state[prefix + "patch_embed.proj.bias"] = t(d)
        # timm reg4 models (no_embed_class) store a PATCHES-ONLY pos table;
        # the cls pos row is folded into cls_token by timm's converter
        n_pos = vs.num_patches
        state[prefix + "pos_embed"] = t(1, n_pos, d)
        if cls_reg:
            state[prefix + "cls_token"] = t(1, 1, d)
            state[prefix + "reg_token"] = t(1, vs.reg_tokens, d)
        for i in range(vs.num_layers):  # bridge stacks only effective layers
            bp = prefix + f"blocks.{i}."
            state[bp + "norm1.weight"] = t(d)
            state[bp + "norm1.bias"] = t(d)
            state[bp + "norm2.weight"] = t(d)
            state[bp + "norm2.bias"] = t(d)
            state[bp + "attn.qkv.weight"] = t(3 * d, d)
            state[bp + "attn.qkv.bias"] = t(3 * d)
            state[bp + "attn.proj.weight"] = t(d, d)
            state[bp + "attn.proj.bias"] = t(d)
            state[bp + "mlp.fc1.weight"] = t(inter, d)
            state[bp + "mlp.fc1.bias"] = t(inter)
            state[bp + "mlp.fc2.weight"] = t(d, inter)
            state[bp + "mlp.fc2.bias"] = t(d)
            if cls_reg:  # dinov2 layerscale
                state[bp + "ls1.gamma"] = t(d)
                state[bp + "ls2.gamma"] = t(d)

    vit_state("vision_backbone.featurizer.", spec.dinov2, True)
    vit_state("vision_backbone.fused_featurizer.", spec.siglip, False)
    for name, din in (("fc1", spec.vision_dim), ("fc2", spec.llama.hidden_size),
                      ("fc3", spec.llama.hidden_size)):
        state[f"projector.{name}.weight"] = t(spec.llama.hidden_size, din)
        state[f"projector.{name}.bias"] = t(spec.llama.hidden_size)
    save_file(state, str(tmp_path / "model.safetensors"))

    stats = {"bridge_orig": {"action": {"q01": [-1.0] * 7, "q99": [1.0] * 7,
                                        "mask": [True] * 6 + [False]}}}
    (tmp_path / "dataset_statistics.json").write_text(json.dumps(stats))
    return state


def test_openvla_bridge_loads_and_runs(tmp_path):
    spec = OpenVLASpec.tiny()
    synth_hf_snapshot(tmp_path, spec)
    params = openvla_params_from_hf_dir(str(tmp_path), spec, jnp.float32)
    # only effective (penultimate-feature) blocks stacked
    assert params["dinov2"]["layers"]["qkv_w"].shape[0] == spec.dinov2.effective_num_layers
    assert params["siglip"]["layers"]["qkv_w"].shape[0] == spec.siglip.effective_num_layers
    assert params["llama"]["layers"]["q_w"].shape[0] == spec.llama.num_layers

    stats = load_norm_stats(str(tmp_path))
    assert infer_unnorm_key(stats) == "bridge_orig"

    model = OpenVLA(spec, stats)
    rng = np.random.RandomState(1)
    ids = np.array([[1, 100, 200]], np.int32)
    img = rng.rand(1, 6, 28, 28).astype(np.float32)
    actions = model.predict_action(params, ids, img, unnorm_key="bridge_orig")
    assert actions.shape == (7,)
    assert np.isfinite(actions).all()


def test_oft_aux_reconstruction(tmp_path):
    """Shape-driven OFT head loading from action_head--*.pt (reference
    eval_hf_vla_simpler.py:76-132 semantics) + math equivalence."""
    rng = np.random.RandomState(2)
    in_dim, hidden, out_dim, n_blocks = 12, 8, 4, 2
    t = lambda *s: torch.tensor(rng.randn(*s).astype(np.float32))
    state = {
        "module.model.layer_norm1.weight": t(in_dim),
        "module.model.layer_norm1.bias": t(in_dim),
        "module.model.fc1.weight": t(hidden, in_dim),
        "module.model.fc1.bias": t(hidden),
        "module.model.layer_norm2.weight": t(hidden),
        "module.model.layer_norm2.bias": t(hidden),
        "module.model.fc2.weight": t(out_dim, hidden),
        "module.model.fc2.bias": t(out_dim),
        "extraneous.key": t(3),
    }
    for i in range(n_blocks):
        state[f"module.model.mlp_resnet_blocks.{i}.ffn.0.weight"] = t(hidden)
        state[f"module.model.mlp_resnet_blocks.{i}.ffn.0.bias"] = t(hidden)
        state[f"module.model.mlp_resnet_blocks.{i}.ffn.1.weight"] = t(hidden, hidden)
        state[f"module.model.mlp_resnet_blocks.{i}.ffn.1.bias"] = t(hidden)
    torch.save(state, tmp_path / "action_head--10000_checkpoint.pt")
    # proprio checkpoints use the "module." prefix, NOT "module.model."
    # (reference eval_hf_vla_simpler.py:119-128) — the round-2 code got this
    # wrong and the old same-author fixture matched the bug; the differential
    # suite (test_reference_parity_hf_eval.py) now pins the real layout.
    torch.save(
        {
            "module.fc1.weight": t(hidden, 8),
            "module.fc1.bias": t(hidden),
            "module.fc2.weight": t(out_dim, hidden),
            "module.fc2.bias": t(out_dim),
        },
        tmp_path / "proprio_projector--10000_checkpoint.pt",
    )
    head, proj = load_oft_aux_params(str(tmp_path), jnp.float32)
    assert head is not None and proj is not None
    assert head["blocks"]["w"].shape == (n_blocks, hidden, hidden)

    # forward equals a literal torch evaluation of the same weights
    x = rng.randn(3, in_dim).astype(np.float32)
    tx = torch.tensor(x)
    y = torch.nn.functional.layer_norm(
        tx, (in_dim,), state["module.model.layer_norm1.weight"],
        state["module.model.layer_norm1.bias"], 1e-5,
    )
    y = torch.nn.functional.linear(y, state["module.model.fc1.weight"],
                                   state["module.model.fc1.bias"])
    for i in range(n_blocks):
        z = torch.nn.functional.layer_norm(
            y, (hidden,), state[f"module.model.mlp_resnet_blocks.{i}.ffn.0.weight"],
            state[f"module.model.mlp_resnet_blocks.{i}.ffn.0.bias"], 1e-5,
        )
        y = y + torch.nn.functional.linear(
            z, state[f"module.model.mlp_resnet_blocks.{i}.ffn.1.weight"],
            state[f"module.model.mlp_resnet_blocks.{i}.ffn.1.bias"],
        )
    y = torch.nn.functional.layer_norm(
        y, (hidden,), state["module.model.layer_norm2.weight"],
        state["module.model.layer_norm2.bias"], 1e-5,
    )
    ref = torch.nn.functional.linear(
        y, state["module.model.fc2.weight"], state["module.model.fc2.bias"]
    ).numpy()
    ours = np.asarray(oft_action_head_forward(head, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_qwen2_style_backbone_bridge():
    """Qwen2-family (MiniVLA) layout: attention QKV biases + tied lm_head.
    The bridge must pick up the biases and omit lm_head so the logits path
    falls back to embed_tokens.T (reference reaches MiniVLA only through the
    external openvla-mini repo, eval_prismatic_vla_simpler.py:240-281)."""
    import jax

    from blurr_tpu.models.openvla.checkpoint import llama_params_from_hf
    from blurr_tpu.models.openvla.llama import (
        LlamaSpec,
        causal_prefill_mask,
        greedy_generate,
        init_llama_params,
    )

    spec = LlamaSpec(
        vocab_size=96, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, qkv_bias=True, tie_word_embeddings=True,
        rope_theta=1_000_000.0, eps=1e-6,
    )
    rng = np.random.RandomState(3)
    t = lambda *shape: torch.tensor(rng.randn(*shape).astype(np.float32) * 0.1)
    prefix = "llm_backbone.llm."
    state = {
        prefix + "model.embed_tokens.weight": t(spec.vocab_size, spec.hidden_size),
        prefix + "model.norm.weight": t(spec.hidden_size),
    }
    hd = spec.head_dim
    for i in range(spec.num_layers):
        lp = f"{prefix}model.layers.{i}."
        state[lp + "self_attn.q_proj.weight"] = t(spec.num_heads * hd, spec.hidden_size)
        state[lp + "self_attn.q_proj.bias"] = t(spec.num_heads * hd)
        state[lp + "self_attn.k_proj.weight"] = t(spec.num_kv_heads * hd, spec.hidden_size)
        state[lp + "self_attn.k_proj.bias"] = t(spec.num_kv_heads * hd)
        state[lp + "self_attn.v_proj.weight"] = t(spec.num_kv_heads * hd, spec.hidden_size)
        state[lp + "self_attn.v_proj.bias"] = t(spec.num_kv_heads * hd)
        state[lp + "self_attn.o_proj.weight"] = t(spec.hidden_size, spec.num_heads * hd)
        state[lp + "mlp.gate_proj.weight"] = t(spec.intermediate_size, spec.hidden_size)
        state[lp + "mlp.up_proj.weight"] = t(spec.intermediate_size, spec.hidden_size)
        state[lp + "mlp.down_proj.weight"] = t(spec.hidden_size, spec.intermediate_size)
        state[lp + "input_layernorm.weight"] = t(spec.hidden_size)
        state[lp + "post_attention_layernorm.weight"] = t(spec.hidden_size)

    params = llama_params_from_hf(state, prefix=prefix)
    assert "lm_head" not in params
    assert {"q_b", "k_b", "v_b"} <= set(params["layers"])

    # same tree structure as a native init with the matching spec
    ref = init_llama_params(jax.random.PRNGKey(0), spec)
    assert jax.tree.structure(params) == jax.tree.structure(
        jax.tree.map(np.asarray, ref)
    )

    params = jax.tree.map(jnp.asarray, params)
    embeds = params["embed_tokens"][jnp.arange(6)[None]]
    toks = greedy_generate(
        params, spec, embeds, jnp.ones((1, 6), jnp.int32), num_new_tokens=3
    )
    assert toks.shape == (1, 3)
    assert ((0 <= np.asarray(toks)) & (np.asarray(toks) < spec.vocab_size)).all()

    # biases are live: zeroing them must change the prefill hidden states
    from blurr_tpu.models.openvla import llama as llama_lib

    cache = llama_lib.alloc_cache(spec, 1, 6, jnp.float32)
    mask = causal_prefill_mask(jnp.ones((1, 6), jnp.int32), 6)
    pos = jnp.arange(6)[None]
    h1, _ = llama_lib.forward(params, spec, embeds, pos, mask, cache, jnp.int32(0))
    p0 = dict(params, layers=dict(params["layers"]))
    for k in ("q_b", "k_b", "v_b"):
        p0["layers"][k] = jnp.zeros_like(p0["layers"][k])
    h0, _ = llama_lib.forward(p0, spec, embeds, pos, mask, cache, jnp.int32(0))
    assert not np.allclose(np.asarray(h1), np.asarray(h0))


def test_tied_head_quantization_materializes_int8_head():
    """quantize_llama_w8a8 on a tied-embedding tree must materialize a
    quantized lm_head copy (the decode-logits matmul is the largest weight
    read) while keeping the fp embedding for the gather."""
    import jax

    from blurr_tpu.models.openvla.llama import (
        LlamaSpec,
        init_llama_params,
        logits,
        quantize_llama_w8a8,
    )

    spec = LlamaSpec(
        vocab_size=64, hidden_size=32, intermediate_size=48, num_layers=2,
        num_heads=4, num_kv_heads=2, qkv_bias=True, tie_word_embeddings=True,
    )
    params = init_llama_params(jax.random.PRNGKey(0), spec)
    assert "lm_head" not in params
    qp = quantize_llama_w8a8(params)
    assert isinstance(qp["lm_head"], dict) and "q8a" in qp["lm_head"]
    assert qp["embed_tokens"].dtype == params["embed_tokens"].dtype
    # biases survive quantization untouched
    assert qp["layers"]["q_b"].dtype == params["layers"]["q_b"].dtype

    h = jnp.ones((1, 1, spec.hidden_size), jnp.float32)
    lg_fp = np.asarray(logits(params, spec, h), np.float32)
    lg_q = np.asarray(logits(qp, spec, h), np.float32)
    # int8 head tracks the fp tied head closely
    assert np.abs(lg_fp - lg_q).max() < 0.05 * (np.abs(lg_fp).max() + 1e-6) + 0.05


def test_quantized_inits_honor_spec_flags():
    import jax

    from blurr_tpu.models.openvla.llama import (
        LlamaSpec,
        init_llama_params_w4a8,
        init_llama_params_w8a8,
    )

    spec = LlamaSpec(
        vocab_size=64, hidden_size=128, intermediate_size=256, num_layers=2,
        num_heads=2, num_kv_heads=1, qkv_bias=True, tie_word_embeddings=True,
    )
    for init in (init_llama_params_w8a8, init_llama_params_w4a8):
        p = init(jax.random.PRNGKey(0), spec)
        assert {"q_b", "k_b", "v_b"} <= set(p["layers"]), init.__name__


def test_prismatic_vision_bridge(tmp_path):
    """MiniVLA-layout .pt: SigLIP featurizer + 2-layer MLP projector bridge
    into the non-fused model and change its outputs vs random init."""
    import jax

    from blurr_tpu.models.openvla.checkpoint import prismatic_vision_params
    from blurr_tpu.models.openvla.llama import LlamaSpec
    from blurr_tpu.models.openvla.model import OpenVLASpec
    from blurr_tpu.models.openvla.vit import ViTSpec

    spec = OpenVLASpec(
        llama=LlamaSpec(vocab_size=64, hidden_size=32, intermediate_size=48,
                        num_layers=1, num_heads=4, num_kv_heads=2),
        siglip=ViTSpec(hidden_size=48, intermediate_size=96, num_layers=2,
                       num_heads=2, image_size=28, feature_layer=-1),
        use_fused_vision=False,
    )
    rng = np.random.RandomState(0)
    t = lambda *shape: torch.tensor(rng.randn(*shape).astype(np.float32) * 0.1)
    d, inter = spec.siglip.hidden_size, spec.siglip.intermediate_size
    state = {
        "vision_backbone.featurizer.patch_embed.proj.weight": t(d, 3, 14, 14),
        "vision_backbone.featurizer.patch_embed.proj.bias": t(d),
        "vision_backbone.featurizer.pos_embed": t(1, spec.siglip.num_patches, d),
        "projector.projector.0.weight": t(spec.llama.hidden_size, d),
        "projector.projector.0.bias": t(spec.llama.hidden_size),
        "projector.projector.2.weight": t(spec.llama.hidden_size, spec.llama.hidden_size),
        "projector.projector.2.bias": t(spec.llama.hidden_size),
    }
    for i in range(spec.siglip.num_layers):
        bp = f"vision_backbone.featurizer.blocks.{i}."
        state[bp + "norm1.weight"] = t(d)
        state[bp + "norm1.bias"] = t(d)
        state[bp + "norm2.weight"] = t(d)
        state[bp + "norm2.bias"] = t(d)
        state[bp + "attn.qkv.weight"] = t(3 * d, d)
        state[bp + "attn.qkv.bias"] = t(3 * d)
        state[bp + "attn.proj.weight"] = t(d, d)
        state[bp + "attn.proj.bias"] = t(d)
        state[bp + "mlp.fc1.weight"] = t(inter, d)
        state[bp + "mlp.fc1.bias"] = t(inter)
        state[bp + "mlp.fc2.weight"] = t(d, inter)
        state[bp + "mlp.fc2.bias"] = t(d)

    vis, proj = prismatic_vision_params(state, spec)
    assert set(proj) == {"fc1_w", "fc1_b", "fc2_w", "fc2_b"}

    from blurr_tpu.models.openvla.model import OpenVLA

    model = OpenVLA(spec)
    params = model.init_params(jax.random.PRNGKey(1))
    assert "fc3_w" not in params["projector"]  # non-fused = 2-layer projector
    px = jnp.asarray(rng.randn(1, 3, 28, 28), jnp.float32)
    before = np.asarray(model._vision_features(params, px))
    params["siglip"] = jax.tree.map(jnp.asarray, vis)
    params["projector"] = jax.tree.map(jnp.asarray, proj)
    after = np.asarray(model._vision_features(params, px))
    assert before.shape == after.shape
    assert not np.allclose(before, after)
    assert np.isfinite(after).all()
