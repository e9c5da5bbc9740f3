"""Differential parity of the native Llama/Qwen2 decoder vs HuggingFace
transformers (installed in this container): identical random weights bridged
from tiny HF models, asserting full-sequence logits allclose and greedy
decode token-identical.

This validates the OpenVLA-7B backbone (Llama-2 arch: GQA-capable attention,
SiLU MLP, Llama-convention RMSNorm) and the MiniVLA backbone (Qwen2.5 arch:
QKV biases, tied lm_head) against the canonical implementation the reference
runs through transformers (reference scripts/eval_hf_vla_simpler.py /
eval_prismatic_vla_simpler.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

transformers = pytest.importorskip("transformers")

from blurr_tpu.models.openvla import llama as L  # noqa: E402
from blurr_tpu.models.openvla.llama import LlamaSpec  # noqa: E402


def t2n(t):
    return t.detach().float().numpy()


def bridge_hf(hf_model, spec: LlamaSpec) -> dict:
    """HF (Llama|Qwen2)ForCausalLM -> blurr stacked llama param tree."""
    m = hf_model.model
    layers = list(m.layers)

    def stack(path):
        mats = []
        for layer in layers:
            mod = layer
            for part in path.split("."):
                mod = getattr(mod, part)
            mats.append(t2n(mod.weight).T)
        return jnp.asarray(np.stack(mats))

    def stack_vec(path, attr="weight"):
        out = []
        for layer in layers:
            mod = layer
            for part in path.split("."):
                mod = getattr(mod, part)
            out.append(t2n(getattr(mod, attr)))
        return jnp.asarray(np.stack(out))

    params = {
        "embed_tokens": jnp.asarray(t2n(m.embed_tokens.weight)),
        "layers": {
            "q_w": stack("self_attn.q_proj"),
            "k_w": stack("self_attn.k_proj"),
            "v_w": stack("self_attn.v_proj"),
            "o_w": stack("self_attn.o_proj"),
            "gate_w": stack("mlp.gate_proj"),
            "up_w": stack("mlp.up_proj"),
            "down_w": stack("mlp.down_proj"),
            "input_norm": stack_vec("input_layernorm"),
            "post_norm": stack_vec("post_attention_layernorm"),
        },
        "final_norm": jnp.asarray(t2n(m.norm.weight)),
    }
    if spec.qkv_bias:
        params["layers"]["q_b"] = stack_vec("self_attn.q_proj", "bias")
        params["layers"]["k_b"] = stack_vec("self_attn.k_proj", "bias")
        params["layers"]["v_b"] = stack_vec("self_attn.v_proj", "bias")
    if not spec.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(t2n(hf_model.lm_head.weight)).T
    return params


def my_full_logits(params, spec, ids):
    b, s = ids.shape
    embeds = params["embed_tokens"][jnp.asarray(ids)]
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    mask = L.causal_prefill_mask(jnp.ones((b, s), jnp.int32), s)
    cache = L.alloc_cache(spec, b, s, jnp.float32)
    h, _ = L.forward(params, spec, embeds, pos, mask, cache, jnp.int32(0))
    return L.logits(params, spec, h)


def run_case(hf_model, spec, seed=0):
    torch = transformers.modeling_utils.torch
    torch.set_grad_enabled(False)
    hf_model = hf_model.eval()
    params = bridge_hf(hf_model, spec)

    rng = np.random.RandomState(seed)
    ids = rng.randint(0, spec.vocab_size - 4, (2, 7))
    out_hf = hf_model(torch.tensor(ids)).logits
    out_mine = my_full_logits(params, spec, ids)
    np.testing.assert_allclose(
        np.asarray(out_mine), t2n(out_hf), atol=3e-4, rtol=3e-4
    )

    # greedy decode parity (HF generate vs greedy_generate)
    gen_hf = hf_model.generate(
        torch.tensor(ids),
        max_new_tokens=5,
        do_sample=False,
        pad_token_id=0,
    )[:, ids.shape[1]:]
    embeds = params["embed_tokens"][jnp.asarray(ids)]
    gen_mine = L.greedy_generate(
        params, spec, embeds, jnp.ones_like(jnp.asarray(ids)), 5
    )
    np.testing.assert_array_equal(np.asarray(gen_mine), t2n(gen_hf).astype(np.int64))


def test_llama_arch_matches_transformers():
    cfg = transformers.LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        attn_implementation="eager",
        tie_word_embeddings=False,
    )
    hf = transformers.LlamaForCausalLM(cfg)
    spec = LlamaSpec(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, eps=1e-5,
    )
    run_case(hf, spec, seed=0)


def test_qwen2_arch_matches_transformers():
    cfg = transformers.Qwen2Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        attn_implementation="eager",
        tie_word_embeddings=True,
        use_sliding_window=False,
    )
    hf = transformers.Qwen2ForCausalLM(cfg)
    spec = LlamaSpec(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, eps=1e-6,
        qkv_bias=True, tie_word_embeddings=True,
    )
    run_case(hf, spec, seed=1)


def bridge_dinov2(hf_model, n_layers):
    """HF Dinov2Model -> blurr ViTSpec param tree (fused qkv, [in,out])."""
    emb = hf_model.embeddings
    conv = t2n(emb.patch_embeddings.projection.weight)  # [D, C, p, p]
    d = conv.shape[0]
    layers = list(hf_model.encoder.layer)[:n_layers]

    return {
        "patch_w": jnp.asarray(conv.transpose(2, 3, 1, 0).reshape(-1, d)),
        "patch_b": jnp.asarray(t2n(emb.patch_embeddings.projection.bias)),
        "pos_embed": jnp.asarray(t2n(emb.position_embeddings)[0]),
        "cls_token": jnp.asarray(t2n(emb.cls_token)),
        "layers": {
            "ln1_w": jnp.asarray(np.stack([t2n(l.norm1.weight) for l in layers])),
            "ln1_b": jnp.asarray(np.stack([t2n(l.norm1.bias) for l in layers])),
            "ln2_w": jnp.asarray(np.stack([t2n(l.norm2.weight) for l in layers])),
            "ln2_b": jnp.asarray(np.stack([t2n(l.norm2.bias) for l in layers])),
            "qkv_w": jnp.asarray(
                np.stack(
                    [
                        np.concatenate(
                            [
                                t2n(l.attention.attention.query.weight).T,
                                t2n(l.attention.attention.key.weight).T,
                                t2n(l.attention.attention.value.weight).T,
                            ],
                            axis=-1,
                        )
                        for l in layers
                    ]
                )
            ),
            "qkv_b": jnp.asarray(
                np.stack(
                    [
                        np.concatenate(
                            [
                                t2n(l.attention.attention.query.bias),
                                t2n(l.attention.attention.key.bias),
                                t2n(l.attention.attention.value.bias),
                            ]
                        )
                        for l in layers
                    ]
                )
            ),
            "out_w": jnp.asarray(
                np.stack([t2n(l.attention.output.dense.weight).T for l in layers])
            ),
            "out_b": jnp.asarray(
                np.stack([t2n(l.attention.output.dense.bias) for l in layers])
            ),
            "fc1_w": jnp.asarray(
                np.stack([t2n(l.mlp.fc1.weight).T for l in layers])
            ),
            "fc1_b": jnp.asarray(np.stack([t2n(l.mlp.fc1.bias) for l in layers])),
            "fc2_w": jnp.asarray(
                np.stack([t2n(l.mlp.fc2.weight).T for l in layers])
            ),
            "fc2_b": jnp.asarray(np.stack([t2n(l.mlp.fc2.bias) for l in layers])),
            "ls1": jnp.asarray(
                np.stack([t2n(l.layer_scale1.lambda1) for l in layers])
            ),
            "ls2": jnp.asarray(
                np.stack([t2n(l.layer_scale2.lambda1) for l in layers])
            ),
        },
    }


@pytest.mark.parametrize("feature_layer,total_layers", [(-1, 2), (-2, 3)])
def test_dinov2_vit_matches_transformers(feature_layer, total_layers):
    """The generic ViT (cls token, LayerScale, exact GELU — the DINOv2 tower
    of OpenVLA's fused backbone) matches HF Dinov2Model block outputs,
    including the prismatic feature_layer=-2 penultimate-block read."""
    from blurr_tpu.models.openvla.vit import ViTSpec, vit_forward

    torch = transformers.modeling_utils.torch
    torch.set_grad_enabled(False)
    cfg = transformers.Dinov2Config(
        hidden_size=64,
        num_hidden_layers=total_layers,
        num_attention_heads=4,
        intermediate_size=128,
        image_size=28,
        patch_size=14,
        layerscale_value=1e-5,
        hidden_act="gelu",
    )
    hf = transformers.Dinov2Model(cfg).eval()
    g = torch.Generator().manual_seed(3)
    for p in hf.parameters():
        p.data = torch.randn(p.shape, generator=g) * 0.1

    spec = ViTSpec(
        hidden_size=64,
        intermediate_size=128,
        num_layers=total_layers,
        num_heads=4,
        patch_size=14,
        image_size=28,
        cls_token=True,
        layerscale=True,
        feature_layer=feature_layer,
    )
    params = bridge_dinov2(hf, spec.effective_num_layers)

    rng = np.random.RandomState(7)
    px = rng.randn(2, 3, 28, 28).astype(np.float32)
    out_hf = hf(torch.tensor(px), output_hidden_states=True).hidden_states
    # hidden_states[k] = output AFTER block k (index 0 = embeddings);
    # feature_layer=-1 -> after last block, -2 -> after penultimate
    want = t2n(out_hf[total_layers + feature_layer + 1])[:, 1:]  # drop cls

    got = np.asarray(vit_forward(params, jnp.asarray(px), spec))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=3e-5)
