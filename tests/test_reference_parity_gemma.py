"""Standalone Gemma causal-LM parity vs reference src/model/paligemma/gemma.py.

The vendored standalone attention has a broken RoPE call —
``self.rotary_emb(position_ids, seq_len=None)`` (gemma.py:92) passes the
position ids as the dtype-carrier ``x`` and None as the positions, which
crashes ``GemmaRotaryEmbedding.forward`` — so the test patches each
attention's ``rotary_emb`` with a thin shim that calls the module with the
intended arguments; everything else (projections, repeat_kv, UN-clamped
scaled-dot-product, fp32 softmax, GemmaRMSNorm, MLP, KVCache append, tied
lm_head) is the reference's real code.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blurr_tpu.utils.reference_bridge import reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

from blurr_tpu.models.paligemma.config import GemmaConfig  # noqa: E402
from blurr_tpu.models.paligemma.model import GemmaForCausalLM  # noqa: E402
from blurr_tpu.utils.reference_bridge import (  # noqa: E402
    DotDict,
    load_reference,
    stack_linear,
    stack_vec as _stack_vec,
    t2n,
)

ref = load_reference()
torch = ref.torch
torch.set_grad_enabled(False)

CFG = dict(
    vocab_size=96,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=8,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    attention_bias=False,
    attention_dropout=0.0,
    pad_token_id=0,
    use_quantize=False,
    use_lora=False,
)


class _RopeShim(torch.nn.Module):
    """Adapter for the reference's broken call convention (gemma.py:92)."""

    def __init__(self, module):
        super().__init__()
        self.module = module

    def forward(self, position_ids, seq_len=None):
        x = position_ids.float()  # dtype-carrier only
        return self.module(x, position_ids)


def bridge_gemma(ref_lm) -> dict:
    layers = list(ref_lm.model.layers)

    def stack(path):
        return jnp.asarray(stack_linear(layers, path))

    def stack_vec(path):
        return jnp.asarray(_stack_vec(layers, path))

    return {
        "embed_tokens": jnp.asarray(t2n(ref_lm.model.embed_tokens.weight)),
        "joint": {
            "vlm": {
                "q_w": stack("self_attn.q_proj"),
                "k_w": stack("self_attn.k_proj"),
                "v_w": stack("self_attn.v_proj"),
                "o_w": stack("self_attn.o_proj"),
                "gate_w": stack("mlp.gate_proj"),
                "up_w": stack("mlp.up_proj"),
                "down_w": stack("mlp.down_proj"),
                "input_norm": {"scale": stack_vec("input_layernorm")},
                "post_norm": {"scale": stack_vec("post_attention_layernorm")},
                "final_norm": {"scale": jnp.asarray(t2n(ref_lm.model.norm.weight))},
            }
        },
    }


def test_standalone_gemma_prefill_and_decode():
    ref_lm = ref.gemma.GemmaForCausalLM(DotDict(CFG)).eval()
    g = torch.Generator().manual_seed(23)
    for p in ref_lm.parameters():
        p.data = torch.randn(p.shape, generator=g) * 0.1
    ref_lm.tie_weights()
    for layer in ref_lm.model.layers:
        layer.self_attn.rotary_emb = _RopeShim(layer.self_attn.rotary_emb)

    mine = GemmaForCausalLM(GemmaConfig(**CFG))
    params = bridge_gemma(ref_lm)

    B, S = 2, 5
    rng = np.random.RandomState(0)
    ids = rng.randint(1, CFG["vocab_size"], (B, S))

    # reference: PaliGemma-style full-mutual prefix attention, positions 1..S
    kv = ref.kv_cache.KVCache()
    embeds = ref_lm.model.embed_tokens(torch.tensor(ids))
    pos = torch.arange(1, S + 1)[None].repeat(B, 1)
    mask0 = torch.zeros(B, 1, S, S)
    out = ref_lm(
        attention_mask=mask0, position_ids=pos, inputs_embeds=embeds, kv_cache=kv
    )
    ref_last = t2n(out["logits"][:, -1])

    MAXLEN = S + 3
    logits, cache, clen = mine.prefill(params, jnp.asarray(ids), MAXLEN)
    np.testing.assert_allclose(
        np.asarray(logits[:, -1]), ref_last, atol=2e-5, rtol=2e-5
    )

    tok_ref = out["logits"][:, -1].argmax(-1)
    tok_mine = jnp.argmax(logits[:, -1], axis=-1)
    np.testing.assert_array_equal(np.asarray(tok_mine), t2n(tok_ref))

    for step in range(2):
        emb1 = ref_lm.model.embed_tokens(tok_ref[:, None])
        kv_len = kv.num_items() + 1
        mask1 = torch.zeros(B, 1, 1, kv_len)
        pos1 = torch.full((B, 1), kv_len, dtype=torch.long)
        out = ref_lm(
            attention_mask=mask1, position_ids=pos1, inputs_embeds=emb1, kv_cache=kv
        )
        tok_ref = out["logits"][:, -1].argmax(-1)
        tok_mine, cache, clen = mine.decode_step(params, tok_mine, cache, clen)
        np.testing.assert_array_equal(
            np.asarray(tok_mine), t2n(tok_ref), err_msg=f"step {step}"
        )

