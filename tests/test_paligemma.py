"""Standalone PaliGemma/Gemma text generation surface."""

import numpy as np

import jax
import jax.numpy as jnp

from blurr_tpu.models.paligemma.config import GemmaConfig, PaliGemmaConfig
from blurr_tpu.models.paligemma.model import (
    GemmaForCausalLM,
    PaliGemmaForConditionalGeneration,
)

TINY_TEXT = dict(
    vocab_size=300, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=2, num_key_value_heads=1, head_dim=16,
)


def test_paligemma_generate():
    cfg = PaliGemmaConfig(
        vision_config={
            "hidden_size": 32, "intermediate_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 2, "image_size": 28, "patch_size": 14,
        },
        text_config=TINY_TEXT,
        image_token_index=260, pad_token_id=0, projection_dim=32, hidden_size=32,
    )
    assert cfg.vision_config.num_image_tokens == 4
    model = PaliGemmaForConditionalGeneration(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    ids = np.concatenate(
        [np.full((1, 4), 260, np.int32), rng.randint(3, 299, (1, 5))], axis=1
    )
    px = rng.rand(1, 3, 28, 28).astype(np.float32)
    toks = model.generate(params, ids, px, max_new_tokens=5)
    assert toks.shape == (1, 5)
    assert (toks >= 0).all() and (toks < 300).all()


def test_gemma_causal_lm_cache_consistency():
    """Greedy decode with cache equals re-running the growing prefix."""
    model = GemmaForCausalLM(GemmaConfig(**TINY_TEXT, pad_token_id=0))
    params = model.init_params(jax.random.PRNGKey(1))
    ids = np.random.RandomState(2).randint(3, 299, (1, 6)).astype(np.int32)

    toks = model.generate(params, ids, max_new_tokens=4)

    cur = ids
    expected = []
    for _ in range(4):
        logits, _, _ = model.prefill(params, jnp.asarray(cur), cur.shape[1])
        nxt = int(np.argmax(np.asarray(logits[0, -1])))
        expected.append(nxt)
        cur = np.concatenate([cur, [[nxt]]], axis=1).astype(np.int32)
    assert toks[0].tolist() == expected


def test_generate_fused_matches_hostloop():
    cfg = PaliGemmaConfig(
        vision_config={
            "hidden_size": 32, "intermediate_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 2, "image_size": 28, "patch_size": 14,
        },
        text_config=TINY_TEXT,
        image_token_index=260, pad_token_id=0, projection_dim=32, hidden_size=32,
    )
    model = PaliGemmaForConditionalGeneration(cfg)
    params = model.init_params(jax.random.PRNGKey(5))
    rng = np.random.RandomState(6)
    ids = np.concatenate(
        [np.full((1, 4), 260, np.int32), rng.randint(3, 299, (1, 5))], axis=1
    )
    px = rng.rand(1, 3, 28, 28).astype(np.float32)
    host = model.generate(params, ids, px, max_new_tokens=6)
    fused = model.generate_fused(params, ids, px, max_new_tokens=6)
    np.testing.assert_array_equal(host, fused)


def test_generate_per_row_eos(tiny_paligemma=None):
    """Batched generate: a row finishing early repeats EOS while other rows
    keep generating — and host generate matches generate_fused."""
    import jax

    from blurr_tpu.models.paligemma.config import PaliGemmaConfig
    from blurr_tpu.models.paligemma.model import PaliGemmaForConditionalGeneration

    cfg = PaliGemmaConfig(
        vision_config={"hidden_size": 16, "intermediate_size": 32,
                       "num_hidden_layers": 1, "num_attention_heads": 2,
                       "image_size": 28, "patch_size": 14},
        text_config={"vocab_size": 64, "hidden_size": 32,
                     "intermediate_size": 48, "num_hidden_layers": 1,
                     "num_attention_heads": 2, "num_key_value_heads": 1,
                     "head_dim": 16},
        image_token_index=60,
        projection_dim=32,
        hidden_size=32,
    )
    model = PaliGemmaForConditionalGeneration(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    n_img = cfg.vision_config.num_image_tokens
    ids = np.concatenate(
        [np.full((2, n_img), 60), rng.randint(0, 59, (2, 4))], axis=1
    ).astype(np.int32)
    px = rng.randn(2, 3, 28, 28).astype(np.float32)

    base = model.generate(params, ids, px, max_new_tokens=6)
    # pick row 0's first token as the "EOS": row 0 must then be all-EOS
    eos = int(base[0, 0])
    out = model.generate(params, ids, px, max_new_tokens=6, eos_token_id=eos)
    assert (out[0] == eos).all()
    fused = model.generate_fused(
        params, ids, px, max_new_tokens=6, eos_token_id=eos
    )
    assert out.shape[1] <= fused.shape[1]
    np.testing.assert_array_equal(out, fused[:, : out.shape[1]])


def test_paligemma_config_accepts_serialized_text_config():
    """transformers-serialized text_config dicts include pad_token_id; the
    constructor must not crash on the duplicate keyword."""
    from blurr_tpu.models.paligemma.config import PaliGemmaConfig

    cfg = PaliGemmaConfig(
        text_config={"vocab_size": 64, "hidden_size": 32,
                     "intermediate_size": 48, "num_hidden_layers": 1,
                     "num_attention_heads": 2, "num_key_value_heads": 1,
                     "head_dim": 16, "pad_token_id": 7},
        vision_config={"hidden_size": 16, "intermediate_size": 32,
                       "num_hidden_layers": 1, "num_attention_heads": 2,
                       "image_size": 28, "patch_size": 14},
    )
    assert cfg.pad_token_id == 7
    assert cfg.text_config.pad_token_id == 7
