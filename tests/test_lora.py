"""LoRA: functional application, merge equivalence, PEFT adapter merging."""

import json

import numpy as np

import jax
import jax.numpy as jnp

from blurr_tpu.ops.lora import (
    apply_lora,
    init_lora_params,
    merge_lora,
    merge_peft_adapter_into_llama,
)


def test_lora_identity_at_init():
    rng = jax.random.PRNGKey(0)
    lora = init_lora_params(rng, 8, 6, r=2)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 8).astype(np.float32))
    w = jnp.asarray(np.random.RandomState(1).randn(8, 6).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(apply_lora(x, w, lora)), np.asarray(x @ w), rtol=1e-6
    )


def test_apply_equals_merge():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(3, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(8, 6).astype(np.float32))
    lora = {
        "a": jnp.asarray(rng.randn(8, 2).astype(np.float32)),
        "b": jnp.asarray(rng.randn(2, 6).astype(np.float32)),
    }
    applied = apply_lora(x, w, lora, scale=0.5)
    merged = x @ merge_lora(w, lora, scale=0.5)
    np.testing.assert_allclose(np.asarray(applied), np.asarray(merged), rtol=1e-5, atol=1e-5)


def test_peft_adapter_merge(tmp_path):
    import torch

    L, h, out = 2, 8, 8
    rng = np.random.RandomState(3)
    llama = {"layers": {"q_w": jnp.asarray(rng.randn(L, h, out).astype(np.float32))}}

    r, alpha = 2, 4
    A = rng.randn(r, h).astype(np.float32)  # torch [out=r, in=h]
    B = rng.randn(out, r).astype(np.float32)
    adapter_dir = tmp_path / "lora_adapter"
    adapter_dir.mkdir()
    (adapter_dir / "adapter_config.json").write_text(
        json.dumps({"r": r, "lora_alpha": alpha})
    )
    torch.save(
        {
            "base_model.model.language_model.model.layers.0.self_attn.q_proj.lora_A.weight": torch.tensor(A),
            "base_model.model.language_model.model.layers.0.self_attn.q_proj.lora_B.weight": torch.tensor(B),
        },
        adapter_dir / "adapter_model.bin",
    )
    merged = merge_peft_adapter_into_llama(llama, str(adapter_dir), jnp.float32)
    delta = (alpha / r) * (B @ A).T
    np.testing.assert_allclose(
        np.asarray(merged["layers"]["q_w"][0]),
        np.asarray(llama["layers"]["q_w"][0]) + delta,
        rtol=1e-5, atol=1e-5,
    )
    # untouched layer unchanged
    np.testing.assert_allclose(
        np.asarray(merged["layers"]["q_w"][1]),
        np.asarray(llama["layers"]["q_w"][1]),
        rtol=1e-6,
    )


def test_peft_double_merge_guard(tmp_path, caplog):
    """Merging into a snapshot whose base weights already contain the adapter
    must be skipped (pre-merged OFT snapshots ship lora_adapter/ alongside
    merged base weights; re-merging would double the delta)."""
    import logging

    import torch

    L, h, out = 2, 8, 8
    rng = np.random.RandomState(5)
    llama = {"layers": {"q_w": jnp.asarray(rng.randn(L, h, out).astype(np.float32))}}

    r, alpha = 2, 4
    A = rng.randn(r, h).astype(np.float32)
    B = rng.randn(out, r).astype(np.float32)
    adapter_dir = tmp_path / "lora_adapter"
    adapter_dir.mkdir()
    (adapter_dir / "adapter_config.json").write_text(
        json.dumps({"r": r, "lora_alpha": alpha})
    )
    torch.save(
        {
            "base_model.model.language_model.model.layers.0.self_attn.q_proj.lora_A.weight": torch.tensor(A),
            "base_model.model.language_model.model.layers.0.self_attn.q_proj.lora_B.weight": torch.tensor(B),
        },
        adapter_dir / "adapter_model.bin",
    )
    merged = merge_peft_adapter_into_llama(llama, str(adapter_dir), jnp.float32)
    delta = (alpha / r) * (B @ A).T
    np.testing.assert_allclose(
        np.asarray(merged["layers"]["q_w"][0]),
        np.asarray(llama["layers"]["q_w"][0]) + delta,
        rtol=1e-5, atol=1e-5,
    )
    # second merge on the already-merged tree: skipped, tree unchanged
    with caplog.at_level(logging.INFO, logger="blurr_tpu.ops.lora"):
        merged2 = merge_peft_adapter_into_llama(merged, str(adapter_dir), jnp.float32)
    assert "skipping merge" in caplog.text
    np.testing.assert_array_equal(
        np.asarray(merged2["layers"]["q_w"]), np.asarray(merged["layers"]["q_w"])
    )
