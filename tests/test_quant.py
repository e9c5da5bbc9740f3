"""INT8 quantization: dequant error bounds and end-to-end action agreement."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blurr_tpu.models.pi0.pizero import PiZero
from blurr_tpu.ops.quant import (
    dequantize_kv,
    mm,
    quantize_kv_int8,
    quantize_weight_int8,
)
from tests.util import tiny_inputs, tiny_pi0_cfg


def test_weight_int8_roundtrip_error():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(32, 16).astype(np.float32))
    q = quantize_weight_int8(w)
    deq = np.asarray(q["q"], np.float32) * np.asarray(q["s"])[None, :]
    # per-out-channel symmetric int8: error <= scale/2 per element
    scale = np.asarray(q["s"])
    assert (np.abs(deq - np.asarray(w)) <= scale[None, :] * 0.5 + 1e-7).all()


def test_mm_quantized_close_to_dense():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(32, 16).astype(np.float32))
    dense = x @ w
    quant = mm(x, quantize_weight_int8(w))
    rel = np.abs(np.asarray(quant - dense)).max() / np.abs(np.asarray(dense)).max()
    assert rel < 0.02


def test_mm_cached_fp_mode():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(32, 16).astype(np.float32))
    q = quantize_weight_int8(w, cache_fp_dtype=jnp.float32)
    assert "fp" in q
    np.testing.assert_allclose(
        np.asarray(mm(x, q)), np.asarray(x @ q["fp"]), rtol=1e-6
    )


def test_kv_int8_roundtrip():
    rng = np.random.RandomState(3)
    kv = jnp.asarray(rng.randn(3, 2, 1, 8, 16).astype(np.float32))
    q, s = quantize_kv_int8(kv)
    deq = dequantize_kv(q, s, jnp.float32)
    err = np.abs(np.asarray(deq) - np.asarray(kv)).max()
    assert err <= float(np.asarray(s).max()) * 0.5 + 1e-7


def test_quantized_model_actions_close():
    cfg = tiny_pi0_cfg()
    cfg["action_quantization"] = {
        "mode": "int8",
        "activation_clip": None,
        "cache_fp_weight": False,
    }
    cfg["kv_quantization"] = {"mode": "int8", "activation_clip": 1.0}
    model = PiZero(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    params = model.tie_action_proprio_weights(params)
    inputs = tiny_inputs(cfg)

    ref_model = PiZero(tiny_pi0_cfg())
    ref = np.asarray(ref_model.infer_action(params, **inputs))

    qparams = model.enable_action_quantization(params)
    # tied weights stay tied after quantization
    assert qparams["joint"]["proprio"] is qparams["joint"]["action"]
    quant = np.asarray(model.infer_action(qparams, **inputs))
    assert quant.shape == ref.shape
    assert np.isfinite(quant).all()
    # int8 noise amplifies through random-init layers; require the quantized
    # action field to track the fp one closely in aggregate
    corr = np.corrcoef(quant.ravel(), ref.ravel())[0, 1]
    assert corr > 0.99, corr
    assert np.abs(quant - ref).mean() < 0.1


def test_w8a8_mm_close_to_dense():
    from blurr_tpu.ops.quant import quantize_weight_w8a8

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(4, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(32, 16).astype(np.float32))
    dense = np.asarray(x @ w)
    quant = np.asarray(mm(x, quantize_weight_w8a8(w)))
    rel = np.abs(quant - dense).max() / np.abs(dense).max()
    assert rel < 0.05  # two int8 quantizations


def test_w8a8_model_actions_track_fp():
    cfg = tiny_pi0_cfg()
    cfg["vlm_quantization"] = {"mode": "w8a8"}
    cfg["action_quantization"] = {"mode": "w8a8"}
    model = PiZero(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    params = model.tie_action_proprio_weights(params)
    inputs = tiny_inputs(cfg)

    ref = np.asarray(PiZero(tiny_pi0_cfg()).infer_action(params, **inputs))
    qp = model.enable_action_quantization(params)
    qp = model.enable_vlm_quantization(qp)
    out = np.asarray(model.infer_action(qp, **inputs))
    assert np.isfinite(out).all()
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.98, corr


# ---------------------------------------------------------------------------
# W4A8 (nibble-packed int4 weights, Pallas kernel on TPU / reference on CPU)
# ---------------------------------------------------------------------------


def test_int4_pack_roundtrip():
    from blurr_tpu.ops.pallas_int4_matmul import pack_int4, unpack_int4_reference

    q = np.random.RandomState(0).randint(-8, 8, (10, 6)).astype(np.int8)
    rt = np.asarray(unpack_int4_reference(pack_int4(jnp.asarray(q))))
    np.testing.assert_array_equal(rt, q)


def test_int4_kernel_interpret_exact():
    """The Pallas kernel (interpret mode) matches the int32 reference —
    including the bitcast nibble ordering."""
    from blurr_tpu.ops.pallas_int4_matmul import (
        int4_matmul,
        pack_int4,
        to_block_major,
    )

    rng = np.random.RandomState(0)
    q = rng.randint(-8, 8, (64, 256)).astype(np.int8)
    x = rng.randint(-127, 128, (4, 64)).astype(np.int8)
    s = rng.rand(256).astype(np.float32) + 0.5
    ref = (x.astype(np.int32) @ q.astype(np.int32)) * s[None, :]
    packed = to_block_major(pack_int4(jnp.asarray(q)), 128)  # 2 blocks of 128
    got = np.asarray(
        int4_matmul(
            jnp.asarray(x), packed, jnp.asarray(s).reshape(1, -1), interpret=True
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_w4a8_mm_tracks_fp():
    from blurr_tpu.ops.quant import mm, quantize_weight_w4a8

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(64, 48) * 0.05, jnp.float32)
    x = jnp.asarray(rng.randn(5, 64), jnp.float32)
    qw = quantize_weight_w4a8(w)
    # N=48 padded to one 128-wide block (block-major); output sliced to 48;
    # K=64 < the minimum 128-row group -> one scale group
    assert qw["q4"].shape == (1, 32, 128) and qw["s"].shape == (1, 48)
    dense = np.asarray(x @ w)
    quant = np.asarray(mm(x, qw))
    assert quant.shape == dense.shape
    rel = np.abs(quant - dense).max() / np.abs(dense).max()
    assert rel < 0.12, rel  # int4 weights + int8 activations


def test_w4a8_stacked_scan_layers():
    """Stacked [L, K, N] weights quantize per-layer and dispatch through mm
    inside a lax.scan, like the Llama decode loop uses them."""
    from blurr_tpu.ops.quant import mm, quantize_mixture_w4a8

    rng = np.random.RandomState(1)
    L = 3
    params = {"gate_w": jnp.asarray(rng.randn(L, 32, 64) * 0.1, jnp.float32)}
    qp = quantize_mixture_w4a8(params)
    assert qp["gate_w"]["q4"].shape == (L, 1, 16, 128)
    x = jnp.asarray(rng.randn(4, 32), jnp.float32)

    def step(h, layer):
        return mm(h, layer["gate_w"]) @ jnp.ones((64, 32), jnp.float32) * 0.1, None

    out, _ = jax.lax.scan(step, x, qp)
    dense_step = lambda h, w: (h @ w) @ np.ones((64, 32), np.float32) * 0.1
    ref = np.asarray(x)
    for l in range(L):
        ref = dense_step(ref, np.asarray(params["gate_w"][l]))
    corr = np.corrcoef(np.asarray(out).ravel(), ref.ravel())[0, 1]
    assert corr > 0.97, corr


def test_llama_w4a8_decode_runs():
    """Tiny Llama stack quantized w4a8 end-to-end: greedy decode executes,
    and the pre-argmax prefill logits correlate with the fp path (greedy
    token agreement itself is noise-sensitive on random init, see
    quantize_llama_w8a8's accuracy note)."""
    from blurr_tpu.models.openvla.llama import (
        LlamaSpec,
        causal_prefill_mask,
        forward,
        greedy_generate,
        init_llama_params,
        logits,
        quantize_llama_w4a8,
    )

    spec = LlamaSpec(
        num_layers=2, hidden_size=64, intermediate_size=128, num_heads=4,
        num_kv_heads=4, vocab_size=256,
    )
    params = init_llama_params(jax.random.PRNGKey(0), spec, jnp.float32)
    qp = quantize_llama_w4a8(params)
    assert qp["layers"]["gate_w"]["q4"].shape[-3:] == (1, 32, 128)
    ids = np.arange(8)[None] % 250
    embeds = jnp.asarray(np.asarray(params["embed_tokens"])[ids])
    valid = jnp.ones((1, 8), jnp.int32)
    toks = greedy_generate(qp, spec, embeds, valid, num_new_tokens=4)
    assert np.asarray(toks).shape[-1] == 4
    assert (np.asarray(toks) >= 0).all()

    # numeric fidelity: prefill logits of the quantized stack track fp
    from blurr_tpu.models.openvla.llama import alloc_cache

    pos = jnp.arange(8)[None]
    mask = causal_prefill_mask(valid, 8)

    def prefill_logits(p):
        h, _ = forward(p, spec, embeds, pos, mask, alloc_cache(spec, 1, 8, jnp.float32), jnp.int32(0))
        return np.asarray(logits(p, spec, h), np.float32)

    lf, lq = prefill_logits(params), prefill_logits(qp)
    corr = np.corrcoef(lf.ravel(), lq.ravel())[0, 1]
    assert corr > 0.9, corr


def test_w4a8_model_actions_track_fp():
    cfg = tiny_pi0_cfg()
    cfg["vlm_quantization"] = {"mode": "w4a8"}
    cfg["action_quantization"] = {"mode": "w4a8"}
    model = PiZero(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    params = model.tie_action_proprio_weights(params)
    inputs = tiny_inputs(cfg)

    ref = np.asarray(PiZero(tiny_pi0_cfg()).infer_action(params, **inputs))
    qp = model.enable_action_quantization(params)
    qp = model.enable_vlm_quantization(qp)
    out = np.asarray(model.infer_action(qp, **inputs))
    assert np.isfinite(out).all()
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.9, corr  # int4 weights: coarser than the w8a8 0.98 bound


def test_llama_streaming_quantize_matches_and_frees():
    """quantize_llama_streaming == quantize_llama_w4a8 numerically, and the
    bf16 source buffers are deleted (the 16GB-chip memory contract)."""
    from blurr_tpu.models.openvla.llama import (
        LlamaSpec,
        init_llama_params,
        quantize_llama_streaming,
        quantize_llama_w4a8,
    )

    spec = LlamaSpec(
        num_layers=2, hidden_size=64, intermediate_size=128, num_heads=4,
        num_kv_heads=4, vocab_size=256,
    )
    params = init_llama_params(jax.random.PRNGKey(0), spec, jnp.float32)
    ref = quantize_llama_w4a8(params)
    # fresh copy: streaming consumes its input
    params2 = init_llama_params(jax.random.PRNGKey(0), spec, jnp.float32)
    srcs = [params2["layers"]["gate_w"], params2["lm_head"]]
    out = quantize_llama_streaming(params2, "w4a8")
    for k in ("gate_w", "down_w", "q_w"):
        np.testing.assert_array_equal(
            np.asarray(ref["layers"][k]["q4"]), np.asarray(out["layers"][k]["q4"])
        )
        np.testing.assert_allclose(
            np.asarray(ref["layers"][k]["s"]), np.asarray(out["layers"][k]["s"]),
            rtol=1e-5,
        )
    np.testing.assert_array_equal(
        np.asarray(ref["lm_head"]["q4"]), np.asarray(out["lm_head"]["q4"])
    )
    for src in srcs:
        assert src.is_deleted()


def test_w4a8_groupwise_beats_per_channel_on_outlier_rows():
    """Group-wise scales contain outlier rows to their own group: a weight
    with one huge row-block must quantize far more accurately group-wise."""
    from blurr_tpu.ops.quant import mm, quantize_weight_w4a8

    rng = np.random.RandomState(7)
    w = rng.randn(256, 64).astype(np.float32) * 0.02
    w[:128] *= 40.0  # outlier half: per-channel scales would crush the rest
    xn = rng.randn(4, 256).astype(np.float32)
    xn[:, :128] = 0.0  # read only the small-magnitude rows: their error is
    # what group-wise scaling fixes (outlier-row error is identical in both)
    x = jnp.asarray(xn)
    dense = np.asarray(x @ jnp.asarray(w))

    per_channel = np.asarray(mm(x, quantize_weight_w4a8(jnp.asarray(w), group_size=256)))
    grouped = np.asarray(mm(x, quantize_weight_w4a8(jnp.asarray(w), group_size=128)))
    err_pc = np.abs(per_channel - dense).max()
    err_g = np.abs(grouped - dense).max()
    assert err_g < err_pc * 0.6, (err_g, err_pc)

    qw = quantize_weight_w4a8(jnp.asarray(w), group_size=128)
    assert qw["s"].shape == (2, 64)  # two 128-row groups


def test_w4a8_random_shapes_property():
    """Property sweep: the packed-int4 matmul tracks the fp reference over
    random (M, K, N) shapes, including non-multiple-of-128 N and K values
    that exercise both group sizes."""
    import jax

    from blurr_tpu.ops.quant import mm, quantize_weight_w4a8

    rng = np.random.RandomState(1)
    for m, k, n in [(1, 256, 96), (3, 512, 384), (8, 1024, 640),
                    (2, 768, 1408), (5, 256, 130)]:
        x = jnp.asarray(rng.randn(1, m, k).astype(np.float32))
        w = jnp.asarray(rng.randn(k, n).astype(np.float32) * 0.05)
        ref = np.asarray(x @ w)
        out = np.asarray(mm(x, quantize_weight_w4a8(w)))
        assert out.shape == ref.shape, (m, k, n)
        denom = np.abs(ref).mean() + 1e-6
        rel = np.abs(out - ref).mean() / denom
        assert rel < 0.15, (m, k, n, rel)  # 15-level quantizer tolerance


def test_w8a8_random_shapes_property():
    import jax

    from blurr_tpu.ops.quant import mm, quantize_weight_w8a8

    rng = np.random.RandomState(2)
    for m, k, n in [(1, 64, 48), (7, 200, 136), (4, 96, 512), (2, 640, 80)]:
        x = jnp.asarray(rng.randn(1, m, k).astype(np.float32))
        w = jnp.asarray(rng.randn(k, n).astype(np.float32) * 0.05)
        ref = np.asarray(x @ w)
        out = np.asarray(mm(x, quantize_weight_w8a8(w)))
        denom = np.abs(ref).mean() + 1e-6
        assert np.abs(out - ref).mean() / denom < 0.03, (m, k, n)


def test_w4a8_mse_scale_beats_maxabs_rtn():
    """The default MSE-optimal clip search reconstructs strictly better
    than max-abs RTN on Gaussian-ish weights (the measured w4a8 blocker is
    quantization noise — verdict r3 Next #5)."""
    import jax.numpy as jnp

    from blurr_tpu.ops.quant import _w4a8_deq, quantize_weight_w4a8

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(256, 128).astype(np.float32) * 0.02)

    def rel_rmse(q):
        wd = _w4a8_deq(q["q4"], q["s"], 256)
        return float(jnp.sqrt(jnp.mean((wd - w) ** 2))
                     / jnp.sqrt(jnp.mean(w ** 2)))

    e_mse = rel_rmse(quantize_weight_w4a8(w, group_size=128))
    e_rtn = rel_rmse(quantize_weight_w4a8(w, group_size=128, mse_scale=False))
    assert e_mse < e_rtn * 0.97, (e_mse, e_rtn)


def test_w4a8_mixture_knobs_group_and_mixed_precision():
    """group_size + int8_keys thread from the config into the quantized
    tree: int8_keys members become {"q8a","s"} dicts, the rest pack int4
    with the requested group count, and mm() serves both in one mixture."""
    import jax.numpy as jnp

    from blurr_tpu.ops.quant import mm, quantize_mixture_w4a8

    rng = np.random.RandomState(1)
    mix = {
        "q_w": jnp.asarray(rng.randn(2, 256, 128).astype(np.float32) * 0.05),
        "down_w": jnp.asarray(rng.randn(2, 128, 256).astype(np.float32) * 0.05),
    }
    out = quantize_mixture_w4a8(mix, group_size=128, int8_keys=("down_w",))
    assert "q4" in out["q_w"] and out["q_w"]["s"].shape == (2, 2, 128)
    assert "q8a" in out["down_w"]
    x = jnp.asarray(rng.randn(4, 256).astype(np.float32))
    y4 = mm(x, {k: v[0] for k, v in out["q_w"].items()})
    ref = x @ np.asarray(mix["q_w"][0])
    assert np.sqrt(((np.asarray(y4) - ref) ** 2).mean()) < 0.35 * np.abs(ref).std()
