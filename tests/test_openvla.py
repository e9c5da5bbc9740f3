"""OpenVLA native JAX stack: greedy decode, detokenization, OFT head."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blurr_tpu.models.openvla import llama as llama_lib
from blurr_tpu.models.openvla.llama import LlamaSpec
from blurr_tpu.models.openvla.model import (
    EMPTY_TOKEN,
    OpenVLA,
    OpenVLAOFT,
    OpenVLASpec,
    oft_action_head_forward,
)


@pytest.fixture(scope="module")
def tiny_model():
    spec = OpenVLASpec.tiny()
    model = OpenVLA(
        spec,
        norm_stats={
            "bridge_orig": {
                "action": {
                    "q01": [-0.1] * 7,
                    "q99": [0.1] * 7,
                    "mask": [True] * 6 + [False],
                }
            }
        },
    )
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_greedy_generate_matches_stepwise(tiny_model):
    """Fused scan decode must equal a python loop of full re-forwards."""
    model, params = tiny_model
    spec = model.spec.llama
    rng = np.random.RandomState(0)
    s = 6
    embeds = jnp.asarray(rng.randn(1, s, spec.hidden_size).astype(np.float32)) * 0.3
    valid = jnp.ones((1, s), jnp.int32)
    toks = np.asarray(
        llama_lib.greedy_generate(params["llama"], spec, embeds, valid, 4)
    )

    # reference: recompute full forward each step without cache
    cur = embeds
    out = []
    for _ in range(4):
        total = cur.shape[1]
        cache = llama_lib.alloc_cache(spec, 1, total, cur.dtype)
        pos = jnp.arange(total, dtype=jnp.int32)[None]
        mask = llama_lib.causal_prefill_mask(jnp.ones((1, total), jnp.int32), total)
        h, _ = llama_lib.forward(
            params["llama"], spec, cur, pos, mask, cache, jnp.int32(0)
        )
        tok = int(jnp.argmax(llama_lib.logits(params["llama"], spec, h[:, -1]), -1)[0])
        out.append(tok)
        emb = params["llama"]["embed_tokens"][tok][None, None, :]
        cur = jnp.concatenate([cur, emb], axis=1)
    assert toks[0].tolist() == out


def test_predict_action_surface(tiny_model):
    model, params = tiny_model
    rng = np.random.RandomState(1)
    ids = np.array([[1, 100, 200, 300]], np.int32)  # no trailing empty token
    img = rng.rand(1, 6, 28, 28).astype(np.float32)
    actions = model.predict_action(params, ids, img, unnorm_key="bridge_orig")
    assert actions.shape == (7,)
    # masked dims unnormalized into [q01, q99]; final dim left normalized
    assert (actions[:6] >= -0.1 - 1e-6).all() and (actions[:6] <= 0.1 + 1e-6).all()
    assert -1.0 <= actions[6] <= 1.0


def test_detokenize_mapping(tiny_model):
    model, _ = tiny_model
    # token id == action_token_vocab - 1 -> discretized 1-1=0 -> first center
    toks = np.array([[model.spec.action_token_vocab - 1]])
    np.testing.assert_allclose(
        model.detokenize_actions(toks)[0, 0], model.bin_centers[0]
    )
    # token id == vocab - 255 -> discretized 254 -> last center
    toks = np.array([[model.spec.action_token_vocab - 255]])
    np.testing.assert_allclose(
        model.detokenize_actions(toks)[0, 0], model.bin_centers[254]
    )
    # out-of-range ids clip
    toks = np.array([[5]])
    assert np.isfinite(model.detokenize_actions(toks)).all()


# The OFT head is validated differentially against the reference's own
# _OFTActionHead in tests/test_reference_parity_hf_eval.py (the former numpy
# translation oracle here was deleted per the round-2 verdict).


def test_oft_parallel_decode():
    spec = OpenVLASpec.tiny()
    model = OpenVLAOFT(spec, chunk_len=3, use_proprio=True, proprio_dim=8)
    params = model.init_params(jax.random.PRNGKey(4))
    rng = np.random.RandomState(5)
    ids = np.array([[1, 50, 60, EMPTY_TOKEN]], np.int32)
    img = rng.rand(1, 6, 28, 28).astype(np.float32)
    proprio = rng.randn(1, 8).astype(np.float32)
    out = model.predict_action(params, ids, img, proprio=proprio)
    assert out.shape == (3, 7)
    assert np.isfinite(out).all()


def test_llama_rms_norm_semantics():
    """Llama applies w AFTER the downcast (vs Gemma (1+w) before)."""
    x = jnp.asarray(np.random.RandomState(6).randn(2, 8).astype(np.float32))
    w = jnp.asarray(np.random.RandomState(7).randn(8).astype(np.float32))
    out = np.asarray(llama_lib.llama_rms_norm(x, w, 1e-5))
    xn = np.asarray(x, np.float64)
    ref = xn / np.sqrt((xn**2).mean(-1, keepdims=True) + 1e-5) * np.asarray(w)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_llama_w8a8_decode_tracks_fp(tiny_model):
    from blurr_tpu.models.openvla.llama import quantize_llama_w8a8

    model, params = tiny_model
    rng = np.random.RandomState(9)
    ids = np.array([[1, 100, 200, 300, EMPTY_TOKEN]], np.int32)
    img = rng.rand(1, 6, 28, 28).astype(np.float32)
    qparams = dict(params)
    qparams["llama"] = quantize_llama_w8a8(params["llama"])
    toks_fp = np.asarray(model.predict_action_tokens(params, jnp.asarray(ids), jnp.asarray(img)))
    toks_q = np.asarray(model.predict_action_tokens(qparams, jnp.asarray(ids), jnp.asarray(img)))
    assert toks_q.shape == toks_fp.shape
    # greedy argmax over a random-init model need not match exactly, but the
    # quantized forward must run and produce valid token ids
    assert (toks_q >= 0).all() and (toks_q < model.spec.llama.vocab_size).all()


def test_greedy_generate_ignores_padded_prompt_positions():
    """Pad positions' cached K/V must not leak into decode: generations are
    identical whatever garbage sits in the padded embedding slots."""
    import jax
    import jax.numpy as jnp

    from blurr_tpu.models.openvla.llama import (
        LlamaSpec,
        greedy_generate,
        init_llama_params,
    )

    spec = LlamaSpec(
        num_layers=2, hidden_size=64, intermediate_size=128, num_heads=4,
        num_kv_heads=4, vocab_size=128,
    )
    params = init_llama_params(jax.random.PRNGKey(0), spec, jnp.float32)
    rng = np.random.RandomState(0)
    emb = rng.randn(1, 8, 64).astype(np.float32) * 0.3
    valid = np.array([[1, 1, 1, 1, 1, 0, 0, 0]], np.int32)  # 3 pad slots

    emb_a = emb.copy()
    emb_b = emb.copy()
    emb_b[0, 5:] = 37.0  # garbage in the padded slots only
    t_a = np.asarray(greedy_generate(params, spec, jnp.asarray(emb_a),
                                     jnp.asarray(valid), num_new_tokens=5))
    t_b = np.asarray(greedy_generate(params, spec, jnp.asarray(emb_b),
                                     jnp.asarray(valid), num_new_tokens=5))
    np.testing.assert_array_equal(t_a, t_b)


def test_greedy_generate_ragged_batch_matches_unbatched():
    """Mixed-length (right-padded) batch decodes must equal per-example
    unpadded decodes: decode RoPE positions are per-example (n_valid + i),
    not the padded prompt length, so shorter prompts see no positional gap."""
    import jax
    import jax.numpy as jnp

    from blurr_tpu.models.openvla.llama import (
        LlamaSpec,
        greedy_generate,
        init_llama_params,
    )

    spec = LlamaSpec(
        num_layers=2, hidden_size=64, intermediate_size=128, num_heads=4,
        num_kv_heads=4, vocab_size=128,
    )
    params = init_llama_params(jax.random.PRNGKey(1), spec, jnp.float32)
    rng = np.random.RandomState(7)
    lens = [8, 5, 3]
    s_max = max(lens)
    embs = [rng.randn(1, n, 64).astype(np.float32) * 0.3 for n in lens]

    # batched: right-pad to s_max; max_len must be shared
    batch = np.zeros((len(lens), s_max, 64), np.float32)
    valid = np.zeros((len(lens), s_max), np.int32)
    for i, (n, e) in enumerate(zip(lens, embs)):
        batch[i, :n] = e[0]
        valid[i, :n] = 1
    n_new = 6
    toks_batched = np.asarray(
        greedy_generate(
            params, spec, jnp.asarray(batch), jnp.asarray(valid), n_new
        )
    )

    for i, (n, e) in enumerate(zip(lens, embs)):
        toks_single = np.asarray(
            greedy_generate(
                params,
                spec,
                jnp.asarray(e),
                jnp.ones((1, n), jnp.int32),
                n_new,
            )
        )
        np.testing.assert_array_equal(toks_batched[i], toks_single[0], err_msg=f"prompt len {n}")


def test_jacobi_decode_bit_identical_to_greedy(tiny_model):
    """Jacobi self-speculative decode is LOSSLESS: tokens bit-equal the
    sequential greedy scan, iterations bounded by n-1, full + ragged
    batches, any number of new tokens."""
    model, params = tiny_model
    spec = model.spec.llama
    rng = np.random.RandomState(3)
    for b, s, n in [(1, 6, 4), (2, 9, 7), (3, 8, 1)]:
        embeds = jnp.asarray(rng.randn(b, s, spec.hidden_size)
                             .astype(np.float32)) * 0.3
        valid = np.ones((b, s), np.int32)
        if b > 1:  # ragged: shorten later rows
            for i in range(1, b):
                valid[i, s - 2 * i:] = 0
        valid = jnp.asarray(valid)
        ref = np.asarray(llama_lib.greedy_generate(
            params["llama"], spec, embeds, valid, n))
        got, iters = llama_lib.greedy_generate_jacobi(
            params["llama"], spec, embeds, valid, n, return_iters=True)
        np.testing.assert_array_equal(np.asarray(got), ref)
        assert int(iters) <= max(0, n - 1)


def test_jacobi_model_surface_matches_ragged(tiny_model):
    """The model method equals predict_action_tokens_ragged bitwise on a
    ragged co-batch (and detokenizes to the same actions)."""
    model, params = tiny_model
    spec = model.spec
    rng = np.random.RandomState(5)
    b = 2
    ids = np.ones((b, 10), np.int32)
    ids[:, 1:] = rng.randint(3, 1000, (b, 9))
    valid = np.ones((b, 10), np.int32)
    valid[1, 7:] = 0
    px = rng.randn(b, 3 if not spec.use_fused_vision else 6,
                   spec.siglip.image_size, spec.siglip.image_size
                   ).astype(np.float32)
    ref = np.asarray(model.predict_action_tokens_ragged(
        params, jnp.asarray(ids), jnp.asarray(px), jnp.asarray(valid)))
    got = np.asarray(model.predict_action_tokens_jacobi(
        params, jnp.asarray(ids), jnp.asarray(px), jnp.asarray(valid)))
    np.testing.assert_array_equal(got, ref)
    np.testing.assert_array_equal(
        model.detokenize_actions(got), model.detokenize_actions(ref))


def test_jacobi_warm_seed_same_fixed_point(tiny_model):
    """ANY init_guess converges to the same exact greedy chain; a perfect
    seed (the answer itself) converges in one sweep."""
    model, params = tiny_model
    spec = model.spec.llama
    rng = np.random.RandomState(9)
    embeds = jnp.asarray(rng.randn(2, 7, spec.hidden_size)
                         .astype(np.float32)) * 0.3
    valid = jnp.ones((2, 7), jnp.int32)
    n = 5
    ref = np.asarray(llama_lib.greedy_generate(
        params["llama"], spec, embeds, valid, n))
    # adversarial seed: random tokens
    bad = jnp.asarray(rng.randint(0, spec.vocab_size, (2, n)), jnp.int32)
    got, it_bad = llama_lib.greedy_generate_jacobi(
        params["llama"], spec, embeds, valid, n, return_iters=True,
        init_guess=bad)
    np.testing.assert_array_equal(np.asarray(got), ref)
    # perfect warm start: one verification sweep suffices
    got2, it_warm = llama_lib.greedy_generate_jacobi(
        params["llama"], spec, embeds, valid, n, return_iters=True,
        init_guess=jnp.asarray(ref))
    np.testing.assert_array_equal(np.asarray(got2), ref)
    assert int(it_warm) == 1
    assert int(it_warm) <= int(it_bad)


def test_jacobi_num_iters_ladder_prefix_exact(tiny_model):
    """num_iters=k (the latency-ladder instrument) runs EXACTLY k sweeps:
    the first k+1 tokens match the greedy chain (induction invariant),
    and k >= n-1 reproduces the full chain bitwise."""
    model, params = tiny_model
    spec = model.spec.llama
    rng = np.random.RandomState(11)
    embeds = jnp.asarray(rng.randn(2, 8, spec.hidden_size)
                         .astype(np.float32)) * 0.3
    valid = jnp.ones((2, 8), jnp.int32)
    n = 6
    ref = np.asarray(llama_lib.greedy_generate(
        params["llama"], spec, embeds, valid, n))
    for k in range(1, n):
        got, iters = llama_lib.greedy_generate_jacobi(
            params["llama"], spec, embeds, valid, n, return_iters=True,
            num_iters=k)
        assert int(iters) == k
        np.testing.assert_array_equal(np.asarray(got)[:, :k + 1],
                                      ref[:, :k + 1])
    np.testing.assert_array_equal(
        np.asarray(llama_lib.greedy_generate_jacobi(
            params["llama"], spec, embeds, valid, n, num_iters=n - 1)), ref)


def test_jacobi_qkv_relayout_identity(tiny_model):
    """relayout_qkv_for_jacobi returns a tree that decodes bit-identically
    (on CPU it degrades to a no-op — custom device layouts are a TPU
    feature — but the contract is the same either way), and the returned
    tree still serves the AR path on small models."""
    model, params = tiny_model
    rng = np.random.RandomState(13)
    spec = model.spec
    ids = np.ones((1, 9), np.int32)
    ids[:, 1:] = rng.randint(3, 1000, (1, 8))
    px = rng.randn(1, 6 if spec.use_fused_vision else 3,
                   spec.siglip.image_size, spec.siglip.image_size
                   ).astype(np.float32)
    ids, px = jnp.asarray(ids), jnp.asarray(px)
    valid = jnp.ones_like(ids)
    ref = np.asarray(model.predict_action_tokens_jacobi(params, ids, px,
                                                        valid))
    # fresh containers: relayout donates (mutates) the input tree's dicts,
    # and the fixture is module-scoped
    params = jax.tree.map(lambda x: x, params)
    params2 = llama_lib.relayout_qkv_for_jacobi(params)
    got = np.asarray(model.predict_action_tokens_jacobi(params2, ids, px,
                                                        valid))
    np.testing.assert_array_equal(got, ref)
    # the returned tree is intact: every qkv leaf present. (The INPUT tree
    # is donated on success — its leaves may be None — and restored intact
    # when the backend rejects custom layouts and params2 is params.)
    for k in ("q_w", "k_w", "v_w"):
        assert params2["llama"]["layers"][k] is not None
    if params2 is params:
        for k in ("q_w", "k_w", "v_w"):
            assert params["llama"]["layers"][k] is not None


def test_jacobi_qkv_relayout_midway_failure_restores(tiny_model, monkeypatch):
    """A device_put failure AFTER earlier leaves were already donated must
    hand back the input tree fully restored (values AND natural layout) —
    a mixed-layout tree makes the later decode program hoist GB-scale
    conversion copies and compile-OOM with no hint why. Simulates a
    RESOURCE_EXHAUSTED on the second transpose; on backends that reject
    custom layouts outright the same no-donation contract is asserted."""
    model, params = tiny_model
    params = jax.tree.map(lambda x: x, params)
    before = {k: np.asarray(params["llama"]["layers"][k])
              for k in ("q_w", "k_w", "v_w")}
    real_put = jax.device_put
    calls = {"n": 0}

    def flaky(x, target=None, **kw):
        maj = getattr(getattr(target, "layout", None), "major_to_minor", None)
        if maj == (0, 2, 1):  # the forward transposes, not the undo puts
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("simulated RESOURCE_EXHAUSTED")
        return real_put(x, target, **kw)

    monkeypatch.setattr(jax, "device_put", flaky)
    out = llama_lib.relayout_qkv_for_jacobi(params)
    assert out is params  # the documented "returned untouched" contract
    for k in ("q_w", "k_w", "v_w"):
        leaf = params["llama"]["layers"][k]
        assert leaf is not None and not isinstance(leaf, dict)
        np.testing.assert_array_equal(np.asarray(leaf), before[k])
