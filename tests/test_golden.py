"""Golden outputs: tiny random-init model with fixed PRNG -> committed action
values (SURVEY.md §7.4 test strategy). Catches silent numerics drift across
refactors; regenerate ONLY for intentional semantic changes (see command in
the docstring below).

Regenerate with:
    python -c "see tests/test_golden.py history"  (compute a[0,0], a[1,3],
    checksum on CPU with jax_default_matmul_precision='highest')
"""

import numpy as np
import pytest

import jax

from blurr_tpu.models.pi0.pizero import PiZero
from tests.util import tiny_inputs, tiny_pi0_cfg

# regenerated 2026-08-17: tests/util.tiny_inputs no longer emits spurious
# image-token ids inside the text span (reference-parity fix), which changes
# the fixed random inputs these goldens integrate over
GOLDEN_A00 = np.array(
    [1.0, -0.239862, -0.319971, -1.0, 1.0, -0.983705, -0.690837], np.float32
)
GOLDEN_A13 = np.array(
    [0.176209, -0.381624, -0.162765, -1.0, -0.861419, -1.0, -0.43198], np.float32
)
GOLDEN_SUM = -5.423043
GOLDEN_ABS_SUM = 40.403732


def test_golden_actions():
    cfg = tiny_pi0_cfg()
    model = PiZero(cfg)
    params = model.tie_action_proprio_weights(
        model.init_params(jax.random.PRNGKey(0))
    )
    a = np.asarray(model.infer_action(params, **tiny_inputs(cfg)))
    np.testing.assert_allclose(a[0, 0], GOLDEN_A00, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(a[1, 3], GOLDEN_A13, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(a.sum()), GOLDEN_SUM, rtol=2e-4)
    np.testing.assert_allclose(float(np.abs(a).sum()), GOLDEN_ABS_SUM, rtol=2e-4)


# Quantized-path goldens: catch silent drift in the int8/int4 pipelines
# (packing order, scale conventions, dispatch). Values computed like the fp
# goldens (CPU, highest matmul precision); tolerances are loose enough to
# absorb borderline integer-rounding flips across platforms but tight
# enough to catch any real change to the quantization math.

GOLDEN_W8A8_A00 = np.array(
    [1.0, -0.230669, -0.338776, -1.0, 1.0, -0.990534, -0.678495], np.float32
)
GOLDEN_W8A8_SUM = -5.395479
# regenerated 2026-08-19: quantize_weight_w4a8 defaults to the MSE-optimal
# clip-scale search (intentional semantic change — 3.4x lower closed-loop
# action noise, docs/results/quant_closed_loop_v5e.md); max-abs-RTN goldens
# no longer apply
GOLDEN_W4A8_A00 = np.array(
    [1.0, -0.190851, -0.21715, -1.0, 1.0, -0.833444, -0.768787], np.float32
)
GOLDEN_W4A8_SUM = -5.509378


@pytest.mark.parametrize(
    "mode,golden_a00,golden_sum",
    [
        ("w8a8", GOLDEN_W8A8_A00, GOLDEN_W8A8_SUM),
        ("w4a8", GOLDEN_W4A8_A00, GOLDEN_W4A8_SUM),
    ],
)
def test_golden_actions_quantized(mode, golden_a00, golden_sum):
    cfg = tiny_pi0_cfg()
    cfg["vlm_quantization"] = {"mode": mode}
    cfg["action_quantization"] = {"mode": mode}
    model = PiZero(cfg)
    params = model.tie_action_proprio_weights(
        model.init_params(jax.random.PRNGKey(0))
    )
    params = model.enable_action_quantization(params)
    params = model.enable_vlm_quantization(params)
    a = np.asarray(model.infer_action(params, **tiny_inputs(cfg)))
    np.testing.assert_allclose(a[0, 0], golden_a00, atol=0.02)
    np.testing.assert_allclose(float(a.sum()), golden_sum, rtol=0.02)


# ---------------------------------------------------------------------------
# Decode-path goldens: OpenVLA (llama) and MiniVLA-architecture (qwen2:
# qkv biases + tied lm_head) greedy token ids for fixed seeds. Computed on
# CPU with jax_default_matmul_precision='highest' (same recipe as above).
# Token ids are integers, so equality is exact on a given platform; compare
# leniently (allow <=1 differing position) to absorb borderline argmax flips
# across matmul precisions.
# ---------------------------------------------------------------------------

GOLDEN_OPENVLA_TOKENS = [11923, 28118, 7764, 21461, 27902, 12060, 29229]
GOLDEN_QWEN_TOKENS = [46, 67, 68, 68, 68, 68, 28]


def _token_golden_check(got, want):
    got, want = np.asarray(got).ravel(), np.asarray(want)
    assert got.shape == want.shape
    n_diff = int((got != want).sum())
    assert n_diff <= 1, f"decode drift: {got.tolist()} vs {want.tolist()}"


def test_golden_openvla_decode_tokens():
    import jax.numpy as jnp

    from blurr_tpu.models.openvla.model import EMPTY_TOKEN, OpenVLA, OpenVLASpec

    spec = OpenVLASpec.tiny()
    model = OpenVLA(spec)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    px = rng.randn(1, 6, 28, 28).astype(np.float32)
    ids = np.concatenate(
        [[[1]], rng.randint(2, 100, (1, 6)), [[EMPTY_TOKEN]]], axis=1
    ).astype(np.int32)
    toks = np.asarray(
        model.predict_action_tokens(params, jnp.asarray(ids), jnp.asarray(px))
    )
    _token_golden_check(toks, GOLDEN_OPENVLA_TOKENS)


def test_golden_qwen2_decode_tokens():
    """Locks the Qwen2 features (bias adds, tied-head logits, theta 1e6)."""
    import jax.numpy as jnp

    from blurr_tpu.models.openvla.llama import LlamaSpec
    from blurr_tpu.models.openvla.model import EMPTY_TOKEN, OpenVLA, OpenVLASpec
    from blurr_tpu.models.openvla.vit import ViTSpec

    spec = OpenVLASpec(
        llama=LlamaSpec(vocab_size=96, hidden_size=64, intermediate_size=128,
                        num_layers=2, num_heads=4, num_kv_heads=2,
                        rope_theta=1_000_000.0, eps=1e-6, qkv_bias=True,
                        tie_word_embeddings=True),
        siglip=ViTSpec(hidden_size=48, intermediate_size=96, num_layers=2,
                       num_heads=2, image_size=28, feature_layer=-1),
        use_fused_vision=False,
    )
    model = OpenVLA(spec)
    params = model.init_params(jax.random.PRNGKey(1))
    rng = np.random.RandomState(0)
    rng.randn(1, 6, 28, 28)  # keep the stream aligned with the generator
    rng.randint(2, 100, (1, 6))
    px = rng.randn(1, 3, 28, 28).astype(np.float32)
    ids = np.concatenate(
        [[[1]], rng.randint(2, 90, (1, 5)), [[EMPTY_TOKEN % 96]]], axis=1
    ).astype(np.int32)
    toks = np.asarray(
        model.predict_action_tokens(params, jnp.asarray(ids), jnp.asarray(px))
    )
    _token_golden_check(toks, GOLDEN_QWEN_TOKENS)
