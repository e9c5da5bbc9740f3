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

GOLDEN_A00 = np.array(
    [1.0, -0.205942, -0.39106, -1.0, 1.0, -1.0, -0.70092], np.float32
)
GOLDEN_A13 = np.array(
    [0.176209, -0.381624, -0.162765, -1.0, -0.861419, -1.0, -0.43198], np.float32
)
GOLDEN_SUM = -5.940588
GOLDEN_ABS_SUM = 40.273537


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
    [1.0, -0.201328, -0.401539, -1.0, 1.0, -1.0, -0.692788], np.float32
)
GOLDEN_W8A8_SUM = -5.920905
GOLDEN_W4A8_A00 = np.array(
    [1.0, -0.152576, -0.372634, -1.0, 1.0, -1.0, -0.693880], np.float32
)
GOLDEN_W4A8_SUM = -5.202209


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
