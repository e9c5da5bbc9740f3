"""OpenVLA eval helper math (preprocessing, conversions, stat injection)."""

import numpy as np
from PIL import Image

from blurr_tpu.agent.hf_vla_utils import (
    binarize_gripper_action,
    bridge_action_to_simpler,
    center_crop_and_resize_back,
    inject_dataset_statistics_into_norm_stats,
    normalize_proprio,
    octo_style_preprocess,
    simpler_eef_pos_to_bridge_proprio,
    simpler_eef_pos_to_bridge_proprio_padded,
)
from blurr_tpu.utils import geometry as geo


def test_octo_preprocess_shapes():
    img = Image.fromarray(np.random.RandomState(0).randint(0, 256, (480, 640, 3), np.uint8))
    out = octo_style_preprocess(img, resize_size=224)
    assert out.size == (224, 224)


def test_center_crop_roundtrip_size():
    img = Image.fromarray(np.zeros((224, 224, 3), np.uint8))
    out = center_crop_and_resize_back(img, crop_scale=0.9)
    assert out.size == (224, 224)
    assert center_crop_and_resize_back(img, crop_scale=1.0) is img


def test_binarize_gripper_mask_logic():
    stats_unmasked = {"mask": [True] * 6 + [False]}
    # [0,1]-range value, 0.5 threshold
    assert binarize_gripper_action(0.7, stats_unmasked) == 1.0
    assert binarize_gripper_action(0.3, stats_unmasked) == -1.0
    # out-of-range falls back to sign
    assert binarize_gripper_action(-0.2, stats_unmasked) == -1.0
    stats_masked = {"mask": [True] * 7}
    # sign(2v - 1)
    assert binarize_gripper_action(0.9, stats_masked) == 1.0
    assert binarize_gripper_action(0.1, stats_masked) == -1.0
    assert binarize_gripper_action(0.5, stats_masked) == -1.0  # sign==0 -> -1
    # no stats: 0.5 threshold in [0,1]
    assert binarize_gripper_action(0.6) == 1.0


def test_bridge_action_to_simpler_rotvec():
    a = np.array([0.01, -0.02, 0.03, 0.1, -0.2, 0.3, 0.9], np.float32)
    out = bridge_action_to_simpler(a)
    np.testing.assert_allclose(out[:3], a[:3], atol=1e-7)
    axis, angle = geo.euler2axangle(0.1, -0.2, 0.3)
    np.testing.assert_allclose(out[3:6], axis * angle, atol=1e-6)
    assert out[6] == 1.0
    # shape handling
    assert bridge_action_to_simpler(a[None]).shape == (7,)


def test_proprio_conversions():
    quat = geo.euler2quat(0.1, 0.2, 0.3)
    eef = np.concatenate([[1.0, 2.0, 3.0], quat, [0.5]]).astype(np.float32)
    p7 = simpler_eef_pos_to_bridge_proprio(eef)
    np.testing.assert_allclose(p7[:3], [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(p7[3:6], [0.1, 0.2, 0.3], atol=1e-5)
    assert p7[6] == 0.5
    p8 = simpler_eef_pos_to_bridge_proprio_padded(eef)
    assert p8.shape == (8,)
    assert p8[6] == 0.0 and p8[7] == 0.5


def test_normalize_proprio_bounds():
    stats = {"k": {"proprio": {"q01": [0.0, -1.0], "q99": [1.0, 1.0]}}}
    out = normalize_proprio(np.array([0.5, 0.0], np.float32), norm_stats=stats, unnorm_key="k")
    np.testing.assert_allclose(out, [0.0, 0.0], atol=1e-6)
    # shape mismatch: unchanged
    same = normalize_proprio(np.array([0.5], np.float32), norm_stats=stats, unnorm_key="k")
    np.testing.assert_allclose(same, [0.5])
    # all-zero stats: unchanged
    z = {"k": {"proprio": {"q01": [0.0], "q99": [0.0]}}}
    same = normalize_proprio(np.array([0.5], np.float32), norm_stats=z, unnorm_key="k")
    np.testing.assert_allclose(same, [0.5])


def test_inject_dataset_statistics():
    norm_stats = {
        "bridge_orig": {
            "action": {"mask": [True] * 7},
            "proprio": {"q01": [0.0], "q99": [0.0]},
        }
    }
    ds = {
        "bridge_dataset": {
            "action": {"q01": [-1.0] * 7, "q99": [1.0] * 7},
            "proprio": {"q01": [-2.0], "q99": [2.0]},
        },
        "other_ds": {"action": {"q01": [0], "q99": [1]}},
    }
    out = inject_dataset_statistics_into_norm_stats(norm_stats, ds)
    # mask preserved, action ranges merged in
    assert out["bridge_orig"]["action"]["mask"] == [True] * 7
    assert out["bridge_orig"]["action"]["q99"] == [1.0] * 7
    # all-zero proprio replaced
    assert out["bridge_orig"]["proprio"]["q99"] == [2.0]
    # alias + new keys added
    assert "bridge_dataset" in out and "other_ds" in out
