"""Native C++ preprocessing library vs cv2/PIL references."""

import numpy as np
import pytest

from blurr_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++)"
)


def test_resize_matches_cv2_lanczos4():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (480, 640, 3), np.uint8)
    ours = native.lanczos4_resize(img, (224, 224))
    ref = cv2.resize(img, (224, 224), interpolation=cv2.INTER_LANCZOS4)
    diff = np.abs(ours.astype(np.int32) - ref.astype(np.int32))
    # same interpolation family; OpenCV uses fixed-point weights -> allow
    # small per-pixel deviation but demand near-identical images
    assert diff.mean() < 1.0, diff.mean()
    assert np.percentile(diff, 99) <= 3


def test_resize_identity():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (64, 64, 3), np.uint8)
    out = native.lanczos4_resize(img, (64, 64))
    # identity resize must be exact (weights collapse to a delta)
    np.testing.assert_array_equal(out, img)


def test_fused_normalize_chw():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (100, 120, 3), np.uint8)
    fused = native.lanczos4_resize_normalize_chw(img, (56, 56), 0.5, 0.5)
    assert fused.shape == (3, 56, 56)
    resized = native.lanczos4_resize(img, (56, 56))
    ref = (resized.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(fused, ref.transpose(2, 0, 1), atol=2e-2)
