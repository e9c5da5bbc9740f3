"""Geometry conversions vs scipy.spatial.transform ground truth."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from blurr_tpu.utils import geometry as geo

CASES = [
    (0.1, -0.2, 0.3),
    (0.0, 0.0, 0.0),
    (1.2, 0.7, -2.1),
    (-3.0, 1.5, 0.01),
    (0.5, -1.5707, 2.0),  # near gimbal lock
]


@pytest.mark.parametrize("ai,aj,ak", CASES)
def test_euler2mat_vs_scipy(ai, aj, ak):
    ours = geo.euler2mat(ai, aj, ak)
    # sxyz static frame == scipy extrinsic 'xyz'
    ref = Rotation.from_euler("xyz", [ai, aj, ak]).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-12)


@pytest.mark.parametrize("ai,aj,ak", CASES[:4])
def test_mat2euler_roundtrip(ai, aj, ak):
    m = geo.euler2mat(ai, aj, ak)
    out = geo.euler2mat(*geo.mat2euler(m))
    np.testing.assert_allclose(out, m, atol=1e-12)


@pytest.mark.parametrize("ai,aj,ak", CASES)
def test_euler2quat_vs_scipy(ai, aj, ak):
    w, x, y, z = geo.euler2quat(ai, aj, ak)
    ref = Rotation.from_euler("xyz", [ai, aj, ak]).as_quat()  # [x,y,z,w]
    ours = np.array([x, y, z, w])
    if np.dot(ours, ref) < 0:
        ours = -ours
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_quat2mat_vs_scipy():
    rng = np.random.RandomState(0)
    for _ in range(10):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        ref = Rotation.from_quat([x, y, z, w]).as_matrix()
        np.testing.assert_allclose(geo.quat2mat(q), ref, atol=1e-12)


def test_quat2mat_non_unit_safe():
    q = np.array([2.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(geo.quat2mat(q), np.eye(3), atol=1e-12)


def test_quat2axangle():
    axis, angle = geo.quat2axangle([np.cos(0.3), np.sin(0.3), 0, 0])
    np.testing.assert_allclose(axis, [1, 0, 0], atol=1e-12)
    np.testing.assert_allclose(angle, 0.6, atol=1e-12)
    axis, angle = geo.quat2axangle([1.0, 0.0, 0.0, 0.0])
    assert angle == 0.0


def test_euler2axangle_vs_scipy():
    for ai, aj, ak in CASES:
        axis, angle = geo.euler2axangle(ai, aj, ak)
        rv = Rotation.from_euler("xyz", [ai, aj, ak]).as_rotvec()
        ref_angle = np.linalg.norm(rv)
        if ref_angle < 1e-12:
            continue
        ref_axis = rv / ref_angle
        if np.dot(axis, ref_axis) < 0:
            axis, angle = -axis, -angle + 2 * np.pi  # wrap representation
        np.testing.assert_allclose(axis * angle % (2 * np.pi),
                                   ref_axis * ref_angle % (2 * np.pi), atol=1e-9)


def test_mat2quat_roundtrip():
    rng = np.random.RandomState(1)
    for _ in range(10):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        np.testing.assert_allclose(geo.mat2quat(geo.quat2mat(q)), q, atol=1e-12)
