"""Mask/position-id construction vs the reference's block-attention spec
(the ASCII diagram at reference pizero.py:337-342 is the ground truth)."""

import numpy as np

import jax.numpy as jnp

from blurr_tpu.ops import masks as mask_lib


def reference_full_mask(attention_mask, max_it, n_p, n_a):
    """Literal numpy re-implementation of reference
    build_causal_mask_and_position_ids (pizero.py:343-362), as booleans."""
    bsz, _ = attention_mask.shape
    total = max_it + n_p + n_a
    p_start, p_end = max_it, max_it + n_p
    allow = np.zeros((bsz, total, total), bool)
    cnts = attention_mask.sum(axis=1)
    for idx, cnt in enumerate(cnts):
        allow[idx, :cnt, :cnt] = True
        allow[idx, p_start:, :cnt] = True
    allow[:, p_start:p_end, p_start:p_end] = True
    allow[:, p_end:, p_start:] = True
    return allow


def make_attention_mask(bsz=3, max_it=10):
    am = np.zeros((bsz, max_it), np.int32)
    for b, cnt in enumerate([4, 7, 10][:bsz]):
        am[b, :cnt] = 1
    return am


def test_full_mask_matches_reference_semantics():
    max_it, n_p, n_a = 10, 1, 4
    am = make_attention_mask(3, max_it)
    ours = np.asarray(mask_lib.pi0_full_mask(jnp.asarray(am), max_it, n_p, n_a))
    ref = reference_full_mask(am, max_it, n_p, n_a)
    np.testing.assert_array_equal(ours, ref)


def test_submasks_are_slices_of_full():
    max_it, n_p, n_a = 10, 2, 4
    am = make_attention_mask(3, max_it)
    full = np.asarray(mask_lib.pi0_full_mask(jnp.asarray(am), max_it, n_p, n_a))
    prefix = np.asarray(mask_lib.pi0_prefix_mask(jnp.asarray(am), max_it, n_p))
    action = np.asarray(mask_lib.pi0_action_mask(jnp.asarray(am), max_it, n_p, n_a))
    p = max_it + n_p
    np.testing.assert_array_equal(prefix, full[:, :p, :p])
    np.testing.assert_array_equal(action, full[:, -n_a:, :])


def test_position_ids():
    vlm, proprio, action = mask_lib.pi0_position_ids(2, 10, 1, 4)
    # start at 1; action continues after proprio (pizero.py:369-381)
    np.testing.assert_array_equal(np.asarray(vlm[0]), np.arange(1, 11))
    np.testing.assert_array_equal(np.asarray(proprio[0]), [1])
    np.testing.assert_array_equal(np.asarray(action[0]), [2, 3, 4, 5])


def test_additive_from_bool_format():
    am = make_attention_mask(1, 6)
    full = mask_lib.pi0_full_mask(jnp.asarray(am), 6, 1, 2)
    add = mask_lib.additive_from_bool(full, jnp.float32)
    assert add.shape == (1, 1, 9, 9)
    a = np.asarray(add)[0, 0]
    assert (a[np.asarray(full)[0]] == 0).all()
    assert (a[~np.asarray(full)[0]] == np.finfo(np.float32).min).all()


def test_full_mask_randomized_lengths():
    """Property sweep: the in-graph mask matches the numpy reference for 40
    random (image_text_len, n_proprio, n_action, batch) combinations."""
    rng = np.random.RandomState(0)
    for _ in range(40):
        max_it = int(rng.randint(3, 24))
        n_p = int(rng.randint(1, 3))
        n_a = int(rng.randint(1, 6))
        bsz = int(rng.randint(1, 4))
        am = np.zeros((bsz, max_it), np.int32)
        for b in range(bsz):
            am[b, : rng.randint(1, max_it + 1)] = 1
        want = reference_full_mask(am, max_it, n_p, n_a)
        got = np.asarray(
            mask_lib.pi0_full_mask(jnp.asarray(am), max_it, n_p, n_a)
        )
        np.testing.assert_array_equal(got, want, err_msg=f"{max_it},{n_p},{n_a}")
