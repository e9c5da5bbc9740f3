"""Differential parity vs the reference's HF-VLA eval helper layer.

Drives the reference's OWN in-repo implementations — imported with
``load_reference_script`` from reference scripts/eval_hf_vla_simpler.py,
eval_prismatic_vla_simpler.py — against the blurr_tpu counterparts
(agent/hf_vla_utils.py, models/openvla/model.py + checkpoint.py), removing
the last same-author oracles (round-2 verdict Weak #1).

prismatic (needed by the reference's _normalize_proprio) is stubbed with the
openvla-oft constants (BOUNDS_Q99); huggingface_hub.hf_hub_download is
monkeypatched to serve synthetic local snapshots.
"""

from __future__ import annotations

import copy
import json
import types

import numpy as np
import pytest

from blurr_tpu.utils.reference_bridge import reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

import jax.numpy as jnp  # noqa: E402

from blurr_tpu.agent.hf_vla_utils import (  # noqa: E402
    binarize_gripper_action,
    bridge_action_to_simpler,
    center_crop_and_resize_back,
    infer_center_crop_default,
    inject_dataset_statistics_into_norm_stats,
    normalize_proprio,
    octo_style_preprocess,
    simpler_eef_pos_to_bridge_proprio,
    simpler_eef_pos_to_bridge_proprio_padded,
)
from blurr_tpu.models.openvla.checkpoint import (  # noqa: E402
    infer_unnorm_key,
    load_oft_aux_params,
)
from blurr_tpu.models.openvla.model import (  # noqa: E402
    oft_action_head_forward,
    oft_proprio_forward,
)
from blurr_tpu.utils.reference_bridge import (  # noqa: E402
    load_reference_script,
    t2n,
)

RH = load_reference_script("eval_hf_vla_simpler")
RP = load_reference_script("eval_prismatic_vla_simpler")

import torch  # noqa: E402


@pytest.fixture(autouse=True)
def _seed_torch():
    torch.manual_seed(0)
    yield


# ---------------------------------------------------------------------------
# OFT action head / proprio projector (reference eval_hf_vla_simpler.py:31-73)
# ---------------------------------------------------------------------------


def _bridge_oft_head(head: "RH._OFTActionHead") -> dict:
    sd = {k: t2n(v) for k, v in head.state_dict().items()}
    n = len(head.mlp_resnet_blocks)
    return {
        "ln1_w": sd["layer_norm1.weight"],
        "ln1_b": sd["layer_norm1.bias"],
        "fc1_w": sd["fc1.weight"].T,
        "fc1_b": sd["fc1.bias"],
        "blocks": {
            "ln_w": np.stack(
                [sd[f"mlp_resnet_blocks.{i}.ffn.0.weight"] for i in range(n)]
            ),
            "ln_b": np.stack(
                [sd[f"mlp_resnet_blocks.{i}.ffn.0.bias"] for i in range(n)]
            ),
            "w": np.stack(
                [sd[f"mlp_resnet_blocks.{i}.ffn.1.weight"].T for i in range(n)]
            ),
            "b": np.stack(
                [sd[f"mlp_resnet_blocks.{i}.ffn.1.bias"] for i in range(n)]
            ),
        },
        "ln2_w": sd["layer_norm2.weight"],
        "ln2_b": sd["layer_norm2.bias"],
        "fc2_w": sd["fc2.weight"].T,
        "fc2_b": sd["fc2.bias"],
    }


def _randomize_(mod: torch.nn.Module) -> None:
    """Non-default weights everywhere (LayerNorm init is identity otherwise,
    which would hide scale/bias transposition bugs)."""
    with torch.no_grad():
        for p in mod.parameters():
            p.copy_(torch.randn_like(p) * 0.3)


def test_oft_action_head_forward_matches_reference():
    head = RH._OFTActionHead(in_dim=24, hidden_dim=16, out_dim=21, n_blocks=3)
    _randomize_(head)
    head.eval()
    x = torch.randn(5, 24)
    ref = t2n(head(x))
    mine = np.asarray(
        oft_action_head_forward(_bridge_oft_head(head), jnp.asarray(t2n(x)))
    )
    np.testing.assert_allclose(mine, ref, rtol=2e-5, atol=2e-6)


def test_oft_predict_action_flattens_whole_chunk():
    """predict_action reshapes [B, T, H] hidden states into one flat vector
    per batch element and returns a flat action vector (reference :57-62)."""
    chunk, h = 4, 6
    head = RH._OFTActionHead(
        in_dim=chunk * h, hidden_dim=16, out_dim=chunk * 7, n_blocks=2
    )
    _randomize_(head)
    head.eval()
    hidden = torch.randn(1, chunk, h)
    ref = t2n(head.predict_action(hidden))
    assert ref.shape == (chunk * 7,)
    mine = np.asarray(
        oft_action_head_forward(
            _bridge_oft_head(head), jnp.asarray(t2n(hidden).reshape(1, -1))
        )
    ).reshape(-1)
    np.testing.assert_allclose(mine, ref, rtol=2e-5, atol=2e-6)


def test_oft_proprio_projector_matches_reference():
    proj = RH._OFTProprioProjector(in_dim=8, hidden_dim=12, out_dim=10)
    _randomize_(proj)
    proj.eval()
    x = torch.randn(3, 8)
    ref = t2n(proj(x))
    p = {k: t2n(v) for k, v in proj.state_dict().items()}
    mine = np.asarray(
        oft_proprio_forward(
            {
                "fc1_w": p["fc1.weight"].T,
                "fc1_b": p["fc1.bias"],
                "fc2_w": p["fc2.weight"].T,
                "fc2_b": p["fc2.bias"],
            },
            jnp.asarray(t2n(x)),
        )
    )
    np.testing.assert_allclose(mine, ref, rtol=2e-5, atol=2e-6)


def test_load_oft_aux_modules_synthetic_snapshot(tmp_path, monkeypatch):
    """Both loaders on the SAME synthetic snapshot dir: the reference's
    shape-driven torch reconstruction (:76-132, checkpoint keys prefixed
    'module.model.' for the head and 'module.' for the projector) vs
    load_oft_aux_params -> identical module outputs."""
    head = RH._OFTActionHead(in_dim=20, hidden_dim=16, out_dim=14, n_blocks=2)
    proj = RH._OFTProprioProjector(in_dim=8, hidden_dim=16, out_dim=12)
    _randomize_(head)
    _randomize_(proj)
    torch.save(
        {f"module.model.{k}": v for k, v in head.state_dict().items()},
        tmp_path / "action_head--5000_checkpoint.pt",
    )
    torch.save(
        {f"module.{k}": v for k, v in proj.state_dict().items()},
        tmp_path / "proprio_projector--5000_checkpoint.pt",
    )
    (tmp_path / "config.json").write_text("{}")

    import huggingface_hub

    monkeypatch.setattr(
        huggingface_hub,
        "hf_hub_download",
        lambda model_id, fname, repo_type=None: str(tmp_path / fname),
    )
    ref_head, ref_proj = RH._load_oft_aux_modules(
        "fake/model", device=torch.device("cpu"), dtype=torch.float32
    )
    assert ref_head is not None and ref_proj is not None

    my_head, my_proj = load_oft_aux_params(str(tmp_path), jnp.float32)
    assert my_head is not None and my_proj is not None

    hidden = torch.randn(1, 20)
    np.testing.assert_allclose(
        np.asarray(oft_action_head_forward(my_head, jnp.asarray(t2n(hidden)))),
        t2n(ref_head(hidden)),
        rtol=2e-5,
        atol=2e-6,
    )
    pr = torch.randn(1, 8)
    np.testing.assert_allclose(
        np.asarray(oft_proprio_forward(my_proj, jnp.asarray(t2n(pr)))),
        t2n(ref_proj(pr)),
        rtol=2e-5,
        atol=2e-6,
    )


# ---------------------------------------------------------------------------
# Image preprocessing (reference :439-459, :506-530, :291-315)
# ---------------------------------------------------------------------------


def _random_image(w=320, h=256, seed=0):
    from PIL import Image

    rng = np.random.RandomState(seed)
    return Image.fromarray(rng.randint(0, 256, (h, w, 3), np.uint8), "RGB")


def test_octo_style_preprocess_bitwise():
    img = _random_image()
    ref = np.asarray(RH._octo_style_preprocess(img, resize_size=224))
    mine = np.asarray(octo_style_preprocess(img, resize_size=224))
    np.testing.assert_array_equal(mine, ref)


@pytest.mark.parametrize("crop_scale", [0.9, 0.5, 0.33, 1.0])
@pytest.mark.parametrize("size", [(224, 224), (200, 180)])
def test_center_crop_and_resize_back_bitwise(crop_scale, size):
    img = _random_image(*size, seed=3)
    ref = np.asarray(
        RH._center_crop_and_resize_back(img, crop_scale=crop_scale)
    )
    mine = np.asarray(center_crop_and_resize_back(img, crop_scale=crop_scale))
    np.testing.assert_array_equal(mine, ref)


def test_center_crop_rejects_bad_scale():
    img = _random_image(32, 32)
    for bad in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError):
            RH._center_crop_and_resize_back(img, crop_scale=bad)
        with pytest.raises(ValueError):
            center_crop_and_resize_back(img, crop_scale=bad)


@pytest.mark.parametrize(
    "payload, expect_file",
    [
        ({"_name_or_path": "runs/openvla-7b+bridge+image_aug"}, True),
        ({"_name_or_path": "runs/openvla-7b+bridge"}, True),
        ({}, True),
        (None, False),  # no config.json at all
        ("NOT JSON", True),  # corrupt file
    ],
)
def test_infer_center_crop_default(tmp_path, payload, expect_file):
    if expect_file:
        text = payload if isinstance(payload, str) else json.dumps(payload)
        (tmp_path / "config.json").write_text(text)
    ref = RH._infer_center_crop_default(str(tmp_path))
    mine = infer_center_crop_default(str(tmp_path))
    assert mine == ref


# ---------------------------------------------------------------------------
# Gripper binarization / action conversion (reference :337-397; prismatic
# variant eval_prismatic_vla_simpler.py:71-127)
# ---------------------------------------------------------------------------

_GRIPPER_VALUES = [-1.5, -1.0, -0.3, 0.0, 0.2, 0.5, 0.7, 1.0, 1.3]
_STATS_CASES = [
    None,
    {},
    {"mask": [True] * 7},
    {"mask": [True] * 6 + [False]},
    {"mask": [True, False]},  # short mask -> fallback branch
    {"q01": [0.0] * 7},  # stats without mask
]


@pytest.mark.parametrize("stats", _STATS_CASES)
def test_binarize_gripper_hf_variant(stats):
    for v in _GRIPPER_VALUES:
        assert binarize_gripper_action(v, stats) == RH._binarize_gripper_action(
            v, stats
        ), (v, stats)


@pytest.mark.parametrize("stats", _STATS_CASES)
def test_binarize_gripper_prismatic_variant(stats):
    """The prismatic script's mask-off branch thresholds on SIGN, not 0.5 —
    a real divergence between the two reference scripts that the ``variant``
    switch reproduces."""
    for v in _GRIPPER_VALUES:
        assert binarize_gripper_action(
            v, stats, variant="prismatic"
        ) == RP._binarize_gripper_action(v, stats), (v, stats)


@pytest.mark.parametrize("shape", ["flat", "row", "col", "torch"])
@pytest.mark.parametrize(
    "stats", [None, {"mask": [True] * 7}, {"mask": [True] * 6 + [False]}]
)
def test_bridge_action_to_simpler(shape, stats):
    rng = np.random.RandomState(7)
    for _ in range(4):
        a = rng.uniform(-1.2, 1.2, size=7).astype(np.float32)
        if shape == "row":
            arg = a[None, :]
        elif shape == "col":
            arg = a[:, None]
        elif shape == "torch":
            arg = torch.tensor(a)
        else:
            arg = a
        ref = RH._bridge_action_to_simpler(arg, action_stats=stats)
        mine = bridge_action_to_simpler(
            np.asarray(arg) if shape == "torch" else arg, action_stats=stats
        )
        np.testing.assert_allclose(mine, ref, rtol=1e-6, atol=1e-7)

        ref_p = RP._bridge_action_to_simpler(arg, action_stats=stats)
        mine_p = bridge_action_to_simpler(
            np.asarray(arg) if shape == "torch" else arg,
            action_stats=stats,
            variant="prismatic",
        )
        np.testing.assert_allclose(mine_p, ref_p, rtol=1e-6, atol=1e-7)


def test_bridge_action_rejects_wrong_dim():
    bad = np.zeros(6, np.float32)
    with pytest.raises(ValueError):
        RH._bridge_action_to_simpler(bad)
    with pytest.raises(ValueError):
        bridge_action_to_simpler(bad)


# ---------------------------------------------------------------------------
# Proprio conversion + normalization (reference :462-503, :533-563)
# ---------------------------------------------------------------------------


def test_eef_pos_conversions(monkeypatch):
    # numpy-2 compat shim for the reference's mat2euler: its
    # `np.array(mat, dtype=float64, copy=False)` relied on numpy<2 semantics
    # (copy-if-needed); reproduce those semantics by pre-converting. Math
    # unchanged.
    import importlib

    RH.ensure_open_pi_zero_on_path()
    geo = importlib.import_module("src.utils.geometry")
    orig = geo.mat2euler
    monkeypatch.setattr(
        geo,
        "mat2euler",
        lambda mat, axes="sxyz": orig(np.asarray(mat, np.float64), axes),
    )
    rng = np.random.RandomState(11)
    for _ in range(5):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        eef = np.concatenate(
            [rng.uniform(-0.5, 0.5, 3), q, [rng.uniform(0, 1)]]
        ).astype(np.float32)
        np.testing.assert_allclose(
            simpler_eef_pos_to_bridge_proprio(eef),
            RH._convert_simpler_eef_pos_to_bridge_proprio(eef),
            rtol=1e-5,
            atol=1e-6,
        )
        np.testing.assert_allclose(
            simpler_eef_pos_to_bridge_proprio_padded(eef),
            RH._convert_simpler_eef_pos_to_bridge_proprio_padded(eef),
            rtol=1e-5,
            atol=1e-6,
        )
    with pytest.raises(ValueError):
        RH._convert_simpler_eef_pos_to_bridge_proprio(np.zeros(7))
    with pytest.raises(ValueError):
        simpler_eef_pos_to_bridge_proprio(np.zeros(7))


def _proprio_stats(q01, q99):
    return {"k": {"proprio": {"q01": q01, "q99": q99}}}


@pytest.mark.parametrize(
    "stats, key",
    [
        (None, None),
        (None, "k"),
        (_proprio_stats([-1, -2, -3, -1, -1, -1, 0, 0], [1, 2, 3, 1, 1, 1, 0, 1]), "k"),
        (_proprio_stats([0] * 8, [0] * 8), "k"),  # all-zero bounds -> passthrough
        (_proprio_stats([-1] * 4, [1] * 4), "k"),  # dim mismatch -> passthrough
        ({"k": {"proprio": "oops"}}, "k"),  # malformed
        ({"k": {}}, "k"),
        (_proprio_stats([-1, -2, -3, -1, -1, -1, 0, 0], [1, 2, 3, 1, 1, 1, 0, 1]), "missing"),
    ],
)
@pytest.mark.parametrize("clip", [True, False])
def test_normalize_proprio(stats, key, clip):
    rng = np.random.RandomState(5)
    p = rng.uniform(-4, 4, 8).astype(np.float32)
    ref = RH._normalize_proprio(p, norm_stats=stats, unnorm_key=key, clip=clip)
    mine = normalize_proprio(p, norm_stats=stats, unnorm_key=key, clip=clip)
    np.testing.assert_allclose(mine, ref, rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# norm_stats merging + unnorm-key inference (reference :201-288)
# ---------------------------------------------------------------------------


def _base_norm_stats(zero_proprio=True):
    proprio = (
        {f: [0.0] * 8 for f in ("min", "max", "mean", "std", "q01", "q99")}
        if zero_proprio
        else {"q01": [-9.0] * 8, "q99": [9.0] * 8}
    )
    return {
        "bridge_orig": {
            "action": {
                "q01": [-0.1] * 7,
                "q99": [0.1] * 7,
                "mask": [True] * 6 + [False],
            },
            "proprio": proprio,
        }
    }


def _dataset_stats():
    return {
        "bridge_dataset": {
            "action": {"q01": [-0.2] * 7, "q99": [0.2] * 7, "mean": [0.0] * 7},
            "proprio": {"q01": [-1.0] * 8, "q99": [1.0] * 8},
        },
        "fractal_ds": {"action": {"q01": [-0.3] * 7, "q99": [0.3] * 7}},
        "no_action_ds": {"proprio": {"q01": [-1.0] * 8}},
        "not_a_dict": 3,
    }


@pytest.mark.parametrize("zero_proprio", [True, False])
def test_inject_dataset_statistics(monkeypatch, zero_proprio):
    ds = _dataset_stats()
    monkeypatch.setattr(RH, "_load_dataset_stats", lambda _mid: copy.deepcopy(ds))
    model = types.SimpleNamespace(
        norm_stats=copy.deepcopy(_base_norm_stats(zero_proprio))
    )
    RH._inject_dataset_statistics_into_norm_stats(model, "fake/model")

    mine = inject_dataset_statistics_into_norm_stats(
        copy.deepcopy(_base_norm_stats(zero_proprio)), copy.deepcopy(ds)
    )
    assert mine == model.norm_stats


def test_inject_noop_when_no_dataset_stats(monkeypatch):
    monkeypatch.setattr(RH, "_load_dataset_stats", lambda _mid: {})
    base = _base_norm_stats()
    model = types.SimpleNamespace(norm_stats=copy.deepcopy(base))
    RH._inject_dataset_statistics_into_norm_stats(model, "fake/model")
    assert model.norm_stats == base
    assert inject_dataset_statistics_into_norm_stats(copy.deepcopy(base), {}) == base


@pytest.mark.parametrize(
    "norm_keys, ds_keys, override",
    [
        (["bridge_orig", "x"], [], None),  # bridge_orig preferred
        (["a", "b"], ["b"], None),  # intersection
        (["a", "b"], ["zzz"], None),  # no intersection -> first key
        (["only"], [], None),
        ([], [], None),  # empty -> None
        (["a", "bridge_orig"], ["a"], None),  # bridge_orig beats intersection
        (["a", "b"], [], "b"),  # explicit override
    ],
)
def test_infer_unnorm_key_hf(monkeypatch, norm_keys, ds_keys, override):
    ds = {k: {"action": {}} for k in ds_keys}
    monkeypatch.setattr(RH, "_load_dataset_stats", lambda _mid: ds)
    model = types.SimpleNamespace(norm_stats={k: {} for k in norm_keys})
    ref = RH._infer_unnorm_key(model=model, model_id="fake", override=override)
    mine = infer_unnorm_key(
        {k: {} for k in norm_keys}, requested=override, dataset_stats=ds
    )
    assert mine == ref


def test_infer_unnorm_key_benchmark_order_flips_preference():
    """The reference BENCHMARK ranks the fallbacks the other way around from
    the eval script (benchmark_hf_vla.py:217-226, inline in main() so not
    import-drivable): dataset-statistics intersection > 'bridge_orig' >
    first norm_stats key. A fine-tuned snapshot whose dataset_statistics.json
    names a custom dataset while config.json still carries 'bridge_orig' must
    resolve to the custom key under prefer_dataset_stats=True and to
    'bridge_orig' under the eval default."""
    norm = {"bridge_orig": {}, "custom_ds": {}}
    ds = {"custom_ds": {}}
    assert infer_unnorm_key(norm, dataset_stats=ds) == "bridge_orig"
    assert (
        infer_unnorm_key(norm, dataset_stats=ds, prefer_dataset_stats=True)
        == "custom_ds"
    )
    # no intersection: benchmark falls back to bridge_orig, then first key
    assert (
        infer_unnorm_key(norm, dataset_stats={"zzz": {}},
                         prefer_dataset_stats=True)
        == "bridge_orig"
    )
    assert (
        infer_unnorm_key({"a": {}, "b": {}}, dataset_stats={},
                         prefer_dataset_stats=True)
        == "a"
    )
    # explicit key validation applies in both orderings
    with pytest.raises(KeyError):
        infer_unnorm_key(norm, requested="zzz", prefer_dataset_stats=True)


def test_infer_unnorm_key_rejects_unknown_explicit_key():
    """Deliberately STRICTER than the reference eval script (which returns an
    unvalidated override and fails later): the explicit-key validation of
    reference benchmark_hf_vla.py:228-231 applies here."""
    with pytest.raises(KeyError):
        infer_unnorm_key({"a": {}}, requested="zzz")


def test_prismatic_infer_unnorm_key_matches_reference():
    import importlib.util
    from pathlib import Path

    repo_script = (
        Path(__file__).resolve().parents[1] / "scripts" / "eval_prismatic_vla_simpler.py"
    )
    spec = importlib.util.spec_from_file_location("blurr_prismatic_eval", repo_script)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    cases = [
        ({"a": {}, "b": {}}, {"b": {}}, None),
        ({"a": {}, "bridge_dataset": {}}, {}, None),
        ({"a": {}, "b": {}}, {}, None),
        ({}, {}, None),
        ({"a": {}}, {}, "forced"),
    ]
    for norm, ds, override in cases:
        assert mod._infer_unnorm_key(norm, ds, override) == RP._infer_unnorm_key(
            norm_stats=norm, dataset_stats=ds, override=override
        ), (norm, ds, override)
