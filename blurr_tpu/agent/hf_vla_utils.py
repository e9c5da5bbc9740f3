"""OpenVLA(-OFT) eval helpers: image preprocessing, action/proprio
conversions (behavior parity with reference scripts/eval_hf_vla_simpler.py;
line pointers on each function)."""

from __future__ import annotations

import copy
import io
import math
from typing import Any, Dict, Optional

import numpy as np
from PIL import Image

from blurr_tpu.utils.geometry import euler2axangle, mat2euler, quat2mat


def octo_style_preprocess(
    image: Image.Image, *, resize_size: int, base_size: int = 128
) -> Image.Image:
    """JPEG round-trip (RLDS artifact) -> 128 -> resize_size, LANCZOS
    (reference :439-459)."""
    resample = Image.Resampling.LANCZOS
    buf = io.BytesIO()
    image.save(buf, format="JPEG", quality=95)
    buf.seek(0)
    image = Image.open(buf).convert("RGB")
    image = image.resize((base_size, base_size), resample=resample)
    return image.resize((resize_size, resize_size), resample=resample)


def center_crop_and_resize_back(
    image: Image.Image, *, crop_scale: float
) -> Image.Image:
    """Center-crop area fraction crop_scale, resize back (reference :506-530;
    side length scales with sqrt(crop_scale))."""
    if not (0.0 < crop_scale <= 1.0):
        raise ValueError(f"crop_scale must be in (0, 1], got {crop_scale}")
    if crop_scale >= 1.0:
        return image
    w, h = image.size
    side = math.sqrt(crop_scale)
    new_w, new_h = max(1, int(round(w * side))), max(1, int(round(h * side)))
    left, top = max(0, (w - new_w) // 2), max(0, (h - new_h) // 2)
    cropped = image.crop((left, top, left + new_w, top + new_h))
    return cropped.resize((w, h), resample=Image.Resampling.BILINEAR)


def binarize_gripper_action(
    value: float,
    action_stats: Optional[Dict[str, Any]] = None,
    *,
    variant: str = "hf",
) -> float:
    """Gripper binarization with mask-aware thresholding (reference
    eval_hf_vla_simpler.py:337-354). ``variant="prismatic"`` reproduces the
    reference's prismatic eval script, which differs in ONE branch: when the
    gripper dim is masked OFF it thresholds on sign (value <= 0 -> -1)
    instead of the [0,1]-aware 0.5 threshold
    (reference eval_prismatic_vla_simpler.py:71-84)."""
    mask = action_stats.get("mask") if action_stats else None
    if isinstance(mask, (list, tuple)) and len(mask) >= 7:
        if not bool(mask[6]):
            if variant == "prismatic":
                return -1.0 if value <= 0.0 else 1.0
            if 0.0 <= value <= 1.0:
                return -1.0 if value <= 0.5 else 1.0
            return -1.0 if value <= 0.0 else 1.0
        sign = float(np.sign(2.0 * value - 1.0))
        return -1.0 if sign == 0.0 else sign
    if 0.0 <= value <= 1.0:
        return -1.0 if value <= 0.5 else 1.0
    return -1.0 if value <= 0.0 else 1.0


def bridge_action_to_simpler(
    action: np.ndarray,
    *,
    action_stats: Optional[Dict[str, Any]] = None,
    variant: str = "hf",
) -> np.ndarray:
    """Bridge 7-DoF [dx,dy,dz,rpy,gripper_open] -> Simpler
    [dx,dy,dz,rotvec,gripper{-1,1}] (reference :357-397)."""
    a = np.asarray(action, dtype=np.float32)
    if a.ndim == 2 and a.shape[1] == 7:
        a = a[0]
    elif a.ndim == 2 and a.shape[0] == 7:
        a = a[:, 0]
    a = a.reshape(-1)
    if a.shape[0] != 7:
        raise ValueError(f"Expected 7D action, got shape {a.shape}")
    axis, angle = euler2axangle(float(a[3]), float(a[4]), float(a[5]))
    out = np.zeros((7,), np.float32)
    out[:3] = a[:3]
    out[3:6] = np.asarray(axis, np.float32) * float(angle)
    out[6] = binarize_gripper_action(float(a[6]), action_stats, variant=variant)
    return out


def simpler_eef_pos_to_bridge_proprio(eef_pos: np.ndarray) -> np.ndarray:
    """8D [xyz, wxyz quat, gripper] -> 7D [xyz, rpy, gripper]
    (reference :533-551)."""
    eef_pos = np.asarray(eef_pos, np.float32).reshape(-1)
    if eef_pos.shape[0] != 8:
        raise ValueError(f"Expected 8D eef_pos, got shape {eef_pos.shape}")
    roll, pitch, yaw = mat2euler(quat2mat(eef_pos[3:7]))
    return np.asarray(
        [eef_pos[0], eef_pos[1], eef_pos[2], roll, pitch, yaw, eef_pos[7]],
        np.float32,
    )


def simpler_eef_pos_to_bridge_proprio_padded(eef_pos: np.ndarray) -> np.ndarray:
    """8D POS_EULER layout [xyz, rpy, PAD, gripper] (reference :553-563)."""
    base = simpler_eef_pos_to_bridge_proprio(eef_pos)
    return np.concatenate(
        [base[:6], np.asarray([0.0], np.float32), base[6:7]]
    ).astype(np.float32)


def normalize_proprio(
    proprio: np.ndarray,
    *,
    norm_stats: Optional[Dict[str, Any]],
    unnorm_key: Optional[str],
    clip: bool = True,
) -> np.ndarray:
    """q01/q99 bounds normalization into [-1, 1] (reference :462-503)."""
    if norm_stats is None or unnorm_key is None:
        return proprio
    proprio_stats = (norm_stats.get(unnorm_key) or {}).get("proprio")
    if not isinstance(proprio_stats, dict):
        return proprio
    low = np.asarray(proprio_stats.get("q01", []), np.float32)
    high = np.asarray(proprio_stats.get("q99", []), np.float32)
    if low.size == 0 or high.size == 0 or low.shape != high.shape:
        return proprio
    if low.shape[0] != proprio.shape[0]:
        return proprio
    if np.allclose(low, 0.0) and np.allclose(high, 0.0):
        return proprio
    eps = 1e-8
    denom = (high - low).astype(np.float32)
    if np.all(np.abs(denom) < eps):
        return proprio
    denom = np.where(np.abs(denom) < eps, 1.0, denom)
    out = (2.0 * (proprio.astype(np.float32) - low) / denom) - 1.0
    if clip:
        out = np.clip(out, -1.0, 1.0)
    return out.astype(np.float32)


def infer_center_crop_default(model_path) -> bool:
    """Auto center-crop heuristic (reference :291-315): a training run that
    used image augmentations stores an ``_name_or_path`` containing
    'image_aug' in the raw config.json; missing/corrupt config -> False."""
    import json
    from pathlib import Path

    cfg_path = Path(model_path) / "config.json"
    if not cfg_path.is_file():
        return False
    try:
        raw = json.load(open(cfg_path))
    except Exception:
        return False
    return "image_aug" in str(raw.get("_name_or_path", "")).lower()


# NOTE on precedence: config.json norm_stats WIN over dataset_statistics
# for overlapping action keys — this mirrors the reference exactly
# (reference scripts/eval_hf_vla_simpler.py:236-238: merged = dict(ds);
# merged.update(base) keeps the mask and base values); dataset stats fill
# gaps and replace all-zero proprio blocks only.
def inject_dataset_statistics_into_norm_stats(
    norm_stats: Dict[str, Any], dataset_stats: Dict[str, Any]
) -> Dict[str, Any]:
    """Merge dataset_statistics.json into norm_stats (reference :198-267):
    bridge_dataset action stats merged under bridge_orig preserving the mask;
    all-zero proprio entries replaced; missing keys copied over."""
    if not dataset_stats:
        return norm_stats

    def is_all_zeros(stats):
        if not isinstance(stats, dict):
            return True
        for field in ("min", "max", "mean", "std", "q01", "q99"):
            vals = stats.get(field)
            if isinstance(vals, (list, tuple)) and any(float(x) != 0.0 for x in vals):
                return False
        return True

    if "bridge_dataset" in dataset_stats and "bridge_orig" in norm_stats:
        ds = dataset_stats["bridge_dataset"]
        base = norm_stats["bridge_orig"]
        if isinstance(ds, dict) and isinstance(base, dict):
            if isinstance(ds.get("action"), dict) and isinstance(base.get("action"), dict):
                merged = dict(ds["action"])
                merged.update(base["action"])  # keep mask
                base["action"] = merged
            if isinstance(ds.get("proprio"), dict) and is_all_zeros(base.get("proprio")):
                base["proprio"] = ds["proprio"]
            elif isinstance(ds.get("proprio"), dict) and isinstance(base.get("proprio"), dict):
                for k, v in ds["proprio"].items():
                    base["proprio"].setdefault(k, v)
            if "bridge_dataset" not in norm_stats:
                # deep-copy: aliasing the same dict would let a later
                # mutation of one key silently corrupt the other
                norm_stats["bridge_dataset"] = copy.deepcopy(base)

    for key, value in dataset_stats.items():
        if key in norm_stats or not isinstance(value, dict) or "action" not in value:
            continue
        norm_stats[key] = value
    return norm_stats
