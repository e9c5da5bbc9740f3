"""Shared host-side image resize ladder for the control loop.

One implementation of the cv2 > native-C++ Lanczos-4 > jax.image degradation
ladder (the reference resizes with cv2.resize INTER_LANCZOS4,
reference src/agent/env_adapter/simpler.py:59-69). Both the env adapters and
the action server use this helper so the two paths cannot drift.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def lanczos_resize_uint8(image: np.ndarray, height: int, width: int) -> np.ndarray:
    """Resize an HxWxC uint8 image to (height, width) with Lanczos-family
    interpolation, degrading cv2 -> native C++ -> jax.image."""
    if image.shape[:2] == (height, width):
        return image
    if cv2 is not None:
        # cv2 takes (width, height)
        return cv2.resize(image, (width, height), interpolation=cv2.INTER_LANCZOS4)
    from blurr_tpu import native

    if native.available():
        out = native.lanczos4_resize(image, (height, width))
        if out is not None:
            return out
    import jax
    import jax.numpy as jnp

    out = jax.image.resize(
        jnp.asarray(image, jnp.float32),
        (height, width, image.shape[2]),
        method="lanczos5",
    )
    return np.asarray(jnp.clip(jnp.round(out), 0, 255)).astype(np.uint8)
