"""Exactness check of the W4A8 Pallas kernel ON REAL TPU HARDWARE at
production shapes (the pytest suite verifies it on CPU interpret mode at
tiny shapes — this catches Mosaic lowering bugs interpret mode cannot).

Method: quantize activations ONCE (feeding the identical int8 xq to both
sides — re-deriving xq on the host can flip borderline round(x/xs) values
in the last ulp and shows up as a false ~1e-4 deviation), then compare the
kernel against XLA int8 dots with int32 accumulation and the same
group-scale order. All integer products/sums fit int32, so outputs must be
BIT-IDENTICAL.

Measured 2026-08-17 (v5e): max rel err 0.00e+00 at every shape below —
gate/up/down prefill (S=276) and decode GEMVs, K up to 16384, N up to the
padded 32064-vocab head.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

from blurr_tpu.ops.pallas_int4_matmul import (
    from_block_major,
    int4_matmul,
    unpack_int4_reference,
)
from blurr_tpu.ops.quant import quantize_weight_w4a8


def check(m, k, n, seed):
    rng = np.random.RandomState(seed)
    x = rng.randn(m, k).astype(np.float32) * 0.5
    w = jnp.asarray(rng.randn(k, n).astype(np.float32) * 0.02)
    q = quantize_weight_w4a8(w)
    groups = q["s"].shape[0]
    g = k // groups

    xs = np.clip(np.abs(x).max(-1, keepdims=True), 1e-6, None) / 127.0
    xq = jnp.asarray(np.clip(np.round(x / xs), -128, 127).astype(np.int8))

    n_pad = q["q4"].shape[0] * q["q4"].shape[2]
    s_pad = jnp.zeros((groups, n_pad), jnp.float32).at[:, :n].set(q["s"])
    out = np.asarray(int4_matmul(xq, q["q4"], s_pad))[:, :n]

    wq = unpack_int4_reference(from_block_major(q["q4"]))[:, :n]

    @jax.jit
    def ref_fn(xq, wq, s):
        acc = jnp.zeros((m, n), jnp.float32)
        for gi in range(groups):
            d = jnp.dot(
                xq[:, gi * g:(gi + 1) * g], wq[gi * g:(gi + 1) * g],
                preferred_element_type=jnp.int32,
            )
            acc = acc + d.astype(jnp.float32) * s[gi]
        return acc

    ref = np.asarray(ref_fn(xq, wq, q["s"]))
    err = np.abs(out - ref).max()
    rel = err / (np.abs(ref).max() + 1e-9)
    print(f"M={m:4d} K={k:5d} N={n:5d} G={groups:2d}: max rel err {rel:.2e}",
          flush=True)
    assert err == 0.0, (m, k, n, rel)


def main():
    # Gemma mixture shapes (prefill S=276 / decode S=4) and Llama GEMV shapes
    for m, k, n, seed in [
        (276, 2048, 16384, 0),  # gate/up at prefill
        (276, 16384, 2048, 1),  # down at prefill
        (4, 1024, 4096, 2),     # action expert decode
        (8, 4096, 11008, 3),    # llama decode GEMV
        (8, 11008, 4096, 4),
        (1, 4096, 32064, 5),    # lm_head (padded N)
    ]:
        check(m, k, n, seed)
    print("ALL BIT-EXACT")


if __name__ == "__main__":
    main()
