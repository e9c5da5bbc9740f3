"""Per-stage latency budget for the Pi-0 BLURR headline preset (v5e, batch 1).

Attributes the ~12 ms control step to its stages — SigLIP tower, embed
merge + projector, two-mixture prefill, flow decode — and compares each
against its weight-bandwidth floor (v5e HBM ~819 GB/s), so every remaining
millisecond is either harvested or shown irreducible.

Also measures the candidate harvest: prefill with the Pallas flash-attention
kernel (attn_impl="pallas") vs the XLA path at the production S=277 shape.

ONE process, full bridge.yaml dims, bf16, fake (iota) weights — every timing
uses the fetch-fenced two-point scheme. Writes docs/results/stage_budget_v5e.md.
"""

import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

from blurr_tpu.config.core import load_yaml
from blurr_tpu.models.pi0 import joint as joint_lib
from blurr_tpu.models.pi0.pizero import PiZero
from blurr_tpu.models.pi0.siglip import projector_forward, siglip_forward
from blurr_tpu.ops import masks as mask_lib
from blurr_tpu.paths import config_root
from blurr_tpu.utils.monitor import timed_call
from experiments.fastinit import fake_params, tree_bytes

HBM_GBPS = 819.0  # v5e HBM bandwidth


def floor_ms(nbytes: int) -> float:
    return nbytes / (HBM_GBPS * 1e9) * 1e3


def main():
    cfg = load_yaml(config_root() / "eval" / "bridge.yaml")
    cfg["num_inference_steps"] = 1
    cfg["use_bf16"] = True
    model = PiZero(cfg)
    params = fake_params(model, jnp.bfloat16)
    params = model.tie_action_proprio_weights(params)

    rng = np.random.RandomState(0)
    bsz, seq = 1, cfg["max_image_text_tokens"]
    n_img = cfg["vision"]["config"]["num_image_tokens"]
    ids = np.zeros((bsz, seq), np.int32)
    am = np.zeros((bsz, seq), np.int32)
    ids[:, :n_img] = cfg["image_token_index"]
    ids[:, n_img : n_img + 10] = rng.randint(3, 1000, (bsz, 10))
    am[:, : n_img + 10] = 1
    img = cfg["vision"]["config"]["image_size"]
    ids, am = jnp.asarray(ids), jnp.asarray(am)
    px = jnp.asarray(rng.rand(bsz, 3, img, img) * 2 - 1, jnp.bfloat16)
    pr = jnp.asarray(rng.randn(bsz, 1, cfg["proprio_dim"]), jnp.bfloat16)
    noise = jnp.asarray(
        rng.randn(bsz, cfg["horizon_steps"], cfg["action_dim"]), jnp.bfloat16
    )

    rows = []

    def bench(name, fn, *args, nbytes=0, iters=20):
        t0 = time.time()
        t, _, _ = timed_call(jax.jit(fn), *args, warmup=3, iters=iters)
        ms = t * 1e3
        rows.append((name, ms, floor_ms(nbytes) if nbytes else None))
        print(
            f"{name:<42s} {ms:7.3f} ms"
            + (f"  (weight floor {floor_ms(nbytes):.2f} ms)" if nbytes else "")
            + f"   [compile+meas {time.time()-t0:.0f}s]",
            flush=True,
        )
        return ms

    # 1) full control step
    full_ms = bench(
        "full control step (blurr preset)",
        model.infer_action,
        params, ids, am, px, pr, noise,
        nbytes=tree_bytes(params),
    )

    # 2) SigLIP tower (256 patches, 27 layers)
    vision_cfg = model.vision_cfg
    sig_ms = bench(
        "siglip tower (27L, 256 patches)",
        lambda p, x: siglip_forward(p, x, vision_cfg),
        params["siglip"], px,
        nbytes=tree_bytes(params["siglip"]),
    )

    # 3) embed merge (siglip + projector + text embed + scatter)
    merge_ms = bench(
        "embed merge (siglip+projector+text)",
        model._embed_merge,
        params, ids, px,
        nbytes=tree_bytes(params["siglip"])
        + tree_bytes(params["projector"])
        + tree_bytes(params["embed_tokens"]),
    )

    # 4) two-mixture prefill (S=277), XLA attention
    spec = model.joint_spec
    pm = mask_lib.pi0_prefix_mask(am, seq, 1)
    vp, pp, ap = mask_lib.pi0_position_ids(bsz, seq, 1, 4)
    em = jnp.asarray(rng.randn(bsz, seq, 2048), jnp.bfloat16)
    pe = jnp.asarray(rng.randn(bsz, 1, 1024), jnp.bfloat16)
    prefill_w = {"vlm": params["joint"]["vlm"], "proprio": params["joint"]["proprio"]}

    def run_prefill(sp):
        return lambda w, em, pe: joint_lib.prefill(
            w, sp, {"vlm": em, "proprio": pe}, {"vlm": vp, "proprio": pp}, pm
        )

    prefill_ms = bench(
        "prefill xla attn (18L, S=277)",
        run_prefill(spec),
        prefill_w, em, pe,
        nbytes=tree_bytes(prefill_w),
    )

    # 5) prefill with the Pallas flash kernel (candidate harvest)
    spec_flash = dataclasses.replace(spec, attn_impl="pallas")
    prefill_flash_ms = bench(
        "prefill pallas flash attn",
        run_prefill(spec_flash),
        prefill_w, em, pe,
        nbytes=tree_bytes(prefill_w),
    )

    # 6) decode (1 flow step: action expert over cached prefix)
    cache = jax.jit(run_prefill(spec))(prefill_w, em, pe)
    amask = mask_lib.pi0_action_mask(am, seq, 1, 4)
    ae = jnp.asarray(rng.randn(bsz, 4, 1024), jnp.bfloat16)
    action_w = {"action": params["joint"]["action"]}
    decode_ms = bench(
        "decode (1 flow step, 4 action tokens)",
        lambda w, ae, cache: joint_lib.decode(
            w, spec, ae, ap, cache, amask
        ),
        action_w, ae, cache,
        nbytes=tree_bytes(action_w),
    )

    # 7) residual: host-side of the flow step (encoders, decoder, masks) =
    #    full - (merge + prefill + decode)
    accounted = merge_ms + prefill_ms + decode_ms
    print(f"\naccounted (merge+prefill+decode): {accounted:.2f} ms "
          f"vs full {full_ms:.2f} ms -> residual {full_ms-accounted:.2f} ms")

    # write the raw table to a scratch file; the curated analysis doc
    # (stage_budget_v5e.md) is maintained by hand on top of these numbers
    out = Path(__file__).resolve().parents[1] / "docs/results/stage_budget_v5e_raw.md"
    with open(out, "w") as f:
        f.write(
            "# Pi-0 BLURR-preset stage budget (v5e, batch 1, bf16, 1 flow step)\n\n"
            "Measured with `experiments/stage_budget.py` (fetch-fenced two-point\n"
            "timing, fake-iota weights — MXU latency is value-independent).\n"
            "Floors are weight-read bytes / 819 GB/s (v5e HBM): a stage at its\n"
            "floor is weight-bandwidth-bound and irreducible without changing\n"
            "the preset's dtype/placement semantics.\n\n"
            "| Stage | Measured (ms) | Weight floor (ms) |\n|---|---|---|\n"
        )
        for name, ms, fl in rows:
            f.write(f"| {name} | {ms:.3f} | {'' if fl is None else f'{fl:.2f}'} |\n")
        f.write(
            f"\nAccounted (merge+prefill+decode): {accounted:.2f} ms of "
            f"{full_ms:.2f} ms full step; residual {full_ms-accounted:.2f} ms "
            "(action/proprio/time encoders, action decoder, mask build, clip).\n"
        )
        f.write(
            f"\nPallas-flash prefill vs XLA: {prefill_flash_ms:.3f} vs "
            f"{prefill_ms:.3f} ms.\n"
        )
        f.write(
            f"\nSigLIP alone: {sig_ms:.3f} ms; embed merge total {merge_ms:.3f} ms.\n"
        )
    print("wrote", out)


if __name__ == "__main__":
    main()
