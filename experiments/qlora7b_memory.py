"""Does QLoRA fine-tuning of OpenVLA-7B fit ONE 16 GB v5e chip?

The capacity headline for scripts/train_openvla_lora.py --quantize-base
w8a8: the frozen llama base lives as int8 (~6.5 GB vs 13.5 GB bf16), only
the rank-r factors carry adamw moments, and the straight-through VJPs
(ops/quant.py) route the backward through a dequantized matmul.

Two measurements:
1. AOT compiled-HBM of the full train step from abstract shapes (free —
   nothing materializes), swept over batch sizes, with/without donation.
2. Real step time at the largest fitting batch (random int8-init weights
   via init_llama_params_w8a8 — never materializes the bf16 tree).

Writes docs/results/qlora7b_memory_v5e.csv. Run on the v5e.
"""

from __future__ import annotations

import csv
import gc
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp
import optax

from blurr_tpu.models.openvla import llama as llama_lib
from blurr_tpu.models.openvla.model import OpenVLA, OpenVLASpec
from blurr_tpu.models.openvla.vit import init_vit_params
from blurr_tpu.ops.lora import inject_lora_tree, lora_trainable_mask
from blurr_tpu.utils.monitor import compiled_hbm_gb, timed_call
from blurr_tpu.utils.optim import masked_freeze

OUT_CSV = (Path(__file__).resolve().parents[1] / "docs" / "results"
           / "qlora7b_memory_v5e.csv")
RANK = 32
SEQ = 32  # prompt ids incl. trailing empty + 7 action tokens fit well inside
TARGETS = ("q_w", "k_w", "v_w", "o_w", "gate_w", "up_w", "down_w")


def param_shapes(spec: OpenVLASpec, dtype=jnp.bfloat16):
    """Abstract QLoRA param tree: w8a8 llama + bf16 vision + fp32 factors."""
    model = OpenVLA(spec)

    def shaped(tree):
        return jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), tree
        )

    # eval_shape the constructors — nothing materializes
    vis = jax.eval_shape(
        lambda k: OpenVLA(spec).init_params(k, dtype), jax.random.PRNGKey(0)
    )
    llama_q = jax.eval_shape(
        lambda k: llama_lib.quantize_llama_w8a8(
            llama_lib.init_llama_params(k, spec.llama, dtype)
        ),
        jax.random.PRNGKey(0),
    )
    llama_q = dict(llama_q)
    llama_q["layers"] = jax.eval_shape(
        lambda k, t: inject_lora_tree(t, k, RANK, TARGETS, dtype=jnp.float32),
        jax.random.PRNGKey(1), llama_q["layers"],
    )
    tree = {k: v for k, v in vis.items() if k != "llama"}
    tree["llama"] = llama_q
    return model, shaped(tree)


def batch_shapes(spec, bsz, dtype=jnp.bfloat16):
    f = jax.ShapeDtypeStruct
    img = spec.siglip.image_size
    return (
        f((bsz, SEQ), jnp.int32),          # ids (prompt + action tokens)
        f((bsz, SEQ), jnp.int32),          # validity
        f((bsz, 6, img, img), dtype),      # fused DINO+SigLIP pixels
        f((bsz, spec.action_dim), jnp.int32),  # labels
    )


def make_step(model, tx, remat: bool = False):
    def loss_fn(p, ids, valid, px, labels):
        return model.action_ce_loss(p, ids, valid, px, labels, remat=remat)

    from blurr_tpu.utils.optim import value_and_grad_frozen_int

    def step(p, o, ids, valid, px, labels):
        loss, grads = value_and_grad_frozen_int(loss_fn)(
            p, ids, valid, px, labels
        )
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    return step


def main():
    # --tiny: CPU smoke of the whole flow at toy dims (no 16 GB claim)
    spec = (OpenVLASpec.tiny() if "--tiny" in sys.argv[1:]
            else OpenVLASpec())  # full 7B dims otherwise
    model, shapes = param_shapes(spec)
    mask = lora_trainable_mask(shapes)
    tx = masked_freeze(optax.adamw(1e-4), mask)
    opt_shapes = jax.eval_shape(tx.init, shapes)
    n_factors = sum(
        int(np.prod(s.shape))
        for s, m in zip(jax.tree.leaves(shapes), jax.tree.leaves(mask)) if m
    )
    print(f"rank-{RANK} factors: {n_factors/1e6:.1f} M trainable", flush=True)

    import re

    def classify(exc) -> str:
        """Round-3 left batch>=4 failures as truncated 'HTTP 500' strings;
        pull the compiler's own OOM accounting out of the message so the
        CSV records the fit boundary as a RESULT, not a mystery."""
        msg = str(exc)
        m = re.search(r"Ran out of memory.*?Used ([0-9.]+[GM]) of "
                      r"([0-9.]+[GM])", msg, re.S)
        if m:
            return f"compile OOM: {m.group(1)} of {m.group(2)}"
        return ("compile failed (non-OOM): " + msg.replace("\n", " "))[:100]

    rows = []
    for bsz in (1, 2, 4, 8, 16):
        for donate, remat in ((False, False), (True, False), (True, True)):
            step = make_step(model, tx, remat=remat)
            jitted = jax.jit(step, donate_argnums=(0, 1) if donate else ())
            row = None
            for attempt in range(2):  # one retry: OOM repeats, flakes don't
                try:
                    compiled = jitted.lower(
                        shapes, opt_shapes, *batch_shapes(spec, bsz)
                    ).compile()
                    hbm = compiled_hbm_gb(compiled)
                    row = {"batch": bsz, "donate": donate, "remat": remat,
                           "peak_hbm_gb": round(hbm.get("peak_gb", -1), 2),
                           "fits_16gb": hbm.get("peak_gb", 99) < 15.7}
                    break
                except Exception as exc:  # noqa: BLE001 — OOMs are data
                    note = classify(exc)
                    row = {"batch": bsz, "donate": donate, "remat": remat,
                           "peak_hbm_gb": note, "fits_16gb": False}
                    if "OOM" in note:
                        break  # deterministic; no point retrying
                    if attempt == 0:
                        print(f"  attempt {attempt}: {note} (retrying)",
                              flush=True)
            print(row, flush=True)
            rows.append(row)

    out_csv = OUT_CSV
    if "--tiny" in sys.argv[1:]:  # the smoke must not overwrite v5e numbers
        out_csv = Path("/tmp/qlora7b_memory_smoke.csv")
    out_csv.parent.mkdir(parents=True, exist_ok=True)
    with out_csv.open("w", newline="") as f:
        w = csv.DictWriter(
            f, fieldnames=["batch", "donate", "remat", "peak_hbm_gb", "fits_16gb",
                           "step_ms"]
        )
        w.writeheader()
        for r in rows:
            w.writerow(r)
    print(f"wrote {out_csv}", flush=True)

    # real step time for EVERY fitting donated configuration (round-4
    # verdict Next #5: the remat samples/s curve must be measured, not
    # interpolated between two endpoints). One subprocess per config: the
    # axon runtime holds each loaded executable's temp arena, so timing 7
    # distinct programs in one process walks into the cumulative-arena OOM
    # the serving sweep documented.
    fitting = [r for r in rows if r["donate"] and r["fits_16gb"] is True]
    if not fitting:
        print("no fitting configuration; skipping timing", flush=True)
        return
    import subprocess

    to_time = sorted({(r["batch"], r["remat"]) for r in fitting})
    for bsz, remat in to_time:
        cmd = [sys.executable, str(Path(__file__).resolve()), "--time-one",
               str(bsz), str(int(remat))]
        if "--tiny" in sys.argv[1:]:
            cmd.append("--tiny")
        res = subprocess.run(cmd, capture_output=True, text=True)
        ms = None
        for line in res.stdout.splitlines():
            if line.startswith("STEP_MS "):
                ms = float(line.split()[3])
        if ms is None:
            print(f"timing batch={bsz} remat={remat} FAILED "
                  f"(rc={res.returncode}): {res.stdout[-200:]} "
                  f"{res.stderr[-200:]}", flush=True)
            continue
        print(f"QLoRA 7B train step, batch {bsz} remat={remat}: {ms:.1f} ms "
              f"({bsz / (ms / 1000):.2f} samples/s)", flush=True)
        for r in rows:
            if r["batch"] == bsz and r["donate"] and r["remat"] == remat:
                r["step_ms"] = round(ms, 1)
    with out_csv.open("w", newline="") as f:
        w = csv.DictWriter(
            f, fieldnames=["batch", "donate", "remat", "peak_hbm_gb",
                           "fits_16gb", "step_ms"]
        )
        w.writeheader()
        for r in rows:
            w.writerow(r)
    print(f"wrote {out_csv} (timed {len(to_time)} configs)", flush=True)


def time_one(bsz: int, remat: bool):
    """Subprocess entry: materialize the int8-init 7B QLoRA state, time one
    donated train step config, print 'STEP_MS <batch> <remat> <ms>'."""
    spec = (OpenVLASpec.tiny() if "--tiny" in sys.argv[1:]
            else OpenVLASpec())
    model, shapes = param_shapes(spec)
    mask = lora_trainable_mask(shapes)
    tx = masked_freeze(optax.adamw(1e-4), mask)
    print(f"materializing int8-init 7B for timing at batch={bsz} "
          f"remat={remat}...", flush=True)
    k = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    ldim = spec.llama.hidden_size

    def dense(key, fan_in, shape):
        return jax.random.normal(key, shape, dtype) * (fan_in**-0.5)

    keys = iter(jax.random.split(k, 8))
    # vision towers + projector only — init_params would also materialize
    # the 13.5 GB bf16 llama, which is exactly what the int8 init avoids
    params = {
        "siglip": init_vit_params(next(keys), spec.siglip, dtype),
        "dinov2": init_vit_params(next(keys), spec.dinov2, dtype),
        "projector": {
            "fc1_w": dense(next(keys), spec.vision_dim, (spec.vision_dim, ldim)),
            "fc1_b": jnp.zeros((ldim,), dtype),
            "fc2_w": dense(next(keys), ldim, (ldim, ldim)),
            "fc2_b": jnp.zeros((ldim,), dtype),
            "fc3_w": dense(next(keys), ldim, (ldim, ldim)),
            "fc3_b": jnp.zeros((ldim,), dtype),
        },
    }
    llama_q = dict(llama_lib.init_llama_params_w8a8(next(keys), spec.llama))
    llama_q["layers"] = inject_lora_tree(
        llama_q["layers"], jax.random.PRNGKey(1), RANK, TARGETS,
        dtype=jnp.float32,
    )
    params["llama"] = llama_q
    opt_state = tx.init(params)
    img = spec.siglip.image_size
    state = {"p": params, "o": opt_state}

    def make_batch(bsz):
        rng = np.random.RandomState(0)
        ids = np.zeros((bsz, SEQ), np.int32)
        ids[:, 0] = 1
        ids[:, 1:25] = rng.randint(3, 1000, (bsz, 24))
        valid = np.zeros((bsz, SEQ), np.int32)
        valid[:, :25 + spec.action_dim] = 1
        ids[:, 25:25 + spec.action_dim] = 31800
        return (
            jnp.asarray(ids), jnp.asarray(valid),
            jnp.asarray(rng.randn(bsz, 6, img, img), jnp.bfloat16),
            jnp.full((bsz, spec.action_dim), 31800, jnp.int32),
        )

    batch = make_batch(bsz)
    # donated step; thread the donated buffers through the holder so
    # repeated timing calls stay legal
    jitted = jax.jit(make_step(model, tx, remat=remat),
                     donate_argnums=(0, 1))

    def one():
        p, o, loss = jitted(state["p"], state["o"], *batch)
        state["p"], state["o"] = p, o
        return loss

    per_iter_s, _, _ = timed_call(one, warmup=2, iters=5)
    ms = per_iter_s * 1000
    gc.collect()
    print(f"STEP_MS {bsz} {int(remat)} {ms:.2f}", flush=True)


if __name__ == "__main__":
    if "--time-one" in sys.argv[1:]:
        i = sys.argv.index("--time-one")
        time_one(int(sys.argv[i + 1]), bool(int(sys.argv[i + 2])))
    else:
        main()
