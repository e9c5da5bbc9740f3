#!/usr/bin/env python3
"""LoRA / QLoRA fine-tuning for the OpenVLA family, TPU-native.

The reference CONSUMES PEFT ``lora_adapter/`` checkpoints (its eval merges
them at load, reference scripts/eval_hf_vla_simpler.py:135-179) but ships no
way to produce them — they come from GPU fine-tuning in the upstream OpenVLA
project. This CLI closes that loop on TPU: teacher-forced next-token
cross-entropy on the action_dim action tokens
(``OpenVLA.action_ce_loss``), rank-r adapters on the Llama projections
(only the factors train; optionally a w8a8/w4a8-quantized frozen base =
QLoRA), and ``--save-adapter`` exports a PEFT-format directory that drops
into the reference's GPU eval unchanged.

Data: an .npz with ``images`` [N, H, W, 3] uint8, ``instructions`` [N]
strings, ``actions`` [N, action_dim] normalized in [-1, 1] — or the
built-in synthetic set for smoke runs.

    python scripts/train_openvla_lora.py --model-id /path/to/snapshot \
        --data demos.npz --steps 500 --lora-rank 32 \
        --save-adapter out/lora_adapter
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

log = logging.getLogger("train_openvla_lora")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-id", type=str, default="random",
                   help="HF snapshot dir, or random / random-7b / "
                        "random-minivla / random-minivla-tiny.")
    p.add_argument("--data", type=str, default="synthetic",
                   help=".npz of (images, instructions, actions) or "
                        "'synthetic'.")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--warmup-steps", type=int, default=5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--lora-rank", type=int, default=32)
    p.add_argument("--lora-alpha", type=float, default=0.0,
                   help="scale numerator: s = alpha/rank (0 = alpha=rank).")
    p.add_argument("--lora-targets", type=str,
                   default="q_w,k_w,v_w,o_w,gate_w,up_w,down_w",
                   help="llama projections to adapt (the OpenVLA OFT recipe "
                        "adapts all seven).")
    p.add_argument("--quantize-base", type=str, default="none",
                   choices=["none", "w8a8", "w4a8"],
                   help="QLoRA: quantize the frozen llama base first "
                        "(int8 MXU / Pallas int4 with straight-through "
                        "gradients; 2-4x less frozen-weight HBM).")
    p.add_argument("--dtype", type=str, default="bf16",
                   choices=["fp32", "bf16"])
    p.add_argument("--max-text-tokens", type=int, default=32)
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument("--remat", action="store_true",
                   help="Rematerialize the llama layers in the backward "
                        "pass (jax.checkpoint on the layer scan): trades "
                        "~recompute FLOPs for activation HBM — the "
                        "single-chip 7B batch-size lever (see "
                        "docs/results/qlora7b_memory_v5e.csv).")
    p.add_argument("--accum-steps", type=int, default=1,
                   help="gradient accumulation via optax.MultiSteps: "
                        "factors update every k micro-batches with the "
                        "averaged gradient.")
    p.add_argument("--ema-decay", type=float, default=0.0,
                   help="track a bias-corrected EMA of the post-update "
                        "parameters inside opt_state (0 = off); "
                        "--save-adapter additionally exports the EMA "
                        "factors to <save-adapter>_ema.")
    p.add_argument("--log-every", type=int, default=5)
    p.add_argument("--save-adapter", type=str, default="",
                   help="export the trained factors as a PEFT lora_adapter/ "
                        "directory (adapter_config.json + safetensors, "
                        "reference-loadable). With --oft, the trained "
                        "action head / proprio projector also export as "
                        "action_head--N_checkpoint.pt etc. next to it.")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel chips: batches split over the 'data' "
                        "mesh axis (grad psum via GSPMD).")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel chips: llama Q/KV heads + MLP "
                        "intermediate shard over 'model' (the 7B capacity "
                        "path); LoRA factors follow the base weights' axes.")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3: weights + moments additionally shard over "
                        "'data' (needs --dp > 1).")
    p.add_argument("--save-params", type=str, default="",
                   help="Save the FINAL full parameter tree (orbax dir): "
                   "base weights incl. QLoRA quant dicts, LoRA factors, "
                   "OFT aux — serve/eval it via --checkpoint on "
                   "serve_openvla.py / eval_openloop_vla.py.")
    p.add_argument("--save-state", type=str, default="",
                   help="save the COMPLETE training state (params + "
                        "moments + step) at the end for EXACT resume.")
    p.add_argument("--save-every", type=int, default=0,
                   help="checkpoint the COMPLETE training state every N "
                        "steps into step-numbered subdirs of --save-state "
                        "(orbax CheckpointManager, ASYNC). 0 = end-of-run "
                        "only. Crash-restart by re-running with "
                        "--resume-state <same root>.")
    p.add_argument("--keep-checkpoints", type=int, default=3,
                   help="with --save-every: retain only the newest K "
                        "periodic checkpoints.")
    p.add_argument("--resume-state", type=str, default="",
                   help="resume exactly from a --save-state tree OR a "
                        "--save-every manager root (auto-detected; "
                        "resumes from the latest complete step); the data "
                        "stream fast-forwards to the saved step.")
    p.add_argument("--stop-after", type=int, default=0,
                   help="stop after this many steps (0 = run to --steps) "
                        "while keeping the --steps LR schedule.")
    p.add_argument("--oft", action="store_true",
                   help="OFT continuous-action fine-tuning: parallel "
                        "decoding + MLP-ResNet action head trained with L1 "
                        "on [chunk_len, action_dim] chunks (the recipe "
                        "behind the reference's OFT checkpoints); the head "
                        "(+ proprio projector) trains fully alongside the "
                        "LoRA factors.")
    p.add_argument("--chunk-len", type=int, default=8,
                   help="OFT action-chunk length.")
    p.add_argument("--use-proprio", action="store_true",
                   help="OFT: condition on proprio via the projector "
                        "(data needs a 'proprios' [N, proprio_dim] key).")
    p.add_argument("--proprio-dim", type=int, default=8)
    return p.parse_args()


def synthetic_examples(n, image_hw, action_shape, seed, proprio_dim=0):
    rng = np.random.RandomState(seed)
    phrases = ["pick up the carrot", "put the spoon on the towel",
               "move the cup near the plate", "stack the green block"]
    out = {
        "images": rng.randint(0, 256, (n, image_hw, image_hw, 3), np.uint8),
        "instructions": np.array([phrases[i % len(phrases)] for i in range(n)]),
        "actions": np.clip(rng.randn(n, *action_shape) * 0.4, -1, 1).astype(
            np.float32
        ),
    }
    if proprio_dim:
        out["proprios"] = rng.randn(n, proprio_dim).astype(np.float32)
    return out


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s | %(message)s")
    import jax
    import jax.numpy as jnp
    import optax

    from blurr_tpu.models.openvla.model import EMPTY_TOKEN
    from blurr_tpu.models.openvla.processing import (
        OpenVLAProcessor,
        process_image,
        tokenize_prompt_ids,
    )
    from blurr_tpu.ops.lora import (
        inject_lora_tree,
        lora_trainable_mask,
        save_peft_adapter,
    )
    from blurr_tpu.utils.optim import masked_freeze

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    # shared model-id resolution (models/openvla/build.py, also the server
    # and open-loop evaluator): snapshot dir or RANDOM_SPECS id, OFT aux
    # load-or-init (continued fine-tuning vs from-scratch head), and the
    # base-quantization for QLoRA — the LoRA factors inject on top below
    from blurr_tpu.models.openvla.build import build_openvla

    try:
        built = build_openvla(
            args.model_id, dtype=dtype, oft=args.oft,
            chunk_len=args.chunk_len, use_proprio=args.use_proprio,
            proprio_dim=args.proprio_dim,
            quantization=args.quantize_base,
        )
    except ValueError as exc:
        sys.exit(str(exc))
    model, params, spec = built.model, built.params, built.spec
    tokenizer = built.tokenizer

    targets = tuple(t.strip() for t in args.lora_targets.split(",") if t.strip())
    llama = dict(params["llama"])
    llama["layers"] = inject_lora_tree(
        llama["layers"], jax.random.PRNGKey(args.seed + 7), args.lora_rank,
        targets, args.lora_alpha or None, dtype=dtype,
    )
    params = dict(params)
    params["llama"] = llama
    mask = lora_trainable_mask(params)
    if args.oft:
        # the OFT aux modules train FULLY alongside the LoRA factors (the
        # upstream OFT recipe: fresh head, adapted backbone)
        mask = dict(mask)
        mask["action_head"] = jax.tree.map(
            lambda _: True, params["action_head"]
        )
        if args.use_proprio:
            mask["proprio_projector"] = jax.tree.map(
                lambda _: True, params["proprio_projector"]
            )
    n_train = sum(
        int(np.prod(p.shape))
        for p, m in zip(jax.tree.leaves(params), jax.tree.leaves(mask)) if m
    )
    n_total = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    log.info("Trainable LoRA parameters: %s of %s (%.3f%%)",
             f"{n_train:,}", f"{n_total:,}", 100.0 * n_train / n_total)

    # schedule budgeted in OPTIMIZER-UPDATE units: with --accum-steps k the
    # inner tx advances every k-th micro-batch (same rationale as
    # train_pi0_flow.py)
    k = max(args.accum_steps, 1)
    total = max(-(-args.steps // k), 2)  # ceil
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=args.lr * 0.01, peak_value=args.lr,
        warmup_steps=min(-(-args.warmup_steps // k), total - 1),
        decay_steps=total, end_value=args.lr * 0.01,
    )
    inner = optax.adamw(schedule)
    if args.grad_clip > 0:
        inner = optax.chain(optax.clip_by_global_norm(args.grad_clip), inner)
    tx = masked_freeze(inner, mask)
    if args.ema_decay > 0:
        from blurr_tpu.utils.optim import params_ema

        # AFTER the freeze so the EMA tracks the actual post-update weights
        tx = optax.chain(tx, params_ema(args.ema_decay, mask=mask))
    if args.accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=args.accum_steps)

    mesh = bsh = None
    if args.fsdp and args.dp <= 1:
        sys.exit("--fsdp shards over the 'data' axis; it needs --dp > 1")
    if args.dp * args.tp > 1:
        from blurr_tpu.parallel.mesh import (
            batch_sharding,
            make_mesh,
            shard_params,
        )

        if args.quantize_base == "w4a8" and args.tp > 1:
            sys.exit("--tp with w4a8: the block-major int4 packing does not "
                     "TP-shard; use w8a8 or tp=1")
        mesh = make_mesh(data=args.dp, model=args.tp)
        params = shard_params(params, mesh, fsdp=args.fsdp)
        bsh = batch_sharding(mesh)
    # init AFTER sharding: the moments inherit the params' NamedShardings
    opt_state = tx.init(params)

    if args.oft:
        def loss_fn(p, ids, valid, px, actions, proprio):
            return model.oft_l1_loss(
                p, ids, px, actions, proprio, attn_valid=valid,
                remat=args.remat,
            )
    else:
        def loss_fn(p, ids, valid, px, labels):
            return model.action_ce_loss(p, ids, valid, px, labels,
                                        remat=args.remat)

    from blurr_tpu.utils.optim import value_and_grad_frozen_int

    @jax.jit
    def step(p, o, *batch):
        loss, grads = value_and_grad_frozen_int(loss_fn)(p, *batch)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    # ------------------------------------------------------------------
    # data: tokenize prompts once per instruction, append the ground-truth
    # action tokens right after each prompt (contiguous; pad at the end)
    processor = OpenVLAProcessor(
        tokenizer, image_size=spec.siglip.image_size,
        fused=spec.use_fused_vision,
    )
    from blurr_tpu.data import is_sharded_dataset

    loader = None
    data = None
    if args.data != "synthetic" and is_sharded_dataset(args.data):
        # streaming path: mmap shards + O(1)-resumable shuffled loader +
        # background prefetch (blurr_tpu.data); rows assemble into device
        # batches in the prefetch thread (OpenVLATrainTransform)
        from blurr_tpu.data import ShardedBatchLoader, ShardedDataset
        from blurr_tpu.models.openvla.data import OpenVLATrainTransform

        ds = ShardedDataset(args.data)
        n_examples = ds.num_examples
        a_shape = tuple(ds.keys["action"]["shape"])
        want = ((args.chunk_len, spec.action_dim) if args.oft
                else (spec.action_dim,))
        if a_shape != want:
            sys.exit(f"dataset action shape {a_shape} != expected {want} "
                     f"(--oft={args.oft}, --chunk-len={args.chunk_len})")
        if args.use_proprio and "proprio" not in ds.keys:
            sys.exit("--use-proprio needs a 'proprio' key in the dataset")
        loader = ShardedBatchLoader(
            ds, args.batch_size, seed=args.seed, prefetch=2,
            transform=OpenVLATrainTransform(
                model, spec.siglip.image_size, spec.use_fused_vision,
                oft=args.oft, use_proprio=args.use_proprio,
            ),
        )
        log.info("Sharded dataset %s: %d examples, %d batches/epoch",
                 args.data, n_examples, loader.batches_per_epoch)
    elif args.data == "synthetic":
        shape = ((args.chunk_len, spec.action_dim) if args.oft
                 else (spec.action_dim,))
        data = synthetic_examples(
            64, spec.siglip.image_size, shape, args.seed,
            proprio_dim=args.proprio_dim if args.use_proprio else 0,
        )
    else:
        data = dict(np.load(args.data, allow_pickle=True))
    if data is not None:
        n_examples = data["actions"].shape[0]
        if args.oft:
            want = (args.chunk_len, spec.action_dim)
            if tuple(data["actions"].shape[1:]) != want:
                sys.exit(f"--oft expects actions [N, {want[0]}, {want[1]}], "
                         f"got {data['actions'].shape}")
            if args.use_proprio and "proprios" not in data:
                sys.exit("--use-proprio needs a 'proprios' key in the data")
        log.info("Dataset: %d examples", n_examples)

    tok_cache = {}

    def prompt_ids(instruction: str):
        ids = tok_cache.get(instruction)
        if ids is None:
            ids = tokenize_prompt_ids(
                processor.tokenizer, instruction, args.max_text_tokens
            )
            tok_cache[instruction] = ids
        return ids

    rng = np.random.RandomState(args.seed)

    def batch_pixels(idx):
        return jnp.asarray(np.concatenate([
            process_image(np.asarray(data["images"][i]),
                          spec.siglip.image_size, spec.use_fused_vision)
            for i in idx
        ], 0), dtype)

    def draw_indices():
        return rng.randint(0, n_examples, args.batch_size)

    if loader is not None:
        def next_batch():
            b = loader.next_batch()
            out = (
                jnp.asarray(b["input_ids"]), jnp.asarray(b["attn_valid"]),
                jnp.asarray(b["pixel_values"], dtype),
            )
            if args.oft:
                out = out + (jnp.asarray(b["actions"], jnp.float32),
                             jnp.asarray(b["proprio"], dtype)
                             if args.use_proprio else None)
            else:
                out = out + (jnp.asarray(b["labels"]),)
            return out
    elif args.oft:
        # ragged prompts right-pad to max_text_tokens; attn_valid gives each
        # example its unpadded forward (predict_action_continuous)
        def next_batch():
            idx = draw_indices()
            ids = np.zeros((args.batch_size, args.max_text_tokens), np.int32)
            valid = np.zeros_like(ids)
            for row, i in enumerate(idx):
                p_ids = prompt_ids(str(data["instructions"][i]))
                ids[row, : len(p_ids)] = p_ids
                valid[row, : len(p_ids)] = 1
            actions = jnp.asarray(
                np.stack([data["actions"][i] for i in idx]), jnp.float32
            )
            proprio = None
            if args.use_proprio:
                proprio = jnp.asarray(
                    np.stack([data["proprios"][i] for i in idx]), dtype
                )
            return (jnp.asarray(ids), jnp.asarray(valid), batch_pixels(idx),
                    actions, proprio)
    else:
        seq_len = args.max_text_tokens + spec.action_dim
        action_tokens_all = model.tokenize_actions(data["actions"])

        def next_batch():
            idx = draw_indices()
            ids = np.zeros((args.batch_size, seq_len), np.int32)
            valid = np.zeros((args.batch_size, seq_len), np.int32)
            labels = []
            for row, i in enumerate(idx):
                p_ids = prompt_ids(str(data["instructions"][i]))
                toks = action_tokens_all[i]
                ids[row, : len(p_ids)] = p_ids
                ids[row, len(p_ids) : len(p_ids) + spec.action_dim] = toks
                valid[row, : len(p_ids) + spec.action_dim] = 1
                labels.append(toks)
            return (
                jnp.asarray(ids), jnp.asarray(valid), batch_pixels(idx),
                jnp.asarray(np.stack(labels)),
            )

    ckpt_mgr = None
    if args.save_every > 0:
        if not args.save_state:
            sys.exit("--save-every needs --save-state <manager root>")
        from blurr_tpu.models.pi0.checkpoint import TrainCheckpointManager

        ckpt_mgr = TrainCheckpointManager(
            args.save_state, keep=args.keep_checkpoints
        )

    start_step = 0
    if args.resume_state:
        from blurr_tpu.models.pi0.checkpoint import (
            TrainCheckpointManager,
            is_manager_root,
            restore_train_state,
        )

        # rng slot is unused (the data stream is a pure function of seed +
        # draws); a dummy key keeps the state-tree template shape
        if is_manager_root(args.resume_state):
            same_root = ckpt_mgr is not None and os.path.abspath(
                args.resume_state) == os.path.abspath(args.save_state)
            rmgr = ckpt_mgr if same_root else TrainCheckpointManager(
                args.resume_state, keep=args.keep_checkpoints)
            r_params, r_opt, start_step, _ = rmgr.restore(
                params, opt_state, jax.random.PRNGKey(0)
            )
            if rmgr is not ckpt_mgr:
                rmgr.close()
        else:
            r_params, r_opt, start_step, _ = restore_train_state(
                args.resume_state, params, opt_state, jax.random.PRNGKey(0)
            )
        params = jax.tree.map(
            lambda r, l: jax.device_put(r, l.sharding), r_params, params
        )
        opt_state = jax.tree.map(
            lambda r, l: jax.device_put(r, l.sharding), r_opt, opt_state
        )
        if loader is not None:
            loader.restore(start_step)  # O(1): stream = f(seed, consumed)
        else:
            for _ in range(start_step):  # O(steps) index draws, no pixels
                draw_indices()
        log.info("Resumed training state from %s at step %d",
                 args.resume_state, start_step)

    def place(batch):
        if bsh is None:
            return batch
        return tuple(
            x if x is None else jax.device_put(x, bsh) for x in batch
        )

    t0 = time.time()
    loss = float("nan")
    p, o = params, opt_state
    steps_done = start_step
    for it in range(start_step, args.steps):
        p, o, loss = step(p, o, *place(next_batch()))
        steps_done = it + 1
        if ckpt_mgr is not None and steps_done % args.save_every == 0:
            # async: blocks only for the device->host snapshot
            ckpt_mgr.save(steps_done, p, o, jax.random.PRNGKey(0))
        if args.stop_after and steps_done >= args.stop_after:
            log.info("Stopping after %d steps (--stop-after)", steps_done)
            break
        if it % args.log_every == 0 or it == args.steps - 1:
            log.info("step %d/%d loss %.5f elapsed %.1fs",
                     it, args.steps, float(loss), time.time() - t0)

    if args.save_adapter:
        n = save_peft_adapter(
            p["llama"]["layers"], args.save_adapter,
            base_model_name=str(args.model_id),
        )
        log.info("Exported %d LoRA factor pairs to %s (PEFT format)",
                 n, args.save_adapter)
        if args.ema_decay > 0:
            from blurr_tpu.utils.optim import extract_ema

            ema = extract_ema(o, p)
            save_peft_adapter(
                ema["llama"]["layers"], args.save_adapter + "_ema",
                base_model_name=str(args.model_id),
            )
            log.info("Exported EMA factors to %s_ema", args.save_adapter)
        if args.oft:
            # reference-discoverable torch checkpoints, next to lora_adapter/
            from blurr_tpu.models.openvla.checkpoint import save_oft_aux_params

            aux_dir = str(Path(args.save_adapter).parent)
            save_oft_aux_params(
                aux_dir, p["action_head"],
                p.get("proprio_projector") if args.use_proprio else None,
                step=args.steps,
            )
            log.info("Exported OFT aux checkpoints to %s", aux_dir)
    if args.save_state:
        if ckpt_mgr is not None:
            if steps_done > 0 and ckpt_mgr.latest_step() != steps_done:
                ckpt_mgr.save(steps_done, p, o, jax.random.PRNGKey(0))
            ckpt_mgr.close()
            log.info("Saved training state to %s (latest step %d)",
                     args.save_state, steps_done)
        else:
            from blurr_tpu.models.pi0.checkpoint import save_train_state

            save_train_state(args.save_state, p, o, steps_done,
                             jax.random.PRNGKey(0))
            log.info("Saved training state to %s", args.save_state)
    if args.save_params:
        # serveable full tree (base incl. quant dicts + LoRA factors + OFT
        # aux) — build_openvla(checkpoint_path=...) loads it directly into
        # the action server / open-loop evaluator, no export step
        from blurr_tpu.models.pi0.checkpoint import save_params

        save_params(p, args.save_params)
        log.info("Saved serveable params to %s", args.save_params)
    if loader is not None:
        loader.close()
    log.info("Done. final loss %.5f", float(loss))


if __name__ == "__main__":
    main()
