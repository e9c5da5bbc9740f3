#!/usr/bin/env python3
"""Flow-matching fine-tuning for Pi-0, TPU-native.

The reference keeps the flow-matching loss but ships no training pipeline
(SURVEY.md §0). This CLI closes that gap: sharded train step over a
('data','model') mesh with optax, parameter-group freezing via mask pytrees
(the reference's freeze_* semantics), checkpoint save/resume via orbax, and
the torch checkpoint bridge / PaliGemma pretrained weights as starting
points. Data comes from an .npz of (images, input_ids, attention_mask,
proprios, actions) or a built-in synthetic dataset for smoke runs.
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

log = logging.getLogger("train_pi0_flow")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, default="config/eval/bridge_tiny.yaml")
    p.add_argument("--checkpoint", type=str, default="random",
                   help=".pt checkpoint / 'random' / orbax dir via --resume.")
    p.add_argument("--pretrained-paligemma", type=str, default="",
                   help="PaliGemma safetensors dir to initialize VLM parts.")
    p.add_argument("--data", type=str, default="synthetic",
                   help="sharded-dataset dir (blurr_tpu.data manifest), "
                        ".npz path, or 'synthetic'.")
    p.add_argument("--data-prefetch", type=int, default=2,
                   help="background batches prepared ahead of the train "
                        "step (sharded-dataset mode only; 0 = synchronous).")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup-steps", type=int, default=5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument(
        "--train-scope", type=str, default="all",
        choices=["all", "action_expert", "vlm"],
        help="Parameter group to train (others frozen via mask).",
    )
    p.add_argument("--lora-rank", type=int, default=0,
                   help="LoRA fine-tuning: inject rank-r adapter factors "
                        "into the --lora-targets projections of the "
                        "--train-scope group and train ONLY those factors "
                        "(base weights frozen; ~1000x fewer trainable "
                        "params at full dims). --save-dir folds the "
                        "adapters back into plain weights (W + s*A@B), so "
                        "the checkpoint serves unchanged.")
    p.add_argument("--lora-alpha", type=float, default=0.0,
                   help="LoRA scale numerator: s = alpha/rank (0 = alpha"
                        "=rank, i.e. s=1).")
    p.add_argument("--lora-targets", type=str, default="q_w,v_w",
                   help="comma list of projection keys to adapt (any of "
                        "q_w,k_w,v_w,o_w,gate_w,up_w,down_w; siglip fc1_w/"
                        "fc2_w/out_w also match under --train-scope vlm/all).")
    p.add_argument("--lora-quantize-base", type=str, default="none",
                   choices=["none", "w8a8", "w4a8"],
                   help="QLoRA: quantize the adapted joint mixtures' linear "
                        "weights BEFORE injecting adapters — the frozen base "
                        "runs on the int8 MXU (w8a8) or the Pallas int4 "
                        "kernel (w4a8) with straight-through gradients, "
                        "cutting frozen-weight HBM 2-4x. --save-dir then "
                        "saves the adapter tree as-is (quantized bases "
                        "cannot absorb the fp delta); serve it directly — "
                        "ops.quant.mm dispatches the dicts.")
    p.add_argument(
        "--dtype", type=str, default="fp32",
        choices=["fp32", "bf16", "master-fp32"],
        help="Training numerics: fp32 (default), bf16 (params + compute in "
             "bf16 — full-dims fits one chip with --remat, see "
             "docs/results/remat_memory_v5e.csv), or master-fp32 (fp32 "
             "master weights + adamw moments, bf16 forward/backward — tiny "
             "updates below the bf16 ulp still accumulate; ~3x the bf16 "
             "param memory, pair with --fsdp at full dims).",
    )
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel devices: SigLIP patch tokens and "
                        "the 277 vlm tokens shard over a 'seq' mesh axis "
                        "(GSPMD inserts the attention K/V all-gathers); "
                        "norm/MLP work and activation HBM split 1/n per "
                        "device. Composes with --dp/--tp on a "
                        "('data','seq','model') mesh; not with --pp.")
    p.add_argument("--remat", action="store_true",
                   help="Rematerialize joint layers in the backward pass "
                        "(jax.checkpoint per scanned layer): activation HBM "
                        "O(L)->O(1) layers for ~1/3 extra FLOPs.")
    p.add_argument("--accum-steps", type=int, default=1,
                   help="Gradient accumulation via optax.MultiSteps: "
                        "parameters update every k micro-batches with the "
                        "averaged gradient (effective batch = k*batch-size).")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel stages: the stacked joint layers "
                        "split over a ('pipe',) mesh, microbatches rotating "
                        "stage-to-stage via ppermute (parallel/pipeline.py). "
                        "Composes with --dp (a ('data','pipe') mesh); "
                        "mutually exclusive with --tp/--fsdp.")
    p.add_argument("--pp-microbatches", type=int, default=0,
                   help="microbatch count for --pp (default: largest valid "
                        "divisor of the batch <= stages). Raise above the "
                        "stage count to shrink the pipeline bubble "
                        "(S-1)/(M+S-1) once the batch is large enough.")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3-style fully-sharded data parallelism: every "
                        "weight (and adamw moment) additionally shards over "
                        "the 'data' axis; GSPMD all-gathers weights per use "
                        "and reduce-scatters grads. Needs --dp > 1.")
    p.add_argument("--val-examples", type=int, default=0,
                   help="hold out the LAST k examples of the sharded "
                        "dataset as a validation split (training draws only "
                        "from the first N-k). Validation flow loss uses "
                        "FIXED per-batch (t, x0) draws so the metric is "
                        "comparable across evals.")
    p.add_argument("--val-every", type=int, default=0,
                   help="validate every M optimizer steps (0 = only at the "
                        "end). Needs --val-examples > 0.")
    p.add_argument("--grad-clip", type=float, default=0.0,
                   help="clip the TRAINABLE gradient to this global L2 norm "
                        "before adamw (0 = off). Sits inside the parameter-"
                        "group mask, so frozen groups don't dilute the norm; "
                        "with --accum-steps it clips the averaged update "
                        "gradient (MultiSteps wraps outside).")
    p.add_argument("--ema-decay", type=float, default=0.0,
                   help="track an exponential moving average of the post-"
                        "update parameters (bias-corrected; 0 = off). The "
                        "EMA rides opt_state (exact resume + shardings come "
                        "free) and is saved to <save-dir>_ema at the end — "
                        "flow policies are commonly served from EMA weights.")
    p.add_argument("--metrics-csv", type=str, default="",
                   help="append per-logged-step training metrics (step, "
                        "loss, lr, wall_s, samples_per_s) to this CSV.")
    p.add_argument("--save-dir", type=str, default="")
    p.add_argument("--resume", type=str, default="")
    p.add_argument("--save-state", type=str, default="",
                   help="also save the COMPLETE training state (params + "
                        "optimizer moments/counters + step + PRNG key) to "
                        "this path at the end, for EXACT resume via "
                        "--resume-state.")
    p.add_argument("--resume-state", type=str, default="",
                   help="resume exactly from a --save-state tree OR a "
                        "--save-every manager root (auto-detected; manager "
                        "roots resume from the latest COMPLETE step): "
                        "restores params/opt-state/step/rng and "
                        "fast-forwards the batch stream to the saved step. "
                        "The run continues to --steps with "
                        "bitwise-identical trajectory to an uninterrupted "
                        "run.")
    p.add_argument("--save-every", type=int, default=0,
                   help="checkpoint the COMPLETE training state every N "
                        "optimizer steps into step-numbered subdirs of "
                        "--save-state (orbax CheckpointManager, ASYNC — "
                        "training continues while the write drains). 0 = "
                        "only the end-of-run save. Crash-restart by "
                        "re-running with --resume-state <same root>.")
    p.add_argument("--keep-checkpoints", type=int, default=3,
                   help="with --save-every: retain only the newest K "
                        "periodic checkpoints.")
    p.add_argument("--stop-after", type=int, default=0,
                   help="stop after this many optimizer steps (0 = run to "
                        "--steps) while keeping the --steps LR schedule — "
                        "simulates an interruption for --save-state/"
                        "--resume-state.")
    p.add_argument("--multihost", action="store_true",
                   help="Join a multi-host pod slice via "
                        "jax.distributed.initialize (auto-discovery on "
                        "Cloud TPU VMs) before building the mesh.")
    p.add_argument("--log-every", type=int, default=5)
    return p.parse_args()


def synthetic_batch(cfg, bsz, rng):
    n_img = cfg["vision"]["config"]["num_image_tokens"]
    seq = cfg["max_image_text_tokens"]
    img = cfg["vision"]["config"]["image_size"]
    ids = np.zeros((bsz, seq), np.int32)
    am = np.zeros((bsz, seq), np.int32)
    ids[:, :n_img] = cfg["image_token_index"]
    ids[:, n_img : n_img + 6] = rng.randint(3, 1000, (bsz, 6))
    am[:, : n_img + 6] = 1
    return {
        "input_ids": ids,
        "attention_mask": am,
        "pixel_values": rng.rand(bsz, 3, img, img).astype(np.float32) * 2 - 1,
        "proprios": rng.randn(bsz, cfg["cond_steps"], cfg["proprio_dim"]).astype(
            np.float32
        ),
        "actions": np.clip(
            rng.randn(bsz, cfg["horizon_steps"], cfg["action_dim"]), -1, 1
        ).astype(np.float32),
    }


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s | %(message)s")
    if args.multihost:
        # must run before any other jax use (backend initialization)
        from blurr_tpu.parallel.mesh import init_multihost

        rank = init_multihost()
        import jax as _jax

        log.info("multihost: process %d of %d", rank, _jax.process_count())
    import jax
    import jax.numpy as jnp
    import optax

    from blurr_tpu.benchmarks import load_cfg
    from blurr_tpu.models.pi0.pizero import PiZero
    from blurr_tpu.models.pi0.trainable import (
        action_expert_mask,
        all_trainable_mask,
        vlm_mask,
    )
    from blurr_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params
    from blurr_tpu.utils.optim import cosine_annealing_warmup_restarts

    cfg = load_cfg(args.config)
    model = PiZero(cfg)

    rng = jax.random.PRNGKey(args.seed)
    if str(args.checkpoint).lower() in {"random", "none", ""}:
        params = model.init_params(rng, jnp.float32)
        params = model.tie_action_proprio_weights(params)
    else:
        from blurr_tpu.models.pi0.checkpoint import (
            pizero_params_from_torch_checkpoint,
        )

        params = pizero_params_from_torch_checkpoint(
            args.checkpoint, dtype=jnp.float32
        )
    if args.pretrained_paligemma:
        params = model.load_pretrained_weights(params, args.pretrained_paligemma)
    # training-canonical form: a tied proprio mixture becomes None and the
    # forward resolves it to the action weights, so autodiff SUMS both
    # mixtures' contributions into the single action leaves (torch
    # shared-Parameter semantics), adamw keeps one moment set, and buffer
    # donation below is legal. Saved/resumed checkpoints are canonical too.
    params = model.canonicalize_tied_weights(params)
    if args.resume:
        from blurr_tpu.models.pi0.checkpoint import restore_params

        params = restore_params(args.resume, like=params)
        log.info("Resumed from %s", args.resume)

    if args.lora_rank > 0:
        from blurr_tpu.ops.lora import inject_lora_tree

        targets = tuple(
            t.strip() for t in args.lora_targets.split(",") if t.strip()
        )
        lrng = jax.random.PRNGKey(args.seed + 7)
        alpha = args.lora_alpha or None
        quantize_base = None
        if args.lora_quantize_base != "none":
            from blurr_tpu.ops.quant import (
                quantize_mixture_w4a8,
                quantize_mixture_w8a8,
            )

            quantize_base = {
                "w8a8": quantize_mixture_w8a8, "w4a8": quantize_mixture_w4a8,
            }[args.lora_quantize_base]

        def inject(t, mixture=False):
            # QLoRA: the base quantizes FIRST, then the adapters wrap the
            # quant dicts (ops.quant.mm recurses); only joint mixtures
            # quantize — siglip/projector stay fp under scope vlm/all
            if mixture and quantize_base is not None:
                t = quantize_base(t)
            return inject_lora_tree(t, lrng, args.lora_rank, targets, alpha)

        # adapters go ONLY into the --train-scope group: the mask below then
        # trains exactly the injected factors, and out-of-scope mixtures pay
        # zero adapter compute
        params = dict(params)
        params["joint"] = dict(params["joint"])
        if args.train_scope == "all":
            for k in ("siglip", "projector"):
                params[k] = inject(params[k])
            for m in ("vlm", "action"):
                params["joint"][m] = inject(params["joint"][m], mixture=True)
        elif args.train_scope == "action_expert":
            params["joint"]["action"] = inject(
                params["joint"]["action"], mixture=True
            )
        else:  # vlm
            params["siglip"] = inject(params["siglip"])
            params["joint"]["vlm"] = inject(
                params["joint"]["vlm"], mixture=True
            )

    # numerics: bf16 casts the masters themselves; master-fp32 keeps fp32
    # masters (what adamw updates / the moments' dtype) and lowers only the
    # forward/backward to bf16 inside the step (compute_dtype below)
    compute_dtype = None
    if args.dtype == "bf16":
        from blurr_tpu.utils.optim import cast_floating_preserving_scales

        # NOT a blanket float cast: quant-dict scales stay fp32 (w8a8/w4a8
        # dequant precision) and lora_s scalars keep their dtype
        params = cast_floating_preserving_scales(params, jnp.bfloat16)
    elif args.dtype == "master-fp32":
        compute_dtype = jnp.bfloat16

    if args.lora_rank > 0:
        from blurr_tpu.ops.lora import lora_trainable_mask

        mask = lora_trainable_mask(params)
    else:
        mask_fn = {
            "all": all_trainable_mask,
            "action_expert": action_expert_mask,
            "vlm": vlm_mask,
        }[args.train_scope]
        mask = mask_fn(params)
    n_train = sum(
        int(np.prod(p.shape))
        for p, m in zip(jax.tree.leaves(params), jax.tree.leaves(mask)) if m
    )
    log.info("Trainable parameters: %s (%s)", f"{n_train:,}",
             f"LoRA rank {args.lora_rank}" if args.lora_rank > 0
             else args.train_scope)

    # jit-compatible schedule for the optimizer; the host-side
    # cosine_annealing_warmup_restarts (utils.optim) is used for logging.
    # The schedule inside adamw advances once per OPTIMIZER UPDATE — with
    # --accum-steps k that is every k-th micro-batch (optax.MultiSteps gates
    # the inner tx) — so warmup/decay are budgeted in update units, not
    # micro-steps, or a k=4 run would end near peak LR with the decay never
    # applied.
    k = max(args.accum_steps, 1)
    total_updates = max(-(-args.steps // k), 2)  # ceil
    warmup = min(-(-args.warmup_steps // k), max(total_updates - 1, 1))
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=args.lr * 0.01,
        peak_value=args.lr,
        warmup_steps=warmup,
        decay_steps=total_updates,
        end_value=args.lr * 0.01,
    )
    log_schedule = cosine_annealing_warmup_restarts(
        first_cycle_steps=total_updates,
        max_lr=args.lr,
        min_lr=args.lr * 0.01,
        warmup_steps=warmup,
    )
    inner = optax.adamw(schedule)
    if args.grad_clip > 0:
        # clip INSIDE the mask: the global norm is taken over the trainable
        # group only (a frozen 3B VLM would otherwise dominate the norm and
        # effectively rescale the action expert's clip threshold)
        inner = optax.chain(optax.clip_by_global_norm(args.grad_clip), inner)
    from blurr_tpu.utils.optim import masked_freeze

    # NOT bare optax.masked: that passes frozen groups' raw grads through as
    # updates (see masked_freeze) — the freeze must zero them
    tx = masked_freeze(inner, mask)
    if args.ema_decay > 0:
        from blurr_tpu.utils.optim import params_ema

        # AFTER the mask so the EMA tracks the actual post-update weights
        # (frozen groups stay pinned at their values); with --accum-steps
        # the MultiSteps wrapper below gates it to once per real update
        tx = optax.chain(tx, params_ema(args.ema_decay, mask=mask))
    if args.accum_steps > 1:
        # accumulation sits OUTSIDE the mask/adamw: k micro-grads average in
        # the accumulator, the inner tx sees one averaged update every k-th
        # call, and param/opt shardings are untouched (the accumulator tree
        # inherits the grads' shardings via GSPMD)
        tx = optax.MultiSteps(tx, every_k_schedule=args.accum_steps)

    mesh = None
    pipeline = None
    if args.fsdp and args.dp <= 1:
        sys.exit("--fsdp shards over the 'data' axis; it needs --dp > 1")
    if args.pp > 1 and (args.tp > 1 or args.sp > 1 or args.fsdp):
        sys.exit("--pp composes with --dp only; drop --tp/--sp/--fsdp")
    if args.pp > 1:
        from blurr_tpu.parallel.pipeline import (
            PipelineCtx,
            make_pipeline_mesh,
            shard_params_pipeline,
        )

        pp_mesh = make_pipeline_mesh(args.pp, data=args.dp)
        params = shard_params_pipeline(params, pp_mesh)
        pipeline = PipelineCtx(
            pp_mesh, microbatches=args.pp_microbatches or None
        )
        if args.dp > 1:
            mesh = pp_mesh  # batch_sharding splits over its 'data' axis
    elif args.dp * args.tp * args.sp > 1:
        mesh = make_mesh(data=args.dp, model=args.tp, seq=args.sp)
        params = shard_params(params, mesh, fsdp=args.fsdp)
    # init AFTER sharding: adamw mu/nu inherit the params' NamedShardings
    # (initializing first would materialize a full replicated fp32 moment
    # tree per device — ~2x model size of wasted HBM on every chip)
    opt_state = tx.init(params)

    # the shared step (beta flow-time sampling + masked optax update); the
    # driver's multichip dryrun exercises this same function on an 8-device
    # virtual mesh (blurr_tpu/parallel/train.py:dryrun_multichip)
    from blurr_tpu.parallel.train import make_optax_train_step

    # donate=True: params/opt_state update in place — peak HBM drops by a
    # full params+moments copy (legal on the canonical tree: no aliases)
    train_step = make_optax_train_step(
        model, tx, remat=args.remat, donate=True, pipeline=pipeline,
        sp_axis="seq" if args.sp > 1 else None,
        compute_dtype=compute_dtype,
    )

    nrng = np.random.RandomState(args.seed)
    data = None
    loader = None
    from blurr_tpu.data import is_sharded_dataset

    if is_sharded_dataset(args.data):
        from blurr_tpu.data import (
            ShardedBatchLoader,
            ShardedDataset,
            transform_for_config,
        )

        ds = ShardedDataset(args.data)
        # raw robot keys get the deployment-exact preprocessing; model-ready
        # datasets pass through untouched
        transform = None
        if any(k in ds.keys for k in ("image", "proprio", "action")):
            transform = transform_for_config(
                cfg, dataset_statistics=ds.statistics
            )
        train_hi = ds.num_examples
        if args.val_examples > 0:
            if ds.num_examples - args.val_examples < args.batch_size:
                sys.exit(
                    f"--val-examples {args.val_examples} leaves fewer than "
                    f"one training batch of {args.batch_size}"
                )
            train_hi = ds.num_examples - args.val_examples
        loader = ShardedBatchLoader(
            ds, args.batch_size, seed=args.seed,
            transform=transform, prefetch=max(args.data_prefetch, 0),
            example_range=(0, train_hi),
        )
        log.info(
            "Sharded dataset %s: %d examples (%d train / %d val), "
            "%d batches/epoch%s",
            args.data, ds.num_examples, train_hi,
            ds.num_examples - train_hi, loader.batches_per_epoch,
            " (raw keys -> Pi0TrainTransform)" if transform else "",
        )
    elif args.data != "synthetic":
        data = dict(np.load(args.data))
        n = data["actions"].shape[0]
        log.info("Loaded %d examples from %s", n, args.data)

    def next_batch():
        if loader is not None:
            return loader.next_batch()
        if data is None:
            return synthetic_batch(cfg, args.batch_size, nrng)
        idx = nrng.randint(0, data["actions"].shape[0], args.batch_size)
        return {k: v[idx] for k, v in data.items()}

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

        if is_manager_root(args.resume_state):
            # crash-restart path: --resume-state is usually the SAME root
            # as --save-state — reuse the live manager (two managers on
            # one root would race its retention/metadata)
            same_root = ckpt_mgr is not None and os.path.abspath(
                args.resume_state) == os.path.abspath(args.save_state)
            rmgr = ckpt_mgr if same_root else TrainCheckpointManager(
                args.resume_state, keep=args.keep_checkpoints)
            r_params, r_opt, start_step, rng = rmgr.restore(
                params, opt_state, rng
            )
            if rmgr is not ckpt_mgr:
                rmgr.close()
        else:
            r_params, r_opt, start_step, rng = restore_train_state(
                args.resume_state, params, opt_state, rng
            )
        # restore to the CURRENT run's placement (FSDP/TP/pipe shardings are
        # not serialized; the pre-restore trees carry them)
        params = jax.tree.map(
            lambda r, l: jax.device_put(r, l.sharding), r_params, params
        )
        opt_state = jax.tree.map(
            lambda r, l: jax.device_put(r, l.sharding), r_opt, opt_state
        )
        if loader is not None:
            # the loader's stream is a pure function of (seed, consumed):
            # jump straight to the saved step, no replay
            loader.restore(start_step)
        else:
            for _ in range(start_step):  # resync the batch stream exactly
                next_batch()
        log.info("Resumed training state from %s at step %d",
                 args.resume_state, start_step)

    if args.val_examples > 0 and loader is None:
        sys.exit("--val-examples needs a sharded dataset (--data <dir>)")

    run_validation = None
    if args.val_examples > 0:
        from blurr_tpu.data import ShardedBatchLoader as _Loader

        val_bs = min(args.batch_size, args.val_examples)
        val_loader = _Loader(
            ds, val_bs, seed=args.seed, shuffle=False, transform=transform,
            example_range=(train_hi, ds.num_examples),
        )
        # materialize the (small) fixed split once; fixed per-batch (t, x0)
        # draws make the metric comparable across evals — a resampled flow
        # time would move the loss more than the weights do
        val_batches = [
            val_loader.next_batch()
            for _ in range(val_loader.batches_per_epoch)
        ]
        vrng = np.random.RandomState(args.seed + 999)
        val_fixed = [
            (
                jnp.asarray(vrng.beta(1.5, 1.0, b["actions"].shape[0]),
                            jnp.float32),
                jnp.asarray(vrng.randn(*b["actions"].shape), jnp.float32),
            )
            for b in val_batches
        ]
        val_loss_fn = jax.jit(model.flow_loss)

        def run_validation(p):
            # validate in the TRAINING compute dtype: master-fp32 casts the
            # masters down (matches what the train step optimizes), and the
            # float batch leaves follow the weights' dtype — an fp32 batch
            # against bf16 weights flips the joint layer-scan carry dtype
            # and fails to trace (see parallel/train.py).
            if compute_dtype is not None:
                p = jax.tree.map(
                    lambda a: a.astype(compute_dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a, p)
            vdt = next(
                a.dtype for a in jax.tree.leaves(p)
                if jnp.issubdtype(a.dtype, jnp.inexact)
            )

            def fcast(x):
                x = jnp.asarray(x)
                return x.astype(vdt) if jnp.issubdtype(
                    x.dtype, jnp.floating) else x

            tot = 0.0
            for b, (t_f, x0_f) in zip(val_batches, val_fixed):
                tot += float(val_loss_fn(
                    p,
                    jnp.asarray(b["input_ids"]),
                    jnp.asarray(b["attention_mask"]),
                    fcast(b["pixel_values"]),
                    fcast(b["proprios"]),
                    fcast(b["actions"]),
                    t_f, x0_f,
                ))
            return tot / len(val_batches)

        log.info(
            "Validation split: %d examples (%d batches of %d)",
            args.val_examples, len(val_batches), val_bs,
        )

    bsh = batch_sharding(mesh) if mesh else None
    feed = None
    if loader is not None and args.data_prefetch > 0:
        # keep 2 batches already transferred: host gather/transform (loader
        # thread) AND the host->device copy both hide behind device compute
        from blurr_tpu.data import device_prefetch

        feed = device_prefetch(loader, depth=2, sharding=bsh)
    t0 = time.time()
    loss = float("nan")
    steps_done = start_step
    # the mesh context lets the step's bare-PartitionSpec sharding
    # constraints (sequence parallelism) resolve at trace time
    import contextlib

    mesh_ctx = mesh if mesh is not None else contextlib.nullcontext()
    for step in range(start_step, args.steps):
        if feed is not None:
            batch = next(feed)
        else:
            batch = next_batch()
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if bsh is not None:
                batch = {k: jax.device_put(v, bsh) for k, v in batch.items()}
        rng, sub = jax.random.split(rng)
        with mesh_ctx:
            params, opt_state, loss = train_step(params, opt_state, batch, sub)
        steps_done = step + 1
        if ckpt_mgr is not None and steps_done % args.save_every == 0:
            # async: blocks only for the device->host snapshot; the write
            # drains in the background while the next step runs (donation
            # of these buffers is safe once save() returns)
            ckpt_mgr.save(steps_done, params, opt_state, rng)
        val = None
        if (run_validation is not None and args.val_every > 0
                and steps_done % args.val_every == 0):
            val = run_validation(params)
            log.info("step %d validation loss %.5f", step, val)
        if args.stop_after and steps_done >= args.stop_after:
            log.info("Stopping after %d steps (--stop-after)", steps_done)
            break
        if step % args.log_every == 0 or step == args.steps - 1:
            # the applied LR is the schedule at the optimizer-update count
            # (step // k), not the micro-step index
            elapsed = time.time() - t0
            log.info(
                "step %d/%d loss %.5f lr %.2e elapsed %.1fs",
                step, args.steps, float(loss), log_schedule(step // k),
                elapsed,
            )
            if args.metrics_csv:
                import csv as _csv

                path = Path(args.metrics_csv)
                path.parent.mkdir(parents=True, exist_ok=True)
                new = not path.exists()
                with path.open("a", newline="") as f:
                    w = _csv.writer(f)
                    if new:
                        w.writerow(
                            ["step", "loss", "lr", "wall_s",
                             "samples_per_s", "val_loss"]
                        )
                    done = step - start_step + 1
                    w.writerow([
                        step, f"{float(loss):.6f}",
                        f"{log_schedule(step // k):.3e}",
                        f"{elapsed:.2f}",
                        f"{done * args.batch_size / max(elapsed, 1e-9):.2f}",
                        "" if val is None else f"{val:.6f}",
                    ])

    if run_validation is not None:
        log.info("Final validation loss %.5f", run_validation(params))
    if loader is not None:
        loader.close()
    if args.save_dir:
        from blurr_tpu.models.pi0.checkpoint import save_params

        finalize = (lambda p: p)
        if args.lora_rank > 0 and args.lora_quantize_base == "none":
            # fold adapters into plain weights: the checkpoint keeps the
            # standard layout and serves with zero adapter overhead
            from blurr_tpu.ops.lora import merge_lora_tree

            finalize = merge_lora_tree
        elif args.lora_rank > 0:
            # a quantized base cannot absorb the fp delta: the checkpoint
            # keeps the adapter dicts; inference serves them via mm dispatch
            log.info("QLoRA: saving the adapter tree unmerged")
        save_params(finalize(params), args.save_dir)
        log.info("Saved params to %s", args.save_dir)
        if args.ema_decay > 0:
            from blurr_tpu.utils.optim import extract_ema

            save_params(finalize(extract_ema(opt_state, params)),
                        args.save_dir + "_ema")
            log.info("Saved EMA params to %s_ema", args.save_dir)
    if args.save_state:
        if ckpt_mgr is not None:
            # make sure the FINAL state is persisted even off the
            # --save-every grid, then drain in-flight async writes
            if steps_done > 0 and ckpt_mgr.latest_step() != steps_done:
                ckpt_mgr.save(steps_done, params, opt_state, rng)
            ckpt_mgr.close()
            log.info("Saved training state to %s (latest step %d)",
                     args.save_state, steps_done)
        else:
            from blurr_tpu.models.pi0.checkpoint import save_train_state

            save_train_state(
                args.save_state, params, opt_state, steps_done, rng
            )
            log.info("Saved training state to %s", args.save_state)
    log.info("Done. final loss %.5f", float(loss))


if __name__ == "__main__":
    main()
