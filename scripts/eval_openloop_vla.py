#!/usr/bin/env python3
"""Open-loop action evaluation for the OpenVLA family.

The OpenVLA-side complement of scripts/eval_openloop.py: scores a model
(base AR, OFT parallel-decoding, MiniVLA — any ``build_openvla`` model id,
bf16/w8a8/w4a8) on a recorded dataset in the trainer's own sharded format
(``blurr_tpu/models/openvla/data.py`` key convention, what
``train_openvla_lora.py --data`` consumes), using the DEPLOYMENT inference
entry points: ragged greedy AR decode (``predict_action_tokens_ragged``)
or the OFT continuous chunk (``predict_action_continuous``). The
reference's only accuracy signal for these models is closed-loop SimplerEnv
success (reference scripts/eval_hf_vla_simpler.py); open-loop error against
held-out demonstrations is the in-repo complement.

Metrics (normalized [-1, 1] action space):
- AR: action MSE/MAE, token exact-match rate (predicted vs ground-truth
  action tokens — the training objective's own accuracy), gripper
  sign-agreement.
- OFT: chunk L1 (the training loss), MSE/MAE, executed-prefix MSE
  (first ``--act-steps`` chunk rows), gripper sign-agreement.

Deterministic: greedy decode has no sampling; reruns are bit-stable.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(
        description="Open-loop action error for OpenVLA-family checkpoints."
    )
    p.add_argument("--model-id", type=str, default="random",
                   help="HF snapshot dir or a checkpoint-free id "
                   "(random / random-7b / random-minivla / ...).")
    p.add_argument("--checkpoint", type=str, default="",
                   help="Orbax params dir from train_openvla_lora "
                   "--save-params; --model-id supplies the spec.")
    p.add_argument("--data", type=str, default="synthetic",
                   help="Sharded OpenVLA dataset dir (write_openvla_dataset "
                   "keys) or 'synthetic'.")
    p.add_argument("--examples", type=int, default=64,
                   help="Evaluation window: the LAST N dataset examples.")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--quantization", type=str, default="none",
                   choices=["none", "w8a8", "w4a8"])
    p.add_argument("--dtype", type=str, default="bf16",
                   choices=["bf16", "fp32"])
    p.add_argument("--max-text-tokens", type=int, default=32)
    p.add_argument("--oft", action="store_true",
                   help="OFT continuous-chunk variant (dataset actions must "
                   "be [N, chunk_len, action_dim]).")
    p.add_argument("--chunk-len", type=int, default=8)
    p.add_argument("--use-proprio", action="store_true")
    p.add_argument("--proprio-dim", type=int, default=8)
    p.add_argument("--act-steps", type=int, default=4,
                   help="Executed-prefix rows for the OFT prefix metric.")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output-json", type=str, default="")
    return p.parse_args()


def load_examples(args, spec, tokenizer):
    """-> dict with instruction_ids [N,T], instruction_len [N], image
    [N,H,W,3] u8, action, (proprio). The LAST --examples rows."""
    from blurr_tpu.models.openvla.processing import (
        StubLlamaTokenizer,
        tokenize_prompt_ids,
    )

    if args.data != "synthetic":
        from blurr_tpu.data import ShardedDataset

        ds = ShardedDataset(args.data)
        n = min(args.examples, ds.num_examples)
        data = ds.gather_batch(
            np.arange(ds.num_examples - n, ds.num_examples))
        missing = [k for k in
                   ("image", "instruction_ids", "instruction_len", "action")
                   if k not in data]
        if missing:
            sys.exit(f"dataset is missing keys {missing}; has {sorted(data)}")
        return data

    sys.path.insert(0, str(REPO_ROOT / "scripts"))
    from train_openvla_lora import synthetic_examples

    n = args.examples
    action_shape = ((args.chunk_len, spec.action_dim) if args.oft
                    else (spec.action_dim,))
    raw = synthetic_examples(
        n, spec.siglip.image_size, action_shape, args.seed + 13,
        proprio_dim=args.proprio_dim if args.use_proprio else 0)
    tok = tokenizer or StubLlamaTokenizer()
    ids = np.zeros((n, args.max_text_tokens), np.int32)
    lens = np.zeros((n,), np.int32)
    cache = {}
    for i, instr in enumerate(raw["instructions"]):
        if instr not in cache:
            cache[instr] = tokenize_prompt_ids(tok, instr,
                                               args.max_text_tokens)
        t = cache[instr]
        ids[i, :len(t)] = t
        lens[i] = len(t)
    out = {
        "image": raw["images"],
        "instruction_ids": ids,
        "instruction_len": lens,
        "action": raw["actions"],
    }
    if args.use_proprio:
        out["proprio"] = raw["proprios"]
    return out


def main() -> None:
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from blurr_tpu.models.openvla.build import build_openvla
    from blurr_tpu.models.openvla.processing import process_image

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    try:
        built = build_openvla(
            args.model_id, dtype=dtype, oft=args.oft,
            chunk_len=args.chunk_len, use_proprio=args.use_proprio,
            proprio_dim=args.proprio_dim, quantization=args.quantization,
            memory_safe_quant_init=True,
            checkpoint_path=args.checkpoint or None,
        )
    except ValueError as exc:
        sys.exit(str(exc))
    model, params, spec = built.model, built.params, built.spec

    data = load_examples(args, spec, built.tokenizer)
    # rank/shape must match the variant BEFORE any metric math: a
    # mismatched dataset would broadcast into silently wrong numbers
    a_shape = data["action"].shape
    if args.oft:
        if len(a_shape) != 3 or a_shape[1:] != (args.chunk_len,
                                                spec.action_dim):
            sys.exit(
                f"--oft expects actions [N, {args.chunk_len}, "
                f"{spec.action_dim}] (chunk_len x action_dim); dataset has "
                f"{list(a_shape)}. Match --chunk-len to the dataset or "
                "drop --oft for a single-step (AR) dataset.")
    elif len(a_shape) != 2 or a_shape[1] != spec.action_dim:
        sys.exit(
            f"AR eval expects actions [N, {spec.action_dim}]; dataset has "
            f"{list(a_shape)}. Pass --oft for chunked datasets.")
    n = a_shape[0]
    bs = args.batch_size

    if args.oft:
        def step(params, ids, valid, px, proprio):
            return model.predict_action_continuous(
                params, ids, px,
                proprio if args.use_proprio else None,
                attn_valid=valid)
    else:
        def step(params, ids, valid, px, proprio):
            return model.predict_action_tokens_ragged(params, ids, px, valid)

    jitted = jax.jit(step)

    se = 0.0
    ae = 0.0
    se_prefix = 0.0
    grip_match = 0
    grip_total = 0
    tok_match = 0
    tok_total = 0
    count = 0          # scalar action entries
    count_prefix = 0
    k = min(args.act_steps, args.chunk_len) if args.oft else 0

    for lo in range(0, n, bs):
        hi = min(lo + bs, n)
        live = hi - lo
        rows = {kk: v[lo:hi] for kk, v in data.items()}
        if live < bs:  # pad to the fixed shape; sliced out of the metrics
            rows = {kk: np.concatenate([v] + [v[-1:]] * (bs - live))
                    for kk, v in rows.items()}
        px = np.concatenate(
            [process_image(img, spec.siglip.image_size,
                           spec.use_fused_vision)
             for img in rows["image"]], axis=0)
        t = rows["instruction_ids"].shape[1]
        valid = (np.arange(t)[None, :]
                 < rows["instruction_len"][:, None]).astype(np.int32)
        proprio = (jnp.asarray(rows["proprio"], dtype)
                   if args.use_proprio else jnp.zeros((bs, 1), dtype))
        out = np.asarray(jitted(
            params,
            jnp.asarray(rows["instruction_ids"]),
            jnp.asarray(valid),
            jnp.asarray(px, dtype),
            proprio,
        ))[:live]
        gt = np.asarray(rows["action"], np.float64)[:live]
        if args.oft:
            pred = out.astype(np.float64)          # [B, chunk, dim]
        else:
            gt_tokens = model.tokenize_actions(gt)  # training objective
            tok_match += int((out == gt_tokens).sum())
            tok_total += out.size
            pred = model.detokenize_actions(out).astype(np.float64)
        err = pred - gt
        se += float((err ** 2).sum())
        ae += float(np.abs(err).sum())
        if args.oft:
            se_prefix += float((err[:, :k] ** 2).sum())
            count_prefix += live * k * gt.shape[-1]
        grip_match += int(
            (np.sign(pred[..., -1]) == np.sign(gt[..., -1])).sum())
        grip_total += int(np.prod(gt[..., -1].shape))
        count += int(np.prod(gt.shape))

    metrics = {
        "examples": n,
        "variant": "oft" if args.oft else "ar",
        "mse": se / count,
        "mae": ae / count,
        "gripper_agreement": grip_match / grip_total,
        "model_id": args.model_id,
        "checkpoint": args.checkpoint,
        "quantization": args.quantization,
        "seed": args.seed,
    }
    if args.oft:
        # mean |err| over the chunk == the OFT training loss normalization
        # (oft_l1_loss reduces the same way); alias, not a second sum
        metrics["l1"] = metrics["mae"]
        metrics["mse_prefix"] = se_prefix / count_prefix
        metrics["act_steps"] = k
    else:
        metrics["token_accuracy"] = tok_match / tok_total

    print(f"Open-loop VLA eval ({metrics['variant']}): {n} examples")
    print(f"  action MSE:          {metrics['mse']:.6f}")
    print(f"  action MAE:          {metrics['mae']:.6f}")
    if args.oft:
        print(f"  chunk L1:            {metrics['l1']:.6f}")
        print(f"  prefix MSE:          {metrics['mse_prefix']:.6f}")
    else:
        print(f"  token accuracy:      {metrics['token_accuracy']:.4f}")
    print(f"  gripper agreement:   {metrics['gripper_agreement']:.4f}")
    print(json.dumps(metrics))
    if args.output_json:
        Path(args.output_json).parent.mkdir(parents=True, exist_ok=True)
        with open(args.output_json, "w") as f:
            json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    main()
