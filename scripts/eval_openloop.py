#!/usr/bin/env python3
"""Open-loop action evaluation over a recorded dataset.

Runs the DEPLOYMENT inference path (``PiZeroInference.infer_action`` —
prefix-KV cached, any quant preset, same jitted program the serving daemon
and eval agent use) over a validation window of a recorded dataset and
reports action-space errors against the ground-truth chunks. This is the
standard VLA proxy metric when a simulator/robot is unavailable: the
reference's acceptance test is closed-loop SimplerEnv success
(reference scripts/run_bridge_full_eval.sh:28-55), which this container
cannot run; open-loop chunk error against held-out demonstrations is the
strongest in-repo complement (and what docs/results/quant_closed_loop_v5e.md
couples with its closed-loop divergence protocol).

Data: a sharded dataset directory (``blurr_tpu.data`` — raw robot-log keys
go through Pi0TrainTransform, the same preprocessing the trainer uses), a
preprocessed ``.npz``, or ``synthetic``. The window defaults to the LAST
``--examples`` examples — the exact split ``train_pi0_flow.py
--val-examples`` holds out, so a fine-tune can be scored on data its
training loop never drew.

Metrics (normalized action space, the model's native output — the env
adapters own denormalization):
  - mse / mae over the full chunk and over the first ``--act-steps`` steps
    (the executed prefix in chunked control)
  - per-dim mse (columns of the action vector)
  - eef_l2: mean L2 error of the first 6 dims per step (EEF pose delta)
  - gripper_agreement: sign-match rate of the last dim — the metric the
    closed-loop quant study found most fragile

All predictions are deterministic: flow noise derives from
``fold_in(key, batch_index)``, so reruns and A/Bs (bf16 vs w8a8 presets,
before/after a fine-tune) are seed-stable.
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
        description="Open-loop action error of a Pi-0 checkpoint on a "
        "recorded dataset's validation window."
    )
    p.add_argument("--config", type=str, required=True,
                   help="Pi0 config yaml (eval presets select quantization).")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="torch .pt, an orbax dir from train_pi0_flow "
                   "--save-dir, or 'random'.")
    p.add_argument("--data", type=str, default="synthetic",
                   help="Sharded dataset dir (blurr_tpu.data), .npz with "
                   "preprocessed keys, or 'synthetic'.")
    p.add_argument("--examples", type=int, default=64,
                   help="Evaluation window size: the LAST N dataset "
                   "examples (matches train_pi0_flow --val-examples).")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--act-steps", type=int, default=4,
                   help="Executed-prefix length for the truncated metrics.")
    p.add_argument("--use-bf16", action="store_true")
    p.add_argument("--dp", type=int, default=1,
                   help="Data-parallel shards over the 'data' mesh axis "
                   "(needs batch-size divisible by dp and dp devices; "
                   "per-example math is unchanged, so metrics match "
                   "single-device).")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output-json", type=str, default="",
                   help="Also write the metrics dict to this path.")
    p.add_argument("--per-dim", action="store_true",
                   help="Print the per-dim MSE table.")
    return p.parse_args()


def _synthetic_examples(cfg, n, seed):
    """Same schema as train_pi0_flow.synthetic_batch, one big batch."""
    rng = np.random.RandomState(seed)
    n_img = cfg["vision"]["config"]["num_image_tokens"]
    seq = cfg["max_image_text_tokens"]
    img = cfg["vision"]["config"]["image_size"]
    ids = np.zeros((n, seq), np.int32)
    am = np.zeros((n, seq), np.int32)
    ids[:, :n_img] = cfg["image_token_index"]
    ids[:, n_img:n_img + 6] = rng.randint(3, 1000, (n, 6))
    am[:, :n_img + 6] = 1
    return {
        "input_ids": ids,
        "attention_mask": am,
        "pixel_values": rng.rand(n, 3, img, img).astype(np.float32) * 2 - 1,
        "proprios": rng.randn(
            n, cfg["cond_steps"], cfg["proprio_dim"]).astype(np.float32),
        "actions": np.clip(
            rng.randn(n, cfg["horizon_steps"], cfg["action_dim"]), -1, 1
        ).astype(np.float32),
    }


REQUIRED_KEYS = ("input_ids", "attention_mask", "pixel_values", "proprios",
                 "actions")


def load_eval_batches(cfg, args):
    """Yield fixed-size preprocessed batches + the number of LIVE rows in
    each (the last batch pads by repeating its final example — static
    shapes keep this to log2-free single-program eval; padded rows are
    excluded from the metrics)."""
    bs = args.batch_size

    if args.data == "synthetic":
        data = _synthetic_examples(cfg, args.examples, args.seed + 7)
        n = args.examples
    elif args.data.endswith(".npz"):
        data = dict(np.load(args.data))
        missing = [k for k in REQUIRED_KEYS if k not in data]
        if missing:  # before any indexing, so the exit message wins
            sys.exit(
                f"dataset is missing keys {missing}; has {sorted(data)}")
        n = min(args.examples, data["actions"].shape[0])
        data = {k: v[-n:] for k, v in data.items()}
    else:
        from blurr_tpu.data import ShardedBatchLoader, ShardedDataset
        from blurr_tpu.data.transform import transform_for_config

        ds = ShardedDataset(args.data)
        n = min(args.examples, ds.num_examples)
        raw = ds.gather_batch(np.arange(ds.num_examples - n,
                                        ds.num_examples))
        if "actions" not in raw:  # raw robot-log keys -> train preprocessing
            transform = transform_for_config(
                cfg, dataset_statistics=ds.statistics)
            raw = transform(raw)
        data = raw
    missing = [k for k in REQUIRED_KEYS if k not in data]
    if missing:
        sys.exit(f"dataset is missing keys {missing}; has {sorted(data)}")

    for lo in range(0, n, bs):
        hi = min(lo + bs, n)
        live = hi - lo
        batch = {k: v[lo:hi] for k, v in data.items()}
        if live < bs:  # pad to the fixed shape; metrics slice to live rows
            batch = {
                k: np.concatenate(
                    [v] + [v[-1:]] * (bs - live), axis=0)
                for k, v in batch.items()
            }
        yield batch, live


def main() -> None:
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from blurr_tpu import benchmarks as B

    dtype = jnp.bfloat16 if args.use_bf16 else jnp.float32
    cfg = B.load_cfg(args.config)
    model, params = B.load_model(cfg, args.checkpoint, dtype)
    infer = (
        model.infer_action
        if cfg.get("use_prefix_kv_cache", True)
        else model.infer_action_naive
    )
    n_tok, act_dim = cfg["horizon_steps"], cfg["action_dim"]
    key = jax.random.PRNGKey(args.seed)

    # the shared (base_key, batch_idx) -> in-graph noise derivation
    # (agent/eval_agent.py:make_noise_infer — CLAUDE.md one-place rule)
    from blurr_tpu.agent.eval_agent import make_noise_infer

    jitted = make_noise_infer(infer, n_tok, act_dim, dtype)

    bsh = None
    if args.dp > 1:
        from blurr_tpu.parallel.mesh import (
            batch_sharding,
            make_mesh,
            shard_params,
        )

        if args.batch_size % args.dp:
            sys.exit(f"--batch-size {args.batch_size} must be divisible "
                     f"by --dp {args.dp}")
        mesh = make_mesh(data=args.dp, model=1)
        params = shard_params(params, mesh)
        bsh = batch_sharding(mesh)

    # accumulate in fp64 on host
    se = np.zeros(act_dim)      # sum of squared error per dim (all steps)
    ae = 0.0                    # sum |err| over everything
    se_prefix = 0.0             # squared error over the executed prefix
    eef_l2_sum = 0.0
    grip_match = 0
    grip_total = 0
    count_steps = 0             # live rows * horizon
    count_prefix = 0
    k = min(args.act_steps, n_tok)

    n_eval = 0
    for bidx, (batch, live) in enumerate(load_eval_batches(cfg, args)):
        inputs = (
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["attention_mask"]),
            jnp.asarray(batch["pixel_values"], dtype),
            jnp.asarray(batch["proprios"], dtype),
        )
        if bsh is not None:
            inputs = tuple(jax.device_put(a, bsh) for a in inputs)
        pred = np.asarray(jitted(
            params, *inputs, key, bidx,
        ), np.float64)[:live]
        gt = np.asarray(batch["actions"], np.float64)[:live]
        err = pred - gt
        se += (err ** 2).sum(axis=(0, 1))
        ae += np.abs(err).sum()
        se_prefix += (err[:, :k] ** 2).sum()
        eef_l2_sum += np.linalg.norm(err[..., :6], axis=-1).sum()
        grip_match += int(
            (np.sign(pred[..., -1]) == np.sign(gt[..., -1])).sum())
        grip_total += live * n_tok
        count_steps += live * n_tok
        count_prefix += live * k
        n_eval += live

    per_dim_mse = se / count_steps
    metrics = {
        "examples": n_eval,
        "horizon": n_tok,
        "act_steps": k,
        "mse": float(per_dim_mse.mean()),
        "mae": float(ae / (count_steps * act_dim)),
        "mse_prefix": float(se_prefix / (count_prefix * act_dim)),
        "eef_l2": float(eef_l2_sum / count_steps),
        "gripper_agreement": float(grip_match / grip_total),
        "per_dim_mse": [float(x) for x in per_dim_mse],
        "config": args.config,
        "checkpoint": args.checkpoint,
        "seed": args.seed,
    }

    print(f"Open-loop eval: {n_eval} examples, horizon {n_tok} "
          f"(prefix {k})")
    print(f"  action MSE:          {metrics['mse']:.6f}")
    print(f"  action MAE:          {metrics['mae']:.6f}")
    print(f"  prefix MSE:          {metrics['mse_prefix']:.6f}")
    print(f"  EEF L2 / step:       {metrics['eef_l2']:.6f}")
    print(f"  gripper agreement:   {metrics['gripper_agreement']:.4f}")
    if args.per_dim:
        for d, v in enumerate(per_dim_mse):
            print(f"    dim {d}: mse {v:.6f}")
    print(json.dumps(metrics))
    if args.output_json:
        Path(args.output_json).parent.mkdir(parents=True, exist_ok=True)
        with open(args.output_json, "w") as f:
            json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    main()
