"""OpenVLA LoRA fine-tuning: action tokenizer inverse, teacher-forced CE
loss, factor-only training, and PEFT-format adapter export that round-trips
through this repo's own PEFT importer (the reference's load path,
reference scripts/eval_hf_vla_simpler.py:135-179)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blurr_tpu.models.openvla import llama as llama_lib
from blurr_tpu.models.openvla.model import OpenVLA, OpenVLASpec
from blurr_tpu.ops.lora import (
    inject_lora_tree,
    lora_trainable_mask,
    merge_peft_adapter_into_llama,
    save_peft_adapter,
)
from blurr_tpu.utils.optim import masked_freeze


def test_tokenize_actions_inverts_detokenize():
    model = OpenVLA(OpenVLASpec.tiny())
    rng = np.random.RandomState(0)
    a = np.clip(rng.randn(8, 7) * 0.5, -1, 1).astype(np.float32)
    toks = model.tokenize_actions(a)
    assert toks.min() >= model.spec.action_token_vocab - model.spec.n_action_bins
    assert toks.max() < model.spec.action_token_vocab
    back = model.detokenize_actions(toks)
    bin_w = 2.0 / (model.spec.n_action_bins - 1)
    assert np.abs(back - a).max() <= bin_w / 2 + 1e-6
    # a second round-trip is exact for interior values (bin centers are
    # fixed points); exactly ±1.0 rides np.digitize's right-edge and lands
    # one bin over — the reference ActionTokenizer has the same edge quirk
    interior = np.abs(a) < 1.0
    np.testing.assert_array_equal(
        model.tokenize_actions(back)[interior], toks[interior]
    )


@pytest.fixture(scope="module")
def tiny_setup():
    spec = OpenVLASpec.tiny()
    model = OpenVLA(spec)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    b, n_prompt = 2, 9
    seq = n_prompt + 2 + spec.action_dim  # ragged: example 1 is 2 shorter
    ids = np.zeros((b, seq), np.int32)
    valid = np.zeros((b, seq), np.int32)
    actions = np.clip(rng.randn(b, spec.action_dim) * 0.5, -1, 1)
    labels = model.tokenize_actions(actions)
    for row, np_ in enumerate((n_prompt + 2, n_prompt)):
        ids[row, 0] = 1  # BOS
        ids[row, 1:np_] = rng.randint(3, 1000, np_ - 1)
        ids[row, np_ : np_ + spec.action_dim] = labels[row]
        valid[row, : np_ + spec.action_dim] = 1
    px = rng.randn(b, 6, spec.siglip.image_size, spec.siglip.image_size)
    return model, params, (
        jnp.asarray(ids), jnp.asarray(valid),
        jnp.asarray(px, jnp.float32), jnp.asarray(labels),
    )


def test_action_ce_loss_finite_and_batch_consistent(tiny_setup):
    """Ragged co-batched loss == mean of the two solo losses (padding and
    per-example label positions don't leak across rows)."""
    model, params, (ids, valid, px, labels) = tiny_setup
    loss = float(model.action_ce_loss(params, ids, valid, px, labels))
    assert np.isfinite(loss) and loss > 0
    solo = []
    for r in range(2):
        n = int(valid[r].sum())
        solo.append(float(model.action_ce_loss(
            params, ids[r : r + 1, :n], valid[r : r + 1, :n],
            px[r : r + 1], labels[r : r + 1],
        )))
    np.testing.assert_allclose(loss, np.mean(solo), rtol=1e-5, atol=1e-6)


def test_lora_ce_training_moves_only_factors(tiny_setup):
    import optax

    model, params, batch = tiny_setup
    ids, valid, px, labels = batch
    llama = dict(params["llama"])
    llama["layers"] = inject_lora_tree(
        llama["layers"], jax.random.PRNGKey(7), 4,
        ("q_w", "v_w", "down_w"),
    )
    p0 = dict(params, llama=llama)
    mask = lora_trainable_mask(p0)
    tx = masked_freeze(optax.adamw(5e-3), mask)
    o = tx.init(p0)

    @jax.jit
    def step(p, o):
        loss, grads = jax.value_and_grad(
            lambda p: model.action_ce_loss(p, ids, valid, px, labels)
        )(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    p, losses = p0, []
    for _ in range(6):
        p, o, loss = step(p, o)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # teacher-forced CE must drop fast
    frozen_moved = sum(
        1 for a, b, m in zip(jax.tree.leaves(p0), jax.tree.leaves(p),
                             jax.tree.leaves(mask))
        if not m and not bool(jnp.array_equal(a, b))
    )
    assert frozen_moved == 0


def test_peft_export_roundtrips_through_own_importer(tmp_path):
    """Adapters trained here export to PEFT format and merge back through
    merge_peft_adapter_into_llama (the reference's load-time path) — merged
    logits equal the adapter-dict logits."""
    spec = OpenVLASpec.tiny().llama
    base = llama_lib.init_llama_params(jax.random.PRNGKey(0), spec)
    layers = inject_lora_tree(
        dict(base["layers"]), jax.random.PRNGKey(1), 4,
        ("q_w", "v_w", "gate_w"), alpha=8.0,
    )
    # non-trivial factors (B=0 would make the round-trip vacuous)
    for k in ("q_w", "v_w", "gate_w"):
        layers[k] = dict(
            layers[k],
            lora_b=jax.random.normal(
                jax.random.PRNGKey(hash(k) % 1000),
                layers[k]["lora_b"].shape, jnp.float32) * 0.05,
        )
    adapted = dict(base, layers=layers)

    n = save_peft_adapter(layers, str(tmp_path / "lora_adapter"))
    assert n == 3 * spec.num_layers
    merged = merge_peft_adapter_into_llama(
        base, str(tmp_path / "lora_adapter"), dtype=jnp.float32
    )

    b, s = 2, 6
    embeds = jax.random.normal(
        jax.random.PRNGKey(2), (b, s, spec.hidden_size), jnp.float32
    )
    valid = jnp.ones((b, s), jnp.int32)

    def run(params):
        pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
        mask = llama_lib.causal_prefill_mask(valid, s)
        cache = llama_lib.alloc_cache(spec, b, s, jnp.float32)
        h, _ = llama_lib.forward(
            params, spec, embeds, pos, mask, cache, jnp.int32(0)
        )
        return np.asarray(llama_lib.logits(params, spec, h))

    np.testing.assert_allclose(run(merged), run(adapted),
                               rtol=2e-4, atol=2e-4)


def test_cli_smoke_and_adapter_export(tmp_path, monkeypatch):
    import sys

    import scripts.train_openvla_lora as cli

    out = tmp_path / "lora_adapter"
    monkeypatch.setattr(sys, "argv", [
        "train_openvla_lora.py", "--model-id", "random", "--steps", "3",
        "--batch-size", "2", "--lora-rank", "2", "--dtype", "fp32",
        "--save-adapter", str(out),
    ])
    cli.main()
    assert (out / "adapter_config.json").exists()
    assert (out / "adapter_model.safetensors").exists()


def test_cli_qlora_smoke(monkeypatch):
    import sys

    import scripts.train_openvla_lora as cli

    monkeypatch.setattr(sys, "argv", [
        "train_openvla_lora.py", "--model-id", "random", "--steps", "2",
        "--batch-size", "2", "--lora-rank", "2", "--dtype", "fp32",
        "--quantize-base", "w8a8",
    ])
    cli.main()


def test_peft_export_loads_in_real_peft(tmp_path):
    """THE format differential: real PEFT (the library the reference's eval
    uses to load lora_adapter/, reference scripts/eval_hf_vla_simpler.py:
    143-176) loads our exported directory onto a tiny HF Llama, and its
    merge_and_unload applies EXACTLY our s·A@B delta per projection."""
    torch = pytest.importorskip("torch")
    peft = pytest.importorskip("peft")
    from transformers import LlamaConfig, LlamaForCausalLM

    spec = OpenVLASpec.tiny().llama
    layers = inject_lora_tree(
        llama_lib.init_llama_params(jax.random.PRNGKey(0), spec)["layers"],
        jax.random.PRNGKey(1), 4, ("q_w", "v_w"), alpha=8.0,
    )
    for k in ("q_w", "v_w"):
        layers[k] = dict(
            layers[k],
            lora_b=jax.random.normal(
                jax.random.PRNGKey(hash(k) % 997),
                layers[k]["lora_b"].shape, jnp.float32) * 0.05,
        )
    # bare LlamaForCausalLM module paths are model.layers.{i}...
    save_peft_adapter(layers, str(tmp_path), module_prefix="model.layers")

    cfg = LlamaConfig(
        vocab_size=spec.vocab_size, hidden_size=spec.hidden_size,
        intermediate_size=spec.intermediate_size,
        num_hidden_layers=spec.num_layers,
        num_attention_heads=spec.num_heads,
        num_key_value_heads=spec.num_kv_heads,
    )
    with torch.no_grad():
        base = LlamaForCausalLM(cfg)
        before = {
            (i, p): getattr(
                base.model.layers[i].self_attn, p
            ).weight.detach().clone()
            for i in range(spec.num_layers) for p in ("q_proj", "v_proj")
        }
        pm = peft.PeftModel.from_pretrained(base, str(tmp_path))
        merged = pm.merge_and_unload()
        for i in range(spec.num_layers):
            for p, ours in (("q_proj", "q_w"), ("v_proj", "v_w")):
                after = getattr(merged.model.layers[i].self_attn, p).weight
                delta = (after - before[(i, p)]).numpy()  # torch [out, in]
                d = layers[ours]
                want = np.asarray(
                    float(d["lora_s"][i])
                    * (d["lora_a"][i] @ d["lora_b"][i])
                ).T
                np.testing.assert_allclose(delta, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# OFT continuous-action fine-tuning
# ---------------------------------------------------------------------------


def test_oft_l1_training_and_aux_export(tmp_path):
    """OFT: L1 on the parallel-decoded chunk trains the head + LoRA factors
    (base frozen); the trained aux modules export as the torch checkpoints
    the reference's eval discovers (save->load round-trip equality)."""
    import optax

    from blurr_tpu.models.openvla.checkpoint import (
        load_oft_aux_params,
        save_oft_aux_params,
    )
    from blurr_tpu.models.openvla.model import OpenVLAOFT

    spec = OpenVLASpec.tiny()
    model = OpenVLAOFT(spec, chunk_len=3, use_proprio=True, proprio_dim=5)
    params = model.init_params(jax.random.PRNGKey(0))
    llama = dict(params["llama"])
    llama["layers"] = inject_lora_tree(
        llama["layers"], jax.random.PRNGKey(7), 2, ("q_w", "v_w")
    )
    p0 = dict(params, llama=llama)
    mask = dict(lora_trainable_mask(p0))
    mask["action_head"] = jax.tree.map(lambda _: True, p0["action_head"])
    mask["proprio_projector"] = jax.tree.map(
        lambda _: True, p0["proprio_projector"]
    )
    tx = masked_freeze(optax.adamw(5e-3), mask)
    o = tx.init(p0)

    rng = np.random.RandomState(0)
    b, n_prompt = 2, 8
    ids = np.concatenate(
        [np.ones((b, 1), np.int32),
         rng.randint(3, 1000, (b, n_prompt - 1)).astype(np.int32)], 1
    )
    px = jnp.asarray(
        rng.randn(b, 6, spec.siglip.image_size, spec.siglip.image_size),
        jnp.float32,
    )
    actions = jnp.asarray(
        np.clip(rng.randn(b, 3, spec.action_dim) * 0.4, -1, 1), jnp.float32
    )
    proprio = jnp.asarray(rng.randn(b, 5), jnp.float32)
    ids = jnp.asarray(ids)

    @jax.jit
    def step(p, o):
        loss, grads = jax.value_and_grad(
            lambda p: model.oft_l1_loss(p, ids, px, actions, proprio)
        )(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    p, losses = p0, []
    for _ in range(6):
        p, o, loss = step(p, o)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    frozen_moved = sum(
        1 for a, b_, m in zip(jax.tree.leaves(p0), jax.tree.leaves(p),
                              jax.tree.leaves(mask))
        if not m and not bool(jnp.array_equal(a, b_))
    )
    assert frozen_moved == 0
    # head moved (it is the regression surface)
    assert not bool(jnp.array_equal(
        p0["action_head"]["fc2_w"], p["action_head"]["fc2_w"]
    ))

    save_oft_aux_params(
        str(tmp_path), p["action_head"], p["proprio_projector"], step=6
    )
    head, proj = load_oft_aux_params(str(tmp_path), jnp.float32)
    for a, b_ in zip(jax.tree.leaves(p["action_head"]), jax.tree.leaves(head)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-6, atol=1e-6)
    for a, b_ in zip(jax.tree.leaves(p["proprio_projector"]),
                     jax.tree.leaves(proj)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-6, atol=1e-6)


def test_cli_oft_smoke(tmp_path, monkeypatch):
    import sys

    import scripts.train_openvla_lora as cli

    out = tmp_path / "snap" / "lora_adapter"
    monkeypatch.setattr(sys, "argv", [
        "train_openvla_lora.py", "--model-id", "random", "--oft",
        "--chunk-len", "2", "--steps", "2", "--batch-size", "2",
        "--lora-rank", "2", "--dtype", "fp32",
        "--save-adapter", str(out),
    ])
    cli.main()
    assert (out / "adapter_model.safetensors").exists()
    assert list((tmp_path / "snap").glob("action_head--*_checkpoint.pt"))


def test_oft_ragged_prompts_match_solo():
    """predict_action_continuous(attn_valid=...): two prompts of different
    lengths co-batch right-padded and each returns EXACTLY its unpadded solo
    chunk (per-example tail positions + masked pad columns)."""
    from blurr_tpu.models.openvla.model import OpenVLAOFT

    spec = OpenVLASpec.tiny()
    model = OpenVLAOFT(spec, chunk_len=2, use_proprio=True, proprio_dim=5)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    lens = (7, 11)
    s_max = max(lens)
    ids = np.zeros((2, s_max), np.int32)
    valid = np.zeros((2, s_max), np.int32)
    for r, n in enumerate(lens):
        ids[r, 0] = 1
        ids[r, 1:n] = rng.randint(3, 1000, n - 1)
        valid[r, :n] = 1
    px = rng.randn(2, 6, spec.siglip.image_size, spec.siglip.image_size)
    proprio = rng.randn(2, 5).astype(np.float32)

    batched = np.asarray(model.predict_action_continuous(
        params, jnp.asarray(ids), jnp.asarray(px, jnp.float32),
        jnp.asarray(proprio), attn_valid=jnp.asarray(valid),
    ))
    for r, n in enumerate(lens):
        solo = np.asarray(model.predict_action_continuous(
            params, jnp.asarray(ids[r : r + 1, :n]),
            jnp.asarray(px[r : r + 1], jnp.float32),
            jnp.asarray(proprio[r : r + 1]),
        ))
        np.testing.assert_allclose(batched[r], solo[0], rtol=2e-5, atol=2e-5)


def _run_cli(monkeypatch, argv):
    import sys

    import scripts.train_openvla_lora as cli

    monkeypatch.setattr(sys, "argv", ["train_openvla_lora.py"] + argv)
    cli.main()


def _load_adapter_tensors(path):
    from safetensors.numpy import load_file

    return load_file(str(path / "adapter_model.safetensors"))


def test_cli_exact_state_resume(tmp_path, monkeypatch):
    """4 straight steps == (2 steps -> save state -> resume -> 2 more): the
    exported adapters are bitwise identical (moments, LR position, and the
    index stream all survive the interruption)."""
    base = ["--model-id", "random", "--steps", "4", "--batch-size", "2",
            "--lora-rank", "2", "--dtype", "fp32"]
    full = tmp_path / "full"
    _run_cli(monkeypatch, base + ["--save-adapter", str(full)])

    st = tmp_path / "state"
    _run_cli(monkeypatch, base + ["--stop-after", "2",
                                  "--save-state", str(st)])
    res = tmp_path / "resumed"
    _run_cli(monkeypatch, base + ["--resume-state", str(st),
                                  "--save-adapter", str(res)])

    a, b = _load_adapter_tensors(full), _load_adapter_tensors(res)
    assert a.keys() == b.keys() and len(a) > 0
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_cli_periodic_checkpoint_crash_resume(tmp_path, monkeypatch):
    """--save-every periodic async checkpoints + crash-restart from the
    manager root reproduce the uninterrupted run's adapters bitwise (the
    Pi-0 twin lives in test_eval_e2e.py)."""
    import os

    base = ["--model-id", "random", "--steps", "4", "--batch-size", "2",
            "--lora-rank", "2", "--dtype", "fp32"]
    full = tmp_path / "full"
    _run_cli(monkeypatch, base + ["--save-adapter", str(full)])

    st = tmp_path / "mgr"
    _run_cli(monkeypatch, base + ["--stop-after", "2", "--save-every", "1",
                                  "--keep-checkpoints", "2",
                                  "--save-state", str(st)])
    assert sorted(int(e) for e in os.listdir(st) if e.isdigit()) == [1, 2]

    res = tmp_path / "resumed"
    _run_cli(monkeypatch, base + ["--resume-state", str(st),
                                  "--save-every", "1",
                                  "--keep-checkpoints", "2",
                                  "--save-state", str(st),
                                  "--save-adapter", str(res)])
    kept = sorted(int(e) for e in os.listdir(st) if e.isdigit())
    assert kept[-1] == 4 and len(kept) <= 2

    a, b = _load_adapter_tensors(full), _load_adapter_tensors(res)
    assert a.keys() == b.keys() and len(a) > 0
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_cli_dp2_smoke(monkeypatch, tmp_path):
    """--dp 2 on the virtual mesh: batches split over 'data', grads psum via
    GSPMD, adapter still exports."""
    out = tmp_path / "lora_adapter"
    _run_cli(monkeypatch, [
        "--model-id", "random", "--steps", "2", "--batch-size", "2",
        "--lora-rank", "2", "--dtype", "fp32", "--dp", "2",
        "--save-adapter", str(out),
    ])
    assert (out / "adapter_model.safetensors").exists()


def test_cli_tp2_smoke(monkeypatch):
    """--tp 2: llama weights (and LoRA factors, via the lora mesh rules)
    shard over 'model' — the 7B capacity path, exercised at tiny dims."""
    _run_cli(monkeypatch, [
        "--model-id", "random", "--steps", "2", "--batch-size", "2",
        "--lora-rank", "2", "--dtype", "fp32", "--tp", "2",
    ])


# ---------------------------------------------------------------------------
# sharded-dataset streaming (blurr_tpu.data) for the OpenVLA trainer
# ---------------------------------------------------------------------------


def _write_tiny_dataset(out_dir, oft=False, chunk=2, proprio=False):
    from blurr_tpu.models.openvla.data import write_openvla_dataset

    rng = np.random.RandomState(0)
    n = 12
    imgs = rng.randint(0, 256, (n, 28, 28, 3), np.uint8)
    instr = ["pick up the carrot",
             "move the very shiny spoon onto the towel please"] * (n // 2)
    shape = (n, chunk, 7) if oft else (n, 7)
    actions = np.clip(rng.randn(*shape) * 0.4, -1, 1).astype(np.float32)
    prop = rng.randn(n, 5).astype(np.float32) if proprio else None
    write_openvla_dataset(out_dir, imgs, instr, actions, proprios=prop,
                          max_text_tokens=24, shard_size=5)
    return out_dir


def test_sharded_dataset_ar_training_and_exact_resume(tmp_path, monkeypatch):
    """The streaming path (mmap shards + prefetch + transform) trains the AR
    objective, and resume restores the loader position O(1): interrupted ==
    straight-through, adapters bitwise."""
    ds = _write_tiny_dataset(tmp_path / "ds")
    base = ["--model-id", "random", "--data", str(ds), "--steps", "4",
            "--batch-size", "2", "--lora-rank", "2", "--dtype", "fp32"]
    full = tmp_path / "full"
    _run_cli(monkeypatch, base + ["--save-adapter", str(full)])
    st = tmp_path / "state"
    _run_cli(monkeypatch, base + ["--stop-after", "2",
                                  "--save-state", str(st)])
    res = tmp_path / "resumed"
    _run_cli(monkeypatch, base + ["--resume-state", str(st),
                                  "--save-adapter", str(res)])
    a, b = _load_adapter_tensors(full), _load_adapter_tensors(res)
    assert a.keys() == b.keys() and len(a) > 0
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_sharded_dataset_oft_training(tmp_path, monkeypatch):
    """OFT from a sharded dataset: ragged prompts in one padded batch
    (attn_valid), proprio key, adapter + aux exports produced."""
    ds = _write_tiny_dataset(tmp_path / "ds", oft=True, chunk=2,
                             proprio=True)
    out = tmp_path / "snap" / "lora_adapter"
    _run_cli(monkeypatch, [
        "--model-id", "random", "--data", str(ds), "--oft",
        "--chunk-len", "2", "--use-proprio", "--proprio-dim", "5",
        "--steps", "3", "--batch-size", "2", "--lora-rank", "2",
        "--dtype", "fp32", "--save-adapter", str(out),
    ])
    assert (out / "adapter_model.safetensors").exists()
    assert list((tmp_path / "snap").glob("action_head--*_checkpoint.pt"))
    assert list((tmp_path / "snap").glob("proprio_projector--*_checkpoint.pt"))


def test_cli_accum_and_ema(tmp_path, monkeypatch):
    """--accum-steps gates updates to every k-th micro-batch and
    --ema-decay exports EMA factors alongside the raw ones."""
    out = tmp_path / "lora_adapter"
    _run_cli(monkeypatch, [
        "--model-id", "random", "--steps", "4", "--batch-size", "2",
        "--lora-rank", "2", "--dtype", "fp32", "--accum-steps", "2",
        "--ema-decay", "0.9", "--save-adapter", str(out),
    ])
    raw = _load_adapter_tensors(out)
    ema = _load_adapter_tensors(tmp_path / "lora_adapter_ema")
    assert raw.keys() == ema.keys()
    # the EMA must differ from the raw factors (it lags the trajectory)
    assert any(not np.array_equal(raw[k], ema[k]) for k in raw)


def test_cli_minivla_family_trains(monkeypatch):
    """The prismatic (Qwen2 QKV-bias, tied lm_head) family trains through
    the same CLI — LoRA targets exist under the same names."""
    _run_cli(monkeypatch, [
        "--model-id", "random-minivla-tiny", "--steps", "2",
        "--batch-size", "2", "--lora-rank", "2", "--dtype", "fp32",
    ])


def test_save_params_serves_and_evals(tmp_path, monkeypatch):
    """The in-repo OpenVLA train->serve loop: --save-params writes the full
    tree (QLoRA int8 base + LoRA factor dicts), build_openvla loads it into
    the server runtime and the open-loop evaluator; trained weights must
    produce actions different from random-init, and re-quantizing an
    already-quantized checkpoint is rejected."""
    import numpy as np

    import jax.numpy as jnp

    from blurr_tpu.models.openvla.build import build_openvla
    from blurr_tpu.serving.openvla_server import OpenVLAActionServer

    saved = tmp_path / "params"
    _run_cli(monkeypatch, [
        "--model-id", "random", "--steps", "3", "--batch-size", "2",
        "--lora-rank", "2", "--dtype", "fp32", "--quantize-base", "w8a8",
        "--lr", "5e-3", "--save-params", str(saved),
    ])
    assert saved.is_dir()

    # the restored tree keeps the quant dicts + factors and refuses PTQ
    built = build_openvla("random", dtype=jnp.float32,
                          checkpoint_path=str(saved))
    layers = built.params["llama"]["layers"]
    # LoRA-targeted projections wrap the quantized base:
    # {"w": {"q8a", "s"}, "lora_a", "lora_b", "lora_s"}
    assert any(
        isinstance(v, dict)
        and ("q8a" in v or (isinstance(v.get("w"), dict) and "q8a" in v["w"]))
        for v in layers.values())
    assert any(isinstance(v, dict) and "lora_a" in v for v in layers.values())
    import pytest as _pytest

    with _pytest.raises(ValueError, match="already carries"):
        build_openvla("random", dtype=jnp.float32,
                      checkpoint_path=str(saved), quantization="w8a8")

    # the restored factors are TRAINED (inject_lora_tree zero-inits
    # lora_b, so any nonzero lora_b proves the trained tree flowed
    # through — greedy decode is discrete, so action-level differences
    # are not a reliable signal at 3 random-init steps)
    lb = [v["lora_b"] for v in layers.values()
          if isinstance(v, dict) and "lora_b" in v]
    assert lb and any(float(jnp.abs(b).max()) > 0 for b in lb)

    # serve it end-to-end through the runtime
    srv_trained = OpenVLAActionServer(
        "random", use_bf16=False, checkpoint_path=str(saved))
    img = np.random.RandomState(0).randint(
        0, 256, (srv_trained.spec.siglip.image_size,
                 srv_trained.spec.siglip.image_size, 3), np.uint8)
    a_t = srv_trained.predict(img, "pick up the carrot", None)
    a_t2 = srv_trained.predict(img, "pick up the carrot", None)
    assert np.isfinite(a_t).all()
    np.testing.assert_array_equal(a_t, a_t2)  # greedy: deterministic
    srv_trained.stop()

    # and score it open-loop with the evaluator CLI
    import json
    import sys as _sys

    import scripts.eval_openloop_vla as vcli

    out = tmp_path / "m.json"
    monkeypatch.setattr(_sys, "argv", [
        "eval_openloop_vla.py", "--model-id", "random", "--dtype", "fp32",
        "--checkpoint", str(saved), "--examples", "4", "--batch-size", "2",
        "--output-json", str(out),
    ])
    vcli.main()
    with open(out) as f:
        got = json.load(f)
    assert got["examples"] == 4 and np.isfinite(got["mse"])
    assert got["checkpoint"] == str(saved)


def test_w4a8_checkpoint_rejects_tp_and_lora_ptq_refused(tmp_path):
    """A w4a8 tree loaded via checkpoint_path must hit the same tp>1 guard
    as quantization='w4a8'; PTQ over LoRA factor dicts is refused."""
    import pytest as _pytest

    import jax
    import jax.numpy as jnp

    from blurr_tpu.models.openvla.build import build_openvla
    from blurr_tpu.models.pi0.checkpoint import save_params
    from blurr_tpu.ops.lora import inject_lora_tree
    from blurr_tpu.serving.openvla_server import OpenVLAActionServer

    built = build_openvla("random", dtype=jnp.float32, quantization="w4a8")
    saved = tmp_path / "w4"
    save_params(built.params, str(saved))
    with _pytest.raises(NotImplementedError, match="w4a8"):
        OpenVLAActionServer("random", use_bf16=False, tp=2, max_batch=2,
                            checkpoint_path=str(saved))

    plain = build_openvla("random", dtype=jnp.float32)
    llama = dict(plain.params["llama"])
    llama["layers"] = inject_lora_tree(
        llama["layers"], jax.random.PRNGKey(0), 2, ("q_w",), None,
        dtype=jnp.float32)
    p2 = dict(plain.params)
    p2["llama"] = llama
    saved2 = tmp_path / "lora"
    save_params(p2, str(saved2))
    with _pytest.raises(ValueError, match="LoRA factor dicts"):
        build_openvla("random", dtype=jnp.float32,
                      checkpoint_path=str(saved2), quantization="w8a8")


def test_remat_matches_plain_loss_and_grads(tiny_setup):
    """``remat=True`` (jax.checkpoint on the llama layer scan) must change
    memory, never math: loss and LoRA-factor grads equal the plain path.
    The 7B single-chip capacity lever (qlora7b_memory_v5e.csv)."""
    model, params, (ids, valid, px, labels) = tiny_setup
    llama = dict(params["llama"])
    llama["layers"] = inject_lora_tree(
        llama["layers"], jax.random.PRNGKey(3), 4, ("q_w", "v_w"),
    )
    p0 = dict(params, llama=llama)

    def loss(p, remat):
        return model.action_ce_loss(p, ids, valid, px, labels, remat=remat)

    l_plain, g_plain = jax.value_and_grad(lambda p: loss(p, False))(p0)
    l_remat, g_remat = jax.value_and_grad(lambda p: loss(p, True))(p0)
    np.testing.assert_allclose(float(l_plain), float(l_remat), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        g_plain, g_remat,
    )


def test_remat_matches_plain_oft_l1():
    """Same invariant through the OFT L1 objective (continuous head)."""
    from blurr_tpu.models.openvla.model import OpenVLAOFT

    spec = OpenVLASpec.tiny()
    model = OpenVLAOFT(spec, chunk_len=2, use_proprio=True, proprio_dim=5)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(2)
    b, seq = 2, 11
    ids = np.zeros((b, seq), np.int32)
    ids[:, 0] = 1
    ids[:, 1:8] = rng.randint(3, 1000, (b, 7))
    valid = (ids > 0).astype(np.int32)
    px = jnp.asarray(
        rng.randn(b, 6, spec.siglip.image_size, spec.siglip.image_size),
        jnp.float32)
    actions = jnp.asarray(
        np.clip(rng.randn(b, 2, spec.action_dim) * 0.5, -1, 1), jnp.float32)
    proprio = jnp.asarray(rng.randn(b, 5), jnp.float32)

    def loss(p, remat):
        return model.oft_l1_loss(
            p, jnp.asarray(ids), px, actions, proprio,
            attn_valid=jnp.asarray(valid), remat=remat)

    l_plain, g_plain = jax.value_and_grad(lambda p: loss(p, False))(params)
    l_remat, g_remat = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l_plain), float(l_remat), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        g_plain, g_remat,
    )
