"""LoRA fine-tuning: adapter injection, mm dispatch, masked training,
merge-on-save, TP sharding.

The reference ships only a LoRA stub on the training side (reference
third_party/open_pi_zero/src/model/lora.py:17-30 raises when LoRA is
requested) and an inference-side PEFT merge; this is the TPU-native
realization — {"w","lora_a","lora_b","lora_s"} dicts dispatched by
ops.quant.mm, masked_freeze training only the factors, and QLoRA via
quantized base weights (the mm recursion).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blurr_tpu.ops.lora import (
    inject_lora_tree,
    is_lora_dict,
    lora_trainable_mask,
    merge_lora_tree,
)
from blurr_tpu.ops.quant import mm
from blurr_tpu.utils.optim import masked_freeze


def _rand_lora(rng, lead, din, dout, r):
    """An adapter dict with a NON-zero B so the delta is visible."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(rng), 3)
    return {
        "w": jax.random.normal(k1, (*lead, din, dout), jnp.float32),
        "lora_a": jax.random.normal(k2, (*lead, din, r), jnp.float32),
        "lora_b": jax.random.normal(k3, (*lead, r, dout), jnp.float32) * 0.1,
        "lora_s": jnp.full(lead or (), 0.5, jnp.float32),
    }


def test_mm_identity_at_init():
    """B = 0 at injection: the adapted matmul IS the base matmul."""
    w = jax.random.normal(jax.random.PRNGKey(0), (16, 8), jnp.float32)
    tree = inject_lora_tree({"q_w": w}, jax.random.PRNGKey(1), rank=4,
                            targets=("q_w",))
    assert is_lora_dict(tree["q_w"])
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 16), jnp.float32)
    np.testing.assert_array_equal(np.asarray(mm(x, tree["q_w"])),
                                  np.asarray(x @ w))


def test_mm_matches_manual_formula():
    d = _rand_lora(0, (), 16, 8, 4)
    x = jax.random.normal(jax.random.PRNGKey(9), (5, 16), jnp.float32)
    want = x @ d["w"] + 0.5 * (x @ d["lora_a"]) @ d["lora_b"]
    np.testing.assert_allclose(np.asarray(mm(x, d)), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_merge_roundtrip_stacked():
    """Stacked [L, in, out] adapters fold into plain weights; the merged
    matmul equals the adapter matmul (per layer slice, as lax.scan sees)."""
    d = _rand_lora(3, (3,), 16, 8, 4)
    merged = merge_lora_tree({"v_w": d})["v_w"]
    assert merged.shape == (3, 16, 8)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16), jnp.float32)
    for i in range(3):
        sl = jax.tree.map(lambda a: a[i], d)
        np.testing.assert_allclose(np.asarray(mm(x, sl)),
                                   np.asarray(x @ merged[i]),
                                   rtol=1e-5, atol=1e-5)


def test_merge_refuses_quantized_base():
    from blurr_tpu.ops.quant import quantize_weight_w8a8

    d = _rand_lora(5, (), 16, 8, 4)
    d["w"] = quantize_weight_w8a8(d["w"])
    with pytest.raises(ValueError, match="quantized base"):
        merge_lora_tree({"q_w": d})


def test_qlora_w8a8_base_dispatch():
    """QLoRA-style: int8-MXU base matmul + fp adapter delta, via the mm
    recursion; identical to w8a8-mm + the manual delta."""
    from blurr_tpu.ops.quant import quantize_weight_w8a8, w8a8_mm

    d = _rand_lora(6, (), 32, 16, 4)
    wq = quantize_weight_w8a8(d["w"])
    d2 = dict(d, w=wq)
    x = jax.random.normal(jax.random.PRNGKey(7), (3, 32), jnp.float32)
    want = w8a8_mm(x, wq) + 0.5 * (x @ d["lora_a"]) @ d["lora_b"]
    np.testing.assert_allclose(np.asarray(mm(x, d2)), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_inject_skips_quant_and_adapter_dicts():
    """Injection never descends into quant dicts' insides and is idempotent
    on already-injected leaves; int8/w8a8 bases get wrapped, w4a8 skipped."""
    from blurr_tpu.ops.quant import quantize_weight_int8

    w = jax.random.normal(jax.random.PRNGKey(0), (16, 8), jnp.float32)
    tree = {"q_w": quantize_weight_int8(w), "k_w": w}
    out = inject_lora_tree(tree, jax.random.PRNGKey(1), 4,
                           targets=("q_w", "k_w"))
    assert is_lora_dict(out["q_w"]) and is_lora_dict(out["k_w"])
    assert out["q_w"]["lora_a"].shape == (16, 4)  # dims from the int8 repr
    again = inject_lora_tree(out, jax.random.PRNGKey(2), 4,
                             targets=("q_w", "k_w"))
    assert again["q_w"] is out["q_w"]  # untouched, not double-wrapped


def test_mask_marks_only_factors():
    w = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8), jnp.float32)
    tree = {"q_w": w, "o_w": w, "norm": jnp.ones((2, 16)), "tied": None}
    out = inject_lora_tree(tree, jax.random.PRNGKey(1), 4, targets=("q_w",))
    mask = lora_trainable_mask(out)
    assert mask["q_w"]["lora_a"] and mask["q_w"]["lora_b"]
    assert not mask["q_w"]["w"] and not mask["q_w"]["lora_s"]
    assert not mask["o_w"] and not mask["norm"]
    assert mask["tied"] is None  # canonical tied subtree stays empty
    assert jax.tree.structure(mask) == jax.tree.structure(
        jax.tree.map(lambda _: True, out)
    )


# ---------------------------------------------------------------------------
# end-to-end: tiny Pi-0 LoRA train step
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def lora_setup():
    import optax

    from blurr_tpu.models.pi0.pizero import PiZero
    from blurr_tpu.parallel.train import make_optax_train_step
    from tests.util import tiny_pi0_cfg

    cfg = tiny_pi0_cfg()
    model = PiZero(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    params = model.tie_action_proprio_weights(params)
    params = model.canonicalize_tied_weights(params)
    base = params
    params = dict(params)
    params["joint"] = dict(params["joint"])
    params["joint"]["action"] = inject_lora_tree(
        params["joint"]["action"], jax.random.PRNGKey(7), rank=4,
        targets=("q_w", "v_w"),
    )
    mask = lora_trainable_mask(params)
    tx = masked_freeze(optax.adamw(1e-2), mask)
    step = make_optax_train_step(model, tx)
    return model, base, params, mask, tx, step


def _batch(model):
    from tests.util import tiny_inputs

    rng = np.random.RandomState(0)
    inputs = tiny_inputs(model.cfg)
    return {
        "input_ids": inputs["input_ids"],
        "attention_mask": inputs["attention_mask"],
        "pixel_values": inputs["pixel_values"],
        "proprios": inputs["proprios"],
        "actions": jnp.asarray(rng.randn(2, 4, 7).astype(np.float32)),
    }


def test_lora_step_trains_only_factors_and_decreases_loss(lora_setup):
    model, base, params, mask, tx, step = lora_setup
    batch = _batch(model)
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(1)
    p, o, losses = params, opt_state, []
    for i in range(5):
        rng, sub = jax.random.split(rng)
        p, o, loss = step(p, o, batch, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()

    flat0, _ = jax.tree_util.tree_flatten_with_path(params)
    flat1, _ = jax.tree_util.tree_flatten_with_path(p)
    mflat = jax.tree.leaves(mask)
    changed = frozen_moved = 0
    for (path, a), (_, b), m in zip(flat0, flat1, mflat):
        same = bool(jnp.array_equal(a, b))
        if m and not same:
            changed += 1
        if not m and not same:
            frozen_moved += 1
    assert changed >= 4  # a AND b factors of q_w/v_w moved
    assert frozen_moved == 0  # every base weight is bitwise frozen


def test_lora_merged_params_match_adapter_forward(lora_setup):
    """merge_lora_tree gives a PLAIN tree whose actions equal the adapter
    tree's — the --save-dir checkpoint serves identically."""
    from tests.util import tiny_inputs

    model, base, params, mask, tx, step = lora_setup
    # make the adapters non-trivial first (B=0 would hide merge bugs)
    batch = _batch(model)
    opt_state = tx.init(params)
    p, o, _ = step(params, opt_state, batch, jax.random.PRNGKey(2))
    merged = merge_lora_tree(p)
    assert not any(
        is_lora_dict(x) for x in jax.tree.leaves(
            merged, is_leaf=is_lora_dict)
    )
    inputs = tiny_inputs(model.cfg)
    a1 = np.asarray(model.infer_action(p, **inputs))
    a2 = np.asarray(model.infer_action(merged, **inputs))
    np.testing.assert_allclose(a2, a1, rtol=2e-5, atol=2e-5)


def test_lora_tp2_matches_single_device(lora_setup):
    """Adapter dicts ride the TP mesh rules (lora_a keeps the in-dim axis,
    lora_b the out-dim axis) — sharded actions equal single-device."""
    from blurr_tpu.parallel.mesh import make_mesh, shard_params
    from tests.util import tiny_inputs

    model, base, params, mask, tx, step = lora_setup
    batch = _batch(model)
    opt_state = tx.init(params)
    p, _, _ = step(params, opt_state, batch, jax.random.PRNGKey(3))
    inputs = tiny_inputs(model.cfg)
    ref = np.asarray(model.infer_action(p, **inputs))
    mesh = make_mesh(data=1, model=2)
    sharded = shard_params(p, mesh)
    with mesh:
        out = np.asarray(jax.jit(model.infer_action)(sharded, **inputs))
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=5e-5)


# ---------------------------------------------------------------------------
# QLoRA: straight-through gradients through quantized bases
# ---------------------------------------------------------------------------


def test_w8a8_mm_straight_through_grad():
    """d/dx of the int8-MXU matmul equals d/dx of x @ W_deq (the QLoRA
    backward): without the custom VJP the int8 cast kills the gradient and
    every layer below an adapted quantized layer trains on zeros."""
    from blurr_tpu.ops.quant import quantize_weight_w8a8, w8a8_mm

    w = jax.random.normal(jax.random.PRNGKey(0), (32, 16), jnp.float32)
    wq = quantize_weight_w8a8(w)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 32), jnp.float32)
    y, vjp = jax.vjp(lambda x: w8a8_mm(x, wq), x)
    ct = jax.random.normal(jax.random.PRNGKey(2), y.shape, jnp.float32)
    (gx,) = vjp(ct)
    deq = wq["q8a"].astype(jnp.float32) * wq["s"]
    # the straight-through linearization is EXACTLY ct @ W_deq^T
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ct @ deq.T),
                               rtol=1e-5, atol=1e-5)
    assert float(jnp.abs(gx).max()) > 0


def test_w4a8_mm_straight_through_grad():
    from blurr_tpu.ops.quant import _w4a8_deq, quantize_weight_w4a8, w4a8_mm

    w = jax.random.normal(jax.random.PRNGKey(0), (64, 16), jnp.float32)
    wq = quantize_weight_w4a8(w)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 64), jnp.float32)
    y, vjp = jax.vjp(lambda x: w4a8_mm(x, wq), x)
    ct = jax.random.normal(jax.random.PRNGKey(2), y.shape, jnp.float32)
    (gx,) = vjp(ct)
    deq = _w4a8_deq(wq["q4"], wq["s"], 64)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ct @ deq.T),
                               rtol=1e-5, atol=1e-5)
    assert float(jnp.abs(gx).max()) > 0


def test_qlora_train_step_end_to_end():
    """Full QLoRA: w8a8-quantized action mixture + LoRA factors; the masked
    step trains the factors to a finite loss, the int8 base stays bitwise,
    and gradients REACH factors in the earliest layer (the straight-through
    VJP carries them through the later quantized matmuls)."""
    import optax

    from blurr_tpu.models.pi0.pizero import PiZero
    from blurr_tpu.ops.quant import quantize_mixture_w8a8
    from blurr_tpu.parallel.train import make_optax_train_step
    from tests.util import tiny_pi0_cfg

    cfg = tiny_pi0_cfg()
    model = PiZero(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    params = model.tie_action_proprio_weights(params)
    params = model.canonicalize_tied_weights(params)
    params = dict(params)
    params["joint"] = dict(params["joint"])
    params["joint"]["action"] = inject_lora_tree(
        quantize_mixture_w8a8(params["joint"]["action"]),
        jax.random.PRNGKey(7), rank=4, targets=("q_w", "v_w"),
    )
    mask = lora_trainable_mask(params)
    tx = masked_freeze(optax.adamw(1e-2), mask)
    step = make_optax_train_step(model, tx)
    batch = _batch(model)
    opt_state = tx.init(params)
    p, o = params, opt_state
    rng = jax.random.PRNGKey(1)
    for _ in range(3):
        rng, sub = jax.random.split(rng)
        p, o, loss = step(p, o, batch, sub)
        assert np.isfinite(float(loss))

    act0, act1 = params["joint"]["action"], p["joint"]["action"]
    for key in ("q_w", "v_w"):
        np.testing.assert_array_equal(  # int8 base bitwise frozen
            np.asarray(act0[key]["w"]["q8a"]), np.asarray(act1[key]["w"]["q8a"])
        )
        # factors moved — INCLUDING layer 0 (grad flows through the later
        # quantized layers via the straight-through VJP)
        d0 = np.abs(np.asarray(act1[key]["lora_b"][0])
                    - np.asarray(act0[key]["lora_b"][0])).max()
        assert d0 > 0, f"{key} layer-0 lora_b never moved"


def test_qlora_checkpoint_serves(tmp_path, monkeypatch):
    """The train->serve loop: a --lora-quantize-base w8a8 run's --save-dir
    (an orbax ADAPTER-DICT tree) loads straight into the ActionServer via
    load_pizero_params_auto and serves finite chunks — no torch export, no
    manual re-injection."""
    import sys

    import scripts.train_pi0_flow as cli

    ckpt = tmp_path / "qlora_ckpt"
    monkeypatch.setattr(sys, "argv", [
        "train_pi0_flow.py", "--config", "config/eval/bridge_tiny.yaml",
        "--steps", "2", "--batch-size", "2", "--lora-rank", "2",
        "--train-scope", "action_expert", "--lora-quantize-base", "w8a8",
        "--save-dir", str(ckpt),
    ])
    cli.main()

    from blurr_tpu.benchmarks import load_cfg
    from blurr_tpu.serving.server import ActionServer

    cfg = load_cfg("config/eval/bridge_tiny.yaml")
    srv = ActionServer(cfg, str(ckpt))
    # the restored tree kept its quantized base + adapters
    from blurr_tpu.ops.lora import is_lora_dict

    q = srv.params["joint"]["action"]["q_w"]
    assert is_lora_dict(q) and "q8a" in q["w"]
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (28, 28, 3), np.uint8)
    actions = srv.predict(img, "pick up the carrot", [0.0] * 7)
    assert actions.shape == (4, 7) and np.isfinite(actions).all()
    srv.stop()


# ---------------------------------------------------------------------------
# review fixes: w4a8 QLoRA injection, scale-preserving casts, masked EMA
# ---------------------------------------------------------------------------


def test_w4a8_base_injects_and_dispatches():
    """REGRESSION: inject_lora_tree used to SKIP w4a8-quantized targets
    (dims hidden by the block-major packing), silently training zero
    parameters; dims now recover from q4/s."""
    from blurr_tpu.ops.quant import quantize_weight_w4a8

    w = jax.random.normal(jax.random.PRNGKey(0), (64, 16), jnp.float32)
    tree = inject_lora_tree({"q_w": quantize_weight_w4a8(w)},
                            jax.random.PRNGKey(1), 4, ("q_w",))
    assert is_lora_dict(tree["q_w"])
    assert tree["q_w"]["lora_a"].shape == (64, 4)
    assert tree["q_w"]["lora_b"].shape == (4, 16)
    d = dict(tree["q_w"], lora_b=jax.random.normal(
        jax.random.PRNGKey(2), (4, 16), jnp.float32) * 0.1)
    x = jax.random.normal(jax.random.PRNGKey(3), (3, 64), jnp.float32)
    from blurr_tpu.ops.quant import w4a8_mm

    want = w4a8_mm(x, d["w"]) + (x @ d["lora_a"]) @ d["lora_b"]
    np.testing.assert_allclose(np.asarray(mm(x, d)), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_w4a8_qlora_cli_trains_factors(tmp_path, monkeypatch):
    """The advertised --lora-quantize-base w4a8 path trains > 0 params and
    moves the factors (it used to burn the whole run on a frozen tree)."""
    import sys

    import scripts.train_pi0_flow as cli

    ckpt = tmp_path / "w4a8_ckpt"
    monkeypatch.setattr(sys, "argv", [
        "train_pi0_flow.py", "--config", "config/eval/bridge_tiny.yaml",
        "--steps", "2", "--batch-size", "2", "--lora-rank", "2",
        "--train-scope", "action_expert", "--lora-quantize-base", "w4a8",
        "--save-dir", str(ckpt),
    ])
    cli.main()
    from blurr_tpu.models.pi0.checkpoint import restore_params

    params = restore_params(str(ckpt))
    q = params["joint"]["action"]["q_w"]
    assert is_lora_dict(q) and "q4" in q["w"]
    # B must have moved off exactly-zero after 2 steps
    assert float(jnp.abs(q["lora_b"]).max()) > 0


def test_cast_preserves_quant_and_lora_scales():
    from blurr_tpu.ops.quant import quantize_weight_w8a8
    from blurr_tpu.utils.optim import cast_floating_preserving_scales

    tree = {
        "plain": jnp.ones((4, 4), jnp.float32),
        "q_w": dict(
            inject_lora_tree(
                {"x": quantize_weight_w8a8(jnp.ones((8, 4), jnp.float32))},
                jax.random.PRNGKey(0), 2, ("x",),
            )["x"]
        ),
        "tied": None,
    }
    out = cast_floating_preserving_scales(tree, jnp.bfloat16)
    assert out["plain"].dtype == jnp.bfloat16
    assert out["q_w"]["lora_a"].dtype == jnp.bfloat16
    assert out["q_w"]["lora_s"].dtype == jnp.float32  # scale preserved
    assert out["q_w"]["w"]["s"].dtype == jnp.float32  # quant scale preserved
    assert out["q_w"]["w"]["q8a"].dtype == jnp.int8
    assert out["tied"] is None


def test_masked_ema_skips_frozen_leaves():
    """mask-aware params_ema: frozen leaves are zero-size sentinels in
    opt_state (no 7B duplicate for QLoRA), and extract_ema(o, params)
    reconstructs the full tree with tracked leaves EMA-averaged."""
    import optax

    from blurr_tpu.utils.optim import extract_ema, params_ema

    params = {"a": jnp.ones((4,)), "b": jnp.full((3,), 2.0)}
    mask = {"a": True, "b": False}
    tx = optax.chain(masked_freeze(optax.sgd(0.1), mask),
                     params_ema(0.5, mask=mask))
    o = tx.init(params)
    # frozen leaf state is the sentinel, not a copy of b
    sentinels = [x for x in jax.tree.leaves(o)
                 if getattr(x, "shape", None) == () and x.dtype == jnp.int8]
    assert sentinels, "no sentinel found in opt_state"
    g = {"a": jnp.ones((4,)), "b": jnp.ones((3,))}
    u, o = tx.update(g, o, params)
    p2 = optax.apply_updates(params, u)
    np.testing.assert_array_equal(np.asarray(p2["b"]),
                                  np.asarray(params["b"]))  # frozen
    ema = extract_ema(o, p2)
    np.testing.assert_array_equal(np.asarray(ema["b"]), np.asarray(p2["b"]))
    assert not np.array_equal(np.asarray(ema["a"]), np.asarray(p2["a"]))
    with pytest.raises(ValueError, match="live params"):
        extract_ema(o)
