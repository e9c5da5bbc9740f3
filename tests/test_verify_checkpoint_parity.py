"""verify_checkpoint --parity: one-command torch-vs-jax action parity for a
real Pi-0 ``.pt``. Exercised here with a synthetic checkpoint saved from the
reference's own torch PiZero (tiny dims), so the day a real checkpoint is
available the command is already proven end-to-end."""

import sys
from pathlib import Path

import pytest

from blurr_tpu.utils.reference_bridge import reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

REPO = Path(__file__).resolve().parents[1]
if str(REPO / "scripts") not in sys.path:
    sys.path.insert(0, str(REPO / "scripts"))


def test_parity_mode_on_synthetic_reference_checkpoint(tmp_path):
    from verify_checkpoint import run_pi0_parity

    from blurr_tpu.benchmarks import load_cfg
    from blurr_tpu.utils.reference_bridge import build_ref_pizero, load_reference

    ref = load_reference()
    torch = ref.torch
    torch.set_grad_enabled(False)

    cfg = load_cfg("config/eval/bridge_tiny.yaml")
    cfg["num_inference_steps"] = 2  # keep the CPU run quick
    ref_model = build_ref_pizero(cfg)
    g = torch.Generator().manual_seed(0)
    for p in ref_model.parameters():
        p.data = torch.randn(p.shape, generator=g) * 0.05

    ckpt = tmp_path / "pizero_tiny.pt"
    torch.save({"model": ref_model.state_dict()}, ckpt)

    # run_pi0_parity reloads the checkpoint into BOTH stacks itself
    import blurr_tpu.benchmarks as B

    orig_load = B.load_cfg

    def patched(path):
        c = orig_load(path)
        c["num_inference_steps"] = 2
        return c

    B.load_cfg = patched
    try:
        dev = run_pi0_parity(str(ckpt), "config/eval/bridge_tiny.yaml")
    finally:
        B.load_cfg = orig_load
    assert dev < 1e-4, f"torch-vs-jax action deviation {dev}"
