"""Utils parity vs the reference: LR schedule trajectory and action-accuracy
metric (reference src/utils/optim.py:31-160, src/utils/metric.py:6-22)."""

import numpy as np
import pytest

from blurr_tpu.utils.reference_bridge import reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

import importlib  # noqa: E402

from blurr_tpu.utils.metric import get_action_accuracy  # noqa: E402
from blurr_tpu.utils.optim import (  # noqa: E402
    cosine_annealing_warmup_restarts,
)
from blurr_tpu.utils.reference_bridge import load_reference  # noqa: E402

ref = load_reference()
torch = ref.torch
ref_optim = importlib.import_module("src.utils.optim")
ref_metric = importlib.import_module("src.utils.metric")


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(first_cycle_steps=40, warmup_steps=5, max_lr=1e-3, min_lr=1e-5),
        dict(first_cycle_steps=25, cycle_mult=2.0, warmup_steps=4,
             max_lr=5e-4, min_lr=1e-6, gamma=0.5),
    ],
)
def test_lr_schedule_trajectory(kwargs):
    """Step the reference's torch scheduler 120 steps and compare the full
    LR trajectory against the functional schedule."""
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    sched = ref_optim.CosineAnnealingWarmupRestarts(opt, **kwargs)
    mine = cosine_annealing_warmup_restarts(**kwargs)
    for step in range(120):
        sched.step(step)  # explicit-epoch stepping: lr for THIS step index
        ref_lr = opt.param_groups[0]["lr"]
        np.testing.assert_allclose(
            mine(step), ref_lr, rtol=1e-10, atol=1e-12,
            err_msg=f"step {step}",
        )


def test_action_accuracy_metric():
    rng = np.random.RandomState(0)
    gt = rng.randn(8, 4, 7).astype(np.float32)
    pred = gt + rng.randn(8, 4, 7).astype(np.float32) * 0.15
    thresholds = [0.05, 0.1, 0.2, 0.5]
    ref_acc = ref_metric.get_action_accuracy(
        torch.tensor(gt), torch.tensor(pred), thresholds
    ).numpy()
    mine_acc = np.asarray(get_action_accuracy(gt, pred, thresholds))
    np.testing.assert_allclose(mine_acc, ref_acc, atol=1e-7)
