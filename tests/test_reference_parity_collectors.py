"""Differential contract tests for collectors/summarizers: feed IDENTICAL
fixtures to the reference's collect_bridge_eval_results.py /
paper/summarize_results.py / paper/summarize_bridge_success.py /
paper/pi0_microbench.py preset table and the repo's counterparts, and
byte-compare outputs (round-2 verdict Next #4).

Declared divergences (asserted explicitly, not papered over):
- steps-tradeoff table says HBM where the reference says VRAM (TPU repo);
- cross-hardware table's first header is 'Hardware' instead of 'GPU';
- LaTeX cells escape '_' in first-vs-steady preset/dtype names (the
  reference emits raw underscores, which break LaTeX for such presets).
"""

from __future__ import annotations

import csv
import importlib
import importlib.util
import json
import sys
from pathlib import Path

import pytest

from blurr_tpu.utils.reference_bridge import reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

from blurr_tpu.utils.reference_bridge import (  # noqa: E402
    demote_reference_sys_paths,
    load_reference_script,
)

REPO = Path(__file__).resolve().parents[1]
if str(REPO / "scripts") not in sys.path:
    sys.path.insert(0, str(REPO / "scripts"))

ref_summ = load_reference_script("paper/summarize_results")
ref_bridge_summ = load_reference_script("paper/summarize_bridge_success")

import scripts.paper.summarize_bridge_success as my_bridge_summ  # noqa: E402
import scripts.paper.summarize_results as my_summ  # noqa: E402


# ---------------------------------------------------------------------------
# collect_bridge_eval_results.py (reference :17-77) — CSV byte parity
# ---------------------------------------------------------------------------


def _write_run_log(run_dir: Path, success=None, episodes=None):
    run_dir.mkdir(parents=True)
    lines = ["2026 | INFO | agent | ============ Evaluation Summary ============"]
    if episodes is not None:
        lines.append(f"2026 | INFO | agent | Number of episodes: {episodes}")
    if success is not None:
        lines.append(f"2026 | INFO | agent | Success rate: {success}")
    (run_dir / "run.log").write_text("\n".join(lines) + "\n")


def _collector_fixture(root: Path):
    runs = root / "runs" / "eval_bridge"
    _write_run_log(
        runs / "accel_step1_ta1_42" / "widowx_carrot_on_plate_2026-01-01_00-00-00",
        success=0.7, episodes=10,
    )
    _write_run_log(
        runs / "accel_step1_ta1_42" / "widowx_spoon_on_towel_2026-01-02_10-00-00",
        success=0.55, episodes=100,
    )
    # <4 underscore parts: task keeps the full dir name (reference :38-42)
    _write_run_log(runs / "m2_43" / "short_a_b", success=0.25, episodes=4)
    # run.log without a success line -> skipped entirely
    _write_run_log(runs / "m2_43" / "widowx_stack_cube_2026-01-03_00-00-00")
    # run dir without run.log -> skipped; stray file -> skipped
    (runs / "m2_43" / "no_log_dir_2026-01-04_00-00-00").mkdir(parents=True)
    (runs / "stray.txt").write_text("x")


def _read_csv_rows(path: Path):
    with path.open() as f:
        reader = csv.reader(f)
        header = next(reader)
        return header, sorted(tuple(r) for r in reader)


def test_collector_csv_differential(tmp_path, monkeypatch):
    """Both collectors scrape the SAME fixture tree; CSV header and row set
    must match byte-for-byte (row order differs only by directory iteration
    order, so rows are compared sorted)."""
    _collector_fixture(tmp_path)

    # reference: module-level script — patch its blurr.paths.repo_root target
    if str(Path("/root/reference")) not in sys.path:
        sys.path.insert(0, "/root/reference")
    ref_paths = importlib.import_module("blurr.paths")
    monkeypatch.setattr(ref_paths, "repo_root", lambda: tmp_path)
    spec = importlib.util.spec_from_file_location(
        "ref_collect_script", "/root/reference/scripts/collect_bridge_eval_results.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    demote_reference_sys_paths()  # the script sys.path-inserts its repo root
    out_csv = tmp_path / "runs" / "bridge_eval_summary.csv"
    ref_header, ref_rows = _read_csv_rows(out_csv)
    out_csv.unlink()

    import collect_bridge_eval_results as mine

    monkeypatch.setattr(mine, "repo_root", lambda: tmp_path)
    mine.main()
    my_header, my_rows = _read_csv_rows(out_csv)

    assert my_header == ref_header
    assert my_rows == ref_rows
    # the skip rules dropped exactly the no-success/no-log entries
    assert len(my_rows) == 3


# ---------------------------------------------------------------------------
# paper/summarize_bridge_success.py (reference :18-128) — stdout byte parity
# ---------------------------------------------------------------------------


def _summary_fixtures(tmp_path: Path):
    a = tmp_path / "hf_openvla_42" / "summary.json"
    a.parent.mkdir()
    a.write_text(json.dumps({
        "model_id": "openvla/openvla-7b",
        "preset": "bf16",
        "episodes_per_task": 20,
        "per_task_success": {
            "widowx_carrot_on_plate": 0.35,
            "widowx_spoon_on_towel": 0.414,
        },
        "avg_success": 0.382,
    }))
    b = tmp_path / "prismatic_minivla_42" / "summary.json"
    b.parent.mkdir()
    b.write_text(json.dumps({
        "checkpoint": "/ckpts/MiniVLA-bridge.pt",
        "n_eval_episode": 100,
        "per_task_success": {
            "widowx_carrot_on_plate": 0.51,
            "widowx_stack_cube": 0.12,
            "widowx_put_eggplant_in_basket": 0.66,
        },
        "avg_success": 0.43,
    }))
    c = tmp_path / "mystery_run" / "summary.json"
    c.parent.mkdir()
    c.write_text(json.dumps({"per_task_success": {}}))
    return [str(a), str(b), str(c)]


@pytest.mark.parametrize("fmt", ["latex", "md"])
def test_summarize_bridge_success_differential(tmp_path, monkeypatch, capsys, fmt):
    paths = _summary_fixtures(tmp_path)
    argv = ["summarize_bridge_success.py", *paths, "--format", fmt]
    monkeypatch.setattr(sys, "argv", argv)
    ref_bridge_summ.main()
    ref_out = capsys.readouterr().out
    my_bridge_summ.main()
    my_out = capsys.readouterr().out
    assert my_out == ref_out


def test_summarize_bridge_success_label_override(tmp_path, monkeypatch, capsys):
    paths = _summary_fixtures(tmp_path)
    argv = ["x", *paths, "--label-override", "L1", "L2", "L3"]
    monkeypatch.setattr(sys, "argv", argv)
    ref_bridge_summ.main()
    ref_out = capsys.readouterr().out
    my_bridge_summ.main()
    assert capsys.readouterr().out == ref_out
    assert "L1" in ref_out and "L3" in ref_out

    # length-mismatched overrides exit with the same message on both sides
    monkeypatch.setattr(sys, "argv", ["x", *paths, "--label-override", "only1"])
    with pytest.raises(SystemExit) as ref_exc:
        ref_bridge_summ.main()
    with pytest.raises(SystemExit) as my_exc:
        my_bridge_summ.main()
    assert str(my_exc.value) == str(ref_exc.value)


# ---------------------------------------------------------------------------
# paper/summarize_results.py — function-level byte parity on shared fixtures
# ---------------------------------------------------------------------------


def _write_csv(path: Path, header, rows):
    with path.open("w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


@pytest.fixture()
def results_dir(tmp_path):
    d = tmp_path / "results"
    d.mkdir()
    _write_csv(
        d / "prompt_length_sweep_pi0.csv",
        ["target_text_tokens", "use_prefix_kv_cache", "latency_ms"],
        [
            [8, "True", 12.5], [8, "False", 31.0],
            [32, "True", 13.1], [32, "False", 48.7],
            [128, "True", ""],  # missing latency -> '--' row
            [128, "False", 99.0],
        ],
    )
    _write_csv(
        d / "first_vs_steady_pi0.csv",
        ["preset", "dtype", "torch_compile", "first_call_ms", "steady_latency_ms"],
        [
            ["baseline", "fp32", "False", 410.2, 120.4],
            ["blurr", "bf16", "True", 27700.0, 11.84],
        ],
    )
    _write_csv(
        d / "horizon_sweep_success.csv",
        ["steps", "task", "success_rate"],
        [
            [1, "carrot", 0.42], [1, "spoon", 0.38],
            [4, "carrot", 0.47], [4, "spoon", 0.45],
            [10, "carrot", 0.48], [10, "spoon", 0.44],
        ],
    )
    _write_csv(
        d / "steps_latency_pi0_bf16_compile.csv",
        ["steps", "latency_ms", "peak_reserved_gb"],
        [[1, 11.8, 6.64], [4, 21.5, 6.64], [10, 43.0, 6.65]],
    )
    _write_csv(
        d / "hf_microbench.csv",
        ["model_id", "profile", "latency_ms", "dtype", "torch_compile", "gpu"],
        [
            ["openvla/openvla-7b", "bf16_eager", 260.0, "bf16", "False", "v5e"],
            ["openvla/openvla-7b", "bf16_compile", 147.0, "bf16", "True", "v5e"],
            ["Embodied-CoT/ecot", "bf16_eager", 300.0, "bf16", "False", "v5e"],
            ["Embodied-CoT/ecot", "bf16_compile", "", "bf16", "True", "v5e"],
        ],
    )
    return d


def test_prompt_sweep_byte_parity(results_dir):
    p = results_dir / "prompt_length_sweep_pi0.csv"
    assert my_summ.summarize_prompt_sweep(p) == ref_summ.summarize_prompt_sweep(p)


def test_first_vs_steady_byte_parity(results_dir):
    p = results_dir / "first_vs_steady_pi0.csv"
    assert my_summ.summarize_first_vs_steady(p) == ref_summ.summarize_first_vs_steady(p)


def test_first_vs_steady_escapes_underscores(tmp_path):
    """Declared divergence: underscore presets are LaTeX-escaped here (the
    reference emits raw '_', which breaks LaTeX compilation)."""
    p = tmp_path / "first_vs_steady_pi0.csv"
    _write_csv(
        p,
        ["preset", "dtype", "torch_compile", "first_call_ms", "steady_latency_ms"],
        [["bridge_pool64_w8a8", "bf16", "True", 100.0, 6.5]],
    )
    ref_out = ref_summ.summarize_first_vs_steady(p)
    my_out = my_summ.summarize_first_vs_steady(p)
    assert my_out == ref_out.replace("bridge_pool64_w8a8", r"bridge\_pool64\_w8a8")


def test_horizon_sweep_byte_parity(results_dir):
    p = results_dir / "horizon_sweep_success.csv"
    assert my_summ.summarize_horizon_sweep(p) == ref_summ.summarize_horizon_sweep(p)


def test_steps_tradeoff_parity_modulo_hbm(results_dir):
    """Byte parity after the single declared VRAM->HBM terminology swap."""
    ref_out = ref_summ.summarize_steps_tradeoff(
        horizon_csv=results_dir / "horizon_sweep_success.csv",
        steps_latency_csv=results_dir / "steps_latency_pi0_bf16_compile.csv",
    )
    my_out = my_summ.summarize_steps_tradeoff(
        horizon_csv=results_dir / "horizon_sweep_success.csv",
        steps_latency_csv=results_dir / "steps_latency_pi0_bf16_compile.csv",
    )
    assert my_out == ref_out.replace("VRAM", "HBM")
    assert "HBM (GB)" in my_out


def test_hf_microbench_byte_parity(results_dir):
    p = results_dir / "hf_microbench.csv"
    assert my_summ.summarize_hf_microbench(p) == ref_summ.summarize_hf_microbench(p)


def test_hf_microbench_missing_profiles_raises(tmp_path):
    p = tmp_path / "hf_microbench.csv"
    _write_csv(
        p,
        ["model_id", "profile", "latency_ms", "dtype", "torch_compile"],
        [["m", "int8_eager", 10.0, "int8", "False"]],
    )
    with pytest.raises(ValueError):
        ref_summ.summarize_hf_microbench(p)
    with pytest.raises(ValueError):
        my_summ.summarize_hf_microbench(p)


def test_cross_hardware_parity_modulo_header(tmp_path):
    payloads = []
    for i, (gpu, base, blurr) in enumerate(
        [("H100_80GB", 17.1, 11.2), ("v5e_lite", 120.0, 11.84)]
    ):
        p = tmp_path / f"pi0_{i}.json"
        p.write_text(json.dumps({
            "gpu": gpu,
            "rows": [
                {"preset": "baseline", "latency_ms": base},
                {"preset": "blurr", "latency_ms": blurr},
            ],
        }))
        payloads.append(p)
    ref_out = ref_summ.summarize_cross_hardware(payloads)
    my_out = my_summ.summarize_cross_hardware(payloads)
    assert my_out == ref_out.replace("GPU &", "Hardware &")


def test_results_dir_mode_parity(results_dir, capsys, monkeypatch):
    """The reference's --results-dir auto-discovery CLI, end to end: every
    table in the same order, joined by blank lines (modulo the two declared
    terminology divergences)."""
    argv = ["summarize_results.py", "--results-dir", str(results_dir)]
    monkeypatch.setattr(sys, "argv", argv)
    ref_summ.main()
    ref_out = capsys.readouterr().out
    my_summ.main()
    my_out = capsys.readouterr().out
    assert my_out == ref_out.replace("VRAM", "HBM")


# ---------------------------------------------------------------------------
# paper/pi0_microbench.py preset semantics (reference :331-349)
# ---------------------------------------------------------------------------


def test_pi0_microbench_preset_table_differential():
    ref_mb = load_reference_script("paper/pi0_microbench")
    from blurr_tpu.benchmarks import preset_toggles

    for name in ["baseline", "vanilla", "blurr", "step1", "blurr_step1",
                 "  BLURR  "]:
        assert preset_toggles(name) == ref_mb._preset(name), name
    with pytest.raises(ValueError):
        ref_mb._preset("nope")
    with pytest.raises(ValueError):
        preset_toggles("nope")
