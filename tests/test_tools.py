"""Tools: analysis tables/plots, sweep driver, retrieval, checkpointing."""
import json
import os

import numpy as np
import pandas as pd
import pytest

from nerf_qa_tpu.compat.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from nerf_qa_tpu.eval import retrieval
from nerf_qa_tpu.core.vgg import init_vgg16_params
from nerf_qa_tpu.tools.plot_results import (
    bootstrap_correlations,
    latex_table,
    subset_correlation_table,
)
from nerf_qa_tpu.tools.sweep import (
    grid_parameters,
    load_yaml,
    read_objective,
    run_sweep,
    sample_parameters,
)


def _results_df():
    rng = np.random.default_rng(0)
    scenes = ["lego", "ship", "train", "m60"]
    rows = []
    for s in scenes:
        for i in range(4):
            mos = rng.uniform(1, 5)
            rows.append({
                "scene": s, "MOS": mos,
                "ours": -mos + rng.normal(0, 0.1),
                "psnr": mos * 2 + rng.normal(0, 1.5),
            })
    return pd.DataFrame(rows)


def test_subset_correlation_table():
    df = _results_df()
    table = subset_correlation_table(df, ["ours", "psnr"])
    assert set(table.index) == {"ours", "psnr"}
    assert table.loc["ours", "combined_plcc"] > 0.9  # |corr|
    assert {"synthetic_plcc", "real_plcc", "combined_srcc"} <= set(table.columns)


def test_latex_table_medals():
    df = _results_df()
    table = subset_correlation_table(df, ["ours", "psnr"])
    tex = latex_table(table)
    assert "\\cellcolor{gold!30}" in tex
    assert "\\begin{tabular}" in tex and "\\bottomrule" in tex


def test_bootstrap_correlations_shape():
    rng = np.random.default_rng(1)
    pred = rng.uniform(0, 1, 10)
    participants = pred[:, None] * 5 + rng.normal(0, 0.3, (10, 7))
    boot = bootstrap_correlations(pred, participants, n_samples=50)
    assert len(boot) == 50
    assert boot["plcc"].mean() > 0.8


def test_sweep_yaml_parse_reference_schema(tmp_path):
    cfg_text = """program: run.py
metric:
  name: Test Metrics Dict/combined_score
  goal: maximize
method: random
parameters:
  lr:
    distribution: q_log_uniform_values
    min: 1e-7
    max: 1e-3
    q: 1e-8
  mode:
    value: 'logistic'
  depth:
    values: [1, 2, 3]
"""
    path = tmp_path / "sweep.yaml"
    path.write_text(cfg_text)
    cfg = load_yaml(str(path))
    assert cfg["method"] == "random"
    assert cfg["metric"]["name"] == "Test Metrics Dict/combined_score"
    params = cfg["parameters"]
    assert params["mode"]["value"] == "logistic"
    assert params["depth"]["values"] == [1, 2, 3]
    rng = np.random.default_rng(0)
    for _ in range(5):
        draw = sample_parameters(params, rng)
        assert 1e-7 <= draw["lr"] <= 1e-3 + 1e-8
        assert draw["mode"] == "logistic"
        assert draw["depth"] in (1, 2, 3)


def test_bundled_sweep_configs_parse():
    base = os.path.join(os.path.dirname(retrieval.__file__), "..", "configs")
    for name in ("sweep-fr-logistic.yaml", "sweep-nr.yaml"):
        cfg = load_yaml(os.path.join(base, name))
        assert "parameters" in cfg and "metric" in cfg


def test_grid_parameters():
    params = {"a": {"values": [1, 2]}, "b": {"value": "x"}}
    combos = list(grid_parameters(params))
    assert combos == [{"a": 1, "b": "x"}, {"a": 2, "b": "x"}]


def test_run_sweep_and_objective(tmp_path):
    cfg = {
        "method": "grid",
        "metric": {"name": "obj", "goal": "maximize"},
        "parameters": {"x": {"values": [1.0, 3.0, 2.0]}},
    }

    def trial(params, trial_dir):
        with open(os.path.join(trial_dir, "metrics.jsonl"), "w") as f:
            f.write(json.dumps({"step": 0, "obj": params["x"] ** 2}) + "\n")
        return read_objective(os.path.join(trial_dir, "metrics.jsonl"), "obj")

    hist = run_sweep(cfg, trial, max_trials=3, output_dir=str(tmp_path / "s"))
    assert [h["objective"] for h in hist] == [1.0, 9.0, 4.0]
    assert os.path.exists(tmp_path / "s" / "history.jsonl")


def test_checkpoint_roundtrip(tmp_path):
    state = {"params": {"w": np.arange(4.0)}, "step_count": np.int32(7)}
    save_checkpoint(str(tmp_path), 3, state)
    save_checkpoint(str(tmp_path), 10, state)
    assert latest_step(str(tmp_path)) == 10
    step, restored = restore_checkpoint(str(tmp_path))
    assert step == 10
    np.testing.assert_array_equal(restored["params"]["w"], np.arange(4.0))
    # overwrite same step must not raise
    save_checkpoint(str(tmp_path), 10, state)


def test_retrieval_finds_self():
    import jax.numpy as jnp

    vgg = init_vgg16_params(seed=0)
    rng = np.random.default_rng(2)
    corpus = rng.random((6, 32, 32, 3)).astype(np.float32)
    ir = retrieval.ImageRetrieval(vgg, compute_dtype=jnp.float32)
    ir.build_index(corpus, batch_size=3)
    queries = np.clip(corpus[:3] + rng.normal(0, 0.01, (3, 32, 32, 3)), 0, 1)
    top, sims = ir.retrieve(queries.astype(np.float32), k=2)
    assert list(top[:, 0]) == [0, 1, 2]
    assert (sims[:, 0] > 0.99).all()


def test_masked_dists_ignores_uncertain_regions():
    import jax.numpy as jnp

    from nerf_qa_tpu.config import DISTSConfig
    from nerf_qa_tpu.core import dists as d

    vgg = init_vgg16_params(seed=0)
    w = d.load_pretrained_weights()
    rng = np.random.default_rng(3)
    render = rng.random((1, 64, 64, 3)).astype(np.float32)
    ref = render.copy()
    ref[:, 32:] = rng.random((1, 32, 64, 3))  # bottom half corrupted
    cert_full = np.ones((1, 64, 64), np.float32)
    cert_top = np.zeros((1, 64, 64), np.float32)
    cert_top[:, :32] = 1.0
    cfg = DISTSConfig()
    s_full = float(retrieval.masked_dists_score(
        vgg, w, jnp.asarray(render), jnp.asarray(ref), jnp.asarray(cert_full),
        cfg)[0])
    s_masked = float(retrieval.masked_dists_score(
        vgg, w, jnp.asarray(render), jnp.asarray(ref), jnp.asarray(cert_top),
        cfg)[0])
    assert s_masked < s_full  # masking out the corrupted half lowers distance
    assert s_masked < 0.02


def test_warp_identity():
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.random((1, 8, 10, 3)).astype(np.float32))
    yy, xx = np.mgrid[0:8, 0:10].astype(np.float32)
    grid = jnp.asarray(np.stack([yy, xx], -1)[None])
    out = retrieval.warp_image(img, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def _textured(rng, h, w):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([
        0.5 + 0.4 * np.sin(xx / 3.1) * np.cos(yy / 4.7),
        (xx * yy) % 13 / 13.0,
        rng.random((h, w)),
    ], axis=-1)
    return np.clip(img, 0, 1).astype(np.float32)


def test_estimate_warp_recovers_translation():
    """The native dense matcher (estimate_warp) recovers a known integer
    shift between render and reference in the interior — the capability
    the reference's dead RoMa import was for (image_retrieval.py:94-96)."""
    import jax.numpy as jnp

    vgg = init_vgg16_params(seed=0)
    rng = np.random.default_rng(5)
    render = _textured(rng, 64, 64)[None]
    dy, dx = 8, 4
    reference = np.roll(render, (dy, dx), axis=(1, 2))
    grid, cert = retrieval.estimate_warp(
        vgg, jnp.asarray(render), jnp.asarray(reference),
        compute_dtype=jnp.float32,
    )
    grid = np.asarray(grid)
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    want = np.stack([yy + dy, xx + dx], -1)  # roll: src = dst + shift
    interior = (slice(None), slice(16, 48), slice(16, 48))
    err = np.abs(grid[interior] - want[None][interior])
    assert err.mean() < 2.0, err.mean()
    assert np.asarray(cert)[interior].mean() > 0.5


def test_pseudo_fr_score_end_to_end():
    """pseudo_fr_score (estimate -> warp -> masked DISTS) scores a
    crop-misaligned identical pair meaningfully closer than naive DISTS.
    The coarse matcher is ~0.5px accurate; the residual distance is
    bilinear-warp blur on high-frequency texture (sub-pixel iterative
    refinement — RoMa's contribution — is explicitly out of scope), so
    the asserted margin is the honest coarse-matcher one."""
    import jax.numpy as jnp

    from nerf_qa_tpu.config import DISTSConfig
    from nerf_qa_tpu.core import dists as d

    vgg = init_vgg16_params(seed=0)
    w = d.load_pretrained_weights()
    rng = np.random.default_rng(6)
    base = _textured(rng, 80, 80)
    render = base[8:72, 4:68][None]  # same content, (8, 4) misaligned
    reference = base[0:64, 0:64][None]
    cfg = DISTSConfig()
    naive = float(d.forward(vgg, w, jnp.asarray(render),
                            jnp.asarray(reference), cfg)[0])
    pseudo = float(retrieval.pseudo_fr_score(
        vgg, w, jnp.asarray(render), jnp.asarray(reference), cfg)[0])
    assert pseudo < naive * 0.8, (pseudo, naive)
    # the machinery itself is near-exact: the ground-truth grid scores ~0
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    gt_grid = jnp.asarray(np.stack([yy + 8, xx + 4], -1)[None])
    valid = ((yy + 8 <= 63) & (xx + 4 <= 63)).astype(np.float32)[None]
    warped = retrieval.warp_image(jnp.asarray(reference), gt_grid)
    s_gt = float(retrieval.masked_dists_score(
        vgg, w, jnp.asarray(render), warped, jnp.asarray(valid), cfg)[0])
    assert s_gt < 0.01, s_gt


def test_bayes_sweep_beats_random_on_quadratic(tmp_path):
    """GP/EI sampler (method: bayes) concentrates trials near the optimum
    of a smooth objective — mean of the last trials must beat random's."""
    from nerf_qa_tpu.tools.sweep import BayesSampler, sample_parameters

    params = {
        "lr": {"min": 0.0, "max": 1.0},
        "gamma": {"min": 0.0, "max": 1.0, "distribution": "uniform"},
    }

    def objective(t):
        return -((t["lr"] - 0.3) ** 2 + (t["gamma"] - 0.7) ** 2)

    rng = np.random.default_rng(0)
    sampler = BayesSampler(params, rng, maximize=True, n_seed=4)
    bayes_vals = []
    for _ in range(20):
        t = sampler.propose()
        v = objective(t)
        sampler.observe(t, v)
        bayes_vals.append(v)

    rng2 = np.random.default_rng(0)
    random_vals = [objective(sample_parameters(params, rng2))
                   for _ in range(20)]
    assert np.mean(bayes_vals[8:]) > np.mean(random_vals[8:])
    assert max(bayes_vals) > -0.01  # found the neighborhood of (0.3, 0.7)


def test_run_sweep_bayes_method(tmp_path):
    from nerf_qa_tpu.tools.sweep import run_sweep

    cfg = {
        "method": "bayes",
        "metric": {"name": "obj", "goal": "minimize"},
        "parameters": {"x": {"min": -1.0, "max": 1.0}},
    }
    hist = run_sweep(cfg, lambda p, d: (p["x"] - 0.5) ** 2,
                     max_trials=12, output_dir=str(tmp_path / "b"))
    best = min(h["objective"] for h in hist)
    assert best < 0.05  # GP homed in on x=0.5


def test_hyperband_successive_halving(tmp_path):
    """early_terminate: hyperband runs rungs with growing epoch budgets
    and promotes the top 1/eta configs."""
    from nerf_qa_tpu.tools.sweep import run_sweep

    cfg = {
        "method": "random",
        "metric": {"name": "obj", "goal": "maximize"},
        "parameters": {"x": {"min": 0.0, "max": 1.0}},
        "early_terminate": {"type": "hyperband", "min_iter": 1,
                            "max_iter": 9},
    }
    calls = []

    def trial(p, d):
        calls.append(p["epochs"])
        return p["x"] * p["epochs"]  # larger budget -> larger objective

    hist = run_sweep(cfg, trial, max_trials=9, output_dir=str(tmp_path / "h"))
    rungs = sorted({h["rung"] for h in hist})
    assert rungs == [0, 1, 2]
    assert sorted(set(calls)) == [1, 3, 9]
    # rung sizes shrink 9 -> 3 -> 1
    assert [sum(1 for h in hist if h["rung"] == r) for r in rungs] == [9, 3, 1]


def test_benchtime_bench_op():
    """bench_op returns a sane positive per-iteration time and runs the
    op the requested number of times (scalar feedback keeps iterations
    chained)."""
    import jax.numpy as jnp

    from nerf_qa_tpu.utils.benchtime import bench_op

    x = jnp.ones((4, 8, 8, 3), jnp.float32)
    dt = bench_op(lambda v: (v * 2.0).sum(), x, iters=3)
    assert dt > 0.0
