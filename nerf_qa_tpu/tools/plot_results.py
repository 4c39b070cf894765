"""Results analysis: correlation tables, bootstrap distributions, plots.

Reference behavior: the plot_results*.py family (10 scripts, SURVEY §2
#28) — merge results CSVs with IQA metric score CSVs; per-subset
(synthetic/real/all) |correlation| tables
(plot_results_test2_bt500.py:93-127); bootstrap resampling of
per-participant MOS (2000 samples) into violin plots of correlation
distributions (plot_results_test2_bootstrap2.py:123-156); LaTeX tables
with gold/silver/bronze highlighting (plot_results_bootstrapping.py:
287-316); scatter + logistic/linear regression figures
(plot_results_test2_bt500.py:145-241).

All matplotlib (plotly is unavailable here); figures are optional —
tables/CSVs always produced.
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

from nerf_qa_tpu.eval.correlations import (
    REAL_SCENE_IDS,
    SYNTH_SCENE_IDS,
    compute_correlations,
)


def subset_correlation_table(
    df: pd.DataFrame,
    metric_cols: list[str],
    target_col: str = "MOS",
    scene_col: str = "scene",
) -> pd.DataFrame:
    """|PLCC|/|SRCC|/|KTCC| per metric for synthetic / real / combined
    subsets (plot_results_test2_bt500.py:93-127)."""
    rows = []
    subsets = {
        "synthetic": df[df[scene_col].isin(SYNTH_SCENE_IDS)],
        "real": df[df[scene_col].isin(REAL_SCENE_IDS)],
        "combined": df,
    }
    for metric in metric_cols:
        row = {"metric": metric}
        for name, sub in subsets.items():
            if len(sub) > 1 and metric in sub:
                corr = compute_correlations(sub[metric].values,
                                            sub[target_col].values)
                for k, v in corr.items():
                    row[f"{name}_{k}"] = abs(v)
        rows.append(row)
    return pd.DataFrame(rows).set_index("metric")


def bootstrap_correlations(
    pred: np.ndarray,
    participant_scores: np.ndarray,
    n_samples: int = 2000,
    seed: int = 0,
) -> pd.DataFrame:
    """Bootstrap-resample participants, recompute MOS, correlate
    (plot_results_test2_bootstrap2.py:123-156). participant_scores:
    (n_videos, n_participants)."""
    rng = np.random.default_rng(seed)
    n_videos, n_part = participant_scores.shape
    out = {"plcc": [], "srcc": [], "ktcc": []}
    for _ in range(n_samples):
        pick = rng.integers(0, n_part, n_part)
        mos = participant_scores[:, pick].mean(axis=1)
        corr = compute_correlations(pred, mos)
        for k in out:
            out[k].append(corr[k])
    return pd.DataFrame(out)


def latex_table(table: pd.DataFrame, medals: bool = True,
                higher_better: bool = True) -> str:
    """LaTeX correlation table with gold/silver/bronze cell highlighting
    (plot_results_bootstrapping.py:287-316)."""
    medal_colors = ["gold!30", "gray!30", "brown!30"]
    cols = list(table.columns)
    lines = [
        "\\begin{tabular}{l" + "c" * len(cols) + "}",
        "\\toprule",
        "Metric & " + " & ".join(c.replace("_", "\\_") for c in cols) + " \\\\",
        "\\midrule",
    ]
    ranks = {}
    if medals:
        for c in cols:
            order = table[c].rank(ascending=not higher_better, method="min")
            ranks[c] = order
    for metric, row in table.iterrows():
        cells = []
        for c in cols:
            v = row[c]
            cell = f"{v:.4f}" if pd.notna(v) else "--"
            if medals and pd.notna(v):
                r = int(ranks[c].loc[metric])
                if r <= 3:
                    cell = f"\\cellcolor{{{medal_colors[r - 1]}}}{cell}"
            cells.append(cell)
        name = str(metric).replace("_", "\\_")
        lines.append(f"{name} & " + " & ".join(cells) + " \\\\")
    lines += ["\\bottomrule", "\\end{tabular}"]
    return "\n".join(lines)


def scatter_regression_figure(df, pred_col, target_col, scene_col, out_path,
                              regression: str = "logistic"):
    """Per-scene colored scatter with a fitted regression curve
    (plot_results_test2_bt500.py:145-241 / vis.py:15-64)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from scipy.optimize import curve_fit

    fig, ax = plt.subplots(figsize=(4.8, 3.6))
    for i, (scene, group) in enumerate(df.groupby(scene_col)):
        ax.scatter(group[pred_col], group[target_col], s=14,
                   label=str(scene), alpha=0.8)
    x = df[pred_col].values.astype(float)
    y = df[target_col].values.astype(float)
    xs = np.linspace(x.min(), x.max(), 200)
    try:
        if regression == "logistic":
            def f(x, b1, b2, b3, b4):
                return (b1 - b2) / (1 + np.exp((x - b3) / np.abs(b4))) + b2

            p0 = [y.max(), y.min(), np.median(x), max(np.std(x), 1e-3)]
            params, _ = curve_fit(f, x, y, p0=p0, maxfev=20000)
            ax.plot(xs, f(xs, *params), "k--", lw=1)
        else:
            coef = np.polyfit(x, y, 1)
            ax.plot(xs, np.polyval(coef, xs), "k--", lw=1)
    except Exception:
        pass
    ax.set_xlabel(pred_col)
    ax.set_ylabel(target_col)
    ax.legend(fontsize=5, ncol=2)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def violin_figure(samples: dict[str, pd.DataFrame], metric: str, out_path):
    """Violin plot of bootstrap correlation distributions per method
    (plot_results_bootstrapping.py:174-262)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(max(4, len(samples)), 3.2))
    names = list(samples)
    data = [np.abs(samples[n][metric].values) for n in names]
    ax.violinplot(data, showmedians=True)
    ax.set_xticks(range(1, len(names) + 1))
    ax.set_xticklabels(names, rotation=45, ha="right", fontsize=7)
    ax.set_ylabel(f"|{metric.upper()}|")
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def main(argv=None):
    p = argparse.ArgumentParser(description="Results analysis and plots")
    p.add_argument("--results-csv", required=True,
                   help="per-video results (video_id, pred_score, mos, ...)")
    p.add_argument("--scores-csv", default=None,
                   help="optional per-video IQA metric columns to merge")
    p.add_argument("--scene-col", default="scene")
    p.add_argument("--target-col", default="MOS")
    p.add_argument("--metric-cols", nargs="*", default=None)
    p.add_argument("--output-dir", default="./analysis")
    p.add_argument("--figures", action="store_true")
    args = p.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    df = pd.read_csv(args.results_csv)
    if args.scores_csv:
        extra = pd.read_csv(args.scores_csv)
        key = "video_id" if "video_id" in df and "video_id" in extra else None
        df = df.merge(extra, on=key) if key else pd.concat([df, extra], axis=1)
    metric_cols = args.metric_cols or [
        c for c in df.columns
        if c not in (args.scene_col, args.target_col, "video_id")
        and np.issubdtype(df[c].dtype, np.number)
    ]
    table = subset_correlation_table(df, metric_cols, args.target_col,
                                     args.scene_col)
    table.to_csv(os.path.join(args.output_dir, "correlations.csv"))
    with open(os.path.join(args.output_dir, "results_table.tex"), "w") as f:
        f.write(latex_table(table))
    print(table.round(4).to_string())
    if args.figures:
        for col in metric_cols:
            scatter_regression_figure(
                df, col, args.target_col, args.scene_col,
                os.path.join(args.output_dir, f"scatter_{col}.pdf"),
            )
        print("figures in", args.output_dir)


if __name__ == "__main__":
    main()
