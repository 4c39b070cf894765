"""logging/figures: plotly-schema per-scene regression figures built
without the plotly package (logger.py:36-59,207 equivalent)."""
import json

import numpy as np

from nerf_qa_tpu.logging.figures import (
    per_scene_regression_figure,
    to_wandb,
    write_figure_json,
)
from nerf_qa_tpu.logging.metrics import MetricCollectionLogger


def _figure():
    x = {0: 0.1, 1: 0.2, 2: 0.3, 3: 0.5, 4: 0.6}
    y = {0: 4.8, 1: 4.1, 2: 3.3, 3: 2.0, 4: 1.4}
    scenes = {0: "lego", 1: "lego", 2: "lego", 3: "truck", 4: "truck"}
    return per_scene_regression_figure(x, y, scenes)


def test_figure_schema_and_trendlines():
    fig = _figure()
    assert set(fig) == {"data", "layout"}
    names = [t["name"] for t in fig["data"]]
    # one marker trace per scene + one OLS line per scene with >= 2 pts
    assert "lego" in names and "truck" in names
    assert "lego (fit)" in names and "truck (fit)" in names
    lego_fit = next(t for t in fig["data"] if t["name"] == "lego (fit)")
    # lego points are collinear on y = 5.55 - 7.5x (within lstsq noise)
    got = np.asarray(lego_fit["y"])
    want = 5.55 - 7.5 * np.asarray(lego_fit["x"])
    np.testing.assert_allclose(got, want, atol=0.2)
    # the whole figure is pure JSON
    json.dumps(fig)


def test_single_point_scene_has_no_fit():
    fig = per_scene_regression_figure({0: 0.1}, {0: 4.0}, {0: "solo"})
    names = [t["name"] for t in fig["data"]]
    assert names == ["solo"]


def test_write_and_wandb_fallback(tmp_path):
    fig = _figure()
    path = write_figure_json(fig, str(tmp_path / "fig.plotly.json"))
    with open(path) as f:
        assert json.load(f) == fig
    # plotly absent in this environment -> graceful None
    assert to_wandb(fig) is None


def test_logger_per_scene_figure():
    log = MetricCollectionLogger("Test Metrics Dict")
    log.add_entries({"pred_score": np.array([0.1, 0.2]),
                     "mos": np.array([4.0, 3.0])},
                    video_ids=np.array([0, 1]),
                    scene_ids=np.array(["lego", "lego"]))
    log.add_entries({"pred_score": np.array([0.4]),
                     "mos": np.array([2.0])},
                    video_ids=np.array([2]), scene_ids=np.array(["truck"]))
    fig = log.per_scene_figure()
    scenes = {t["name"] for t in fig["data"]}
    assert {"lego", "truck", "lego (fit)"} <= scenes
    json.dumps(fig)
