"""wandb glue under a stub module: the env has no wandb, so the only
external observability integration (wandb_sink, log_artifact — the
run_final.py:279-287 Artifact-upload equivalents) is exercised against a
fake ``wandb`` injected into sys.modules."""
import sys
import types

import numpy as np
import pytest

from nerf_qa_tpu.logging import metrics as M


class FakeArtifact:
    def __init__(self, name, type):
        self.name, self.type = name, type
        self.files, self.dirs = [], []

    def add_file(self, p):
        self.files.append(p)

    def add_dir(self, p):
        self.dirs.append(p)


@pytest.fixture
def fake_wandb(monkeypatch):
    mod = types.ModuleType("wandb")
    mod.logged = []
    mod.log = lambda logs, step=None: mod.logged.append((logs, step))
    mod.Artifact = FakeArtifact

    class Run:
        artifacts = []

        def log_artifact(self, a):
            Run.artifacts.append(a)

    mod.run = Run()
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod


def test_wandb_sink_logs_dict(fake_wandb):
    sink = M.wandb_sink()
    sink({"a": 1.0, "b": 2}, 7)
    assert fake_wandb.logged == [({"a": 1.0, "b": 2}, 7)]


def test_wandb_sink_through_logger(fake_wandb):
    """MetricCollectionLogger drives the sink end-to-end (logger.py
    wandb.log path)."""
    logger = M.MetricCollectionLogger("Test Metrics Dict",
                                      log_fn=M.wandb_sink())
    logger.add_entries(
        {"pred_score": np.array([3.0, 3.2]), "mos": np.array([3.1, 3.1])},
        video_ids=np.array([0, 0]), scene_ids=np.array(["s", "s"]),
    )
    logger.log_summary(step=1)
    assert fake_wandb.logged, "sink never called"
    logs, step = fake_wandb.logged[-1]
    assert step == 1 and isinstance(logs, dict)


def test_log_artifact_file(fake_wandb, tmp_path):
    p = tmp_path / "results.csv"
    p.write_text("a,b\n1,2\n")
    assert M.log_artifact(str(p), type="results") is True
    art = fake_wandb.run.artifacts[-1]
    assert art.type == "results" and art.files == [str(p)]
    assert art.name == "results-csv"


def test_log_artifact_dir(fake_wandb, tmp_path):
    d = tmp_path / "ckpt"
    d.mkdir()
    assert M.log_artifact(str(d), name="model_0", type="model") is True
    art = fake_wandb.run.artifacts[-1]
    assert art.name == "model_0" and art.dirs == [str(d)]


def test_log_artifact_no_active_run(fake_wandb, tmp_path):
    fake_wandb.run = None
    p = tmp_path / "x.csv"
    p.write_text("x\n")
    assert M.log_artifact(str(p)) is False


def test_log_artifact_without_wandb(monkeypatch, tmp_path):
    monkeypatch.setitem(sys.modules, "wandb", None)  # import -> ImportError
    p = tmp_path / "x.csv"
    p.write_text("x\n")
    assert M.log_artifact(str(p)) is False
