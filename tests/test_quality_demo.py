"""tools/quality_demo smoke: the FR quality-recovery certificate runs the
real driver stack on a synthetic dataset and reports CV correlations."""
import json

import numpy as np

from nerf_qa_tpu.tools.quality_demo import main as qdemo_main


def test_fr_quality_demo_smoke(tmp_path, capsys):
    qdemo_main([
        "--kind", "fr", "--out", str(tmp_path / "q"),
        "--epochs", "1", "--folds", "2", "--scenes", "4", "--methods", "2",
        "--frames", "2", "--batch-size", "4",
    ])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(out)
    assert res["n_videos"] == 8
    for k in ("cv_plcc", "cv_srcc", "cv_ktcc"):
        assert np.isfinite(res[k]), res
