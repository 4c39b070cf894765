"""tools/score CLI: image pairs, frame dirs, and MJPEG mp4s end-to-end
(the unified rebuild of DISTS_pt.py:220-238 / ADISTS.py:206-224 /
run_test2.py:278-297)."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from nerf_qa_tpu.data.video import write_mjpeg_mp4
from nerf_qa_tpu.tools.score import main as score_main


def _gradient(h=64, w=64, shift=0.0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([yy / h, xx / w, (yy + xx) / (h + w)], axis=-1)
    return np.clip(img * 0.8 + shift, 0, 1)


@pytest.fixture(scope="module")
def pair_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("score")
    ref_dir, dist_dir = root / "ref", root / "dist"
    ref_dir.mkdir()
    dist_dir.mkdir()
    for i in range(3):
        ref = _gradient(shift=0.01 * i)
        dist = np.clip(ref + 0.1, 0, 1)
        Image.fromarray((ref * 255).astype(np.uint8)).save(
            ref_dir / f"{i:03d}.png")
        Image.fromarray((dist * 255).astype(np.uint8)).save(
            dist_dir / f"{i:03d}.png")
    return str(ref_dir), str(dist_dir)


def test_image_pair(pair_dirs, capsys):
    ref_dir, dist_dir = pair_dirs
    rc = score_main(["--ref", os.path.join(ref_dir, "000.png"),
                     "--dist", os.path.join(dist_dir, "000.png"),
                     "--fp32", "--json"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert 0.0 < out["dists"]["video_score"] < 1.0
    assert out["dists"]["frames"] == 1


def test_frame_dirs_both_metrics_csv(pair_dirs, tmp_path, capsys):
    ref_dir, dist_dir = pair_dirs
    csv = str(tmp_path / "scores.csv")
    rc = score_main(["--ref", ref_dir, "--dist", dist_dir,
                     "--metric", "both", "--fp32", "--batch-size", "2",
                     "--out-csv", csv, "--json"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["dists"]["frames"] == 3
    assert 0.0 < out["adists"]["video_score"] < 1.0
    lines = open(csv).read().strip().splitlines()
    assert lines[0] == "frame,dists,adists"
    assert len(lines) == 4


def test_identical_pair_scores_zero(pair_dirs, capsys):
    ref_dir, _ = pair_dirs
    rc = score_main(["--ref", ref_dir, "--dist", ref_dir, "--fp32",
                     "--json"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert abs(out["dists"]["video_score"]) < 1e-5


def test_mp4_input(tmp_path, capsys):
    from nerf_qa_tpu.data import native

    if not native.available():
        pytest.skip("native decoder not built")
    frames = np.stack([_gradient(shift=0.01 * i) for i in range(2)])
    ref_mp4 = str(tmp_path / "ref.mp4")
    dist_mp4 = str(tmp_path / "dist.mp4")
    write_mjpeg_mp4(ref_mp4, frames, quality=95)
    write_mjpeg_mp4(dist_mp4, np.clip(frames + 0.1, 0, 1), quality=95)
    rc = score_main(["--ref", ref_mp4, "--dist", dist_mp4, "--fp32",
                     "--json"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["dists"]["frames"] == 2
    assert out["dists"]["video_score"] > 0.0


@pytest.mark.slow
def test_nr_mode(pair_dirs, tmp_path, capsys):
    """--nr scores renders without references through a checkpointed NR
    model (train-nr.py:305-315 video semantics)."""
    import jax

    from nerf_qa_tpu.compat.checkpoint import save_checkpoint
    from nerf_qa_tpu.config import DISTSConfig, NRModelConfig
    from nerf_qa_tpu.core.vgg import init_vgg16_params
    from nerf_qa_tpu.models.nr.model import NRModel
    from nerf_qa_tpu.models.nr.vit import ViTS14

    cfg = NRModelConfig(version=8, refine_up_depth=1,
                        transformer_decoder_depth=0,
                        dists=DISTSConfig(compute_dtype="float32"))
    model = NRModel(init_vgg16_params(seed=0), cfg=cfg, vit=ViTS14(depth=1))
    params, state = model.init(seed=0)
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, 1, {"params": params, "state": state})

    _, dist_dir = pair_dirs
    csv = str(tmp_path / "nr.csv")
    rc = score_main([
        "--dist", dist_dir, "--nr", "--nr-ckpt", ckpt_dir,
        "--nr-version", "8", "--refine-up-depth", "1",
        "--transformer-decoder-depth", "0", "--vit-depth", "1",
        "--fp32", "--batch-size", "3", "--out-csv", csv, "--json",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["nr"]["frames"] == 3
    assert np.isfinite(out["nr"]["video_score"])
    lines = open(csv).read().strip().splitlines()
    assert lines[0] == "frame,nr_score"
    assert len(lines) == 4


def test_shape_mismatch_errors(pair_dirs, tmp_path):
    ref_dir, _ = pair_dirs
    other = tmp_path / "other"
    other.mkdir()
    Image.fromarray(
        (_gradient(h=32, w=32) * 255).astype(np.uint8)
    ).save(other / "000.png")
    with pytest.raises(SystemExit):
        score_main(["--ref", ref_dir, "--dist", str(other), "--fp32"])


@pytest.mark.slow
def test_nr_scorer_uses_finetuned_alpha_beta(pair_dirs, tmp_path):
    """A checkpoint carrying dists_alpha_beta (the torch importer's
    output) changes the NR scores — the fine-tuned weights are applied,
    not the bundled ones."""
    import argparse

    import jax  # noqa: F401

    from nerf_qa_tpu.compat.checkpoint import save_checkpoint
    from nerf_qa_tpu.config import DISTSConfig, NRModelConfig
    from nerf_qa_tpu.core.vgg import init_vgg16_params
    from nerf_qa_tpu.data.video import load_video_frames
    from nerf_qa_tpu.models.nr.model import NRModel
    from nerf_qa_tpu.models.nr.vit import ViTS14
    from nerf_qa_tpu.tools.score import NRScorer

    cfg = NRModelConfig(version=8, refine_up_depth=1,
                        transformer_decoder_depth=0,
                        dists=DISTSConfig(compute_dtype="float32"))
    vgg = init_vgg16_params(seed=0)
    model = NRModel(vgg, cfg=cfg, vit=ViTS14(depth=1))
    params, state = model.init(seed=0)

    base = {"params": params, "state": state}
    rng = np.random.default_rng(6)
    tuned = dict(base, dists_alpha_beta={
        "alpha": rng.random(1475).astype(np.float32),
        "beta": rng.random(1475).astype(np.float32),
    })
    d_plain, d_tuned = str(tmp_path / "a"), str(tmp_path / "b")
    save_checkpoint(d_plain, 1, base)
    save_checkpoint(d_tuned, 1, tuned)

    def args_for(ckpt):
        return argparse.Namespace(
            nr_ckpt=ckpt, nr_version=8, refine_up_depth=1,
            transformer_decoder_depth=0, vit_depth=1, fp32=True,
            batch_size=3, vit_ckpt=None, jbu_ckpt=None,
        )

    _, dist_dir = pair_dirs
    frames = load_video_frames(dist_dir, resize=False)
    s_plain = NRScorer(args_for(d_plain), vgg).score_frames(frames)
    s_tuned = NRScorer(args_for(d_tuned), vgg).score_frames(frames)
    assert np.isfinite(s_plain).all() and np.isfinite(s_tuned).all()
    assert np.abs(s_plain - s_tuned).max() > 1e-4
