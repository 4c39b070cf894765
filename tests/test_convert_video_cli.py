"""convert_video CLI end-to-end + init_sweep no-wandb fallback."""
import os

import numpy as np
import pytest
from PIL import Image

from nerf_qa_tpu.data import native
from nerf_qa_tpu.tools.convert_video import main as convert_main


@pytest.fixture()
def frame_dir(tmp_path):
    d = tmp_path / "frames"
    d.mkdir()
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32) / 64.0
    base = np.stack([yy * 0.8, xx * 0.8, (yy + xx) * 0.4], axis=-1)
    for i in range(3):  # smooth frames: JPEG round-trip stays tight
        img = np.clip(base + 0.02 * i, 0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            d / f"{i:03d}.png")
    return str(d)


def test_extract_frame_trees(frame_dir, tmp_path, capsys):
    out = str(tmp_path / "out")
    convert_main(["--video", frame_dir, "--out-dir", out,
                  "--sizes", "32", "--check"])
    text = capsys.readouterr().out
    assert "round-trip PSNR" in text
    # trees live under <out>/<video-name>/ (conver_video2.py:39-58)
    orig = os.path.join(out, "frames", "original_size")
    assert sorted(os.listdir(orig)) == ["000.png", "001.png", "002.png"]
    sq = os.path.join(out, "frames", "32x32")
    assert Image.open(os.path.join(sq, "000.png")).size == (32, 32)


@pytest.mark.skipif(not native.available(),
                    reason="native decoder not built")
def test_to_mp4_roundtrip(frame_dir, tmp_path):
    from nerf_qa_tpu.data.video import load_video_frames

    mp4 = str(tmp_path / "clip.mp4")
    convert_main(["--video", frame_dir, "--to-mp4", mp4, "--quality", "95"])
    assert os.path.getsize(mp4) > 0
    back = load_video_frames(mp4, resize=False)
    orig = load_video_frames(frame_dir, resize=False)
    assert back.shape == orig.shape
    assert np.abs(back - orig).mean() < 0.03  # JPEG-lossy roundtrip


def test_init_sweep_without_wandb(tmp_path, capsys):
    from nerf_qa_tpu.tools.init_sweep import init_sweep

    cfg = tmp_path / "sweep.yaml"
    cfg.write_text(
        "method: random\n"
        "parameters:\n  lr:\n    min: 0.0001\n    max: 0.001\n"
    )
    assert init_sweep(str(cfg)) is None  # wandb absent in this env
    assert "local driver" in capsys.readouterr().err
