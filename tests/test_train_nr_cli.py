"""tools/train_nr CLI on a synthetic NR tree: train, checkpoint,
--init-from (incl. the imported fine-tuned alpha/beta branch)."""
import os

import numpy as np
import pytest

from nerf_qa_tpu.compat.checkpoint import restore_checkpoint, save_checkpoint
from nerf_qa_tpu.tools.make_synthetic_dataset import make_nr_tree
from nerf_qa_tpu.tools.train_nr import main as train_nr_main

ARCH = [
    "--vit-depth", "1", "--refine-up-depth", "1",
    "--transformer-decoder-depth", "0", "--dropout-rate", "0.0",
    "--render-size", "64", "--sem-size", "56",
    "--compute-dtype", "float32", "--decoder-dtype", "float32",
    "--batch-size", "2", "--num-workers", "0", "--epochs", "1",
    "--test-every", "100",
]


@pytest.fixture(scope="module")
def nr_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nr"))
    csv = make_nr_tree(root, scenes=("chair", "drums"),
                       methods=("nerfacto",), frames=2, hw=(64, 64))
    return root, csv


@pytest.mark.slow
def test_train_and_checkpoint(nr_tree, tmp_path):
    root, csv = nr_tree
    out = str(tmp_path / "run1")
    train_nr_main(["--data-dir", root, "--scores-csv", csv,
                   "--output-dir", out, "--checkpoint-every", "1", *ARCH])
    restored = restore_checkpoint(os.path.join(out, "ckpt"))
    assert restored is not None
    epoch, ckpt = restored
    assert epoch == 1 and "params" in ckpt and "opt_state" in ckpt


@pytest.mark.slow
def test_init_from_with_finetuned_alpha_beta(nr_tree, tmp_path, capsys):
    """--init-from seeds decoder params (fresh optimizer) and applies a
    checkpoint's imported dists_alpha_beta (compat/torch_nr output)."""
    root, csv = nr_tree
    out1 = str(tmp_path / "run1")
    train_nr_main(["--data-dir", root, "--scores-csv", csv,
                   "--output-dir", out1, "--checkpoint-every", "1", *ARCH])
    _, ckpt = restore_checkpoint(os.path.join(out1, "ckpt"))

    rng = np.random.default_rng(1)
    seed_dir = str(tmp_path / "seed")
    save_checkpoint(seed_dir, 0, {
        "params": ckpt["params"], "state": ckpt.get("state") or {},
        "dists_alpha_beta": {
            "alpha": rng.random(1475).astype(np.float32),
            "beta": rng.random(1475).astype(np.float32),
        },
    })

    out2 = str(tmp_path / "run2")
    train_nr_main(["--data-dir", root, "--scores-csv", csv,
                   "--output-dir", out2, "--init-from", seed_dir, *ARCH])
    text = capsys.readouterr().out
    assert "fine-tuned DISTS alpha/beta" in text
    assert "initialized decoder params" in text
