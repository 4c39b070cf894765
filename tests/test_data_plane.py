"""Data plane: datasets on synthetic frame trees, samplers, loader,
imaging ops."""
import os

import numpy as np
import pandas as pd
import pytest
import torch
import torch.nn.functional as F
from PIL import Image

from nerf_qa_tpu.data.datasets import (
    FrameIndexed,
    NerfNRQADataset,
    Test2Dataset,
)
from nerf_qa_tpu.data.imaging import (
    load_image_rgb,
    paired_random_crop,
    prepare_image,
    resize_image,
)
from nerf_qa_tpu.data.pipeline import DataLoader, recursive_collate
from nerf_qa_tpu.data.samplers import (
    ComputeBatchSampler,
    SceneBalancedSampler,
    host_shard,
)
from nerf_qa_tpu.data.video import iter_video_batches, load_video_frames


def _write_png(path, hw=(32, 40), rgba=False, seed=0):
    rng = np.random.default_rng(seed)
    c = 4 if rgba else 3
    arr = rng.integers(0, 256, (*hw, c), dtype=np.uint8)
    Image.fromarray(arr, "RGBA" if rgba else "RGB").save(path)
    return arr


@pytest.fixture()
def test2_tree(tmp_path):
    """Synthetic Test2 layout: Reference/<ref>/*.png, Renders/<dist>/*.png."""
    rows = []
    for v, (scene, n_frames) in enumerate([("lego", 3), ("truck", 2)]):
        ref_dir = tmp_path / "Reference" / f"{scene}_ref"
        dist_dir = tmp_path / "Renders" / f"{scene}_dist"
        ref_dir.mkdir(parents=True)
        dist_dir.mkdir(parents=True)
        for f in range(n_frames):
            _write_png(ref_dir / f"{f:03d}.png", seed=v * 10 + f)
            _write_png(dist_dir / f"{f:03d}.png", seed=100 + v * 10 + f)
        rows.append({
            "distorted_folder": f"{scene}_dist",
            "reference_folder": f"{scene}_ref",
            "frame_count": n_frames,
            "MOS": 3.0 + v,
        })
    return str(tmp_path), pd.DataFrame(rows)


def test_frame_indexing():
    fi = FrameIndexed([3, 2, 4])
    assert len(fi) == 9
    assert fi.locate(0) == (0, 0)
    assert fi.locate(2) == (0, 2)
    assert fi.locate(3) == (1, 0)
    assert fi.locate(8) == (2, 3)
    scenes = fi.scene_indices(["a", "b", "a"])
    assert scenes["a"] == [0, 1, 2, 5, 6, 7, 8]
    assert scenes["b"] == [3, 4]


def test_test2_dataset(test2_tree):
    root, df = test2_tree
    ds = Test2Dataset(root, df)
    assert len(ds) == 5
    dist, ref, score, vid = ds[0]
    assert dist.shape == (32, 40, 3)  # min side < 256 -> no resize
    assert score == 3.0 and vid == 0
    dist, ref, score, vid = ds[4]
    assert score == 4.0 and vid == 1


def test_test2_in_memory_cache_matches(test2_tree):
    root, df = test2_tree
    plain = Test2Dataset(root, df)
    cached = Test2Dataset(root, df, in_memory=True)
    d0, r0, s0, v0 = plain[1]
    d1, r1, s1, v1 = cached[1]
    # uint8 quantized cache: within 1/255
    np.testing.assert_allclose(d1, d0, atol=1 / 255 + 1e-6)
    np.testing.assert_allclose(r1, r0, atol=1 / 255 + 1e-6)
    assert (s0, v0) == (s1, v1)


def test_rgba_composites_to_white(tmp_path):
    p = tmp_path / "a.png"
    arr = np.zeros((8, 8, 4), np.uint8)
    arr[..., 3] = 0  # fully transparent
    Image.fromarray(arr, "RGBA").save(p)
    img = load_image_rgb(str(p))
    np.testing.assert_allclose(img, 1.0)  # white background


def test_prepare_image_resize_rule():
    big = np.zeros((300, 400, 3), np.float32)
    small = np.zeros((200, 400, 3), np.float32)
    assert prepare_image(big).shape == (256, 256, 3)
    assert prepare_image(big, keep_aspect_ratio=True).shape == (256, 341, 3)
    assert prepare_image(small).shape == (200, 400, 3)  # min side <= 256


def test_host_resize_matches_torch():
    rng = np.random.default_rng(0)
    img = rng.random((50, 70, 3), dtype=np.float32)
    ours = resize_image(img, 32, 32)
    ref = F.interpolate(
        torch.from_numpy(img).permute(2, 0, 1)[None], size=(32, 32),
        mode="bilinear", align_corners=False,
    )[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_nr_dataset_modes(tmp_path):
    scene_dir = tmp_path / "scene1" / "color"
    gt_dir = tmp_path / "scene1" / "gt"
    scene_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    names = []
    for f in range(3):
        name = f"frame_{f}.png"
        _write_png(scene_dir / name, hw=(64, 64), seed=f)
        _write_png(gt_dir / name, hw=(64, 64), seed=50 + f)
        names.append(name)
    df = pd.DataFrame([{
        "scene": "scene1",
        "method": "nerfacto",
        "frame_count": 3,
        "basenames": str(names),
        "DISTS_std": str([0.1, 0.2, 0.3]),
        "DISTS_mean": str([0.4, 0.5, 0.6]),
        "render_dir": "scene1/color",
        "gt_dir": "scene1/gt",
    }])
    ds = NerfNRQADataset(df, dir=str(tmp_path), mode="gt", is_train=True)
    gt, render, std, mean, vid, frame = ds[1]
    assert gt.shape == (256, 256, 3)
    assert render["256x256"].shape == (256, 256, 3)
    assert render["224x224"].shape == (224, 224, 3)
    assert float(std) == pytest.approx(0.2) and float(mean) == pytest.approx(0.5)
    assert (vid, frame) == (0, 1)


def test_scene_balanced_sampler_balance():
    indices = {"a": list(range(10)), "b": list(range(10, 14)),
               "c": list(range(14, 20))}
    s = SceneBalancedSampler(indices, seed=1)
    assert len(s) == 12  # 3 scenes x min(4)
    drawn = list(s)
    assert len(drawn) == 12
    for scene, idxs in indices.items():
        assert sum(1 for i in drawn if i in set(idxs)) == 4
    s.set_epoch(1)
    assert list(s) != drawn  # reshuffles per epoch


def test_compute_batch_sampler_uniform_shapes():
    shapes = [(32, 32)] * 5 + [(64, 64)] * 3
    s = ComputeBatchSampler(shapes, batch_size=2)
    for batch in s:
        got = {shapes[i] for i in batch}
        assert len(got) == 1


def test_host_shard_partition():
    idx = list(range(10))
    shards = [host_shard(idx, h, 3) for h in range(3)]
    assert sorted(sum(shards, [])) == idx


def test_dataloader_threaded_order(test2_tree):
    root, df = test2_tree
    ds = Test2Dataset(root, df)
    batches = list(DataLoader(ds, batch_size=2, num_workers=3))
    assert len(batches) == 3
    dist, ref, score, vid = batches[0]
    assert dist.shape == (2, 32, 40, 3)
    # sequential loader gives identical order/content
    seq = list(DataLoader(ds, batch_size=2, num_workers=0))
    for a, b in zip(batches, seq):
        np.testing.assert_array_equal(a[0], b[0])


def test_recursive_collate_nested():
    items = [
        {"img": np.zeros((4, 4)), "meta": (1, np.ones(2))},
        {"img": np.ones((4, 4)), "meta": (2, np.zeros(2))},
    ]
    out = recursive_collate(items)
    assert out["img"].shape == (2, 4, 4)
    assert out["meta"][0].tolist() == [1, 2]
    assert out["meta"][1].shape == (2, 2)


def test_video_frame_dir_loading(test2_tree):
    root, df = test2_tree
    frames = load_video_frames(os.path.join(root, "Renders", "lego_dist"),
                               resize=True)
    assert frames.shape == (3, 32, 40, 3)
    batches = list(iter_video_batches(frames, frames, 2))
    assert [b[0].shape[0] for b in batches] == [2, 1]


def test_dataloader_len_cached_and_correct(test2_tree):
    root, df = test2_tree
    ds = Test2Dataset(root, df)
    loader = DataLoader(ds, batch_size=2, num_workers=0)
    assert len(loader) == 3
    assert loader._len == 3  # cached, not re-enumerated per call
    assert len(loader) == 3


def test_device_prefetch_preserves_order_and_content(test2_tree):
    from nerf_qa_tpu.data.pipeline import device_prefetch

    root, df = test2_tree
    ds = Test2Dataset(root, df)
    loader = DataLoader(ds, batch_size=2, num_workers=2)
    direct = list(DataLoader(ds, batch_size=2, num_workers=0))
    fetched = list(device_prefetch(loader, buffer_size=2))
    assert len(fetched) == len(direct)
    for a, b in zip(fetched, direct):
        np.testing.assert_allclose(np.asarray(a[0]), b[0])
        np.testing.assert_array_equal(np.asarray(a[3]), b[3])


def test_device_prefetch_short_stream():
    from nerf_qa_tpu.data.pipeline import device_prefetch

    batches = [np.full((2, 2), i, np.float32) for i in range(1)]
    out = list(device_prefetch(iter(batches), buffer_size=4))
    assert len(out) == 1
    np.testing.assert_array_equal(np.asarray(out[0]), batches[0])


def test_host_sharded_sampler_partitions_and_covers():
    from nerf_qa_tpu.parallel.distributed import HostShardedSampler

    base = list(range(10))
    shards = [list(HostShardedSampler(base, host_id=i, host_count=3))
              for i in range(3)]
    assert sorted(sum(shards, [])) == base
    assert [len(s) for s in shards] == [4, 3, 3]
    assert [len(HostShardedSampler(base, host_id=i, host_count=3))
            for i in range(3)] == [4, 3, 3]


def test_maybe_initialize_noop_without_cluster(monkeypatch):
    from nerf_qa_tpu.parallel.distributed import host_info, maybe_initialize

    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert maybe_initialize() is False
    assert host_info() == (0, 1)
