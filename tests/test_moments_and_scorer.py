"""Pallas fused moments vs XLA oracle, video scorer, resize parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from nerf_qa_tpu.config import DISTSConfig
from nerf_qa_tpu.core import dists
from nerf_qa_tpu.core.vgg import init_vgg16_params
from nerf_qa_tpu.eval.video_scorer import FrameScorer
from nerf_qa_tpu.ops.pallas.moments import stage_stats_pallas
from nerf_qa_tpu.ops.resize import resize_bilinear
from nerf_qa_tpu.parallel import mesh as meshlib


@pytest.mark.parametrize(
    "shape",
    [(2, 32, 48, 64), (1, 17, 33, 3), (2, 67, 120, 512)],
)
def test_pallas_moments_match_xla(shape):
    rng = np.random.default_rng(1)
    fx = jnp.asarray(rng.random(shape, dtype=np.float32))
    fy = jnp.asarray(rng.random(shape, dtype=np.float32))
    ours = stage_stats_pallas(fx, fy)
    ref = dists.stage_stats_xla(fx, fy)
    for name, a, b in zip(ours._fields, ours, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6, err_msg=name
        )


def test_pallas_score_path_matches_xla():
    rng = np.random.default_rng(2)
    params = init_vgg16_params(seed=0)
    w = dists.load_pretrained_weights()
    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    s_xla = dists.forward(params, w, x, y, DISTSConfig(stats_impl="xla"))
    s_pl = dists.forward(params, w, x, y, DISTSConfig(stats_impl="pallas"))
    np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_xla), atol=1e-5)


def test_resize_matches_torch_interpolate():
    rng = np.random.default_rng(3)
    for in_hw, out_hw in [((37, 53), (64, 64)), ((128, 96), (64, 48)),
                          ((100, 100), (256, 256))]:
        x = rng.random((2, *in_hw, 3), dtype=np.float32)
        ours = np.asarray(resize_bilinear(jnp.asarray(x), *out_hw))
        ref = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
            mode="bilinear", align_corners=False,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@pytest.fixture(scope="module")
def scorer_setup():
    params = init_vgg16_params(seed=0)
    w = dists.load_pretrained_weights()
    return params, w


def test_frame_scorer_uint8_resize(scorer_setup):
    params, w = scorer_setup
    scorer = FrameScorer(params, w, cfg=DISTSConfig(), resize_to=(64, 64))
    rng = np.random.default_rng(4)
    d = rng.integers(0, 256, (5, 90, 120, 3), dtype=np.uint8)
    r = rng.integers(0, 256, (5, 90, 120, 3), dtype=np.uint8)
    scores = scorer.score_frames(d, r, batch_size=2)
    assert scores.shape == (5,)
    assert np.isfinite(scores).all()
    # tail-batch padding must not change results vs one-shot batches
    scores_big = scorer.score_frames(d, r, batch_size=5)
    np.testing.assert_allclose(scores, scores_big, atol=1e-5)


def test_frame_scorer_video_mean(scorer_setup):
    params, w = scorer_setup
    scorer = FrameScorer(params, w, cfg=DISTSConfig(), resize_to=(64, 64))
    rng = np.random.default_rng(5)
    d = rng.random((3, 64, 64, 3)).astype(np.float32)
    v = scorer.score_video(d, d.copy(), batch_size=3)
    assert abs(v) < 1e-5  # identical pair -> 0


def test_frame_scorer_data_parallel_matches_single(scorer_setup):
    params, w = scorer_setup
    mesh = meshlib.create_mesh()
    assert mesh.shape[meshlib.DATA_AXIS] == 8
    rng = np.random.default_rng(6)
    d = rng.random((16, 64, 64, 3)).astype(np.float32)
    r = np.clip(d + rng.normal(0, 0.05, d.shape).astype(np.float32), 0, 1)
    single = FrameScorer(params, w, cfg=DISTSConfig(), resize_to=None)
    sharded = FrameScorer(params, w, cfg=DISTSConfig(), resize_to=None, mesh=mesh)
    s1 = single.score_frames(d, r, batch_size=16)
    s8 = sharded.score_frames(d, r, batch_size=16)
    np.testing.assert_allclose(s8, s1, atol=1e-5)


def test_batched_map_padding_and_edges():
    """The shared pad-tail batching helper: exact-multiple, ragged tail,
    and empty inputs; the padded tail rows never leak into the output."""
    from nerf_qa_tpu.eval.video_scorer import batched_map

    calls = []

    def fn(a, b):
        calls.append(a.shape[0])
        assert a.shape[0] == 4  # always the compiled batch shape
        return a.sum(axis=(1, 2)) + b.sum(axis=(1, 2))

    rng = np.random.default_rng(0)
    a = rng.random((10, 3, 2)).astype(np.float32)
    b = rng.random((10, 3, 2)).astype(np.float32)
    got = batched_map(fn, (a, b), 4)
    want = a.sum(axis=(1, 2)) + b.sum(axis=(1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert calls == [4, 4, 4]  # 10 -> 4+4+2(padded)

    got8 = batched_map(fn, (a[:8], b[:8]), 4)
    np.testing.assert_allclose(got8, want[:8], rtol=1e-6)

    empty = batched_map(fn, (a[:0], b[:0]), 4)
    assert empty.shape == (0,)
