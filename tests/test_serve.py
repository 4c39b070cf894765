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
