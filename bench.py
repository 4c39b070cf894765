"""Headline benchmark: 1080p frames/sec/chip end-to-end DISTS scoring.

Pipeline under test (the reference's per-video eval path, run_test2.py:278-297,
rebuilt TPU-native): uint8 1080p frame pairs -> device -> f32 -> bilinear
resize 256x256 -> VGG16 pyramid (bf16 MXU convs) -> fused DISTS statistics
-> per-frame scores.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is measured fps / 500 (BASELINE.json north-star target for a
v5e chip; the reference publishes no throughput numbers).
"""
import json
import sys
import time

import numpy as np


def main() -> None:
    import jax

    from nerf_qa_tpu.config import DISTSConfig
    from nerf_qa_tpu.core import dists
    from nerf_qa_tpu.core.vgg import init_vgg16_params
    from nerf_qa_tpu.eval.video_scorer import FrameScorer

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    # Random VGG weights: identical FLOPs/memory to pretrained; the bench
    # environment has no torchvision checkpoint (see compat/torch_vgg.py).
    params = init_vgg16_params(seed=0)
    weights = dists.load_pretrained_weights()
    cfg = DISTSConfig(compute_dtype="bfloat16", stats_impl="pallas")
    scorer = FrameScorer(params, weights, cfg=cfg, resize_to=(256, 256))

    rng = np.random.default_rng(0)
    d_host = rng.integers(0, 256, (batch, 1080, 1920, 3), dtype=np.uint8)
    r_host = rng.integers(0, 256, (batch, 1080, 1920, 3), dtype=np.uint8)

    # Warmup / compile.
    scorer.score_batch(d_host, r_host).block_until_ready()

    # Steady state: fresh host buffers each iteration (end-to-end includes
    # host->device transfer of the uint8 frames).
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = scorer.score_batch(d_host, r_host)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    fps = batch * iters / dt

    # Device-resident variant (isolates TPU compute from the host link).
    d_dev = jax.device_put(d_host)
    r_dev = jax.device_put(r_host)
    scorer.score_batch(d_dev, r_dev).block_until_ready()
    d_dev, r_dev = jax.device_put(d_host), jax.device_put(r_host)
    t0 = time.perf_counter()
    for _ in range(iters):
        # donation consumes buffers; re-put outside timing is avoided by
        # scoring the same logical content back and forth
        out = scorer.score_batch(jax.device_put(d_host), jax.device_put(r_host))
    out.block_until_ready()
    dt_dev = time.perf_counter() - t0
    fps_dev = batch * iters / dt_dev

    print(
        json.dumps(
            {
                "metric": "1080p_frames_per_sec_per_chip_dists_e2e",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 500.0, 4),
                "detail": {
                    "batch": batch,
                    "iters": iters,
                    "device": str(jax.devices()[0]),
                    "fps_including_h2d": round(fps, 2),
                    "fps_with_explicit_put": round(fps_dev, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
