"""Sustained end-to-end feed benchmark (bench.py's ``feed_sustained``).

The reference feeds its GPU with 4-worker PIL DataLoaders
(nerf_qa/data.py:182); this framework's equivalent is the native C++
decode pool feeding a prefetch queue. The short (16-frame) overlapped
number in bench_host_decode proves the pattern; THIS tool measures what
a production scorer actually *sustains* over hundreds of frames, per
feed mode:

  dists_jpeg         native full JPEG decode of 1080p frame pairs ->
                     256^2 f32 -> device -> DISTS scores
  dists_jpeg_fast    same with the DCT-scaled fast decode
                     (the NERF_QA_TPU_FAST_DECODE=1 feed path)
  dists_uint8_cache  one-time decode into an in-memory uint8 256^2
                     cache (Test2Dataset's cache mode,
                     reference data.py:126-143), then a sustained feed
                     from the cache
  nr_tokens          render-only 256^2 decode + fp16 ViT-token cache
                     gather (the --feature-cache path,
                     data/feature_cache.py) -> NR serving scores
  nr_full            render 256^2 + 224^2 decode -> full NR serving
                     (frozen ViT runs on device)

Decode work cycles a pool of distinct 1080p JPEG fixtures (decode cost
is per-call; only page-cache IO is shared, which any real frame server
also enjoys). Emits a CUMULATIVE one-line JSON to stdout after EVERY
completed mode so a caller-imposed timeout preserves finished modes;
progress lines go to stderr.

In this build environment both the host (1 vCPU) and the H2D link (a
network tunnel) are harness-bound; the per-mode fps are end-to-end
sustained numbers on THIS harness, and the decode/transfer components
are reported so production hosts (100+ vCPU, PCIe-attached) can be
extrapolated with bench_host_decode's per-core table.
"""
from __future__ import annotations

import argparse
import json
import os
import queue
import sys
import tempfile
import threading
import time

import numpy as np


def _log(msg: str) -> None:
    print(f"bench_feed: {msg}", file=sys.stderr, flush=True)


def _make_fixture_pairs(root: str, n_pairs: int, hw) -> tuple[list, list]:
    """n distinct (reference, distorted) 1080p JPEG pairs with rendered-
    content-like entropy (gradient + noise texture)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    h, w = hw
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([yy / h, xx / w, (yy + xx) / (h + w)], axis=-1)
    refs, dists_ = [], []
    for i in range(n_pairs):
        ref = np.clip(base * 0.7 + rng.normal(0.15, 0.08, (h, w, 3)), 0, 1)
        dst = np.clip(ref + rng.normal(0.0, 0.04, (h, w, 3)), 0, 1)
        rp = os.path.join(root, f"ref_{i:03d}.jpg")
        dp = os.path.join(root, f"dst_{i:03d}.jpg")
        Image.fromarray((ref * 255).astype(np.uint8)).save(rp, quality=90)
        Image.fromarray((dst * 255).astype(np.uint8)).save(dp, quality=90)
        refs.append(rp)
        dists_.append(dp)
    return refs, dists_


def _sustained(decode_batch, step, n_batches: int, batch: int,
               sync_every: int = 4) -> float:
    """Producer thread decodes batch i+1 while the device scores batch i
    (the device_prefetch pattern); returns sustained frames/s including
    decode, H2D, and device compute."""
    import jax

    q: queue.Queue = queue.Queue(maxsize=2)
    err: list = []

    def producer():
        try:
            for i in range(n_batches):
                q.put(decode_batch(i))
        except Exception as e:  # surface decode failures to the consumer
            err.append(e)
        q.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t0 = time.perf_counter()
    t.start()
    out = None
    done = 0
    while True:
        b = q.get()
        if b is None:
            break
        out = step(*[jax.device_put(a) for a in b])
        done += 1
        if done % sync_every == 0:
            jax.block_until_ready(out)
    if out is not None:
        # host-read the final scores: through the axon tunnel a bare
        # block_until_ready can ack at enqueue for arg-passing programs
        np.asarray(out)
    dt = time.perf_counter() - t0
    t.join()
    if err:
        raise err[0]
    return batch * n_batches / dt


def run(frames: int = 512, n_pairs: int = 16, batch: int = 16,
        modes=("dists_jpeg", "dists_jpeg_fast", "dists_uint8_cache",
               "nr_tokens", "nr_full"),
        tiny: bool = False, emit=None) -> dict:
    import jax
    import jax.numpy as jnp

    from nerf_qa_tpu.compat.pretrained import (
        resolve_dists_weights,
        resolve_vgg_params,
    )
    from nerf_qa_tpu.config import DISTSConfig
    from nerf_qa_tpu.core import dists
    from nerf_qa_tpu.data import native

    if tiny:
        frames, n_pairs, batch, hw, score_hw = 16, 2, 4, (96, 128), 64
    else:
        hw, score_hw = (1080, 1920), 256
    threads = os.cpu_count() or 1
    n_batches = max(1, frames // batch)
    frames = n_batches * batch

    result: dict = {
        "frames": frames, "batch": batch, "decode_threads": threads,
        "fixture_hw": list(hw), "score_size": score_hw,
        "host_cores": os.cpu_count(),
        "note": "end-to-end sustained fps on this harness (1 vCPU host, "
                "tunnel H2D); per-core decode table in host_decode",
    }

    if not native.available():
        result["error"] = "native decoder not built"
        if emit:
            emit(result)
        return result

    cfg = DISTSConfig(compute_dtype="bfloat16", stats_impl="pallas")
    # weights as jit ARGUMENTS: closed-over constants bloat the
    # serialized executable to >100 MB, which this harness's tunnel
    # loads slower than it compiles (see bench.py headline note)
    vgg = jax.device_put(resolve_vgg_params(seed=0))
    weights = jax.device_put(resolve_dists_weights(cfg))

    @jax.jit
    def _dists_step(p, w, d, r):
        return dists.forward(p, w, d, r, cfg)

    @jax.jit
    def _dists_step_u8(p, w, d, r):
        return dists.forward(
            p, w,
            d.astype(jnp.float32) / 255.0, r.astype(jnp.float32) / 255.0,
            cfg,
        )

    def dists_step(d, r):
        return _dists_step(vgg, weights, d, r)

    def dists_step_u8(d, r):
        return _dists_step_u8(vgg, weights, d, r)

    with tempfile.TemporaryDirectory() as tmp:
        _log(f"building {n_pairs} fixture pairs at {hw[0]}x{hw[1]}")
        refs, dsts = _make_fixture_pairs(tmp, n_pairs, hw)

        def paths_for(i: int) -> tuple[list, list]:
            sel = [(i * batch + j) % n_pairs for j in range(batch)]
            return [refs[k] for k in sel], [dsts[k] for k in sel]

        def jpeg_batch(fast):
            def decode(i):
                rp, dp = paths_for(i)
                r = native.decode_resize_batch(
                    rp, score_hw, score_hw, threads=threads, fast=fast)
                d = native.decode_resize_batch(
                    dp, score_hw, score_hw, threads=threads, fast=fast)
                return d, r
            return decode

        warm = jpeg_batch(False)(0)
        np.asarray(dists_step(*[jax.device_put(a) for a in warm]))  # compile

        if "dists_jpeg" in modes:
            fps = _sustained(jpeg_batch(False), dists_step, n_batches, batch)
            result["fps_dists_jpeg"] = round(fps, 2)
            _log(f"dists_jpeg: {fps:.2f} fr/s")
            if emit:
                emit(result)

        if "dists_jpeg_fast" in modes and native.fast_decode_available():
            fps = _sustained(jpeg_batch(True), dists_step, n_batches, batch)
            result["fps_dists_jpeg_fast"] = round(fps, 2)
            _log(f"dists_jpeg_fast: {fps:.2f} fr/s")
            if emit:
                emit(result)

        if "dists_uint8_cache" in modes:
            t0 = time.perf_counter()
            ref_cache = (native.decode_resize_batch(
                refs, score_hw, score_hw, threads=threads
            ) * 255).astype(np.uint8)
            dst_cache = (native.decode_resize_batch(
                dsts, score_hw, score_hw, threads=threads
            ) * 255).astype(np.uint8)
            result["uint8_cache_build_s"] = round(
                time.perf_counter() - t0, 2)

            def cache_batch(i):
                sel = [(i * batch + j) % n_pairs for j in range(batch)]
                return dst_cache[sel], ref_cache[sel]

            np.asarray(dists_step_u8(
                *[jax.device_put(a) for a in cache_batch(0)]))  # compile
            fps = _sustained(cache_batch, dists_step_u8, n_batches, batch)
            result["fps_dists_uint8_cache"] = round(fps, 2)
            _log(f"dists_uint8_cache: {fps:.2f} fr/s "
                 f"(build {result['uint8_cache_build_s']}s)")
            if emit:
                emit(result)

        nr_modes = [m for m in modes if m.startswith("nr_")]
        if nr_modes:
            _run_nr_modes(result, nr_modes, tiny, dsts, n_pairs,
                          frames, threads, emit)
    return result


def _run_nr_modes(result: dict, modes, tiny: bool, dsts: list,
                  n_pairs: int, frames: int, threads: int,
                  emit=None) -> None:
    """NR serving feeds: full (ViT on device) vs cached-token gather."""
    import jax
    import jax.numpy as jnp

    from nerf_qa_tpu.config import DISTSConfig, NRModelConfig, TrainConfig
    from nerf_qa_tpu.core.vgg import init_vgg16_params
    from nerf_qa_tpu.data import native
    from nerf_qa_tpu.models.nr.model import NRModel
    from nerf_qa_tpu.models.nr.vit import ViTS14
    from nerf_qa_tpu.train.nr_train import NRTrainer

    if tiny:
        render, sem, depth, batch = 64, 56, 1, 4
    else:
        render, sem, depth, batch = 256, 224, 12, 8
    n_batches = max(1, frames // batch)
    grid = sem // 14
    cfg = NRModelConfig(
        transformer_decoder_depth=2, refine_up_depth=2, dropout_rate=0.2,
        decoder_dtype="bfloat16",
        dists=DISTSConfig(compute_dtype="bfloat16"),
    )
    model = NRModel(init_vgg16_params(seed=0), cfg=cfg, render_size=render,
                    sem_size=sem, vit=ViTS14(depth=depth))
    trainer = NRTrainer(
        model, TrainConfig(lr=1e-4, schedule="constant", batch_size=batch),
        steps_per_epoch=1,
    )
    params, state, _, _ = trainer.init(seed=0)
    result["nr_batch"] = batch

    def render_paths(i: int) -> list:
        return [dsts[(i * batch + j) % n_pairs] for j in range(batch)]

    if "nr_full" in modes:
        def decode_full(i):
            p = render_paths(i)
            r256 = native.decode_resize_batch(p, render, render,
                                              threads=threads)
            r224 = native.decode_resize_batch(p, sem, sem, threads=threads)
            return r256, r224

        def step_full(r256, r224):
            return trainer.score_frames(params, state, r256, r224)

        step_full(*decode_full(0))  # compile
        fps = _sustained(decode_full, step_full, n_batches, batch,
                         sync_every=1)
        result["fps_nr_full"] = round(fps, 2)
        _log(f"nr_full: {fps:.2f} fr/s")
        if emit:
            emit(result)

    if "nr_tokens" in modes:
        # fabricated fp16 token cache, memmap-read like the real one
        # (data/feature_cache.py stores (n, gh, gw, 384) fp16 per video)
        tok_path = os.path.join(tempfile.gettempdir(),
                                f"nqa_bench_tokens_{os.getpid()}.npy")
        rng = np.random.default_rng(0)
        np.save(tok_path, rng.normal(
            0, 1, (n_pairs, grid, grid, 384)).astype(np.float16))
        tok_map = np.load(tok_path, mmap_mode="r")
        r224_zero = jnp.zeros((batch, sem, sem, 3), jnp.float32)

        try:
            def decode_tok(i):
                p = render_paths(i)
                r256 = native.decode_resize_batch(p, render, render,
                                                  threads=threads)
                sel = [(i * batch + j) % n_pairs for j in range(batch)]
                toks = np.stack(
                    [np.asarray(tok_map[k], np.float32) for k in sel])
                return (r256, toks)

            def step_tok(r256, toks):
                return trainer.score_frames(params, state, r256,
                                            r224_zero, sem_tokens=toks)

            step_tok(*decode_tok(0))  # compile
            fps = _sustained(decode_tok, step_tok, n_batches, batch,
                             sync_every=1)
            result["fps_nr_tokens"] = round(fps, 2)
            _log(f"nr_tokens: {fps:.2f} fr/s")
            if emit:
                emit(result)
        finally:
            os.unlink(tok_path)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="sustained end-to-end feed")
    p.add_argument("--frames", type=int, default=512)
    p.add_argument("--pairs", type=int, default=16,
                   help="distinct fixture pairs cycled to --frames")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--modes", default="dists_jpeg,dists_jpeg_fast,"
                                      "dists_uint8_cache,nr_tokens,nr_full")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)

    from nerf_qa_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()

    def emit(res):
        if args.json:
            print(json.dumps(res), flush=True)

    res = run(frames=args.frames, n_pairs=args.pairs, batch=args.batch,
              modes=tuple(m for m in args.modes.split(",") if m),
              tiny=args.tiny, emit=emit)
    if args.json:
        print(json.dumps(res), flush=True)
    else:
        for k, v in res.items():
            print(f"{k}: {v}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
