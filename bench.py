"""Headline benchmark: 1080p frames/sec/chip DISTS scoring.

Pipeline under test (the reference's per-video eval path,
run_test2.py:278-297, rebuilt TPU-native): 1080p uint8 frame pairs ->
f32 -> bilinear resize 256x256 (MXU matmul formulation) -> VGG16
pyramid (bf16 MXU convs) -> fused DISTS statistics -> per-frame scores.

Emission protocol (the round-4 failure was a single end-of-run print
wiped out by a timeout):

* The headline's random 1080p inputs are generated ON DEVICE with
  ``jax.random`` — FLOP/memory-identical to host-fed frames; in
  production frames stream from the host decode pipeline and stay
  resident. Host->device transfer is measured separately by a SMALL
  (~100 MB) probe, because in this build environment the TPU sits
  behind a network tunnel whose H2D bandwidth (0.04-1.5 GB/s across
  rounds) is a harness artifact, not the framework or chip.
* A parseable one-line JSON result
  {"metric", "value", "unit", "vs_baseline", "detail"} is printed to
  stdout AS SOON AS the headline is measured, then re-emitted enriched
  after every additional section. Progress goes to stderr; stdout
  carries only JSON lines, last line = most complete result.
* Sections after the headline run under a total wall-clock budget
  (env NERF_QA_TPU_BENCH_BUDGET_S, default 1200 s — an external
  timeout can cut the run at ANY point without losing the sections
  already emitted, so the budget is a graceful-termination bound for
  manual runs, not the driver's safety net). A section whose
  minimum time no longer fits is recorded as ``skipped (budget)``
  instead of hanging the run; subprocess sections are bounded by the
  remaining budget and their partial JSON is kept on timeout.

vs_baseline = fps / 500 (BASELINE.json north-star target for v5e).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))


def _log(msg: str) -> None:
    print(f"bench: {msg}", file=sys.stderr, flush=True)


class Bench:
    """Budget bookkeeping + incremental JSON emission."""

    def __init__(self, budget_s: float) -> None:
        self.t0 = time.monotonic()
        self.budget_s = budget_s
        self.result: dict = {}
        self.sections: dict[str, dict] = {}

    def remaining(self) -> float:
        return self.budget_s - (time.monotonic() - self.t0)

    def emit(self) -> None:
        self.result.setdefault("detail", {})["sections"] = self.sections
        print(json.dumps(self.result), flush=True)

    def run_section(self, name: str, floor_s: float, fn) -> None:
        """Run one optional section if >= floor_s of budget remains;
        record elapsed/skip/error and re-emit the enriched JSON."""
        rem = self.remaining()
        if rem < floor_s:
            _log(f"{name}: skipped (budget: {rem:.0f}s left < "
                 f"{floor_s:.0f}s floor)")
            self.sections[name] = {"status": "skipped (budget)"}
            self.emit()
            return
        _log(f"{name}: start ({rem:.0f}s budget left)")
        t0 = time.monotonic()
        try:
            fn()
        except Exception as e:  # keep later sections + the headline
            self.sections[name] = {
                "status": "error",
                "error": f"{type(e).__name__}: {e}",
                "elapsed_s": round(time.monotonic() - t0, 1),
            }
            _log(f"{name}: ERROR {type(e).__name__}: {e}")
        else:
            dt = time.monotonic() - t0
            self.sections[name] = {"status": "ok",
                                   "elapsed_s": round(dt, 1)}
            _log(f"{name}: ok ({dt:.1f}s)")
        self.emit()

    def run_json_subprocess(self, argv: list[str],
                            timeout_s: float) -> tuple[dict | None, object]:
        """Run a child, return (last parseable stdout JSON line, rc).
        On timeout the partial stdout is still parsed (rc='timeout')."""
        try:
            proc = subprocess.run(
                argv, cwd=_REPO, capture_output=True, text=True,
                timeout=timeout_s,
            )
            out, rc = proc.stdout or "", proc.returncode
            if proc.returncode != 0:
                _log(f"subprocess rc={proc.returncode}: "
                     f"{(proc.stderr or '').strip()[-500:]}")
        except subprocess.TimeoutExpired as e:
            out = e.stdout or ""
            if isinstance(out, bytes):
                out = out.decode(errors="replace")
            rc = "timeout"
            _log(f"subprocess timeout after {timeout_s:.0f}s: "
                 f"{' '.join(argv[-6:])}")
        last = None
        for line in out.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    last = json.loads(line)
                except ValueError:
                    pass
        return last, rc


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("batch", nargs="?", type=int, default=128)
    p.add_argument("iters", nargs="?", type=int, default=20)
    p.add_argument("--tiny", action="store_true",
                   help="protocol smoke mode: small shapes, CPU-friendly "
                        "(tests/test_bench_protocol.py)")
    args = p.parse_args()

    budget = float(os.environ.get("NERF_QA_TPU_BENCH_BUDGET_S", "1200"))
    bench = Bench(budget)

    # compile time is not part of any measured number; cache repeat runs
    from nerf_qa_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from nerf_qa_tpu.compat.pretrained import (
        resolve_dists_weights,
        resolve_vgg_params,
    )
    from nerf_qa_tpu.config import ADISTSConfig, DISTSConfig
    from nerf_qa_tpu.core import adists, dists
    from nerf_qa_tpu.ops.resize import resize_bilinear

    if args.tiny:
        batch, iters = min(args.batch, 4), min(args.iters, 3)
        frame_hw, score_size = (96, 128), 64
    else:
        batch, iters, frame_hw, score_size = (
            args.batch, args.iters, (1080, 1920), 256)
    n_buffers = 4

    # Pretrained VGG16 via $NERF_QA_VGG_CKPT when available; random
    # fallback is FLOP/memory-identical (this environment ships no
    # torchvision checkpoint — see compat/pretrained).
    cfg = DISTSConfig(compute_dtype="bfloat16", stats_impl="pallas")
    params = resolve_vgg_params(seed=0)
    weights = resolve_dists_weights(cfg)

    fast_resize = dict(
        precision=jax.lax.Precision.DEFAULT,
        compute_dtype=jnp.bfloat16,
        scale=1.0 / 255.0,  # folded uint8 normalization
    )

    # params/weights are jit ARGUMENTS, not closed-over constants:
    # constants get embedded into the serialized executable (measured:
    # 127 MB jit_pipeline entry with the VGG pyramid folded in), and
    # loading that through this harness's degraded tunnel took 100-470 s
    # — slower than the compile it was meant to skip. As arguments the
    # executable is a few MB and the weights transfer once as arrays.
    # settle: the first device operation after another client's exit
    # can block for minutes while the server tears the old client down
    # (measured: a tiny matmul at 231-2013 s, then everything normal).
    # Pay that here, visibly, so compile_s reflects compilation — and
    # restart the budget clock after it: the stall is environmental,
    # and counting it would budget-skip every section on a healthy run.
    t0 = time.perf_counter()
    _ = np.asarray(jnp.zeros((8, 8)) @ jnp.zeros((8, 8)))
    _log(f"device settle: {time.perf_counter() - t0:.1f}s")
    bench.t0 = time.monotonic()

    t0 = time.perf_counter()
    params = jax.device_put(params)
    weights = jax.device_put(weights)
    jax.block_until_ready((params, weights))
    _log(f"weights upload: {time.perf_counter() - t0:.1f}s")

    @jax.jit
    def pipeline(p, w, d_u8, r_u8):
        x = resize_bilinear(d_u8, score_size, score_size, **fast_resize)
        y = resize_bilinear(r_u8, score_size, score_size, **fast_resize)
        return dists.forward(p, w, x, y, cfg)

    # ---- headline (required; emitted the moment it is measured) ------
    _log(f"headline: generating {2 * n_buffers} device-resident "
         f"{frame_hw[0]}x{frame_hw[1]} uint8 buffers (batch {batch})")

    @jax.jit
    def gen_u8(key):
        return jax.random.bits(
            key, (batch, frame_hw[0], frame_hw[1], 3), dtype=jnp.uint8
        )

    t0 = time.perf_counter()
    keys = jax.random.split(jax.random.key(0), 2 * n_buffers)
    dev_pairs = [
        (gen_u8(keys[2 * i]), gen_u8(keys[2 * i + 1]))
        for i in range(n_buffers)
    ]
    jax.block_until_ready(dev_pairs)
    devgen_s = time.perf_counter() - t0
    _log(f"headline: devgen {devgen_s:.1f}s; compiling pipeline")

    t0 = time.perf_counter()
    out = pipeline(params, weights, *dev_pairs[0])
    _ = np.asarray(out)
    compile_s = time.perf_counter() - t0
    _log(f"headline: compile+first-call {compile_s:.1f}s; measuring")

    t0 = time.perf_counter()
    outs = [pipeline(params, weights, *dev_pairs[i % n_buffers])
            for i in range(iters)]
    jax.block_until_ready(outs)
    _ = np.asarray(outs[-1])
    dt = time.perf_counter() - t0
    fps = batch * iters / dt

    bench.result = {
        "metric": "1080p_frames_per_sec_per_chip_dists",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 500.0, 4),
        "detail": {
            "batch": batch,
            "iters": iters,
            "frame_hw": list(frame_hw),
            "device": str(jax.devices()[0]),
            "pipeline": "devgen u8 -> bf16 MXU resize256 -> VGG16 bf16 "
                        "-> DISTS stats (pallas/XLA auto by stage size)",
            "fps_device_pipeline": round(fps, 2),
            "devgen_s": round(devgen_s, 1),
            "compile_s": round(compile_s, 1),
            "budget_s": budget,
        },
    }
    bench.sections["headline"] = {
        "status": "ok",
        "elapsed_s": round(time.monotonic() - bench.t0, 1),
    }
    _log(f"headline: {fps:.1f} frames/s")
    bench.emit()
    detail = bench.result["detail"]

    # ---- small H2D probe (informational; the tunnel is the harness) --
    def h2d_probe():
        nb = 2 if args.tiny else 16
        host = np.random.default_rng(0).integers(
            0, 256, (nb, 1080, 1920, 3), dtype=np.uint8)
        t0 = time.perf_counter()
        dev = jax.device_put(host)
        jax.block_until_ready(dev)
        dt = time.perf_counter() - t0
        detail["h2d_gbps"] = round(host.nbytes / dt / 1e9, 3)
        detail["h2d_probe_mb"] = round(host.nbytes / 1e6)
        detail["h2d_note"] = (
            "TPU reached via a network tunnel in this environment; "
            "H2D is harness-bound"
        )
        del dev

    bench.run_section("h2d_probe", 30.0, h2d_probe)

    # ---- ADISTS @256 (same resize front-end, headline buffers) -------
    def adists_256():
        acfg = ADISTSConfig(compute_dtype="bfloat16")

        @jax.jit
        def pipeline_adists(p, d_u8, r_u8):
            x = resize_bilinear(d_u8, score_size, score_size, **fast_resize)
            y = resize_bilinear(r_u8, score_size, score_size, **fast_resize)
            return adists.forward(p, x, y, acfg, as_loss=False)

        out = pipeline_adists(params, *dev_pairs[0])
        _ = np.asarray(out)
        t0 = time.perf_counter()
        outs = [pipeline_adists(params, *dev_pairs[i % n_buffers])
                for i in range(iters)]
        jax.block_until_ready(outs)
        _ = np.asarray(outs[-1])
        detail["fps_adists"] = round(
            batch * iters / (time.perf_counter() - t0), 2)

    bench.run_section("adists_256", 60.0, adists_256)

    # ---- full-resolution 1080p scoring (fused Pallas moments DISTS,
    # channel-blocked windowed ADISTS). Free the ~6 GB of headline
    # buffers first — they distort the HBM-bound full-res timings. ----
    def fullres():
        nonlocal dev_pairs, out, outs
        del dev_pairs, out, outs
        import gc

        gc.collect()
        fr_batch, fr_iters = (1, 2) if args.tiny else (2, 8)

        @jax.jit
        def gen_f32(key):
            return jax.random.uniform(
                key, (fr_batch, frame_hw[0], frame_hw[1], 3), jnp.float32)

        fkeys = jax.random.split(jax.random.key(1), 4)
        fr_pairs = [(gen_f32(fkeys[2 * i]), gen_f32(fkeys[2 * i + 1]))
                    for i in range(2)]
        jax.block_until_ready(fr_pairs)
        acfg = ADISTSConfig(compute_dtype="bfloat16")

        @jax.jit
        def dists_fullres(p, w, x, y):
            return dists.forward(p, w, x, y, cfg)

        @jax.jit
        def adists_fullres(p, x, y):
            return adists.forward(p, x, y, acfg, as_loss=False)

        def timed(fn, *wargs):
            o = fn(*wargs, *fr_pairs[0])
            _ = np.asarray(o)
            t0 = time.perf_counter()
            os_ = [fn(*wargs, *fr_pairs[i % 2]) for i in range(fr_iters)]
            jax.block_until_ready(os_)
            _ = np.asarray(os_[-1])  # host read: tunnel ack can be early
            return fr_batch * fr_iters / (time.perf_counter() - t0)

        detail["fps_dists_fullres_1080p"] = round(
            timed(dists_fullres, params, weights), 2)
        if bench.remaining() > 45.0:
            detail["fps_adists_fullres_1080p"] = round(
                timed(adists_fullres, params), 2)
        else:
            bench.sections["fullres_adists"] = {
                "status": "skipped (budget)"}

    bench.run_section("fullres_1080p", 90.0, fullres)

    # ---- NR model numbers (VERDICT r4 weak #3: put them in the
    # artifact, not just prose) — serving forward @B=8 and the bf16
    # train step @B=4. IN-PROCESS: this harness allows one TPU client
    # at a time, so a subprocess would queue behind the parent until
    # its timeout (observed: 823 s of nothing). ------------------------
    def _nr_model():
        from nerf_qa_tpu.config import NRModelConfig
        from nerf_qa_tpu.core.vgg import init_vgg16_params
        from nerf_qa_tpu.models.nr.model import NRModel
        from nerf_qa_tpu.models.nr.vit import ViTS14

        if args.tiny:
            return NRModel(
                init_vgg16_params(seed=0),
                cfg=NRModelConfig(transformer_decoder_depth=1,
                                  refine_up_depth=1, dropout_rate=0.2,
                                  decoder_dtype="bfloat16", dists=cfg),
                render_size=64, sem_size=56, vit=ViTS14(depth=1),
            )
        return NRModel(
            init_vgg16_params(seed=0),
            cfg=NRModelConfig(transformer_decoder_depth=2,
                              refine_up_depth=2, dropout_rate=0.2,
                              decoder_dtype="bfloat16", dists=cfg),
            vit=ViTS14(depth=12),
        )

    nr_holder: dict = {}

    def nr_serving():
        model = _nr_model()
        nr_holder["model"] = model
        nparams, nstate = model.init(seed=0)
        nr_holder["params"], nr_holder["state"] = nparams, nstate
        frozen = jax.device_put(model.frozen_params())
        nr_holder["frozen"] = frozen
        b = 2 if args.tiny else 8
        rng = np.random.default_rng(0)
        r256 = jnp.asarray(rng.random(
            (b, model.render_size, model.render_size, 3), dtype=np.float32))
        r224 = jnp.asarray(rng.random(
            (b, model.sem_size, model.sem_size, 3), dtype=np.float32))
        nr_holder["batch"] = (r256, r224)

        @jax.jit
        def nr_fwd(fz, p, x256, x224):
            return model.forward(p, x256, x224, deterministic=True,
                                 state=nstate, frozen=fz)

        _ = np.asarray(nr_fwd(frozen, nparams, r256, r224))  # compile
        iters = 2 if args.tiny else 10
        t0 = time.perf_counter()
        for _i in range(iters):
            out = nr_fwd(frozen, nparams, r256, r224)
            _ = np.asarray(out[:1])  # host read: tunnel ack can be early
        dt = (time.perf_counter() - t0) / iters
        detail["ms_nr_serving_forward_b8"] = round(dt * 1e3, 1)
        detail["fps_nr_serving_b8"] = round(b / dt, 2)

    bench.run_section("nr_serving", 120.0, nr_serving)

    def nr_train():
        from nerf_qa_tpu.config import TrainConfig
        from nerf_qa_tpu.train.nr_train import NRTrainer

        model = nr_holder.get("model") or _nr_model()
        b = 2 if args.tiny else 4
        trainer = NRTrainer(
            model, TrainConfig(lr=1e-4, schedule="constant", batch_size=b),
            steps_per_epoch=100,
        )
        tparams, tstate, topt, key = trainer.init(seed=0)
        rng = np.random.default_rng(0)
        gt = rng.random((b, model.render_size, model.render_size, 3),
                        dtype=np.float32)
        render = np.clip(gt + 0.05, 0, 1)
        r224 = rng.random((b, model.sem_size, model.sem_size, 3),
                          dtype=np.float32)
        tparams, tstate, topt, losses, key = trainer.train_step(
            tparams, tstate, topt, gt, render, r224, key)
        float(losses["combined"])  # compile + host read
        iters = 2 if args.tiny else 10
        t0 = time.perf_counter()
        for _i in range(iters):
            tparams, tstate, topt, losses, key = trainer.train_step(
                tparams, tstate, topt, gt, render, r224, key)
        float(losses["combined"])
        dt = (time.perf_counter() - t0) / iters
        detail["ms_nr_train_step_b4"] = round(dt * 1e3, 1)
        detail["fps_nr_train_b4"] = round(b / dt, 2)

    bench.run_section("nr_train", 120.0, nr_train)

    # ---- host decode-pool rate table + the feed-budget arithmetic ----
    def host_decode():
        from nerf_qa_tpu.tools.bench_host_decode import run as host_run

        host = host_run(frames=4 if args.tiny else 12,
                        threads=(1,) if args.tiny else (1, 2, 4),
                        overlap=False)
        # feeding one chip at the headline device rate from JPEG frames
        # costs this many host decode cores (a pair = TWO frames); the
        # mitigations (uint8 caches, --feature-cache, MJPEG remux,
        # N-core hosts) exist because this number is large.
        for key, tag in (("fps_host_decode_jpeg_t1", "jpeg"),
                         ("fps_host_decode_jpeg_fast_t1", "jpeg_fast")):
            percore = host.get(key)
            if percore:
                host[f"host_cores_per_chip_{tag}"] = int(
                    np.ceil(fps / percore))
                host[f"host_cores_per_chip_{tag}_pairs"] = int(
                    np.ceil(2 * fps / percore))
        detail["host_decode"] = host

    bench.run_section("host_decode", 45.0, host_decode)

    # ---- sustained end-to-end feed (VERDICT r4 item 6: >=500 frames
    # through decode-pool -> prefetch -> device -> scores, per feed
    # mode). IN-PROCESS (single-TPU-client harness, see NR sections)
    # and last: it is the longest section. Each completed mode
    # re-emits the enriched artifact immediately, so a hard external
    # kill mid-mode preserves the finished ones. The DISTS feeds and
    # the NR feeds run as two sections so the budget can cut between
    # them. -----------------------------------------------------------
    nr_holder.clear()

    def _feed(modes):
        from nerf_qa_tpu.tools import bench_feed

        def emit_mode(res):
            detail.setdefault("feed_sustained", {}).update(res)
            bench.emit()

        res = bench_feed.run(tiny=args.tiny, modes=modes, emit=emit_mode)
        detail.setdefault("feed_sustained", {}).update(res)

    bench.run_section(
        "feed_dists", 90.0,
        lambda: _feed(("dists_jpeg", "dists_jpeg_fast",
                       "dists_uint8_cache")))
    bench.run_section(
        "feed_nr", 180.0, lambda: _feed(("nr_tokens", "nr_full")))

    _log(f"done in {time.monotonic() - bench.t0:.0f}s "
         f"(budget {budget:.0f}s)")
    bench.emit()


if __name__ == "__main__":
    main()
