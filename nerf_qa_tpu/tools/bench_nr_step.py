"""NR train-step throughput measurement (one dtype/remat variant per run).

Measures the full v8 training step (frozen ViT+VGG encode, decoder
forward/backward, optimizer update) on the attached device at the
production shapes (256² render / 224² ViT input), reporting ms/step and
frames/s. One variant per process: rerunning in a fresh process avoids
HBM fragmentation and compilation-cache crosstalk between variants.

Usage:
  python -m nerf_qa_tpu.tools.bench_nr_step --variant bf16r --batch 4
  python -m nerf_qa_tpu.tools.bench_nr_step --forward --batch 8

Variants: f32 (fp32 decoder), bf16 (bf16 decoder convs), bf16r (bf16 +
jax.checkpoint on each RefineUp stage). PARITY.md records the measured
numbers; train_nr exposes the same knobs as --decoder-dtype/--remat.

``--forward`` measures the SERVING path instead (the score/serve --nr
forward: encode + decoder + DISTS scoring, deterministic, no grads) with
a per-stage breakdown from separately jitted stages — the fused number
is the one that matters; the splits locate regressions/improvements.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="NR train-step benchmark")
    p.add_argument("--variant", choices=("f32", "bf16", "bf16r"),
                   default="bf16")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--vit-depth", type=int, default=12)
    p.add_argument("--forward", action="store_true",
                   help="measure the serving forward (encode+decode+score) "
                        "with a per-stage breakdown instead of the train "
                        "step")
    p.add_argument("--no-breakdown", action="store_true",
                   help="--forward: skip the separately-jitted per-stage "
                        "splits (3 extra cold compiles) — bench.py's "
                        "budget-bounded section uses this")
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)

    # bench.py runs this as a budget-bounded subprocess: persistent-cache
    # the big NR compiles so repeat runs deserialize inside the budget
    from nerf_qa_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax

    from nerf_qa_tpu.config import DISTSConfig, NRModelConfig, TrainConfig
    from nerf_qa_tpu.core.vgg import init_vgg16_params
    from nerf_qa_tpu.models.nr.model import NRModel
    from nerf_qa_tpu.models.nr.vit import ViTS14
    from nerf_qa_tpu.train.nr_train import NRTrainer

    b = args.batch
    dd = "float32" if args.variant == "f32" else "bfloat16"
    remat = args.variant.endswith("r")
    rng = np.random.default_rng(0)
    gt = rng.random((b, 256, 256, 3), dtype=np.float32)
    render = np.clip(gt + 0.05, 0, 1)
    r224 = rng.random((b, 224, 224, 3), dtype=np.float32)

    cfg = NRModelConfig(
        transformer_decoder_depth=2, refine_up_depth=2, dropout_rate=0.2,
        decoder_dtype=dd, remat=remat,
        dists=DISTSConfig(compute_dtype="bfloat16"),
    )
    model = NRModel(init_vgg16_params(seed=0), cfg=cfg,
                    vit=ViTS14(depth=args.vit_depth))
    if args.forward:
        return _bench_forward(args, model, render, r224)
    trainer = NRTrainer(
        model, TrainConfig(lr=1e-4, schedule="constant", batch_size=b),
        steps_per_epoch=100,
    )
    params, state, opt, key = trainer.init(seed=0)

    t0 = time.perf_counter()
    params, state, opt, losses, key = trainer.train_step(
        params, state, opt, gt, render, r224, key
    )
    # host-read the loss, not just block_until_ready: through the axon
    # tunnel the latter can ack at enqueue for arg-passing programs
    float(losses["combined"])
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(args.iters):
        params, state, opt, losses, key = trainer.train_step(
            params, state, opt, gt, render, r224, key
        )
    float(losses["combined"])
    dt = (time.perf_counter() - t0) / args.iters

    result = {
        "variant": args.variant,
        "batch": b,
        "ms_per_step": round(dt * 1e3, 1),
        "frames_per_sec": round(b / dt, 2),
        "compile_s": round(compile_s, 1),
        "loss": round(float(losses["combined"]), 4),
        "device": str(jax.devices()[0]),
    }
    if args.json:
        print(json.dumps(result))
    else:
        print(f"{args.variant} B={b}: {result['ms_per_step']} ms/step "
              f"({result['frames_per_sec']} fr/s) "
              f"compile {result['compile_s']}s loss {result['loss']}")


def _bench_forward(args, model, render, r224) -> None:
    """Serving-forward benchmark with per-stage breakdown."""
    import jax
    import jax.numpy as jnp

    params, state = model.init(seed=0)
    render = jnp.asarray(render)
    r224 = jnp.asarray(r224)
    # frozen weights as jit args — closure constants bloat the serialized
    # executable to >300 MB (model.frozen_params docstring)
    frozen = jax.device_put(model.frozen_params())

    @jax.jit
    def _full(fz, p, x256, x224):
        return model.forward(p, x256, x224, deterministic=True, state=state,
                             frozen=fz)

    def full(p, x256, x224):
        return _full(frozen, p, x256, x224)

    @jax.jit
    def _encode(fz, x256, x224):
        return model.encode(x256, x224, frozen=fz)

    def encode(x256, x224):
        return _encode(frozen, x256, x224)

    @jax.jit
    def _decode(fz, p, feats):
        (predicted, reg_map), _ = model.apply_decoder(
            p, feats, deterministic=True, state=state, frozen=fz
        )
        return predicted, reg_map

    def decode(p, feats):
        return _decode(frozen, p, feats)

    @jax.jit
    def _score(fz, feats, predicted, reg_map):
        s, _ = model._compose_score(feats, predicted, reg_map, fz)
        return s

    def score(feats, predicted, reg_map):
        return _score(frozen, feats, predicted, reg_map)

    def _sync(out):
        # block_until_ready alone can return at enqueue-ack (not
        # completion) through the axon tunnel for arg-passing programs
        # (observed: a 190 ms forward "measured" at 0.6 ms); pulling one
        # scalar-sized leaf to the host cannot complete early.
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf if leaf.ndim == 0 else leaf.ravel()[:1])
        jax.block_until_ready(out)

    def timed(fn, *fargs):
        out = fn(*fargs)
        _sync(out)
        t0 = time.perf_counter()
        # keep only the newest output alive: the encode/decode pyramids
        # are ~0.5 GB each at B=8, so holding all iters' outputs (as the
        # first build of this bench did) exhausts HBM. Additionally
        # bound the number of IN-FLIGHT executions: dispatching all
        # iters unsynced OOMed the standalone encode at B=32 (~2 GB of
        # pyramid per queued execution). A sync every 4 iters costs one
        # ~30 ms tunnel round-trip against ≥250 ms stage times at that
        # batch (<3% inflation) and keeps ≤4 outputs resident.
        for i in range(args.iters):
            out = fn(*fargs)
            if (i + 1) % 4 == 0:
                _sync(out)
        _sync(out)
        return (time.perf_counter() - t0) / args.iters, out

    dt_full, _ = timed(full, params, render, r224)
    result = {
        "mode": "serving_forward",
        "variant": args.variant,
        "batch": args.batch,
        "iters": args.iters,
        "ms_forward": round(dt_full * 1e3, 1),
        "frames_per_sec": round(args.batch / dt_full, 2),
        "device": str(jax.devices()[0]),
    }
    if not args.no_breakdown:
        dt_enc, feats = timed(encode, render, r224)
        dt_dec, (predicted, reg_map) = timed(decode, params, feats)
        dt_score, _ = timed(score, feats, predicted, reg_map)
        result["ms_encode"] = round(dt_enc * 1e3, 1)
        result["ms_decoder"] = round(dt_dec * 1e3, 1)
        result["ms_scoring"] = round(dt_score * 1e3, 1)
    if args.json:
        print(json.dumps(result))
    elif args.no_breakdown:
        print(f"forward B={args.batch}: {result['ms_forward']} ms "
              f"({result['frames_per_sec']} fr/s)")
    else:
        print(f"forward B={args.batch}: {result['ms_forward']} ms "
              f"({result['frames_per_sec']} fr/s) = encode "
              f"{result['ms_encode']} + decoder {result['ms_decoder']} + "
              f"scoring {result['ms_scoring']} (separate-jit splits)")


if __name__ == "__main__":
    main()
