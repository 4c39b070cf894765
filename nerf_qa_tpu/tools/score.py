"""Score image pairs, frame directories, or mp4 videos with DISTS/ADISTS.

Reference behavior, unified into one driver: the metric __main__ CLIs
(DISTS_pt.py:220-238, ADISTS/ADISTS.py:206-224 — score one image pair)
and the per-video evaluation loops (run_test2.py:278-297,
train-nr.py:305-315 — per-frame scores mean-pooled to a video score).

TPU design: frames batch through the jitted FrameScorer pipeline (bf16
MXU convs + fused statistics by default; --fp32 for the parity oracle);
ADISTS jits one fixed-shape batch step. Inputs can be single images,
directories of frames, or mp4 files (MJPEG mp4s decode through the
native demuxer with no ffmpeg).

No-reference mode (--nr): scores renders WITHOUT ground truth through a
trained NR model (the capability the reference only exposes inside
train-nr.py's test loop, :299-375) — pass a train_nr orbax checkpoint
via --nr-ckpt and the same architecture flags the model was trained
with.

Examples:
  python -m nerf_qa_tpu.tools.score --ref r0.png --dist r1.png
  python -m nerf_qa_tpu.tools.score --ref gt_dir --dist render_dir \\
      --metric both --full-size --out-csv scores.csv
  python -m nerf_qa_tpu.tools.score --dist render_dir --nr \\
      --nr-ckpt runs/nr/ckpt --out-csv nr_scores.csv
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _load_frames(path: str, resize: bool, keep_aspect: bool) -> np.ndarray:
    from nerf_qa_tpu.data.imaging import load_prepared
    from nerf_qa_tpu.data.video import load_video_frames

    if os.path.isdir(path) or path.endswith((".mp4", ".mov")):
        return load_video_frames(path, resize=resize,
                                 keep_aspect_ratio=keep_aspect)
    img = load_prepared(path, resize=resize, keep_aspect_ratio=keep_aspect)
    return img[None]


class NRScorer:
    """Warm no-reference scorer: render frames -> (256², 224²) -> NRModel
    forward (train-nr.py:305-315 per-video semantics). Built once, jitted
    once; reused by the score CLI and the serving daemon."""

    def __init__(self, args, vgg):
        import jax

        from nerf_qa_tpu.compat import pretrained
        from nerf_qa_tpu.compat.checkpoint import restore_checkpoint
        from nerf_qa_tpu.config import DISTSConfig, NRModelConfig
        from nerf_qa_tpu.models.nr.model import NRModel
        from nerf_qa_tpu.models.nr.vit import ViTS14

        if not args.nr_ckpt:
            raise SystemExit("--nr needs --nr-ckpt (a train_nr checkpoint dir)")
        cfg = NRModelConfig(
            version=args.nr_version,
            refine_up_depth=args.refine_up_depth,
            transformer_decoder_depth=args.transformer_decoder_depth,
            dists=DISTSConfig(
                compute_dtype="float32" if args.fp32 else "bfloat16"
            ),
        )
        model = NRModel(
            vgg, cfg=cfg, vit=ViTS14(depth=args.vit_depth),
            vit_params=pretrained.resolve_vit_params(
                getattr(args, "vit_ckpt", None), depth=args.vit_depth
            ),
            jbu_params=(pretrained.resolve_jbu_params(
                getattr(args, "jbu_ckpt", None)) if cfg.version >= 7 else None),
        )
        restored = restore_checkpoint(args.nr_ckpt)
        if restored is None:
            raise SystemExit(f"no checkpoint found in {args.nr_ckpt}")
        _, ckpt = restored
        self.params, self.state = ckpt["params"], ckpt.get("state") or {}
        if "dists_alpha_beta" in ckpt:
            # fine-tuned alpha/beta imported alongside the decoder
            # (compat/torch_nr) — score with them, not the bundled ones
            import jax.numpy as jnp

            from nerf_qa_tpu.core.dists import DISTSWeights

            ab = ckpt["dists_alpha_beta"]
            model.dists_weights = DISTSWeights(
                jnp.asarray(ab["alpha"]), jnp.asarray(ab["beta"])
            )
        # frozen weights as jit args (not closure constants): keeps the
        # serialized executable small enough that the persistent-cache
        # load beats recompiling (model.frozen_params docstring)
        self._frozen = jax.device_put(model.frozen_params())
        self._step = jax.jit(
            lambda fz, p, s, a, b: model.forward(p, a, b, state=s, frozen=fz)
        )
        self.batch_size = args.batch_size

    def prep_frames(self, frames: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Host resize to the model's fixed (256², 224²) inputs — shapes
        become request-size-independent, so frames from different
        requests can share device batches (serve.FrameBatcher)."""
        from nerf_qa_tpu.data.imaging import resize_image

        r256 = np.stack([resize_image(f, 256, 256) for f in frames])
        r224 = np.stack([resize_image(f, 224, 224) for f in frames])
        return r256, r224

    def step_batch(self, r256, r224):
        """One fixed-shape device step over prepped frames."""
        return self._step(self._frozen, self.params, self.state, r256, r224)

    def score_frames(self, frames: np.ndarray) -> np.ndarray:
        """Per-frame NR scores for full-size float frames (N,H,W,3)."""
        from nerf_qa_tpu.eval.video_scorer import batched_map

        r256, r224 = self.prep_frames(frames)
        # Always run the full compiled batch shape (batched_map pads the
        # ragged tail by repeating the last row): clamping to len(frames)
        # would trigger a fresh XLA compile per distinct request size in
        # the serve daemon, stalling the device lock for tens of seconds.
        return batched_map(self.step_batch, (r256, r224), self.batch_size)


def _score_nr(args, vgg) -> int:
    """No-reference scoring CLI path (see NRScorer)."""
    frames = _load_frames(args.dist, resize=False, keep_aspect=False)
    out = NRScorer(args, vgg).score_frames(frames)
    n = len(out)

    if args.out_csv:
        rows = [f"{i},{out[i]:.6f}" for i in range(n)]
        with open(args.out_csv, "w") as f:
            f.write("frame,nr_score\n" + "\n".join(rows) + "\n")
    summary = {"nr": {"video_score": round(float(out.mean()), 6),
                      "frames": n}}
    if args.json:
        print(json.dumps(summary))
    else:
        print(f"nr: {summary['nr']['video_score']:.4f}  "
              f"(mean of {n} frame scores)")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="DISTS/ADISTS/NR scoring for image pairs or videos"
    )
    p.add_argument("--ref", default=None,
                   help="reference image, frame directory, or mp4 "
                        "(not needed with --nr)")
    p.add_argument("--dist", required=True,
                   help="distorted image, frame directory, or mp4")
    p.add_argument("--nr", action="store_true",
                   help="no-reference mode: score renders with a trained "
                        "NR model (needs --nr-ckpt)")
    p.add_argument("--nr-ckpt", default=None,
                   help="train_nr orbax checkpoint directory")
    p.add_argument("--nr-version", type=int, default=8)
    p.add_argument("--refine-up-depth", type=int, default=2)
    p.add_argument("--transformer-decoder-depth", type=int, default=2)
    p.add_argument("--vit-depth", type=int, default=12)
    p.add_argument("--metric", choices=("dists", "adists", "both"),
                   default="dists")
    p.add_argument("--full-size", action="store_true",
                   help="score at source resolution (no resize-to-256)")
    p.add_argument("--keep-aspect", action="store_true",
                   help="aspect-preserving resize (shortest side 256)")
    p.add_argument("--fp32", action="store_true",
                   help="fp32 parity mode (default: bf16 serving path)")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--out-csv", default=None,
                   help="write per-frame scores as CSV")
    p.add_argument("--json", action="store_true",
                   help="print one JSON line instead of text")
    from nerf_qa_tpu.compat import pretrained

    pretrained.add_backbone_args(p)
    args = p.parse_args(argv)

    from nerf_qa_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax.numpy as jnp

    from nerf_qa_tpu.config import ADISTSConfig, DISTSConfig
    from nerf_qa_tpu.core import adists
    from nerf_qa_tpu.eval.video_scorer import FrameScorer

    dtype = "float32" if args.fp32 else "bfloat16"
    vgg = pretrained.resolve_vgg_params(getattr(args, "vgg_ckpt", None))

    if args.nr:
        return _score_nr(args, vgg)

    if args.ref is None:
        p.error("--ref is required (or use --nr for no-reference mode)")
    ref = _load_frames(args.ref, not args.full_size, args.keep_aspect)
    dist = _load_frames(args.dist, not args.full_size, args.keep_aspect)
    if ref.shape != dist.shape:
        raise SystemExit(
            f"ref/dist shapes differ: {ref.shape} vs {dist.shape}"
        )
    n = ref.shape[0]
    bs = min(args.batch_size, n)

    results: dict[str, np.ndarray] = {}
    if args.metric in ("dists", "both"):
        cfg = DISTSConfig(compute_dtype=dtype,
                          stats_impl="xla" if args.fp32 else "pallas")
        weights = pretrained.resolve_dists_weights(
            cfg, getattr(args, "dists_weights", None)
        )
        scorer = FrameScorer(vgg, weights, cfg, resize_to=None)
        results["dists"] = scorer.score_frames(dist, ref, batch_size=bs)
    if args.metric in ("adists", "both"):
        import jax

        acfg = ADISTSConfig(compute_dtype=dtype)
        vgg_dev = jax.device_put(vgg)  # arg, not a 60 MB closure constant

        @jax.jit
        def _astep(vp, x, y):
            return adists.forward(vp, x, y, acfg, as_loss=False)

        def astep(x, y):
            return _astep(vgg_dev, x, y)

        out = np.empty((n,), np.float32)
        for lo in range(0, n, bs):
            hi = min(lo + bs, n)
            db, rb = dist[lo:hi], ref[lo:hi]
            if hi - lo < bs:  # pad tail to keep the compiled shape
                pad = bs - (hi - lo)
                db = np.concatenate([db, np.repeat(db[-1:], pad, 0)])
                rb = np.concatenate([rb, np.repeat(rb[-1:], pad, 0)])
            scores = np.asarray(astep(jnp.asarray(db), jnp.asarray(rb)))
            out[lo:hi] = scores[: hi - lo]
        results["adists"] = out

    if args.out_csv:
        header = "frame," + ",".join(results)
        rows = [
            f"{i}," + ",".join(f"{results[m][i]:.6f}" for m in results)
            for i in range(n)
        ]
        with open(args.out_csv, "w") as f:
            f.write(header + "\n" + "\n".join(rows) + "\n")

    summary = {
        m: {"video_score": round(float(v.mean()), 6), "frames": n}
        for m, v in results.items()
    }
    if args.json:
        print(json.dumps(summary))
    else:
        for m, s in summary.items():
            print(f"{m}: {s['video_score']:.4f}  "
                  f"(mean of {s['frames']} frame scores)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
