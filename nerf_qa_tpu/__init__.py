"""nerf_qa_tpu — TPU-native framework for NeRF-render quality assessment.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of the
reference PyTorch codebase ``kobejean/nerf-qa``:

* ``core``     — DISTS / ADISTS perceptual metric math on a VGG16 feature
  pyramid (reference: nerf_qa/DISTS_pytorch/DISTS_pt.py, nerf_qa/ADISTS/ADISTS.py)
* ``ops``      — TPU compute primitives (L2 pooling, fused statistic
  reductions, bilinear resize) with Pallas kernels for the hot paths
* ``models``   — full-reference MOS regression heads and the no-reference
  feature-hallucination model family (reference: model.py, model_stats.py,
  model_nr*.py)
* ``data``     — host-side datasets, scene-balanced samplers, batch pipeline
* ``parallel`` — device mesh / sharding layer (data-parallel frame scoring,
  pjit train steps)
* ``train``    — optax training loops (FR + NR), schedules, CV driver
* ``eval``     — video scoring + PLCC/SRCC/KTCC correlation evaluation
* ``logging``  — metric collection/aggregation (frame→video→scene)
* ``compat``   — torch checkpoint converters (VGG16, weights.pt α/β, model.pth)
"""

__version__ = "0.1.0"
