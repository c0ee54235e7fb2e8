"""mmtrack_tpu — a TPU-native multi-modal visual object tracking framework.

Built from scratch in JAX/XLA/Pallas/pjit with the capability surface of the
wxltop/Multi-Modal-Trakcing-Bechmark reference (RGB-D / RGB-T / RGB-E
single-object tracking): a unified config -> data -> model zoo -> tracker
runtime -> eval/metrics -> train stack, where each reference tracker is a
model + runtime recipe rather than a vendored fork.

Layer map (mirrors reference SURVEY.md section 1, redesigned TPU-first):
  L0 data       mmtrack_tpu.data       multi-modal frame composition, datasets,
                                       sampler, processing (device crop kernels)
  L1 training   mmtrack_tpu.train      actors, optax optimizers, trainer,
                                       orbax checkpointing
  L2 models     mmtrack_tpu.models     ViT-CE-prompt (ViPT), OSTrack, heads,
                                       DiMP family, SiamFC, ...
  L3 runtime    mmtrack_tpu.trackers   functional TrackerState + jitted
                                       track_step
  L4 metrics    mmtrack_tpu.eval       OPE curves, DepthTrack Pr/Re/F
  L5 protocol   mmtrack_tpu.eval.ope   OPE drivers, result writers
  L6 orchestr.  bench.py, tools/       benchmark entry points
  ||            mmtrack_tpu.parallel   device meshes, pjit train step,
                                       batched multi-sequence inference
"""

__version__ = "0.1.0"
