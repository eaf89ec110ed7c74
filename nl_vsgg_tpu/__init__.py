"""nl_vsgg_tpu — a TPU-native (JAX/XLA/Pallas) framework for weakly-supervised
Video Scene Graph Generation with the capabilities of NL-VSGG (ICLR 2025).

The reference implementation (rlqja1107/NL-VSGG) is a single-GPU PyTorch stack;
this framework is a ground-up redesign for TPU:

  * all compute-path code is JAX (jit/pjit/shard_map) over *padded, static-shape*
    relation/box layouts instead of ragged python loops,
  * hot geometry kernels (RoIAlign, union-box rasterization, IoU, NMS) are
    closed-form XLA or Pallas TPU kernels instead of CUDA/Cython,
  * parallelism is expressed with `jax.sharding.Mesh` + collectives (the
    reference has none),
  * the host-side runtime (dataset packing, feature IO) has a native C++ fast
    path.

Package layout
  ops/        geometry + kernel library (boxes, nms, roi_align, union masks)
  data/       Action Genome schema, grounding engine, padded Entry pytrees
  models/     STTran and DSG-DETR relation models (flax), matcher, tracking
  detector/   VinVL-style AttrRCNN (ResNeXt-152-C4) reimplemented in flax
  eval/       Recall@K / meanRecall@K scene-graph evaluation
  pipelines/  offline weak-supervision passes (TCS, triplet parsing, ADV,
              negative pseudo-labels)
  parallel/   mesh construction, sharded train/eval steps
  utils/      config, logging, checkpointing, GloVe
"""

__version__ = "0.1.0"
