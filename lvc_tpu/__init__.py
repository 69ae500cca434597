"""lvc_tpu: a TPU-native (JAX/XLA/Pallas) few-shot object detection framework.

A ground-up rebuild of the capabilities of prannaykaul/lvc ("Label, Verify,
Correct", CVPR 2022) — a Faster R-CNN/FPN few-shot detector plus the
pseudo-labelling pipeline (candidate mining -> kNN label verification ->
cascade box correction -> retraining) — designed TPU-first:

- fixed-shape, masked tensor programs everywhere (XLA-compilable),
- Pallas/XLA kernels replacing the reference's CUDA ops
  (RoIAlign, batched NMS, anchor generation),
- `jax.sharding.Mesh` + jit for data parallelism instead of DDP/NCCL,
- functional flax models with pytree checkpoint surgery.
"""

__version__ = "0.1.0"
