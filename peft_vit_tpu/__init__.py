"""peft_vit_tpu — a TPU-native parameter-efficient fine-tuning framework for
Vision Transformers.

A ground-up JAX / XLA / Pallas / pjit re-design with the capabilities of the
reference PyTorch codebase ``jkooy/Parameter-efficient-Fine-tuning-for-Vision-
Transformers`` (see /root/repo/SURVEY.md for the full capability inventory).

Design spine (vs. the reference):

* The reference duplicates a ~900-line ViT ~15x, varying only which delta
  module is injected.  Here there is ONE ViT (``models.vit``) whose blocks
  expose typed PEFT injection points driven by a single frozen dataclass,
  ``peft.PEFTSpec``.
* The reference's per-method ``requires_grad`` name filters (e.g.
  ``'adapter' in name`` at adapter_tuning_clip.py:117) become *pytree masks*
  (``peft.masks``) consumed by ``optax.masked`` — optimizer state exists only
  for trainable leaves.
* Attention runs through a Pallas flash-attention kernel (``ops.attention``)
  that takes an additive bias (RPB) and post-attention residual (LePE).
* Parallelism is a ``jax.sharding.Mesh`` with a ``data`` axis (the
  reference's DDP/NCCL, SURVEY §2.4) plus optional ``model`` axis hooks.
"""

__version__ = "0.1.0"
