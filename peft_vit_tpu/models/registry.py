"""Custom-model extension contract.

The reference ships stub modules documenting how users plug their own
architectures into the benchmark: any module exposing
``get_cls_model(config)`` (models/cls_example.py:4-17) or
``get_zeroshot_model(config)`` (models/clip_example.py:4-23) is
dispatched by ``MODEL.NAME``.  The TPU-native analog: register a builder
under a name (or point ``MODEL.NAME`` at a ``module:function`` path) and
the factory hands the whole model construction to it.

A builder has the factory's own contract::

    def build(cfg, spec: PEFTSpec, num_classes: int, rng) ->
        (model, variables, encode_text_fn_or_None)

* ``model`` — a flax module whose ``__call__(x, train)`` returns logits
  (the classifier contract) and which may expose ``forward_features`` /
  ``encode_image`` for the feature-extraction paths.
* ``variables`` — ``{"params": ..., optionally "batch_stats": ...}``.
* ``encode_text_fn`` — ``f(token_ids) -> (B, D) features`` for zero-shot
  evaluation, or ``None`` for supervised-only models.

Usage::

    from peft_vit_tpu.models.registry import register_model

    @register_model("my_tiny_net")
    def build_my_tiny_net(cfg, spec, num_classes, rng):
        ...
        return model, {"params": params}, None

    # cfg.MODEL.NAME = "my_tiny_net"        (registered name), or
    # cfg.MODEL.NAME = "mypkg.nets:build"   (import path, no registration)
"""

from __future__ import annotations

import importlib
from typing import Callable, Dict, Optional

_BUILDERS: Dict[str, Callable] = {}


def register_model(name: str) -> Callable:
    """Decorator: register ``builder(cfg, spec, num_classes, rng)`` under
    ``name`` for MODEL.NAME dispatch.  Last registration wins (so tests
    and notebooks can re-register freely)."""

    def deco(fn: Callable) -> Callable:
        _BUILDERS[str(name)] = fn
        return fn

    return deco


def get_custom_builder(name: str) -> Optional[Callable]:
    """Resolve ``name`` to a registered builder, or import a
    ``module:function`` / ``module.function`` path; None when ``name``
    is not a custom model (the factory falls through to its built-ins)."""
    if name in _BUILDERS:
        return _BUILDERS[name]
    if ":" in name:
        mod, _, attr = name.partition(":")
        return getattr(importlib.import_module(mod), attr)
    return None
