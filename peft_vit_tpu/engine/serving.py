"""Model export and in-process serving.

The reference is a research codebase with no deployment story — a tuned
model exists only as a ``final_state.pth`` consumed by the same Python
tree that trained it (``lib/utils/utils.py:185-203``).  For production
serving of a PEFT-tuned classifier this module provides the two
TPU-native pieces:

* **Portable artifact** — ``export_classifier`` serializes the eval
  forward through ``jax.export`` (StableHLO): batch-polymorphic, runnable
  in a different process — or a different *framework version* — without
  the model-building Python code.  Multi-platform lowering (``platforms=
  ("cpu", "tpu")``) bakes both backends into one artifact.
* **In-process server** — ``ServingSession`` AOT-compiles the forward for
  a fixed set of batch buckets (XLA wants static shapes; compiling at
  load time moves the multi-second TPU compile out of the request path)
  and pads each request up to the smallest bucket.  Built with
  ``TPU.INT8_INFERENCE`` the forward runs the int8 MXU path measured at
  2.6x bf16 feature extraction (BASELINE.md round 3).

Weights are closed over as device constants, so the artifact/server is
self-contained: no param pytree travels with requests.
"""

from __future__ import annotations

import logging
from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def make_infer_fn(model, variables: dict) -> Callable:
    """Deterministic logits fn(images) with weights closed over.

    ``variables`` = {'params': ..., optional 'batch_stats': ...} exactly
    as built by models.factory.build_image_classifier.
    """

    def infer(images: jax.Array) -> jax.Array:
        return model.apply(variables, images, False)

    return infer


def export_classifier(
    model,
    variables: dict,
    image_size: int,
    *,
    dtype=jnp.float32,
    path: Optional[str] = None,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize the eval forward as a batch-polymorphic StableHLO artifact.

    Returns the serialized bytes (and writes them to ``path`` if given).
    ``platforms`` defaults to the current backend; pass ("cpu", "tpu") for
    an artifact loadable on either.
    """
    from jax import export as jexport

    fn = jax.jit(make_infer_fn(model, variables))
    (b,) = jexport.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, image_size, image_size, 3), dtype)
    exported = jexport.export(
        fn, platforms=tuple(platforms) if platforms else None
    )(spec)
    data = exported.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(data)
        logger.info(
            "=> exported %d-byte artifact (platforms %s) to %s",
            len(data),
            list(exported.platforms),
            path,
        )
    return data


def load_exported(src: Union[str, bytes]) -> Callable:
    """Load an ``export_classifier`` artifact -> jitted fn(images)->logits.

    Needs only jax — not the model code that produced the artifact.
    """
    from jax import export as jexport

    if isinstance(src, (str,)):
        with open(src, "rb") as f:
            src = f.read()
    exported = jexport.deserialize(bytearray(src))
    return jax.jit(exported.call)


class ServingSession:
    """Static-shape batched inference with ahead-of-time compilation.

    >>> sess = ServingSession(model, variables, image_size=224)
    >>> logits = sess.predict(images)          # (N, num_classes) np array

    ``buckets`` are the batch sizes compiled at construction; a request of
    N images is padded to the smallest bucket >= N (oversize requests are
    split into max-bucket chunks).  All compiles happen here, in load
    order, so the first request is served at steady-state latency.
    """

    def __init__(
        self,
        model,
        variables: dict,
        image_size: int,
        *,
        buckets: Sequence[int] = (1, 8, 32),
        dtype=jnp.float32,
    ):
        self.image_size = int(image_size)
        self.dtype = dtype
        self.buckets: Tuple[int, ...] = tuple(sorted(set(int(b) for b in buckets)))
        if not self.buckets or self.buckets[0] < 1:
            raise ValueError(f"bad buckets: {buckets}")
        fn = jax.jit(make_infer_fn(model, variables))
        self._compiled = {}
        for b in self.buckets:
            spec = jax.ShapeDtypeStruct(
                (b, self.image_size, self.image_size, 3), dtype
            )
            self._compiled[b] = fn.lower(spec).compile()
        logger.info(
            "=> serving session ready: buckets %s, image %d",
            self.buckets,
            self.image_size,
        )

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def predict(self, images: np.ndarray) -> np.ndarray:
        """(N, H, W, 3) -> (N, num_classes) logits; N arbitrary."""
        n = images.shape[0]
        if n == 0:
            raise ValueError("empty request")
        out = []
        start = 0
        max_b = self.buckets[-1]
        while start < n:
            take = min(max_b, n - start)
            b = self._bucket_for(take)
            chunk = np.zeros(
                (b, self.image_size, self.image_size, 3),
                jnp.dtype(self.dtype),
            )
            chunk[:take] = images[start : start + take]
            logits = self._compiled[b](jnp.asarray(chunk))
            out.append(np.asarray(logits[:take], np.float32))
            start += take
        return np.concatenate(out, axis=0)
