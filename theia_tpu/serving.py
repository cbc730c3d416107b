"""Batched TPU inference for Theia models (deployment/serving path).

The reference's published usage calls ``model.forward_feature`` on whatever
batch the robot stack hands it (reference: README.md:23-38). On TPU that
has two costs a serving loop must not pay per request: every new batch
shape triggers a fresh XLA compile, and synchronous call-per-request leaves
the chip idle during host work. ``Predictor`` provides the TPU-native
serving shape:

  - **bucketed static shapes**: inputs are zero-padded up to a fixed set of
    batch buckets, so at most ``len(buckets)`` programs ever compile
    (oversized batches are chunked by the largest bucket);
  - **pipelined streaming**: ``predict_stream`` exploits JAX's async
    dispatch — batch k+1 is dispatched before batch k's result is read
    back, overlapping H2D + host work with device compute.

Usage:
    pred = Predictor(from_pretrained("theaiinstitute/theia-tiny-...", ckpt))
    feats = pred(images)                       # uint8 [B,H,W,C] -> [B,T,C]
    for f in pred.predict_stream(batch_iter):  # pipelined
        ...
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Optional, Sequence

import jax
import numpy as np


class Predictor:
    """Bucketed, pipelined inference over a Theia module (or a
    ``models.hub.PretrainedTheia`` wrapper).

    Args:
        model: Theia module, or any object with ``.model``/``.params``.
        params: param pytree (ignored when ``model`` carries its own).
        buckets: allowed static batch sizes, ascending.
        method: "forward_feature" (spatial tokens) or "predict"
            (dict of per-teacher features, the module __call__).
    """

    def __init__(
        self,
        model: Any,
        params: Optional[Any] = None,
        *,
        buckets: Sequence[int] = (1, 4, 16, 64),
        method: str = "forward_feature",
    ) -> None:
        if hasattr(model, "model") and hasattr(model, "params"):
            params = model.params
            model = model.model
        if params is None:
            raise ValueError("params required when model is a bare module")
        self._params = params
        self._buckets = tuple(sorted(buckets))
        if method == "forward_feature":
            fn = lambda p, x: model.apply({"params": p}, x, method=model.forward_feature)
        elif method == "predict":
            fn = lambda p, x: model.apply({"params": p}, x)
        else:
            raise ValueError(f"unknown method {method!r}")
        self._fn = jax.jit(fn)

    def _bucket(self, n: int) -> int:
        for b in self._buckets:
            if n <= b:
                return b
        return self._buckets[-1]

    def _dispatch(self, images: np.ndarray):
        """Pad to a bucket and dispatch (async); returns (result, n)."""
        n = images.shape[0]
        b = self._bucket(n)
        if n < b:
            pad = np.zeros((b - n,) + images.shape[1:], images.dtype)
            images = np.concatenate([images, pad])
        return self._fn(self._params, images), n

    @staticmethod
    def _readback(result: Any, n: int) -> Any:
        return jax.tree.map(lambda y: np.asarray(y[:n]), result)

    def __call__(self, images: np.ndarray) -> Any:
        """Predict one batch (any size; chunked by the largest bucket)."""
        top = self._buckets[-1]
        chunks = [images[i : i + top] for i in range(0, images.shape[0], top)] or [images]
        # dispatch all chunks first (async), then read back
        return self._readback_group([self._dispatch(c) for c in chunks])

    def predict_stream(self, batches: Iterable[np.ndarray]) -> Iterator[Any]:
        """Pipelined prediction over a stream of batches, order-preserving:
        the next batch is dispatched before the previous result is read
        back, so host-side readback/prep overlaps device compute."""
        top = self._buckets[-1]
        prev = None
        for images in batches:
            images = np.asarray(images)
            # chunk oversize batches by the largest bucket so the static-shape
            # guarantee ("at most len(buckets) programs") holds here too;
            # chunks of one logical batch are reassembled on readback
            chunks = [images[i : i + top] for i in range(0, images.shape[0], top)] or [images]
            cur = [self._dispatch(c) for c in chunks]
            if prev is not None:
                yield self._readback_group(prev)
            prev = cur
        if prev is not None:
            yield self._readback_group(prev)

    def _readback_group(self, pending: list) -> Any:
        outs = [self._readback(r, n) for r, n in pending]
        if len(outs) == 1:
            return outs[0]
        return jax.tree.map(lambda *ys: np.concatenate(ys), *outs)
