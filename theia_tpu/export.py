"""AOT deployment artifacts: serialize a Theia forward to StableHLO.

The reference's deployment story is "load the torch module in Python and
call it" (reference: README.md:23-38) — serving a robot stack therefore
drags the whole training framework (torch, transformers, the model source)
onto the robot. On TPU the natural artifact is the compiled program itself:
``jax.export`` lowers the jitted forward to versioned StableHLO with the
trained weights baked in as constants, producing ONE self-contained file
that any JAX runtime on the target platform can execute — no model code, no
checkpoint loading, no Python class versioning at serve time.

Properties of the artifact:
  - **batch-polymorphic**: exported with a symbolic batch dimension, so a
    single program serves any batch size (XLA re-specializes per concrete
    shape at run time; pair with ``serving.Predictor``-style bucketing if
    compile count matters on the serving host);
  - **multi-platform**: lowered for ``("tpu", "cpu")`` by default, so the
    same file runs on the TPU serving fleet and in CPU CI;
  - **forward-compatible**: jax.export's serialization is versioned with a
    compatibility window (calling convention + StableHLO), unlike pickled
    modules.

Usage:
    save_artifact("theia_tiny.stablehlo", model, params)
    pred = load_artifact("theia_tiny.stablehlo")
    feats = pred(images)          # uint8 [B,224,224,3] -> [B,T,C] float32
"""

from __future__ import annotations

import json
import struct
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

_MAGIC = b"THEIA-AOT-1\x00"


def export_model(
    model: Any,
    params: Any,
    *,
    method: str = "forward_feature",
    image_size: int = 224,
    channels: int = 3,
    out_dtype: Optional[Any] = None,
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> bytes:
    """Serialize ``model.apply`` (with ``params`` baked in) to a
    self-contained artifact with a symbolic batch dimension.

    Args:
        model: Theia module (or ``models.hub.PretrainedTheia`` wrapper).
        params: param pytree (ignored when ``model`` carries its own).
        method: "forward_feature" (spatial tokens) or "predict" (dict of
            per-teacher features, the module ``__call__``).
        out_dtype: optional on-device output cast (e.g. ``jnp.bfloat16``)
            to halve readback bytes on bandwidth-bound serving links.
        platforms: lowering targets; the artifact runs on any of them.
    """
    if hasattr(model, "model") and hasattr(model, "params"):
        params = model.params
        model = model.model
    if params is None:
        raise ValueError("params required when model is a bare module")
    if method == "forward_feature":
        fn = lambda x: model.apply({"params": params}, x, method=model.forward_feature)
    elif method == "predict":
        fn = lambda x: model.apply({"params": params}, x)
    else:
        raise ValueError(f"unknown method {method!r}")
    if out_dtype is not None:
        inner = fn
        fn = lambda x: jax.tree.map(lambda y: y.astype(out_dtype), inner(x))
    (b,) = jexport.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, image_size, image_size, channels), jnp.uint8)
    exp = jexport.export(jax.jit(fn), platforms=tuple(platforms))(spec)
    payload = exp.serialize()
    header = json.dumps(
        {
            "method": method,
            "image_size": image_size,
            "channels": channels,
            "out_dtype": None if out_dtype is None else jnp.dtype(out_dtype).name,
            "platforms": list(platforms),
        }
    ).encode()
    return _MAGIC + struct.pack("<I", len(header)) + header + payload


def save_artifact(path: str, model: Any, params: Any = None, **kw) -> None:
    """``export_model`` straight to a file."""
    with open(path, "wb") as f:
        f.write(export_model(model, params, **kw))


class ExportedPredictor:
    """A loaded artifact, callable like ``serving.Predictor`` — no model
    source or checkpoint needed on the serving host."""

    def __init__(self, blob: bytes) -> None:
        if not blob.startswith(_MAGIC):
            raise ValueError("not a theia-tpu AOT artifact")
        off = len(_MAGIC)
        (hlen,) = struct.unpack_from("<I", blob, off)
        off += 4
        self.meta = json.loads(blob[off : off + hlen].decode())
        self._exported = jexport.deserialize(blob[off + hlen :])
        self._upcast = self.meta["out_dtype"] in ("bfloat16", "float16")

    def __call__(self, images: np.ndarray) -> Any:
        """uint8 [B,H,W,C] -> features (float32 on host)."""
        out = self._exported.call(np.ascontiguousarray(images, dtype=np.uint8))
        post = (
            (lambda y: np.asarray(y).astype(np.float32))
            if self._upcast
            else (lambda y: np.asarray(y))
        )
        return jax.tree.map(post, out)


def load_artifact(path: str) -> ExportedPredictor:
    with open(path, "rb") as f:
        return ExportedPredictor(f.read())
