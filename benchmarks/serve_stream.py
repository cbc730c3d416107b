"""Measure serving-path throughput on the real chip vs its ceilings.

VERDICT r2 #4: the serve stream must be compared against the step-only
forward rate *with the H2D relay ceiling quantified* (numbers, not
adjectives). Three measurements in one process:

  1. resident forward rate: jitted forward_feature on a device-resident
     batch (no H2D) — the compute ceiling;
  2. raw H2D bandwidth of this TPU attachment (axon network relay here;
     PCIe on a real host);
  3. predict_stream throughput over host numpy batches — what a robot
     stack actually gets.

The relay ceiling for serving is h2d_bw / (224*224*3 bytes per uint8
image); a healthy pipeline lands near min(compute ceiling, relay ceiling).

Usage: python benchmarks/serve_stream.py [--batch 64] [--n-batches 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n-batches", type=int, default=30)
    ap.add_argument("--backbone", default="facebook/deit-base-patch16-224")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from theia_tpu.models.rvfm import Theia
    from theia_tpu.serving import Predictor

    model = Theia(backbone=args.backbone, dtype=jnp.bfloat16, fast_math=True,
                  fuse_preprocessing=True)
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (args.batch, 224, 224, 3), np.uint8)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(imgs[:2]), method=model.forward_feature
    )["params"]

    # 1. resident forward rate (device-resident input, chained, one readback)
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x, method=model.forward_feature))
    dev = jnp.asarray(imgs)

    def run_n(n):
        t = time.perf_counter()
        out = None
        for _ in range(n):
            out = fwd(params, dev)
        float(out.sum())
        return time.perf_counter() - t

    run_n(2)
    t1, tn = run_n(1), run_n(31)
    resident_ips = args.batch / max((tn - t1) / 30, 1e-9)

    # 2. raw H2D and D2H bandwidth of this attachment (compile-warm; see
    # benchmarks/_util.py)
    from benchmarks._util import d2h_bandwidth, h2d_bandwidth

    h2d_bw = h2d_bandwidth()
    d2h_bw = d2h_bandwidth()

    in_bytes = 224 * 224 * 3  # uint8 image
    out0 = fwd(params, dev)
    out_bytes = int(out0.dtype.itemsize * np.prod(out0.shape[1:]))
    # serving moves BOTH directions over the relay: image in, features out.
    # Serialized (half-duplex, worst case) and overlapped (full-duplex,
    # best case) transfer ceilings in images/sec:
    serial_ceiling_ips = 1.0 / (in_bytes / h2d_bw + out_bytes / d2h_bw)
    duplex_ceiling_ips = min(h2d_bw / in_bytes, d2h_bw / out_bytes)
    relay_ceiling_ips = serial_ceiling_ips

    # 3. predict_stream over host batches (each a fresh numpy array);
    # same-process A/B of the f32 vs bf16 readback path (bf16 halves the
    # dominant D2H bytes on this wire-bound attachment)
    batches = [rng.randint(0, 256, (args.batch, 224, 224, 3), np.uint8)
               for _ in range(args.n_batches)]

    def stream_rate(pred):
        for _ in pred.predict_stream(iter(batches[:3])):  # warm compile + path
            pass
        t = time.perf_counter()
        n_out = 0
        for out in pred.predict_stream(iter(batches)):
            n_out += out.shape[0]
        return n_out / (time.perf_counter() - t)

    stream_ips = stream_rate(Predictor(model, params, buckets=(args.batch,), depth=2))
    stream_bf16_ips = stream_rate(
        Predictor(model, params, buckets=(args.batch,), depth=2, out_dtype=jnp.bfloat16)
    )

    bf16_serial_ceiling_ips = 1.0 / (in_bytes / h2d_bw + out_bytes / 2 / d2h_bw)
    bound = min(resident_ips, relay_ceiling_ips)
    print(json.dumps({
        "stream_images_per_sec": round(stream_ips, 1),
        "stream_bf16_readback_images_per_sec": round(stream_bf16_ips, 1),
        "bf16_relay_serial_ceiling_images_per_sec": round(bf16_serial_ceiling_ips, 1),
        "resident_forward_images_per_sec": round(resident_ips, 1),
        "h2d_bandwidth_MB_per_s": round(h2d_bw / 1e6, 1),
        "d2h_bandwidth_MB_per_s": round(d2h_bw / 1e6, 1),
        "bytes_per_image_in_out": [in_bytes, out_bytes],
        "relay_serial_ceiling_images_per_sec": round(serial_ceiling_ips, 1),
        "relay_duplex_ceiling_images_per_sec": round(duplex_ceiling_ips, 1),
        "stream_fraction_of_binding_ceiling": round(stream_ips / bound, 3),
        "binding_ceiling": "transfer" if relay_ceiling_ips < resident_ips else "compute",
        "batch": args.batch,
        "n_batches": args.n_batches,
    }))


if __name__ == "__main__":
    main()
