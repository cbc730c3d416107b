"""Map profiled fusion names to their HLO definitions.

Compiles the tiny-cddsv train step, dumps optimized HLO, and prints the
definition lines (root + a few body lines) for the fusion names passed on
the command line (e.g. `python benchmarks/map_fusions.py fusion.2805 copy.1597`).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import CDDSV_TARGETS
    from theia_tpu.models.rvfm import Theia
    from theia_tpu.train.optim import constant_with_warmup, make_optimizer
    from theia_tpu.train.state import TrainState
    from theia_tpu.train.step import make_train_step

    batch_size = 256
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 256, (batch_size, 224, 224, 3), np.uint8))
    targets = {
        k: jnp.asarray(rng.randn(batch_size, s[1] * s[2], s[0]).astype(np.float32), jnp.bfloat16)
        for k, s in CDDSV_TARGETS.items()
    }
    model = Theia(
        backbone="facebook/deit-tiny-patch16-224",
        translator="lconv",
        target_feature_sizes=CDDSV_TARGETS,
        dtype=jnp.bfloat16,
        fuse_preprocessing=True,
        fast_math=True,
    )
    params = model.init(jax.random.PRNGKey(0), images[:2])["params"]
    tx = make_optimizer(constant_with_warmup(1e-3, 100), weight_decay=0.01)
    step = make_train_step(model, tx, main_loss="cos_l1")
    state = TrainState.create(params, tx)

    lowered = step._jitted.lower(state, images, targets, None)
    txt = lowered.compile().as_text()
    out = "/tmp/tiny_step_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {out} ({len(txt)} bytes)")

    names = sys.argv[1:]
    lines = txt.splitlines()
    for name in names:
        print("=" * 100)
        # find computation definition for this fusion: `%name.N (`? fusion
        # instruction line contains `fusion(...)`, with calls=%fused_computation...
        pat = re.compile(rf"%?{re.escape(name)} = ")
        for i, ln in enumerate(lines):
            if pat.search(ln):
                print(ln.strip()[:500])
                m = re.search(r"calls=%?([\w.\-_]+)", ln)
                if m:
                    comp = m.group(1)
                    # print the computation body
                    cpat = re.compile(rf"^%?{re.escape(comp)} ")
                    for j, ln2 in enumerate(lines):
                        if cpat.match(ln2.strip()) or ln2.strip().startswith(f"%{comp} "):
                            k = j
                            while k < len(lines) and not lines[k].strip().startswith("}"):
                                s = lines[k].strip()
                                if len(s) > 300:
                                    s = s[:300] + "..."
                                print("   ", s)
                                k += 1
                                if k - j > 40:
                                    print("    ... (truncated)")
                                    break
                            break
                break


if __name__ == "__main__":
    main()
