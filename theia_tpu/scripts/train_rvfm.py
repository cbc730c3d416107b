"""Training CLI (reference: src/theia/scripts/train/train_rvfm.py + torchrun).

Usage:
    python -m theia_tpu.scripts.train_rvfm [config_name] [overrides...]
    python -m theia_tpu.scripts.train_rvfm training.batch_size=32 dataset.dataset_root=/data

Multi-host: launch once per TPU host (jax.distributed auto-init via
theia_tpu.parallel.distributed when TPU env vars are present).
"""

from __future__ import annotations

import sys

from theia_tpu.config import load_config
from theia_tpu.parallel.distributed import maybe_initialize_distributed
from theia_tpu.train.loop import train_from_config


def main(argv: list[str] | None = None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] in ("-h", "--help"):
        print(
            "usage: theia-train [CONFIG_NAME] [group/name=value|dotted.key=value ...]\n"
            "  CONFIG_NAME   root config under theia_tpu/configs/ "
            "(default: train_rvfm_imagenet)\n"
            "  overrides     hydra-style, e.g. model/backbone=deit_reg "
            "training.batch_size=32"
        )
        return
    config_name = "train_rvfm_imagenet"
    if argv and "=" not in argv[0]:
        config_name = argv.pop(0)
    cfg = load_config(config_name, overrides=argv)
    maybe_initialize_distributed()
    summary = train_from_config(cfg)
    print(summary)


if __name__ == "__main__":
    main()
