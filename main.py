"""CLI entry point (SURVEY.md §2.13, §3.1): `python main.py --flags...`.

Reference parity: same flag surface as [R main.py] (see
dvdgan_tpu/utils/config.py) plus `--preset` for the five BASELINE configs,
e.g. `python main.py --preset smoke`.
"""

from __future__ import annotations

import jax

from dvdgan_tpu.train.trainer import Trainer
from dvdgan_tpu.utils.config import parse_config


def main(argv=None):
    cfg = parse_config(argv)
    print(f"devices: {jax.devices()}")
    print(cfg)
    trainer = Trainer(cfg)
    try:
        metrics = trainer.train()
        print("final:", metrics)
        trainer.dump_samples(step=cfg.total_step)
    finally:
        trainer.close()


if __name__ == "__main__":
    main()
