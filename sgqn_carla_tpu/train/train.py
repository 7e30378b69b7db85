"""DMC training CLI (reference: src/train.py).

Usage mirrors the reference:
    python -m sgqn_carla_tpu.train.train --algorithm sgsac \
        --domain_name walker --task_name walk --eval_mode video_hard
"""

from __future__ import annotations

from sgqn_carla_tpu.core.cache import enable_persistent_cache
from sgqn_carla_tpu.core.config import parse_args
from sgqn_carla_tpu.train.loop import run_training


def main(argv=None):
    enable_persistent_cache()
    cfg = parse_args(argv)
    if cfg.domain_name == "carla":
        from sgqn_carla_tpu.train.train_carla import main as carla_main
        return carla_main(argv)
    return run_training(cfg)


if __name__ == "__main__":
    main()
