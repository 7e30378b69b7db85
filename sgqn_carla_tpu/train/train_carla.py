"""CARLA-twin training CLI (reference: src/train_carla.py).

Reuses the shared training loop with the twin env factory. The reference's
dual UE4 servers (train on port 2000, color_easy eval on port 2003,
train_carla.py:98-152) become two env instances; its PyQt5 live reward
dashboards (utils.py:348-489) are replaced by the JSONL logs.
"""

from __future__ import annotations

from sgqn_carla_tpu.core.config import parse_args
from sgqn_carla_tpu.envs.carla_twin import make_carla_env
from sgqn_carla_tpu.train.loop import run_training


def main(argv=None):
    from sgqn_carla_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()
    cfg = parse_args(argv)
    if cfg.domain_name != "carla":
        cfg = cfg.replace(domain_name="carla", task_name="drive")
    return run_training(cfg, env_factory=make_carla_env)


if __name__ == "__main__":
    main()
