from sgqn_carla_tpu.core.config import Config, parse_args  # noqa: F401
