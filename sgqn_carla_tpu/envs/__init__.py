from sgqn_carla_tpu.envs.base import DMCPixelEnv, EnvState, StepResult, make_env  # noqa: F401
