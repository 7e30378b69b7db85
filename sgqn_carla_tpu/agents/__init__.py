from sgqn_carla_tpu.agents.factory import make_agent  # noqa: F401
