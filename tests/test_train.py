"""End-to-end training-driver smoke test (tiny config, cartpole)."""

import json
import os

import jax
import numpy as np
import pytest

from sgqn_carla_tpu.core.config import Config
from sgqn_carla_tpu.train.loop import run_training, work_dir_for


def test_run_training_end_to_end(tmp_path):
    cfg = Config(
        domain_name="cartpole", task_name="balance", algorithm="sac",
        train_steps=6, init_steps=2, eval_freq=3, save_freq=3,
        episode_length=8, action_repeat=4, eval_episodes=2, num_envs=2,
        batch_size=4, num_shared_layers=4, num_filters=8, hidden_dim=32,
        projection_dim=16, log_dir=str(tmp_path), seed=7, eval_mode="color_easy",
    ).finalize()
    out = run_training(cfg)
    wd = work_dir_for(cfg)
    assert os.path.exists(os.path.join(wd, "info.log"))
    assert os.path.exists(os.path.join(wd, "train.log"))
    rows = [json.loads(l) for l in open(os.path.join(wd, "train.log"))]
    assert any("episode_reward" in r for r in rows)
    assert any("critic_loss" in r for r in rows)
    # eval log with the test-env metric
    erows = [json.loads(l) for l in open(os.path.join(wd, "eval.log"))]
    assert any("episode_reward" in r for r in erows)
    assert any("episode_reward_test_env_color_easy" in r for r in erows)
    # checkpoint saved
    model_dir = os.path.join(wd, "model")
    assert os.path.isdir(model_dir) and len(os.listdir(model_dir)) > 0
    for v in out["final_metrics"].values():
        assert np.isfinite(v)
