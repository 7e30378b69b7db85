"""Core substrate tests: config, tolerance rewards, logger, mesh."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgqn_carla_tpu.core.config import Config, parse_args
from sgqn_carla_tpu.core.logger import Logger
from sgqn_carla_tpu.parallel import MeshSpec, make_mesh
from sgqn_carla_tpu.physics import rewards


class TestConfig:
    def test_defaults_finalize(self):
        cfg = Config().finalize()
        assert cfg.image_size == 84 and cfg.image_crop_size == 84  # sgsac default

    def test_crop_policy(self):
        # reference arguments.py:137-142
        for algo in ("rad", "curl", "pad", "soda"):
            cfg = Config(algorithm=algo).finalize()
            assert cfg.image_size == 100 and cfg.image_crop_size == 84
        for algo in ("sac", "drq", "svea", "sgsac"):
            cfg = Config(algorithm=algo).finalize()
            assert cfg.image_size == 84 and cfg.image_crop_size == 84

    def test_k_suffix(self):
        cfg = parse_args(["--train_steps", "600k", "--algorithm", "sac"])
        assert cfg.train_steps == 600_000

    def test_bad_algorithm(self):
        with pytest.raises(AssertionError):
            Config(algorithm="nope").finalize()

    def test_eval_mode_none(self):
        cfg = parse_args(["--eval_mode", "none"])
        assert cfg.eval_mode is None

    def test_hashable(self):
        hash(Config().finalize())  # must be usable as a jit static arg


class TestTolerance:
    """Golden values computed from the dm_control formulas (reference:
    src/env/dm_control/dm_control/utils/rewards.py:28-130)."""

    def test_in_bounds(self):
        assert float(rewards.tolerance(0.5, bounds=(0.0, 1.0))) == 1.0

    def test_margin_zero_outside(self):
        assert float(rewards.tolerance(2.0, bounds=(0.0, 1.0), margin=0.0)) == 0.0

    def test_gaussian_value_at_margin(self):
        # exactly `value_at_margin` at distance == margin
        v = float(rewards.tolerance(2.0, bounds=(0.0, 1.0), margin=1.0,
                                    value_at_margin=0.1))
        assert abs(v - 0.1) < 1e-6

    @pytest.mark.parametrize(
        "sigmoid", ["gaussian", "hyperbolic", "long_tail", "cosine", "linear",
                     "quadratic", "tanh_squared"],
    )
    def test_all_sigmoids_monotone(self, sigmoid):
        xs = jnp.linspace(1.0, 4.0, 50)
        v_at_1 = 0.0 if sigmoid in ("cosine", "linear", "quadratic") else 0.1
        vals = rewards.tolerance(xs, bounds=(0.0, 1.0), margin=1.0,
                                 sigmoid=sigmoid, value_at_margin=max(v_at_1, 1e-3))
        assert float(vals[0]) >= float(vals[-1])
        assert (np.diff(np.asarray(vals)) <= 1e-6).all()

    def test_linear_walker_move_reward(self):
        # walker move reward shape: linear sigmoid, value_at_margin=0.5
        # (reference: suite/walker.py:153-157)
        v = float(rewards.tolerance(0.5, bounds=(1.0, float("inf")), margin=0.5,
                                    value_at_margin=0.5, sigmoid="linear"))
        assert abs(v - 0.5) < 1e-6

    def test_jit_and_vmap(self):
        f = jax.jit(lambda x: rewards.tolerance(x, bounds=(0.0, 1.0), margin=2.0))
        batched = jax.vmap(f)(jnp.linspace(-1, 2, 8))
        assert batched.shape == (8,)


class TestLogger:
    def test_jsonl_schema(self, tmp_path):
        log = Logger(str(tmp_path))
        log.log("train/episode_reward", 1.5, step=0)
        log.log("train/episode_reward", 2.5, step=0)
        log.log("train/critic_loss", jnp.float32(0.25), step=0)
        log.dump(step=10)
        rows = [json.loads(l) for l in open(tmp_path / "train.log")]
        assert rows[0]["episode_reward"] == 2.0  # averaged
        assert rows[0]["critic_loss"] == 0.25
        assert rows[0]["step"] == 10
        # meters cleared after dump
        log.dump(step=20)
        assert len(open(tmp_path / "train.log").readlines()) == 1

    def test_eval_routing(self, tmp_path):
        log = Logger(str(tmp_path))
        log.log("eval/episode_reward", 3.0, step=5)
        log.dump(step=5)
        assert os.path.exists(tmp_path / "eval.log")
        assert not os.path.exists(tmp_path / "train.log")


class TestMesh:
    def test_8_device_mesh(self):
        assert jax.device_count() == 8
        mesh = make_mesh(MeshSpec(data=8))
        assert mesh.shape["data"] == 8

    def test_sharded_psum(self):
        mesh = make_mesh(MeshSpec(data=8))
        from jax.sharding import NamedSharding, PartitionSpec as P

        x = jnp.arange(16.0).reshape(16, 1)
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))

        @jax.jit
        def total(v):
            return jnp.sum(v)

        assert float(total(xs)) == float(jnp.sum(x))


class TestGuardHealth:
    """Health-aware rollback targets (runs/flag_r2 failure: a periodic save
    landed on the collapse chunk and the guard restored the poisoned
    checkpoint until its budget was gone)."""

    def test_healthy_step_skips_poisoned_save(self, tmp_path):
        from sgqn_carla_tpu.core import checkpoint as ckpt

        d = str(tmp_path)
        for step, r in ((2, 900.0), (4, 910.0), (6, 271.0)):
            open(f"{d}/{step}.npz", "w").close()
            ckpt.record_health(d, step, r, 905.0)
        # best_ema 910: step 6 (save landed mid-collapse, min=271 < 455)
        # is skipped; step 4 is the newest healthy target
        assert ckpt.healthy_step(d, best_ema=910.0) == 4
        assert ckpt.latest_step(d) == 6

    def test_legacy_dir_without_health_records(self, tmp_path):
        from sgqn_carla_tpu.core import checkpoint as ckpt

        d = str(tmp_path)
        for step in (2, 4):
            open(f"{d}/{step}.npz", "w").close()
        assert ckpt.healthy_step(d, best_ema=910.0) == 4

    def test_all_poisoned_returns_none(self, tmp_path):
        from sgqn_carla_tpu.core import checkpoint as ckpt

        d = str(tmp_path)
        open(f"{d}/2.npz", "w").close()
        ckpt.record_health(d, 2, 10.0, 12.0)
        assert ckpt.healthy_step(d, best_ema=910.0) is None
