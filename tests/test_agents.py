"""Agent tests: every algorithm's jitted update runs, changes the right
parameters, and produces finite losses. Networks are shrunk for CPU speed
except where the architecture pins shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgqn_carla_tpu.agents import make_agent
from sgqn_carla_tpu.agents.factory import ALGORITHMS
from sgqn_carla_tpu.core.config import Config
from sgqn_carla_tpu.data.overlay import get_overlay_pool
from sgqn_carla_tpu.data.replay import ReplayBuffer

A = 2  # action dim


def _cfg(algo, **kw):
    base = dict(
        algorithm=algo, num_shared_layers=4, num_filters=8, hidden_dim=32,
        projection_dim=16, batch_size=4, soda_batch_size=4, init_steps=1,
        train_steps=100,
    )
    base.update(kw)
    return Config(**base).finalize()


def _filled_buffer(cfg, T=3, num_envs=2):
    buf = ReplayBuffer(num_envs=num_envs, episode_len=T,
                       capacity=num_envs * T * 2, image_size=cfg.image_size,
                       action_size=A, batch_size=cfg.batch_size)
    state = buf.init()
    rng = np.random.RandomState(0)
    s = cfg.image_size
    state = buf.add_reset(state, jnp.asarray(
        rng.randint(0, 255, (num_envs, 9, s, s)), jnp.uint8))
    for t in range(T):
        state = buf.add(
            state,
            jnp.asarray(rng.uniform(-1, 1, (num_envs, A)), jnp.float32),
            jnp.asarray(rng.uniform(0, 1, (num_envs,)), jnp.float32),
            jnp.asarray(rng.randint(0, 255, (num_envs, 9, s, s)), jnp.uint8))
    return buf, state


def _pool(cfg):
    return jnp.asarray(get_overlay_pool(cfg.image_crop_size,
                                        cfg.image_crop_size, num=4))


def _mk(algo, **kw):
    cfg = _cfg(algo, **kw)
    agent = make_agent((9, cfg.image_crop_size, cfg.image_crop_size), (A,),
                       cfg, overlay_pool=_pool(cfg))
    state = agent.init_state(jax.random.PRNGKey(0))
    buf, rstate = _filled_buffer(cfg)
    return agent, state, buf, rstate


class TestPackedTrunk:
    """nets.trunk_packed_apply: grouped-conv packing of g trunk forwards
    must be numerically equivalent to g separate Trunk.apply calls, with
    tied-group param cotangents summing (docs/PERF.md learner notes)."""

    def test_forward_matches_separate(self):
        from sgqn_carla_tpu.agents import nets
        trunk = nets.Trunk(num_shared_layers=4, num_head_layers=1,
                           num_filters=8)
        x1 = jax.random.uniform(jax.random.PRNGKey(2), (2, 9, 84, 84)) * 255
        x2 = jax.random.uniform(jax.random.PRNGKey(3), (2, 9, 84, 84)) * 255
        p1 = trunk.init(jax.random.PRNGKey(0), x1)["params"]
        p2 = trunk.init(jax.random.PRNGKey(1), x1)["params"]
        f1, f2, f3 = nets.trunk_packed_apply(
            [p1, p2, p1], [x1, x2, x2], num_shared_layers=4,
            num_head_layers=1)
        for f, p, x in ((f1, p1, x1), (f2, p2, x2), (f3, p1, x2)):
            ref = trunk.apply({"params": p}, x)
            np.testing.assert_allclose(np.asarray(f), np.asarray(ref),
                                       atol=1e-5)

    def test_tied_group_grads_sum(self):
        from sgqn_carla_tpu.agents import nets
        trunk = nets.Trunk(num_shared_layers=3, num_filters=8)
        x1 = jax.random.uniform(jax.random.PRNGKey(2), (2, 9, 84, 84)) * 255
        x2 = jax.random.uniform(jax.random.PRNGKey(3), (2, 9, 84, 84)) * 255
        p = trunk.init(jax.random.PRNGKey(0), x1)["params"]

        def packed(p):
            a, b = nets.trunk_packed_apply([p, p], [x1, x2], 3, 0)
            return jnp.sum(a ** 2) + jnp.sum(jnp.sin(b))

        def separate(p):
            a = trunk.apply({"params": p}, x1)
            b = trunk.apply({"params": p}, x2)
            return jnp.sum(a ** 2) + jnp.sum(jnp.sin(b))

        gp = jax.tree_util.tree_leaves(jax.grad(packed)(p))
        gs = jax.tree_util.tree_leaves(jax.grad(separate)(p))
        for a, b in zip(gp, gs):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestPackedEquivalence:
    """The packed update (SGQN_PACKED=1, default) must match the separate-
    forward formulation: identical attribution masks and critic targets,
    and a critic step that lands on the same parameters."""

    def _pair(self, algo, monkeypatch, **kw):
        kw.setdefault("precision", "f32")
        monkeypatch.setenv("SGQN_PACKED", "0")
        a0, s0, buf, rs = _mk(algo, **kw)
        monkeypatch.setenv("SGQN_PACKED", "1")
        a1, s1, _, _ = _mk(algo, **kw)
        return a0, s0, a1, s1, buf, rs

    @pytest.mark.parametrize("algo", ["sac", "svea", "sgsac"])
    def test_critic_step_matches(self, algo, monkeypatch):
        kw = (dict(num_shared_layers=11, num_filters=8)
              if algo == "sgsac" else {})
        a0, s0, a1, s1, buf, rs = self._pair(algo, monkeypatch, **kw)
        n0, m0 = a0.update(s0, rs, buf)
        n1, m1 = a1.update(s1, rs, buf)
        np.testing.assert_allclose(float(m0["critic_loss"]),
                                   float(m1["critic_loss"]), rtol=1e-4)
        for g0, g1 in zip(jax.tree_util.tree_leaves(n0.params["critic"]),
                          jax.tree_util.tree_leaves(n1.params["critic"])):
            np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                                       rtol=1e-3, atol=1e-5)
        for g0, g1 in zip(jax.tree_util.tree_leaves(n0.params["trunk"]),
                          jax.tree_util.tree_leaves(n1.params["trunk"])):
            np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                                       rtol=1e-3, atol=1e-5)

    def test_sgsac_mask_and_targets_match(self, monkeypatch):
        a0, s0, a1, s1, buf, rs = self._pair(
            "sgsac", monkeypatch, num_shared_layers=11, num_filters=8)
        key = jax.random.PRNGKey(7)
        batch = a0.sample_batch(buf, rs, key)
        ctx0 = a0.update_context(s0, batch, key)
        ctx1 = a1.update_context(s1, batch, key)
        np.testing.assert_array_equal(np.asarray(ctx0["mask"]),
                                      np.asarray(ctx1["mask"]))
        t0 = a0.critic_target_values(s0, batch, key, ctx0)
        t1 = a1.critic_target_values(s1, batch, key, ctx1)
        np.testing.assert_allclose(np.asarray(t0), np.asarray(t1),
                                   rtol=1e-4, atol=1e-5)


class TestActions:
    def test_select_deterministic(self):
        agent, state, _, _ = _mk("sac")
        obs = jnp.zeros((9, 84, 84), jnp.uint8)
        a1 = agent.select_action(state, obs)
        a2 = agent.select_action(state, obs)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        assert a1.shape == (1, A)
        assert (np.abs(np.asarray(a1)) <= 1).all()

    def test_sample_stochastic(self):
        agent, state, _, _ = _mk("sac")
        obs = jnp.zeros((9, 84, 84), jnp.uint8)
        a1 = agent.sample_action(state, obs, jax.random.PRNGKey(1))
        a2 = agent.sample_action(state, obs, jax.random.PRNGKey(2))
        assert (np.asarray(a1) != np.asarray(a2)).any()


@pytest.mark.parametrize("algo", sorted(ALGORITHMS))
def test_update_runs_and_is_finite(algo):
    kw = {}
    if algo == "sgsac":
        # decoder spatial math needs the full 11-layer trunk → keep defaults
        kw = dict(num_shared_layers=11, num_filters=8)
    agent, state, buf, rstate = _mk(algo, **kw)
    state1, metrics = agent.update(state, rstate, buf)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{algo}: {k} not finite"
    assert "critic_loss" in metrics
    # two more updates exercise both cond branches (freqs = 2)
    state2, _ = agent.update(state1, rstate, buf)
    state3, m3 = agent.update(state2, rstate, buf)
    assert int(state3.step) == 3
    # parameters actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.params["trunk"], state3.params["trunk"])
    assert max(jax.tree_util.tree_leaves(moved)) > 0, f"{algo}: trunk frozen"


def test_sgsac_consistency_fill_color():
    """--consistency_fill color: per-sample RGB fill (tiled over the frame
    stack) replaces the reference's gray scalar; the update stays finite
    and the default path is untouched (agents/sgsac.py::_fill)."""
    agent, state, buf, rstate = _mk("sgsac", num_shared_layers=11,
                                    num_filters=8,
                                    consistency_fill="color",
                                    consistency_fill_p=1.0)
    obs = jnp.arange(2 * 9 * 4 * 4, dtype=jnp.float32).reshape(2, 9, 4, 4)
    f = agent._fill(jax.random.PRNGKey(0), obs)
    assert f.shape == (2, 9, 1, 1)
    fn = np.asarray(f)[:, :, 0, 0]
    # per-frame color: channels repeat across the 3 stacked frames
    assert np.allclose(fn[:, :3], fn[:, 3:6]) and np.allclose(
        fn[:, :3], fn[:, 6:9])
    assert (fn >= float(obs.min())).all() and (fn <= float(obs.max())).all()
    # colored, not gray: channels differ within a sample
    assert (np.abs(fn[:, 0] - fn[:, 1]) > 1e-3).any()
    # dose p=0 must reduce every sample to one scalar (the easy fill)
    agent0, *_ = _mk("sgsac", num_shared_layers=11, num_filters=8,
                     consistency_fill="color", consistency_fill_p=0.0)
    f0 = np.asarray(agent0._fill(jax.random.PRNGKey(0), obs))
    assert np.unique(f0).size == 1
    # warmup curriculum: before `consistency_fill_warmup` updates the
    # fill is the reference scalar; after, the colored dose activates
    agw, *_ = _mk("sgsac", num_shared_layers=11, num_filters=8,
                  consistency_fill="color", consistency_fill_p=1.0,
                  consistency_fill_warmup=100)
    pre = np.asarray(agw._fill(jax.random.PRNGKey(0), obs, jnp.int32(5)))
    post = np.asarray(agw._fill(jax.random.PRNGKey(0), obs, jnp.int32(200)))
    assert np.unique(pre).size == 1
    assert np.unique(post).size > 1
    _, metrics = agent.update(state, rstate, buf)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    # default stays the reference scalar
    agent2, *_ = _mk("sgsac", num_shared_layers=11, num_filters=8)
    f2 = agent2._fill(jax.random.PRNGKey(0), obs)
    assert f2.shape == ()


def test_target_updates_lag_params():
    agent, state, buf, rstate = _mk("sac")
    for _ in range(4):
        state, _ = agent.update(state, rstate, buf)
    diff_t = jax.tree_util.tree_map(
        lambda p, t: float(jnp.max(jnp.abs(p - t))),
        state.params["critic"], state.target_params["critic"])
    assert max(jax.tree_util.tree_leaves(diff_t)) > 0  # target lags


def test_alpha_moves():
    agent, state, buf, rstate = _mk("sac")
    a0 = float(state.log_alpha)
    for _ in range(4):
        state, _ = agent.update(state, rstate, buf)
    assert float(state.log_alpha) != a0


def test_q_target_clip_bounds_backup():
    """--q_target_clip caps the TD target at the return bound (collapse
    stabilizer, core/config.py); off by default (reference parity)."""
    agent, state, buf, rstate = _mk("sac", q_target_clip=0.5)
    batch = agent.sample_batch(buf, rstate, jax.random.PRNGKey(1))
    # inflate the backup: huge rewards would push targets far past the clip
    batch = batch.replace(reward=batch.reward + 1e3)
    tq = agent.critic_target_values(state, batch, jax.random.PRNGKey(2))
    assert float(jnp.max(jnp.abs(tq))) <= 0.5
    agent2, state2, buf2, rstate2 = _mk("sac")  # default: unclipped
    batch2 = agent2.sample_batch(buf2, rstate2, jax.random.PRNGKey(1))
    batch2 = batch2.replace(reward=batch2.reward + 1e3)
    tq2 = agent2.critic_target_values(state2, batch2, jax.random.PRNGKey(2))
    assert float(jnp.max(tq2)) > 0.5


def test_q_head_layernorm_opt_in():
    """--q_head_layernorm inserts LayerNorm scale/bias into both Q heads
    (collapse-study stabilizer probe, core/config.py); the update still runs
    and is finite; off by default (reference parity: plain MLP heads,
    modules.py:235-246)."""
    agent, state, buf, rstate = _mk("sac", q_head_layernorm=True)
    q1 = state.params["critic"]["Q1"]
    assert any("LayerNorm" in k for k in q1), sorted(q1)
    state1, metrics = agent.update(state, rstate, buf)
    assert np.isfinite(float(metrics["critic_loss"]))
    agent0, state0, _, _ = _mk("sac")
    assert not any("LayerNorm" in k for k in state0.params["critic"]["Q1"])


class TestGuidedBackprop:
    def test_guided_relu_gates_both(self):
        from sgqn_carla_tpu.ops.guided_backprop import guided_relu

        def f(x):
            return jnp.sum(guided_relu(x) * jnp.asarray([1.0, 1.0, -1.0, -1.0]))

        x = jnp.asarray([1.0, -1.0, 1.0, -1.0])
        g = jax.grad(f)(x)
        # grad passes only where input>0 AND upstream grad>0
        np.testing.assert_allclose(np.asarray(g), [1.0, 0.0, 0.0, 0.0])

    def test_attribution_mask_quantile(self):
        from sgqn_carla_tpu.ops.guided_backprop import compute_attribution_mask

        grad = jnp.asarray(np.random.RandomState(0).randn(2, 9, 16, 16),
                           jnp.float32)
        mask = compute_attribution_mask(grad, 0.9)
        assert mask.shape == (2, 9, 16, 16)
        frac = np.asarray(mask[:, :3]).mean()
        assert 0.05 < frac < 0.20  # ~10% of pixels above the 0.9 quantile

    def test_row_quantile_bisect_exact(self):
        """The bisection select (production) must return bit-identical
        order statistics to the top_k formulation it replaced — ties,
        zero rows, and assorted quantiles included."""
        from sgqn_carla_tpu.ops.guided_backprop import (
            _row_quantile, _row_quantile_topk)

        rng = np.random.RandomState(7)
        for trial in range(12):
            n = int(rng.choice([50, 64, 100, 600]))
            rows = int(rng.randint(1, 6))
            q = float(rng.choice([0.9, 0.95, 0.98]))
            x = np.abs(rng.randn(rows, n)).astype(np.float32)
            if trial % 3 == 0:
                x = (x * 4).round() / 4        # heavy ties
            if trial % 4 == 0:
                x[:, : n // 3] = 0.0           # zero plateaus
            got = np.asarray(_row_quantile(jnp.asarray(x), q))
            ref = np.asarray(_row_quantile_topk(jnp.asarray(x), q))
            np.testing.assert_array_equal(got, ref)

    def test_sgsac_attribution_shapes(self):
        agent, state, buf, rstate = _mk("sgsac", num_shared_layers=11,
                                        num_filters=8)
        obs = jnp.asarray(
            np.random.RandomState(0).randint(0, 255, (2, 9, 84, 84)),
            jnp.float32)
        act = jnp.zeros((2, A))
        grad = agent.attribution_grad(state.params, obs, act)
        assert grad.shape == obs.shape
        assert np.abs(np.asarray(grad)).sum() > 0


class TestTdAnomalyGate:
    """docs/PERF.md collapse study: the measured onset is a critic-loss
    burst ~10x its running EMA that poisons the policy within one episode
    chunk (runs/flag_r2). The gate freezes critic params + optimizer through
    burst updates; normal updates are untouched."""

    def test_gate_off_matches_reference_state(self):
        agent, state, _, _ = _mk("sac", td_anomaly_gate=0.0)
        assert state.critic_loss_ema is None

    def test_normal_update_passes_and_tracks_ema(self):
        agent, state, buf, rstate = _mk("sac")
        assert float(state.critic_loss_ema) == 0.0
        s1, m = agent.update(state, rstate, buf)
        assert float(m["td_gate_fired"]) == 0.0
        assert float(s1.critic_loss_ema) > 0.0
        # critic params moved
        q_before = jax.tree_util.tree_leaves(state.params["critic"])[0]
        q_after = jax.tree_util.tree_leaves(s1.params["critic"])[0]
        assert (np.asarray(q_before) != np.asarray(q_after)).any()

    def test_burst_update_is_rejected(self):
        from sgqn_carla_tpu.agents.sac import SAC

        agent, state, buf, rstate = _mk("sac")
        # arm the gate (past warmup) with a tiny EMA so any real loss bursts
        state = state.replace(step=jnp.int32(SAC.GATE_WARMUP + 1),
                              critic_loss_ema=jnp.float32(1e-8))
        s1, m = agent.update(state, rstate, buf)
        assert float(m["td_gate_fired"]) == 1.0
        # critic params and optimizer are frozen through the burst
        for a, b in zip(jax.tree_util.tree_leaves(state.params["critic"]),
                        jax.tree_util.tree_leaves(s1.params["critic"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.params["trunk"]),
                        jax.tree_util.tree_leaves(s1.params["trunk"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # the EMA ignored the burst (stays tiny, keeping the gate armed)
        assert float(s1.critic_loss_ema) == pytest.approx(1e-8)

    def test_burst_forensics_snapshot(self):
        """The first gate-flagged minibatch's replay provenance + per-sample
        TD errors are captured in AgentState.burst_log and held until the
        driver drains it (docs/PERF.md open collapse trigger)."""
        from sgqn_carla_tpu.agents.sac import SAC

        agent, state, buf, rstate = _mk("sac")
        assert int(state.burst_log["valid"]) == 0
        # normal update: nothing recorded
        s0, m0 = agent.update(state, rstate, buf)
        assert float(m0["td_gate_fired"]) == 0.0
        assert int(s0.burst_log["valid"]) == 0
        # forced burst: snapshot written
        step0 = SAC.GATE_WARMUP + 1
        state = state.replace(step=jnp.int32(step0),
                              critic_loss_ema=jnp.float32(1e-8))
        s1, m1 = agent.update(state, rstate, buf)
        assert float(m1["td_gate_fired"]) == 1.0
        bl = jax.device_get(s1.burst_log)
        assert int(bl["valid"]) == 1
        assert int(bl["step"]) == step0
        B = agent.cfg.batch_size
        for k in ("env_i", "ep_i", "s", "slot_ep", "reward", "td1", "td2"):
            assert bl[k].shape == (B,), k
        assert np.all(np.isfinite(bl["td1"])) and np.all(np.isfinite(bl["td2"]))
        # provenance indices in range; slot write ordinals ≤ ep_counter
        assert (bl["env_i"] >= 0).all() and (bl["env_i"] < buf.num_envs).all()
        assert (bl["ep_i"] >= 0).all() and (bl["ep_i"] < buf.num_episodes).all()
        assert (bl["slot_ep"] <= int(bl["ep_counter"])).all()
        # TD arrays never leak into the metrics stream
        assert "_td1" not in m1 and "_td2" not in m1
        # a second burst does NOT overwrite the held snapshot
        s1 = s1.replace(critic_loss_ema=jnp.float32(1e-8),
                        step=jnp.int32(step0 + 2))
        s2, m2 = agent.update(s1, rstate, buf)
        assert float(m2["td_gate_fired"]) == 1.0
        assert int(jax.device_get(s2.burst_log)["step"]) == step0

    def test_latch_breaker_releases_sustained_freeze(self):
        """cfg.td_gate_latch: a freeze sustained past the latch window is a
        loss-regime shift, not an anomaly — the EMA snaps to the observed
        loss, the freeze releases, the cooldown zeroes (measured live:
        runs/flag_r5 seed 2 froze at fired=1.0 for >5k updates without
        this)."""
        from sgqn_carla_tpu.agents.sac import SAC

        agent, state, buf, rstate = _mk("sac", td_gate_cooldown=3,
                                        td_gate_latch=2)
        state = state.replace(step=jnp.int32(SAC.GATE_WARMUP + 1),
                              critic_loss_ema=jnp.float32(1e-8))
        s1, m1 = agent.update(state, rstate, buf)  # burst 1: frozen
        assert float(m1["td_gate_frozen"]) == 1.0
        assert float(m1["td_gate_latched"]) == 0.0
        assert int(s1.gate_latch) == 1
        s2, m2 = agent.update(s1, rstate, buf)     # burst 2: latch fires
        assert float(m2["td_gate_latched"]) == 1.0
        assert float(m2["td_gate_frozen"]) == 0.0
        assert int(s2.gate_latch) == 0
        assert int(s2.gate_cooldown) == 0
        # EMA snapped to the observed loss (regime accepted), params moved
        assert float(s2.critic_loss_ema) == pytest.approx(
            float(m2["critic_loss"]), rel=1e-5)
        changed = any(
            (np.asarray(a) != np.asarray(b)).any()
            for a, b in zip(jax.tree_util.tree_leaves(s1.params["critic"]),
                            jax.tree_util.tree_leaves(s2.params["critic"])))
        assert changed

    def test_burst_forensics_off_with_gate(self):
        agent, state, _, _ = _mk("sac", td_anomaly_gate=0.0)
        assert state.burst_log is None

    def test_cooldown_freezes_follow_on_updates(self):
        """--td_gate_cooldown: the measured cascade (docs/PERF.md collapse
        signature) compounds through follow-on updates that sit BELOW the
        burst threshold; with a cooldown the whole agent (critic, trunk,
        actor, alpha) sits frozen for K updates after a burst."""
        from sgqn_carla_tpu.agents.sac import SAC

        agent, state, buf, rstate = _mk("sac", td_gate_cooldown=3)
        assert int(state.gate_cooldown) == 0
        # force a burst at an actor-update step (even step, freq 2)
        step0 = SAC.GATE_WARMUP + 2
        state = state.replace(step=jnp.int32(step0),
                              critic_loss_ema=jnp.float32(1e-8))
        s1, m = agent.update(state, rstate, buf)
        assert float(m["td_gate_fired"]) == 1.0
        assert float(m["td_gate_frozen"]) == 1.0
        assert int(s1.gate_cooldown) == 3
        # actor/alpha frozen on the burst step despite step % freq == 0
        for a, b in zip(jax.tree_util.tree_leaves(state.params["actor"]),
                        jax.tree_util.tree_leaves(s1.params["actor"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # simulate a recovered loss level: next update is BELOW the burst
        # threshold but still inside the cooldown -> frozen, counter ticks
        s1 = s1.replace(critic_loss_ema=jnp.float32(1e8))
        s2, m2 = agent.update(s1, rstate, buf)
        assert float(m2["td_gate_fired"]) == 0.0
        assert float(m2["td_gate_frozen"]) == 1.0
        assert int(s2.gate_cooldown) == 2
        for a, b in zip(jax.tree_util.tree_leaves(s1.params["critic"]),
                        jax.tree_util.tree_leaves(s2.params["critic"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(s1.params["actor"]),
                        jax.tree_util.tree_leaves(s2.params["actor"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # run the cooldown out: updates resume
        s3 = s2.replace(gate_cooldown=jnp.int32(0))
        s4, m4 = agent.update(s3, rstate, buf)
        assert float(m4["td_gate_frozen"]) == 0.0
        q_before = jax.tree_util.tree_leaves(s3.params["critic"])[0]
        q_after = jax.tree_util.tree_leaves(s4.params["critic"])[0]
        assert (np.asarray(q_before) != np.asarray(q_after)).any()
