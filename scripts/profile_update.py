"""Phase breakdown of the SGQN update (round-2 item #2: the update is the
training wall-clock bound at ~9-14 ms; find where the ms go).

Times, each as a scanned jitted loop at batch 128 against a randomized
replay ring: the full sgsac update, the plain SAC update (no consistency /
aux), the guided-backprop attribution alone, the quantile mask alone, and
the aux BCE step alone.

Usage: python scripts/profile_update.py [batch] [inner]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def make_ring(buffer):
    rstate = buffer.init()
    rnp = np.random.RandomState(0)
    return rstate.replace(
        frames=jnp.asarray(rnp.randint(0, 256, rstate.frames.shape, np.uint8)),
        actions=jnp.asarray(rnp.uniform(-1, 1, rstate.actions.shape)
                            .astype(np.float32)),
        rewards=jnp.asarray(rnp.uniform(0, 1, rstate.rewards.shape)
                            .astype(np.float32)),
        num_eps=jnp.int32(buffer.num_episodes),
        ep_counter=jnp.int32(buffer.num_episodes),
    )


def main():
    from sgqn_carla_tpu.agents import make_agent
    from sgqn_carla_tpu.core.config import Config
    from sgqn_carla_tpu.data.replay import ReplayBuffer
    from sgqn_carla_tpu.ops.guided_backprop import compute_attribution_mask

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    inner = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    buffer = ReplayBuffer(num_envs=8, episode_len=250, capacity=16_000,
                          image_size=84, action_size=6, batch_size=batch)
    rstate = make_ring(buffer)

    precision = os.environ.get("SGQN_PROFILE_PRECISION", "bf16")

    def upd_loop(algo):
        cfg = Config(domain_name="walker", task_name="walk", algorithm=algo,
                     batch_size=batch, precision=precision).finalize()
        agent = make_agent((9, 84, 84), (6,), cfg)
        astate = agent.init_state(jax.random.PRNGKey(0))

        @jax.jit
        def run(astate, rstate):
            def body(a, _):
                a, m = agent._update(a, rstate, buffer)
                return a, m["critic_loss"]
            astate, losses = jax.lax.scan(body, astate, None, length=inner)
            return losses.sum()
        return timeit(run, astate, rstate), agent, astate

    t_sgsac, agent, astate = upd_loop("sgsac")
    t_sac, _, _ = upd_loop("sac")
    t_svea, _, _ = upd_loop("svea")

    # isolated attribution (guided fwd+bwd) and mask (quantile) passes
    obs = jnp.asarray(np.random.RandomState(1).randint(
        0, 256, (batch, 9, 84, 84), np.uint8)).astype(jnp.float32)
    act = jnp.asarray(np.random.RandomState(2).uniform(
        -1, 1, (batch, 6)).astype(np.float32))

    @jax.jit
    def attr_loop(obs):
        def body(o, _):
            g = agent.attribution_grad(astate.params, o, act)
            return o + 1e-12 * g.sum(), g.sum()
        o, s = jax.lax.scan(body, obs, None, length=inner)
        return s.sum()

    @jax.jit
    def mask_loop(obs):
        def body(o, _):
            m = compute_attribution_mask(o, 0.95)
            return o + 1e-12 * m.sum(), m.sum()
        o, s = jax.lax.scan(body, obs, None, length=inner)
        return s.sum()

    from sgqn_carla_tpu.ops.guided_backprop import _row_quantile_topk

    def topk_mask(obs_grad, quantile=0.95):
        b, c, h, w = obs_grad.shape
        g = obs_grad.reshape(b, 3, 3, h, w)
        attr = jnp.max(jnp.abs(g), axis=2)
        q = _row_quantile_topk(attr.reshape(b * 3, h * w),
                               quantile).reshape(b, 3)
        m = attr >= q[:, :, None, None]
        return jnp.repeat(m, 3, axis=1)

    @jax.jit
    def topkmask_loop(obs):
        def body(o, _):
            m = topk_mask(o, 0.95)
            return o + 1e-12 * m.sum(), m.sum()
        o, s = jax.lax.scan(body, obs, None, length=inner)
        return s.sum()

    def sort_mask(obs_grad, quantile=0.95):
        """Round-2 formulation (full jnp.quantile sort) for the A/B."""
        b, c, h, w = obs_grad.shape
        masks = []
        for i in (0, 3, 6):
            attr = jnp.max(jnp.abs(obs_grad[:, i:i + 3]), axis=1)
            q = jnp.quantile(attr.reshape(b, -1), quantile, axis=1)
            masks.append(jnp.repeat((attr >= q[:, None, None])[:, None], 3,
                                    axis=1))
        return jnp.concatenate(masks, axis=1)

    @jax.jit
    def sortmask_loop(obs):
        def body(o, _):
            m = sort_mask(o, 0.95)
            return o + 1e-12 * m.sum(), m.sum()
        o, s = jax.lax.scan(body, obs, None, length=inner)
        return s.sum()

    t_attr = timeit(attr_loop, obs)
    t_mask = timeit(mask_loop, obs)
    t_topkmask = timeit(topkmask_loop, obs)
    t_sortmask = timeit(sortmask_loop, obs)

    ms = lambda t: round(1e3 * t / inner, 3)
    print(json.dumps({
        "batch": batch, "inner": inner, "precision": precision,
        "concat": os.environ.get("SGQN_SGSAC_CONCAT", "0"),
        "packed": os.environ.get("SGQN_PACKED", "1"),
        "sgsac_update_ms": ms(t_sgsac),
        "sac_update_ms": ms(t_sac),
        "svea_update_ms": ms(t_svea),
        "attribution_pass_ms": ms(t_attr),
        "quantile_mask_bisect_ms": ms(t_mask),
        "quantile_mask_topk_ms": ms(t_topkmask),
        "quantile_mask_sort_ms": ms(t_sortmask),
    }))


if __name__ == "__main__":
    main()
