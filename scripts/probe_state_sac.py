"""State-input SAC probe for the flat pixel tasks (round-3 verdict item #4).

pendulum-swingup / point_mass-easy stayed flat and swimmer-swimmer6
plateaued under every pixel agent. Golden trajectories bound physics
*divergence*, not *learnability* (finger-spin precedent, docs/PERF.md), so
this probe separates "env defect" from "pixel-exploration hardness": train
a standard state-observation SAC directly on the framework's Task layer —
`Task.observe_fn` dict flattened to a vector, no rendering anywhere.

  * state-SAC learns, pixel agent doesn't  → expected SAC-from-pixels
    exploration hardness (the reference suite shows the same pattern);
  * state-SAC is also flat                 → the env itself is broken and
    gets probed like finger was.

Everything runs as fused `lax.scan` episode chunks (one dispatch per
episode — the axon runtime charges ~26 ms per dispatch, docs/PERF.md).

Usage: python scripts/probe_state_sac.py <domain> <task> [steps] [seed]
Prints one JSONL row per episode and a final summary JSON line.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sgqn_carla_tpu.core.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import struct

from sgqn_carla_tpu.agents import nets
from sgqn_carla_tpu.physics.domains import load as load_task

ACTION_REPEAT = 4
EPISODE_LEN = 1000  # control steps → 250 transitions
HIDDEN = 256
BATCH = 256
LR = 3e-4
TAU = 0.005
DISCOUNT = 0.99
INIT_STEPS = 1000  # random-policy transitions before updates
CAPACITY = 100_000


class Actor(nn.Module):
    action_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(HIDDEN)(x))
        x = nn.relu(nn.Dense(HIDDEN)(x))
        out = nn.Dense(2 * self.action_dim)(x)
        mu, log_std = jnp.split(out, 2, axis=-1)
        log_std = jnp.tanh(log_std)
        log_std = -10.0 + 0.5 * (2.0 - (-10.0)) * (log_std + 1)
        return mu, log_std


class Critic(nn.Module):
    @nn.compact
    def __call__(self, obs, act):
        q1 = nets.QFunction(HIDDEN)(obs, act)
        q2 = nets.QFunction(HIDDEN)(obs, act)
        return q1, q2


class ProbeState(struct.PyTreeNode):
    actor: dict
    critic: dict
    target: dict
    log_alpha: jnp.ndarray
    opt_a: tuple
    opt_c: tuple
    opt_al: tuple
    # flat replay ring
    r_obs: jnp.ndarray
    r_act: jnp.ndarray
    r_rew: jnp.ndarray
    r_next: jnp.ndarray
    ptr: jnp.ndarray
    filled: jnp.ndarray
    rng: jnp.ndarray


def flat_obs(task, phys):
    d = task.observe(phys)
    o = jnp.concatenate(
        [jnp.ravel(d[k]).astype(jnp.float32) for k in sorted(d)])
    # sanitize: the hopper probe NaN'd twice (round 4) at ~28-31k steps —
    # AFTER grad-norm clip + Q-bound rails — i.e. the non-finite enters
    # through the OBSERVATION under the learned policy's state
    # distribution (contact-solver blowup at extreme velocities; random-
    # action rollouts are finite). The pixel path is immune because
    # rendering saturates to uint8. Clip to a generous bound and zero
    # non-finites so the probe measures LEARNABILITY, not the tail
    # numerics of unbounded state readouts.
    return jnp.clip(jnp.nan_to_num(o, nan=0.0, posinf=50.0, neginf=-50.0),
                    -50.0, 50.0)


def main():
    domain, task_name = sys.argv[1], sys.argv[2]
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    task = load_task(domain, task_name)
    A = task.action_size
    rng = jax.random.PRNGKey(seed)
    phys0 = task.init(jax.random.PRNGKey(0))
    D = int(flat_obs(task, phys0).shape[0])
    print(json.dumps({"probe": f"{domain}-{task_name}", "obs_dim": D,
                      "action_dim": A, "steps": steps, "seed": seed}))

    actor_def, critic_def = Actor(A), Critic()
    # grad-norm clip: the hopper run diverged to NaN at ~27.75k steps with
    # plain adam (critic_loss ramp 17→19→NaN while roll-20 was ~268 and
    # climbing — round-4 rerun of the round-3 queue); standard SAC rails
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(LR))
    target_entropy = -float(A)
    # frame-skip-aware return bound: one transition spans ACTION_REPEAT
    # control steps → r_max = ACTION_REPEAT → bound r_max/(1−γ), with 10%
    # slack so the clip is a divergence rail, not a learning cap
    q_bound = 1.1 * ACTION_REPEAT / (1.0 - DISCOUNT)

    def env_step(phys, action):
        def body(p, _):
            p = task.step(p, action)
            return p, task.reward(p, action)
        phys, rs = jax.lax.scan(body, phys, None, length=ACTION_REPEAT)
        # same sanitization rationale as flat_obs: a blown-up phys state
        # must not poison the replay ring through the reward channel
        return phys, jnp.clip(jnp.nan_to_num(jnp.sum(rs)),
                              0.0, float(ACTION_REPEAT))

    def policy(actor, obs, key):
        mu, log_std = actor_def.apply({"params": actor}, obs)
        noise = jax.random.normal(key, mu.shape)
        pi = mu + noise * jnp.exp(log_std)
        log_pi = nets.gaussian_logprob(noise, log_std)
        mu, pi, log_pi = nets.squash(mu, pi, log_pi)
        return mu, pi, log_pi

    def add(s: ProbeState, obs, act, rew, nxt):
        return s.replace(
            r_obs=s.r_obs.at[s.ptr].set(obs),
            r_act=s.r_act.at[s.ptr].set(act),
            r_rew=s.r_rew.at[s.ptr].set(rew),
            r_next=s.r_next.at[s.ptr].set(nxt),
            ptr=(s.ptr + 1) % CAPACITY,
            filled=jnp.minimum(s.filled + 1, CAPACITY))

    def update(s: ProbeState, key):
        k_s, k_t, k_a = jax.random.split(key, 3)
        idx = jax.random.randint(k_s, (BATCH,), 0, s.filled)
        obs, act = s.r_obs[idx], s.r_act[idx]
        rew, nxt = s.r_rew[idx][:, None], s.r_next[idx]

        _, pi_n, logp_n = policy(s.actor, nxt, k_t)
        tq1, tq2 = critic_def.apply({"params": s.target}, nxt, pi_n)
        alpha = jnp.exp(s.log_alpha)
        tv = jnp.minimum(tq1, tq2) - alpha * logp_n
        target_q = jax.lax.stop_gradient(
            jnp.clip(rew + DISCOUNT * tv, -q_bound, q_bound))

        def c_loss(cp):
            q1, q2 = critic_def.apply({"params": cp}, obs, act)
            return (jnp.mean((q1 - target_q) ** 2)
                    + jnp.mean((q2 - target_q) ** 2))

        closs, cg = jax.value_and_grad(c_loss)(s.critic)
        cu, opt_c = tx.update(cg, s.opt_c, s.critic)
        critic = optax.apply_updates(s.critic, cu)

        def a_loss(ap):
            _, pi, logp = policy(ap, obs, k_a)
            q1, q2 = critic_def.apply({"params": critic}, obs, pi)
            return jnp.mean(jnp.exp(jax.lax.stop_gradient(s.log_alpha))
                            * logp - jnp.minimum(q1, q2)), logp

        (aloss, logp), ag = jax.value_and_grad(a_loss, has_aux=True)(s.actor)
        au, opt_a = tx.update(ag, s.opt_a, s.actor)
        actor = optax.apply_updates(s.actor, au)

        def al_loss(la):
            t = jax.lax.stop_gradient(-logp - target_entropy)
            return jnp.mean(jnp.exp(la) * t)

        alg = jax.grad(al_loss)(s.log_alpha)
        alu, opt_al = tx.update(alg, s.opt_al, s.log_alpha)
        log_alpha = optax.apply_updates(s.log_alpha, alu)

        target = jax.tree_util.tree_map(
            lambda t, p: (1 - TAU) * t + TAU * p, s.target, critic)
        return s.replace(actor=actor, critic=critic, target=target,
                         log_alpha=log_alpha, opt_a=opt_a, opt_c=opt_c,
                         opt_al=opt_al), closs

    T = EPISODE_LEN // ACTION_REPEAT

    @functools.partial(jax.jit, static_argnames=("learn",))
    def episode_chunk(s: ProbeState, phys, learn: bool):
        k_ep, k_next = jax.random.split(s.rng)
        s = s.replace(rng=k_next)
        obs = flat_obs(task, phys)

        def body(carry, key):
            s, phys, obs = carry
            k_act, k_upd = jax.random.split(key)
            if learn:
                _, act, _ = policy(s.actor, obs[None], k_act)
                act = act[0]
            else:
                act = jax.random.uniform(k_act, (A,), minval=-1.0, maxval=1.0)
            phys, rew = env_step(phys, act)
            nxt = flat_obs(task, phys)
            s = add(s, obs, act, rew, nxt)
            closs = jnp.float32(0)
            if learn:
                s, closs = update(s, k_upd)
            return (s, phys, nxt), (rew, closs)

        (s, phys, _), (rews, closs) = jax.lax.scan(
            body, (s, phys, obs), jax.random.split(k_ep, T))
        return s, jnp.sum(rews), jnp.mean(closs)

    # ---- init
    rng, k_a, k_c = jax.random.split(rng, 3)
    dummy_o = jnp.zeros((1, D))
    dummy_a = jnp.zeros((1, A))
    actor = actor_def.init(k_a, dummy_o)["params"]
    critic = critic_def.init(k_c, dummy_o, dummy_a)["params"]
    s = ProbeState(
        actor=actor, critic=critic,
        target=jax.tree_util.tree_map(lambda x: x, critic),
        log_alpha=jnp.log(jnp.float32(0.1)),
        opt_a=tx.init(actor), opt_c=tx.init(critic),
        opt_al=tx.init(jnp.zeros(())),
        r_obs=jnp.zeros((CAPACITY, D)), r_act=jnp.zeros((CAPACITY, A)),
        r_rew=jnp.zeros((CAPACITY,)), r_next=jnp.zeros((CAPACITY, D)),
        ptr=jnp.int32(0), filled=jnp.int32(0), rng=rng)

    t0 = time.time()
    step, ep, recent = 0, 0, []
    while step < steps:
        rng, k_r = jax.random.split(rng)
        phys = task.init(k_r)
        learn = step >= INIT_STEPS
        s, ep_rew, closs = episode_chunk(s, phys, learn)
        step += T
        ep += 1
        recent.append(float(ep_rew))
        recent = recent[-20:]
        print(json.dumps({"episode": ep, "step": step,
                          "episode_reward": round(float(ep_rew), 2),
                          "roll20": round(float(np.mean(recent)), 2),
                          "critic_loss": round(float(closs), 3),
                          "wall_s": round(time.time() - t0, 1)}), flush=True)
    print(json.dumps({"probe_done": f"{domain}-{task_name}", "steps": step,
                      "roll20_final": round(float(np.mean(recent)), 2),
                      "max_episode": round(max(recent), 2),
                      "wall_min": round((time.time() - t0) / 60, 1)}))


if __name__ == "__main__":
    main()
