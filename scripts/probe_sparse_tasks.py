"""Interaction-level probes for the two sparse-reward negatives:
pendulum-swingup and point_mass-easy (round-2 VERDICT item #3 tail).

Golden trajectories bound divergence and the reward surfaces byte-match
(artifacts/pendulum_pointmass_drq_tpu/README.md), but finger-spin proved
that is not enough: the env can still be *unlearnable* if scripted CONTROL
cannot collect reward. These probes run hand-written expert controllers in
BOTH engines (reference: suite/pendulum.py swing_up task, suite/
point_mass.py easy task) and compare collected reward:

  pendulum   — bang-bang energy pump: u = sign(cos(theta)*thetadot) until
               the bob nears upright, then a PD hold. If the pump reaches
               the +-30 deg reward window in the real wheel, it must in
               ours too.
  point_mass — P-controller toward the target through the 2 slide
               actuators (gear 0.1). Reward is nonzero only within ~3 cm
               of the 1.5 cm target.

Run on CPU:  python scripts/probe_sparse_tasks.py
Prints a JSON object {task: {"real": R, "ours": R}} over 1000 control
steps. Parity = both engines collect comparable reward through the SAME
closed-loop policy (interaction-level, not trajectory-replay).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STEPS = 1000


# ------------------------------------------------------------- controllers
def pendulum_ctrl(theta, thetadot):
    """Energy-pump bang-bang, PD hold near upright (theta=0 is up)."""
    wrapped = (theta + np.pi) % (2 * np.pi) - np.pi
    if abs(wrapped) < 0.5:
        u = -5.0 * wrapped - 1.0 * thetadot
    else:
        u = np.sign(np.cos(wrapped) * thetadot) if thetadot != 0 else 1.0
    return float(np.clip(u, -1, 1))


def point_mass_ctrl(pos, vel):
    """P-control toward the origin target through the xy actuators."""
    u = -40.0 * pos - 8.0 * vel
    return np.clip(u, -1, 1)


# ------------------------------------------------------------- real MuJoCo
def real_rollout(domain, task):
    from dm_control import suite

    env = suite.load(domain, task, task_kwargs={"random": 0})
    ts = env.reset()
    phys = env.physics
    total = 0.0
    for _ in range(STEPS):
        if domain == "pendulum":
            u = [pendulum_ctrl(float(phys.data.qpos[0]),
                               float(phys.data.qvel[0]))]
        else:
            u = point_mass_ctrl(np.asarray(phys.data.qpos, np.float64),
                                np.asarray(phys.data.qvel, np.float64))
        ts = env.step(np.asarray(u))
        total += float(ts.reward or 0.0)
    return total


# ------------------------------------------------------------- this engine
def ours_rollout(domain, task):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from sgqn_carla_tpu.physics.domains import load as load_domain

    t = load_domain(domain, task)
    rng = jax.random.PRNGKey(0)
    state = t.init(rng)
    total = 0.0
    for _ in range(STEPS):
        qpos = np.asarray(state.qpos, np.float64)
        qvel = np.asarray(state.qvel, np.float64)
        if domain == "pendulum":
            u = jnp.asarray([pendulum_ctrl(qpos[0], qvel[0])], jnp.float32)
        else:
            u = jnp.asarray(point_mass_ctrl(qpos, qvel), jnp.float32)
        state = t.step(state, u)
        total += float(t.reward(state, u))
    return total


def main():
    out = {}
    for domain, task in (("pendulum", "swingup"), ("point_mass", "easy")):
        out[f"{domain}_{task}"] = {
            "real": round(real_rollout(domain, task), 2),
            "ours": round(ours_rollout(domain, task), 2),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
