"""Generate golden physics trajectories from the *real* dm_control/MuJoCo.

VERDICT round-1 missing #3 / SURVEY §7 hard part #1: quantitative physics
parity evidence against `mj_step` semantics (reference: src/env/dm_control/
dm_control/mujoco/engine.py:148-165). The container ships the public
`dm_control` + `mujoco` wheels; this script rolls each suite task under a
deterministic action sequence and records (qpos, qvel, reward, body xpos)
per control step into ``tests/golden/<domain>_<task>.npz``. The goldens are
committed; ``tests/test_parity.py`` replays the same controls through the
from-scratch JAX engine and asserts bounded divergence.

Run on CPU:  JAX_PLATFORMS=cpu python scripts/gen_parity_golden.py
"""

import os
import sys

# no MUJOCO_GL override: we never render; the default backend import only warns

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (domain, task, tracked body names in the mujoco model)
CASES = [
    ("pendulum", "swingup", ["pole"]),
    ("acrobot", "swingup", ["upper_arm", "lower_arm"]),
    ("cartpole", "balance", ["cart", "pole_1"]),
    ("cartpole", "swingup", ["cart", "pole_1"]),
    ("point_mass", "easy", ["pointmass"]),
    ("reacher", "easy", ["arm", "hand"]),
    ("walker", "stand", ["torso", "right_foot", "left_foot"]),
    ("walker", "walk", ["torso", "right_foot", "left_foot"]),
    ("cheetah", "run", ["torso", "ffoot", "bfoot"]),
    ("hopper", "stand", ["torso", "foot"]),
    ("finger", "spin", ["proximal", "distal", "spinner"]),
    ("ball_in_cup", "catch", ["cup", "ball"]),
    ("swimmer", "swimmer6", ["head"]),
    ("fish", "upright", ["torso"]),
    ("humanoid", "stand", ["torso"]),
    ("quadruped", "walk", ["torso"]),
    ("lqr", "lqr_2_1", []),
    ("lqr", "lqr_6_2", []),
    ("humanoid_CMU", "stand", ["thorax"]),
    ("manipulator", "bring_ball", ["hand", "ball"]),
    ("stacker", "stack_2", ["hand", "box0"]),
]

T = 100          # control steps recorded
SEED = 7


def action_sequence(T, nu, lo, hi):
    """Deterministic, smooth, dim-decorrelated excitation within the spec.

    Unbounded specs (lqr: ctrllimited=false → dm_control's ±1e10 sentinel)
    are excited in [-1, 1] — e9-scale raw forces integrate to garbage on
    both sides of the parity comparison and prove nothing."""
    if not (np.isfinite(lo).all() and np.isfinite(hi).all()) \
            or max(np.abs(lo).max(), np.abs(hi).max()) >= 1e6:
        lo, hi = np.full(nu, -1.0), np.full(nu, 1.0)
    k = np.arange(T)[:, None]
    i = np.arange(nu)[None, :]
    a = 0.7 * np.sin(0.23 * k + 1.7 * i) + 0.2 * np.sin(0.71 * k + 0.4 * i)
    mid, half = (hi + lo) / 2, (hi - lo) / 2
    return np.clip(mid + a * half, lo, hi).astype(np.float64)


def main():
    from dm_control import suite

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)

    # optional CLI filter: regenerate only the named domains (so adding a
    # new case never rewrites the committed goldens of the existing ones)
    only = set(sys.argv[1:])
    cases = [c for c in CASES if not only or c[0] in only]

    for domain, task, bodies in cases:
        env = suite.load(domain, task, task_kwargs={"random": SEED})
        ts = env.reset()
        phys = env.physics
        nq, nv = phys.data.qpos.size, phys.data.qvel.size
        spec = env.action_spec()
        acts = action_sequence(T, spec.shape[0],
                               np.asarray(spec.minimum), np.asarray(spec.maximum))

        qpos = np.zeros((T + 1, nq))
        qvel = np.zeros((T + 1, nv))
        rew = np.zeros(T)
        xpos = np.zeros((T + 1, len(bodies), 3))
        qpos[0] = phys.data.qpos
        qvel[0] = phys.data.qvel
        if bodies:
            xpos[0] = [phys.named.data.xpos[b] for b in bodies]

        # task-level randomized parameters needed to replay rewards
        aux = {}
        if domain == "reacher":
            aux["target"] = np.array(phys.named.data.geom_xpos["target"])
            aux["target_size"] = float(phys.named.model.geom_size["target", 0])
        if domain == "finger":
            try:
                aux["target"] = np.array(phys.named.data.site_xpos["target"])
            except Exception:
                pass
        if domain == "point_mass":
            aux["target"] = np.array(phys.named.data.geom_xpos["target"])
        if domain == "lqr":
            # stiffnesses are drawn from the task RandomState at model
            # build time (lqr.py:139-141) — record them so the parity test
            # can instantiate the SAME linear system
            aux["stiffness"] = np.array(phys.model.jnt_stiffness)

        for t in range(T):
            ts = env.step(acts[t])
            qpos[t + 1] = phys.data.qpos
            qvel[t + 1] = phys.data.qvel
            rew[t] = ts.reward if ts.reward is not None else np.nan
            if bodies:
                xpos[t + 1] = [phys.named.data.xpos[b] for b in bodies]

        qpos_names = np.array(phys.named.data.qpos.axes.row.names)
        act_names = np.array([phys.model.actuator(i).name
                              for i in range(phys.model.nu)])
        path = os.path.join(out_dir, f"{domain}_{task}.npz")
        np.savez_compressed(
            path, qpos=qpos, qvel=qvel, reward=rew, xpos=xpos,
            actions=acts, bodies=np.array(bodies),
            qpos_names=qpos_names, act_names=act_names,
            n_sub_steps=getattr(env, "_n_sub_steps", 0) or
            int(round(env.control_timestep() / phys.model.opt.timestep)),
            timestep=phys.model.opt.timestep,
            control_timestep=env.control_timestep(),
            **{f"aux_{k}": v for k, v in aux.items()},
        )
        print(f"{domain}/{task}: nq={nq} nv={nv} nu={spec.shape[0]} "
              f"sub={int(round(env.control_timestep()/phys.model.opt.timestep))} "
              f"dt={phys.model.opt.timestep} r̄={np.nanmean(rew):.3f} -> {path}")


if __name__ == "__main__":
    main()
