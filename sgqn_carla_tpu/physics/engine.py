"""Featherstone rigid-body dynamics engine (pure JAX).

TPU-native replacement for the MuJoCo C stepping core the reference reaches
through ctypes (`mj_step1`/`mj_step2`, reference: src/env/dm_control/
dm_control/mujoco/engine.py:148-165). Design:

  * generalized coordinates over single-DoF links (see `model.ModelBuilder`),
    world-frame 6D spatial algebra;
  * CRBA for the mass matrix, RNEA (qacc=0) for bias forces, dense
    `jnp.linalg.solve` for forward dynamics — nv ≤ ~10 for every DMC domain,
    so the solve is a tiny batched op under `vmap`;
  * contacts are smooth penalty forces (spring-damper normal + regularized
    Coulomb friction) over a *static* pair list compiled from
    contype/conaffinity, instead of MuJoCo's PGS/Newton LCP solver — no
    data-dependent control flow, fully fused by XLA;
  * joint limits as one-sided penalty springs (reference semantics:
    solimplimit constraints, src/env/dm_control .../suite/walker.xml:11);
  * integrators: semi-implicit Euler (MuJoCo default) and RK4 (cartpole,
    suite/cartpole.xml:6).

All trace-time loops unroll over the static topology; every function is
`vmap`-able over an environment batch and jits into one fused XLA program.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sgqn_carla_tpu.physics import math3d as m3
from sgqn_carla_tpu.physics.model import (
    BOX, CAPSULE, CYLINDER, HINGE, PLANE, SLIDE, SPHERE, Model,
)


class Kin(NamedTuple):
    """Forward-kinematics caches (all world frame)."""

    R: jnp.ndarray        # (nl, 3, 3) link orientations
    p: jnp.ndarray        # (nl, 3) link frame origins
    S: jnp.ndarray        # (nl, 6) joint motion subspaces (Plücker, world origin)
    v: jnp.ndarray        # (nl, 6) link spatial velocities
    com: jnp.ndarray      # (nl, 3) link COM positions
    axis_w: jnp.ndarray   # (nl, 3) world joint axes
    anchor_w: jnp.ndarray # (nl, 3) world joint anchors


class StepOut(NamedTuple):
    qpos: jnp.ndarray
    qvel: jnp.ndarray
    contact_force: jnp.ndarray  # (npair,) accumulated normal force magnitude


def _ancestors(model: Model) -> np.ndarray:
    """(nl, nl) bool: anc[i, j] = True iff dof j is i or an ancestor of i."""
    nl = model.nl
    anc = np.zeros((nl, nl), dtype=bool)
    for i in range(nl):
        j = i
        while j >= 0:
            anc[i, j] = True
            j = int(model.link_parent[j])
    return anc


def forward_kinematics(model: Model, qpos, qvel) -> Kin:
    nl = model.nl
    Rs, ps, Ss, vs, coms, axes, anchors = [], [], [], [], [], [], []
    for i in range(nl):
        par = int(model.link_parent[i])
        if par < 0:
            R_p = jnp.eye(3, dtype=qpos.dtype)
            p_p = jnp.zeros(3, dtype=qpos.dtype)
            v_p = jnp.zeros(6, dtype=qpos.dtype)
        else:
            R_p, p_p, v_p = Rs[par], ps[par], vs[par]
        R_off = jnp.asarray(m3.quat_to_mat(jnp.asarray(model.link_quat[i], qpos.dtype)))
        R0 = R_p @ R_off
        p0 = p_p + R_p @ jnp.asarray(model.link_pos[i], qpos.dtype)
        n = R0 @ jnp.asarray(model.jnt_axis[i], qpos.dtype)
        a = p0 + R0 @ jnp.asarray(model.jnt_pos[i], qpos.dtype)
        q = qpos[i]
        if int(model.jnt_type[i]) == HINGE:
            Rj = m3.quat_to_mat(m3.quat_from_axis_angle(n, q))
            R_i = Rj @ R0
            p_i = a + Rj @ (p0 - a)
            S_i = jnp.concatenate([n, jnp.cross(a, n)])
        else:  # SLIDE
            R_i = R0
            p_i = p0 + n * q
            S_i = jnp.concatenate([jnp.zeros(3, dtype=qpos.dtype), n])
        v_i = v_p + S_i * qvel[i]
        com_i = p_i + R_i @ jnp.asarray(model.link_com[i], qpos.dtype)
        Rs.append(R_i); ps.append(p_i); Ss.append(S_i); vs.append(v_i)
        coms.append(com_i); axes.append(n); anchors.append(a)
    return Kin(
        jnp.stack(Rs), jnp.stack(ps), jnp.stack(Ss), jnp.stack(vs),
        jnp.stack(coms), jnp.stack(axes), jnp.stack(anchors),
    )


def mass_matrix(model: Model, kin: Kin) -> jnp.ndarray:
    """CRBA. Returns (nv, nv) joint-space inertia incl. armature."""
    nl = model.nl
    Iw = []
    for i in range(nl):
        R = kin.R[i]
        I_com = R @ jnp.asarray(model.link_inertia[i], kin.R.dtype) @ R.T
        Iw.append(m3.spatial_inertia(jnp.asarray(model.link_mass[i], kin.R.dtype),
                                     kin.com[i], I_com))
    Ic = list(Iw)
    for i in reversed(range(nl)):
        par = int(model.link_parent[i])
        if par >= 0:
            Ic[par] = Ic[par] + Ic[i]
    M = [[None] * nl for _ in range(nl)]
    for i in range(nl):
        F = Ic[i] @ kin.S[i]
        M[i][i] = kin.S[i] @ F + jnp.asarray(model.jnt_armature[i], kin.R.dtype)
        j = int(model.link_parent[i])
        while j >= 0:
            mij = kin.S[j] @ F
            M[i][j] = mij
            M[j][i] = mij
            j = int(model.link_parent[j])
    zero = jnp.zeros((), dtype=kin.R.dtype)
    rows = [jnp.stack([M[i][j] if M[i][j] is not None else zero for j in range(nl)])
            for i in range(nl)]
    return jnp.stack(rows)


def bias_forces(model: Model, kin: Kin, qvel) -> jnp.ndarray:
    """RNEA with qacc = 0: Coriolis + centrifugal + gravity. (nv,)"""
    nl = model.nl
    g = jnp.asarray(model.gravity, kin.R.dtype)
    a_base = jnp.concatenate([jnp.zeros(3, dtype=kin.R.dtype), -g])
    accs, fs = [], []
    for i in range(nl):
        par = int(model.link_parent[i])
        a_p = a_base if par < 0 else accs[par]
        a_i = a_p + m3.crm(kin.v[i], kin.S[i] * qvel[i])
        R = kin.R[i]
        I_com = R @ jnp.asarray(model.link_inertia[i], kin.R.dtype) @ R.T
        Iw = m3.spatial_inertia(jnp.asarray(model.link_mass[i], kin.R.dtype),
                                kin.com[i], I_com)
        f_i = Iw @ a_i + m3.crf(kin.v[i], Iw @ kin.v[i])
        accs.append(a_i); fs.append(f_i)
    fsub = list(fs)
    for i in reversed(range(nl)):
        par = int(model.link_parent[i])
        if par >= 0:
            fsub[par] = fsub[par] + fsub[i]
    return jnp.stack([kin.S[i] @ fsub[i] for i in range(model.nl)])


# ----------------------------------------------------------------- geometry
def geom_world(model: Model, kin: Kin):
    """World pose of every geom: (ngeom, 3, 3) R and (ngeom, 3) p."""
    Rs, ps = [], []
    for g in model.geoms:
        Rg = m3.quat_to_mat(jnp.asarray(g.quat, kin.R.dtype))
        pg = jnp.asarray(g.pos, kin.R.dtype)
        if g.link < 0:
            Rs.append(Rg)
            ps.append(pg)
        else:
            Rs.append(kin.R[g.link] @ Rg)
            ps.append(kin.p[g.link] + kin.R[g.link] @ pg)
    return jnp.stack(Rs), jnp.stack(ps)


def _point_velocity(kin: Kin, link: int, x):
    """World velocity of world point x rigidly attached to `link`."""
    if link < 0:
        return jnp.zeros(3, dtype=x.dtype)
    w, v0 = kin.v[link][:3], kin.v[link][3:]
    return jnp.cross(w, x) + v0


def _capsule_segment(g, Rg, pg):
    """World endpoints of a capsule/cylinder axis (local z, half-length size[1])."""
    hl = g.size[1]
    d = Rg[:, 2] * hl
    return pg - d, pg + d


def _contacts_for_pair(model, kin, gi, gj, Rg, pg):
    """Contacts for one static geom pair.

    Returns a list of ``(point, n, depth, mu, la, lb)`` where ``n`` points
    from geom b toward geom a and the contact force ``+f`` acts on link
    ``la`` (geom a's link), ``-f`` on ``lb``. Every potential contact is
    always emitted — depth ≤ 0 simply yields zero force (static shapes)."""
    a, b = model.geoms[gi], model.geoms[gj]
    # order so the PLANE (if any) is geom b → normal points at the body
    if a.gtype == PLANE:
        a, b, gi, gj = b, a, gj, gi
    Ra, pa, Rb, pb = Rg[gi], pg[gi], Rg[gj], pg[gj]
    mu = max(a.friction, b.friction)  # MuJoCo default friction combination
    out = []
    if b.gtype == PLANE:
        n = Rb[:, 2]  # plane normal (world)
        d0 = n @ pb
        if a.gtype == SPHERE:
            r = a.size[0]
            dist = n @ pa - d0
            out.append((pa - n * dist, n, r - dist, mu))
        elif a.gtype in (CAPSULE, CYLINDER):
            r = a.size[0]
            for e in _capsule_segment(a, Ra, pa):
                dist = n @ e - d0
                out.append((e - n * dist, n, r - dist, mu))
        elif a.gtype == BOX:
            for sx in (-1, 1):
                for sy in (-1, 1):
                    for sz in (-1, 1):
                        corner = pa + Ra @ (jnp.asarray([sx, sy, sz], pa.dtype)
                                            * jnp.asarray(a.size, pa.dtype))
                        dist = n @ corner - d0
                        out.append((corner - n * dist, n, -dist, mu))
        else:
            raise NotImplementedError(f"plane vs geom type {a.gtype}")
    elif a.gtype in (SPHERE, CAPSULE) and b.gtype in (SPHERE, CAPSULE):
        # closest points between the two core segments (sphere = 0-length)
        def seg(g, R, p):
            if g.gtype == SPHERE:
                return p, p
            return _capsule_segment(g, R, p)

        a0, a1 = seg(a, Ra, pa)
        b0, b1 = seg(b, Rb, pb)
        ca, cb = _closest_segment_points(a0, a1, b0, b1)
        delta = ca - cb
        dist = jnp.linalg.norm(delta) + 1e-9
        n = delta / dist  # from b to a
        ra, rb = a.size[0], b.size[0]
        depth = (ra + rb) - dist
        point = cb + n * (rb - depth / 2)
        out.append((point, n, depth, mu))
    else:
        raise NotImplementedError(
            f"contact pair {a.gtype} vs {b.gtype} not supported"
        )
    la = model.geoms[gi].link
    lb = model.geoms[gj].link
    return [(pt, nn, dd, mm, la, lb) for (pt, nn, dd, mm) in out]


def _closest_segment_points(a0, a1, b0, b1):
    """Closest points between segments [a0,a1], [b0,b1] (smooth clamped)."""
    d1 = a1 - a0
    d2 = b1 - b0
    r = a0 - b0
    a = d1 @ d1 + 1e-12
    e = d2 @ d2 + 1e-12
    f = d2 @ r
    c = d1 @ r
    b = d1 @ d2
    denom = a * e - b * b
    s = jnp.clip((b * f - c * e) / (denom + 1e-12), 0.0, 1.0)
    t = jnp.clip((b * s + f) / e, 0.0, 1.0)
    s = jnp.clip((b * t - c) / a, 0.0, 1.0)
    return a0 + d1 * s, b0 + d2 * t


def contact_taus(model: Model, kin: Kin, Rg, pg, anc: np.ndarray):
    """Generalized contact forces (nv,) + per-pair normal force magnitudes."""
    nl = model.nl
    dtype = kin.R.dtype
    tau = jnp.zeros(nl, dtype=dtype)
    pair_forces = []
    kp = model.contact_stiffness
    kd = model.contact_damping
    for (gi, gj) in model.contact_pairs:
        contacts = _contacts_for_pair(model, kin, int(gi), int(gj), Rg, pg)
        fn_total = jnp.zeros((), dtype=dtype)
        for (x, n, depth, mu, la, lb) in contacts:
            active = (depth > 0).astype(dtype)
            v_rel = _point_velocity(kin, la, x) - _point_velocity(kin, lb, x)
            vn = v_rel @ n
            fn = jnp.maximum(kp * depth - kd * vn, 0.0) * active
            vt = v_rel - vn * n
            vt_norm = jnp.linalg.norm(vt) + 1e-6
            # regularized Coulomb: full µ·fn beyond ~1 cm/s slip
            ft = -mu * fn * jnp.tanh(vt_norm / 0.01) * (vt / vt_norm)
            f3 = fn * n + ft
            f6 = jnp.concatenate([jnp.cross(x, f3), f3])
            proj = kin.S @ f6  # (nl,) = S_i · f for every dof i
            av = anc[la].astype(np.float32) if la >= 0 else np.zeros(nl, np.float32)
            bv = anc[lb].astype(np.float32) if lb >= 0 else np.zeros(nl, np.float32)
            tau = tau + jnp.asarray(av - bv, dtype=dtype) * proj
            fn_total = fn_total + fn
        pair_forces.append(fn_total)
    pf = (jnp.stack(pair_forces) if pair_forces
          else jnp.zeros(0, dtype=dtype))
    return tau, pf


def limit_taus(model: Model, qpos, qvel):
    """One-sided penalty springs at joint limits."""
    lo = jnp.asarray(model.jnt_range[:, 0], qpos.dtype)
    hi = jnp.asarray(model.jnt_range[:, 1], qpos.dtype)
    limited = jnp.asarray(model.jnt_limited, qpos.dtype)
    k = model.limit_stiffness
    c = model.limit_damping
    below = jnp.maximum(lo - qpos, 0.0)
    above = jnp.maximum(qpos - hi, 0.0)
    tau = k * below - k * above
    # damping only while violating
    viol = ((below > 0) | (above > 0)).astype(qpos.dtype)
    tau = tau - c * qvel * viol
    return tau * limited


def _forward_dynamics(model: Model, qpos, qvel, ctrl, anc):
    kin = forward_kinematics(model, qpos, qvel)
    M = mass_matrix(model, kin)
    C = bias_forces(model, kin, qvel)
    dtype = qpos.dtype
    # actuation: tau_act[dof] += gear * ctrl (ctrl clipped to [-1, 1],
    # reference: motor ctrlrange, suite/walker.xml:13)
    tau = jnp.zeros(model.nl, dtype=dtype)
    if model.nu:
        c_clip = jnp.clip(ctrl, -1.0, 1.0)
        tau = tau.at[jnp.asarray(model.act_dof)].add(
            jnp.asarray(model.act_gear, dtype) * c_clip
        )
    # passive
    tau = tau - jnp.asarray(model.jnt_damping, dtype) * qvel
    tau = tau - jnp.asarray(model.jnt_stiffness, dtype) * (
        qpos - jnp.asarray(model.jnt_springref, dtype)
    )
    tau = tau + limit_taus(model, qpos, qvel)
    if len(model.contact_pairs):
        Rg, pg = geom_world(model, kin)
        tau_c, pair_f = contact_taus(model, kin, Rg, pg, anc)
        tau = tau + tau_c
    else:
        pair_f = jnp.zeros(0, dtype=dtype)
    qacc = jnp.linalg.solve(M, tau - C)
    return qacc, pair_f


def step(model: Model, qpos, qvel, ctrl) -> StepOut:
    """One physics substep of `model.timestep` seconds."""
    anc = _ancestors(model)
    h = model.timestep
    if model.integrator == "rk4":
        def f(q, qd):
            qacc, pf = _forward_dynamics(model, q, qd, ctrl, anc)
            return qd, qacc, pf

        k1v, k1a, pf = f(qpos, qvel)
        k2v, k2a, _ = f(qpos + 0.5 * h * k1v, qvel + 0.5 * h * k1a)
        k3v, k3a, _ = f(qpos + 0.5 * h * k2v, qvel + 0.5 * h * k2a)
        k4v, k4a, _ = f(qpos + h * k3v, qvel + h * k3a)
        qpos_n = qpos + h / 6 * (k1v + 2 * k2v + 2 * k3v + k4v)
        qvel_n = qvel + h / 6 * (k1a + 2 * k2a + 2 * k3a + k4a)
    else:  # semi-implicit Euler (MuJoCo default)
        qacc, pf = _forward_dynamics(model, qpos, qvel, ctrl, anc)
        qvel_n = qvel + h * qacc
        qpos_n = qpos + h * qvel_n
    return StepOut(qpos_n, qvel_n, pf)


def n_steps(model: Model, qpos, qvel, ctrl, n: int) -> StepOut:
    """`n` substeps under one held control (dm_control's n_sub_steps,
    reference: rl/control.py:102-111). Uses lax.scan: one compiled body."""

    def body(carry, _):
        q, qd = carry
        out = step(model, q, qd, ctrl)
        return (out.qpos, out.qvel), out.contact_force

    (q, qd), pf = jax.lax.scan(body, (qpos, qvel), None, length=n)
    return StepOut(q, qd, pf.max(axis=0))


# ------------------------------------------------------------------ sensors
def subtree_com(model: Model, kin: Kin, root_dof: int) -> jnp.ndarray:
    """Mass-weighted COM position of the subtree rooted at link `root_dof`."""
    anc = _ancestors(model)
    total_m = 0.0
    s = jnp.zeros(3, dtype=kin.R.dtype)
    for i in range(model.nl):
        if not anc[i, root_dof]:
            continue
        mi = float(model.link_mass[i])
        if mi == 0.0:
            continue
        s = s + mi * kin.com[i]
        total_m += mi
    return s / max(total_m, 1e-12)


def subtree_linvel(model: Model, kin: Kin, root_dof: int) -> jnp.ndarray:
    """Mass-weighted COM velocity of the subtree rooted at link `root_dof`
    (MuJoCo `subtreelinvel` sensor, used by walker/cheetah speed)."""
    anc = _ancestors(model)
    total_m = 0.0
    mom = jnp.zeros(3, dtype=kin.R.dtype)
    for i in range(model.nl):
        if not anc[i, root_dof]:
            continue
        mi = float(model.link_mass[i])
        if mi == 0.0:
            continue
        w, v0 = kin.v[i][:3], kin.v[i][3:]
        v_com = jnp.cross(w, kin.com[i]) + v0
        mom = mom + mi * v_com
        total_m += mi
    return mom / max(total_m, 1e-12)
