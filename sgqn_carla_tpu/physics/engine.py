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
    q: jnp.ndarray = None # (nl, 4) link orientation quaternions


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
    """Quaternion-based FK: the per-link chain is inherently sequential
    (unrolled, nl ≤ ~10), but every op is elementwise quaternion math on the
    VPU — no tiny 3×3 matmuls that would land as ~0.05%-utilized MXU ops.
    Everything downstream (velocities, rotation matrices, COMs) is computed
    in one batched op over links."""
    nl = model.nl
    dtype = qpos.dtype
    qs, ps, Ss, axes, anchors = [], [], [], [], []
    theta = qpos - jnp.asarray(model.jnt_ref, dtype)  # MuJoCo `ref`
    for i in range(nl):
        par = int(model.link_parent[i])
        if par < 0:
            q_p = jnp.asarray([1.0, 0, 0, 0], dtype)
            p_p = jnp.zeros(3, dtype)
        else:
            q_p, p_p = qs[par], ps[par]
        q_off = jnp.asarray(model.link_quat[i], dtype)
        if np.allclose(model.link_quat[i], [1.0, 0, 0, 0]):
            q0 = q_p
        else:
            q0 = m3.quat_mul(q_p, q_off)
        p0 = p_p + m3.quat_rotate(q_p, jnp.asarray(model.link_pos[i], dtype))
        n = m3.quat_rotate(q0, jnp.asarray(model.jnt_axis[i], dtype))
        a = p0 + m3.quat_rotate(q0, jnp.asarray(model.jnt_pos[i], dtype))
        if int(model.jnt_type[i]) == HINGE:
            q_rot = m3.quat_from_axis_angle(n, theta[i])
            q_i = m3.quat_mul(q_rot, q0)
            p_i = a + m3.quat_rotate(q_rot, p0 - a)
            S_i = jnp.concatenate([n, jnp.cross(a, n)])
        else:  # SLIDE
            q_i = q0
            p_i = p0 + n * theta[i]
            S_i = jnp.concatenate([jnp.zeros(3, dtype), n])
        qs.append(q_i); ps.append(p_i); Ss.append(S_i)
        axes.append(n); anchors.append(a)
    q_all = jnp.stack(qs)
    p_all = jnp.stack(ps)
    S_all = jnp.stack(Ss)
    R_all = m3.quat_to_mat(q_all)
    anc_f = jnp.asarray(_ancestors(model).astype(np.float32), dtype)
    # v_i = Σ_{j ancestor-or-self} S_j qd_j  — one dense matmul
    v_all = anc_f @ (S_all * qvel[:, None])
    com_all = p_all + m3.quat_rotate(q_all, jnp.asarray(model.link_com, dtype))
    return Kin(R_all, p_all, S_all, v_all, com_all,
               jnp.stack(axes), jnp.stack(anchors), q_all)


def _spatial_inertias(model: Model, kin: Kin) -> jnp.ndarray:
    """(nl, 6, 6) world-frame spatial inertias, batched over links."""
    dtype = kin.R.dtype
    I_local = jnp.asarray(model.link_inertia, dtype)        # (nl, 3, 3)
    I_com = jnp.einsum("nij,njk,nlk->nil", kin.R, I_local, kin.R)
    return m3.spatial_inertia(jnp.asarray(model.link_mass, dtype),
                              kin.com, I_com)


def _masked_jacobians(model: Model, kin: Kin) -> jnp.ndarray:
    """(nl, nv, 6): J[i, j] = S_j if dof j supports link i else 0."""
    anc_f = jnp.asarray(_ancestors(model).astype(np.float32), kin.R.dtype)
    return anc_f[:, :, None] * kin.S[None, :, :]


def mass_matrix(model: Model, kin: Kin) -> jnp.ndarray:
    """CRBA as one dense einsum: M = Σ_i J_iᵀ I_i J_i (+armature).
    Equivalent to the classic composite recursion, but lands on the MXU as
    a handful of (nl·nv, 6)-shaped contractions instead of hundreds of tiny
    per-link dots."""
    Iw = _spatial_inertias(model, kin)
    J = _masked_jacobians(model, kin)
    M = jnp.einsum("inj,ijk,imk->nm", J, Iw, J)
    return M + jnp.diag(jnp.asarray(model.jnt_armature, kin.R.dtype))


def bias_forces(model: Model, kin: Kin, qvel) -> jnp.ndarray:
    """RNEA (qacc = 0) vectorized: link accelerations from the per-dof
    velocity-product terms summed over ancestor masks; C = Σ J_iᵀ f_i."""
    dtype = kin.R.dtype
    g = jnp.asarray(model.gravity, dtype)
    a_base = jnp.concatenate([jnp.zeros(3, dtype), -g])
    anc_f = jnp.asarray(_ancestors(model).astype(np.float32), dtype)
    # per-dof velocity-product term: crm(v_link(j)) S_j qd_j  (link j == dof j)
    gterm = m3.crm(kin.v, kin.S * qvel[:, None])            # (nv, 6)
    a = a_base[None, :] + anc_f @ gterm                      # (nl, 6)
    Iw = _spatial_inertias(model, kin)
    Iv = jnp.einsum("ijk,ik->ij", Iw, kin.v)
    f = jnp.einsum("ijk,ik->ij", Iw, a) + m3.crf(kin.v, Iv)  # (nl, 6)
    J = _masked_jacobians(model, kin)
    return jnp.einsum("inj,ij->n", J, f)


# ----------------------------------------------------------------- geometry
def geom_world(model: Model, kin: Kin):
    """World pose of every geom: (ngeom, 3, 3) R and (ngeom, 3) p — one
    batched quaternion op over the geom list (a virtual identity link is
    appended for world-attached geoms)."""
    dtype = kin.R.dtype
    links = np.array([g.link if g.link >= 0 else model.nl for g in model.geoms])
    gq = jnp.asarray(np.stack([g.quat for g in model.geoms]), dtype)
    gp = jnp.asarray(np.stack([g.pos for g in model.geoms]), dtype)
    ident = jnp.asarray([[1.0, 0, 0, 0]], dtype)
    q_ext = jnp.concatenate([kin.q, ident], axis=0)
    p_ext = jnp.concatenate([kin.p, jnp.zeros((1, 3), dtype)], axis=0)
    ql = q_ext[links]
    Rg = m3.quat_to_mat(m3.quat_mul(ql, gq))
    pg = p_ext[links] + m3.quat_rotate(ql, gp)
    return Rg, pg


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
    elif (a.gtype in (SPHERE, CAPSULE, CYLINDER)
          and b.gtype in (SPHERE, CAPSULE, CYLINDER)):
        # closest points between the two core segments (sphere = 0-length;
        # cylinders approximated as capsules — only decorations use them)
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


def _point_force_taus(kin: Kin, anc: np.ndarray, link: int, x, f3, nl: int):
    """Generalized forces from a world-frame force f3 applied at world point
    x on `link` (Jacobian-transpose via the Plücker motion subspaces)."""
    if link < 0:
        return 0.0
    f6 = jnp.concatenate([jnp.cross(x, f3), f3])
    proj = kin.S @ f6
    return jnp.asarray(anc[link].astype(np.float32), dtype=f3.dtype) * proj


def tendon_taus(model: Model, kin: Kin, anc: np.ndarray):
    """Limited spatial tendons as one-sided stiff springs (ball_in_cup's
    string, reference: suite/ball_in_cup.xml tendon range 0-0.3)."""
    nl = model.nl
    tau = jnp.zeros(nl, dtype=kin.R.dtype)
    for t in model.tendons:
        pa = (kin.p[t.link_a] + kin.R[t.link_a] @ jnp.asarray(t.pos_a, kin.R.dtype)
              if t.link_a >= 0 else jnp.asarray(t.pos_a, kin.R.dtype))
        pb = (kin.p[t.link_b] + kin.R[t.link_b] @ jnp.asarray(t.pos_b, kin.R.dtype)
              if t.link_b >= 0 else jnp.asarray(t.pos_b, kin.R.dtype))
        delta = pa - pb
        length = jnp.linalg.norm(delta) + 1e-9
        dirn = delta / length
        stretch = jnp.maximum(length - t.range[1], 0.0)
        va = _point_velocity(kin, t.link_a, pa)
        vb = _point_velocity(kin, t.link_b, pb)
        rate = (va - vb) @ dirn
        fmag = t.stiffness * stretch + jnp.where(stretch > 0,
                                                 t.damping * rate, 0.0)
        f3 = -jnp.maximum(fmag, 0.0) * dirn  # pull a toward b when taut
        tau = tau + _point_force_taus(kin, anc, t.link_a, pa, f3, nl)
        tau = tau + _point_force_taus(kin, anc, t.link_b, pb, -f3, nl)
    return tau


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
    # dry friction (MuJoCo frictionloss), smoothed sign
    if np.any(model.jnt_frictionloss):
        tau = tau - jnp.asarray(model.jnt_frictionloss, dtype) * jnp.tanh(
            qvel / 0.01)
    tau = tau + limit_taus(model, qpos, qvel)
    if model.tendons:
        tau = tau + tendon_taus(model, kin, anc)
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


def max_penetration(model: Model, qpos) -> jnp.ndarray:
    """Deepest contact penetration at configuration `qpos` (≤ 0 ⇒ free).
    Backs collision-free episode initialization (the reference's retry loop
    checks physics.data.ncon == 0, suite/finger.py:206-216)."""
    qvel = jnp.zeros_like(qpos)
    kin = forward_kinematics(model, qpos, qvel)
    Rg, pg = geom_world(model, kin)
    depths = [jnp.float32(-1.0)]
    for (gi, gj) in model.contact_pairs:
        for (x, n, depth, mu, la, lb) in _contacts_for_pair(
                model, kin, int(gi), int(gj), Rg, pg):
            depths.append(depth)
    return jnp.max(jnp.stack(depths))


# ------------------------------------------------------------------ sensors
def _subtree_weights(model: Model, root_dof: int):
    anc = _ancestors(model)
    w = np.asarray(model.link_mass) * anc[:, root_dof]
    return w, max(w.sum(), 1e-12)


def subtree_com(model: Model, kin: Kin, root_dof: int) -> jnp.ndarray:
    """Mass-weighted COM position of the subtree rooted at link `root_dof`."""
    w, total = _subtree_weights(model, root_dof)
    wj = jnp.asarray(w, kin.R.dtype)
    return (wj @ kin.com) / total


def subtree_linvel(model: Model, kin: Kin, root_dof: int) -> jnp.ndarray:
    """Mass-weighted COM velocity of the subtree rooted at link `root_dof`
    (MuJoCo `subtreelinvel` sensor, used by walker/cheetah speed)."""
    w, total = _subtree_weights(model, root_dof)
    wj = jnp.asarray(w, kin.R.dtype)
    v_com = jnp.cross(kin.v[:, :3], kin.com) + kin.v[:, 3:]
    return (wj @ v_com) / total
