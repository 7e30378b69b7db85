"""Dense (array/matmul) dynamics path for large kinematic trees.

The scalar structure-of-arrays path in `engine.py` unrolls CRBA/RNEA into
per-link-pair scalar ops — unbeatable for the ≤10-link DMCGB models, but its
graph size grows O(nl²)–O(nl³) and XLA compile time explodes beyond ~12
links (swimmer15 = 17, humanoid = 27, humanoid_CMU = 62). This module is
the same physics expressed as fixed-shape batched linear algebra:

  * per-link 6×6 world-origin spatial inertias, (nl, 6, 6);
  * CRBA as a masked Gram product: composite inertias via one
    ancestor-mask einsum, M = mask ⊙ (IcS)Sᵀ, symmetrized;
  * RNEA (qacc = 0) as two mask matmuls over (nl, 6) velocity-product and
    force arrays;
  * point forces (contacts/tendons/fluid) accumulate world-origin wrenches
    into one (nl, 6) array, projected through all support paths with a
    single maskᵀ matmul — O(1) ops per contact instead of O(path length);
  * the SPD solve is jax.scipy `cho_solve` on the dense (nv, nv) matrix.

Compile is seconds at any nl; the einsums land on the MXU. Everything is
`vmap`-able over the environment batch exactly like the scalar path.
Selected automatically by `engine.step` when `nl ≥ DENSE_NL` (same physics,
verified against the scalar path in tests/test_physics_dense.py).

Reference semantics mirrored: mj_step's Euler split (reference:
src/env/dm_control/dm_control/mujoco/engine.py:148-165); the algorithms are
Featherstone's CRBA/RNEA in world-aligned Plücker coordinates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sgqn_carla_tpu.physics.model import Model

# beyond this many links the unrolled scalar path's compile time explodes;
# the dense path takes over (engine.step dispatch)
DENSE_NL = 12
# Gauss-Seidel sweeps of the implicit contact solve (implicit_contact_stage):
# velocity-impulse sweeps, positional pseudo-impulse sweeps, and the
# error-reduction factor of the positional pass.
GS_SWEEPS = 3
POS_SWEEPS = 2
GS_BETA = 0.2

_f = jnp.float32


def _skew(h):
    """(..., 3) → (..., 3, 3) cross-product matrices."""
    z = jnp.zeros_like(h[..., 0])
    return jnp.stack([
        jnp.stack([z, -h[..., 2], h[..., 1]], -1),
        jnp.stack([h[..., 2], z, -h[..., 0]], -1),
        jnp.stack([-h[..., 1], h[..., 0], z], -1),
    ], -2)


def crm(v, m):
    """Spatial motion cross product v × m, both (..., 6) = (angular, linear)."""
    w, u = v[..., :3], v[..., 3:]
    mw, mv = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(w, mv) + jnp.cross(u, mw)], -1)


def crf(v, f):
    """Spatial force cross product v ×* f."""
    w, u = v[..., :3], v[..., 3:]
    fn, ff = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, fn) + jnp.cross(u, ff), jnp.cross(w, ff)], -1)


# --------------------------------------------------------------- scan FK
def _qmul(a, b):
    """Quaternion product on (..., 4) arrays (w, x, y, z)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], -1)


def _qrot(q, v):
    """Rotate (..., 3) vectors by (..., 4) quaternions."""
    u = q[..., 1:]
    w = q[..., 0:1]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def forward_kinematics_scan(model: Model, qpos, qvel):
    """lax.scan FK over topologically-ordered links.

    The unrolled scalar FK in `engine.forward_kinematics` chains quaternion
    expressions link-by-link; XLA's simplification passes blow up on deep
    chains (swimmer15's 17-deep chain alone took ~140 s to compile, growing
    ~3× per +3 links). Here the per-link recurrence is ONE compiled scan
    body reading the parent's row from (nl+1)-row buffers (last row = the
    world's identity frame) and scattering its own — compile time is flat
    in nl, and under vmap each step still runs (B,)-wide lanes."""
    from sgqn_carla_tpu.physics import engine as eng
    from sgqn_carla_tpu.physics.math3d import quat_to_mat
    from sgqn_carla_tpu.physics.model import HINGE

    nl = model.nl
    f = jnp.float32
    theta = qpos.astype(f) - jnp.asarray(model.jnt_ref, f)
    qd = qvel.astype(f)
    parent = np.asarray(model.link_parent, np.int32)
    pidx = np.where(parent < 0, nl, parent).astype(np.int32)
    xs = dict(
        i=jnp.arange(nl, dtype=jnp.int32),
        pidx=jnp.asarray(pidx),
        body_pos=jnp.asarray(model.link_pos, f),
        body_quat=jnp.asarray(model.link_quat, f),
        axis=jnp.asarray(model.jnt_axis, f),
        jpos=jnp.asarray(model.jnt_pos, f),
        com_l=jnp.asarray(model.link_com, f),
        is_hinge=jnp.asarray(np.asarray(model.jnt_type) == HINGE),
        theta=theta,
        qd=qd,
    )
    Q0 = jnp.zeros((nl + 1, 4), f).at[nl, 0].set(1.0)
    P0 = jnp.zeros((nl + 1, 3), f)
    V0 = jnp.zeros((nl + 1, 6), f)
    S0 = jnp.zeros((nl + 1, 6), f)
    C0 = jnp.zeros((nl + 1, 3), f)
    A0 = jnp.zeros((nl + 1, 3), f)
    N0 = jnp.zeros((nl + 1, 3), f)

    def body(carry, x):
        Q, P, V, S, C, Aa, Nn = carry
        qp, pp, vp = Q[x["pidx"]], P[x["pidx"]], V[x["pidx"]]
        q0 = _qmul(qp, x["body_quat"])
        p0 = pp + _qrot(qp, x["body_pos"])
        n = _qrot(q0, x["axis"])
        a = p0 + _qrot(q0, x["jpos"])
        half = 0.5 * x["theta"]
        qr = jnp.concatenate([jnp.cos(half)[None],
                              jnp.sin(half) * n])
        q_h = _qmul(qr, q0)
        p_h = a + _qrot(qr, p0 - a)
        S_h = jnp.concatenate([n, jnp.cross(a, n)])
        q_s = q0
        p_s = p0 + n * x["theta"]
        S_s = jnp.concatenate([jnp.zeros(3, f), n])
        h = x["is_hinge"]
        q_i = jnp.where(h, q_h, q_s)
        p_i = jnp.where(h, p_h, p_s)
        S_i = jnp.where(h, S_h, S_s)
        v_i = vp + S_i * x["qd"]
        com_i = p_i + _qrot(q_i, x["com_l"])
        i = x["i"]
        return (Q.at[i].set(q_i), P.at[i].set(p_i), V.at[i].set(v_i),
                S.at[i].set(S_i), C.at[i].set(com_i), Aa.at[i].set(a),
                Nn.at[i].set(n)), None

    (Q, P, V, S, C, Aa, Nn), _ = jax.lax.scan(
        body, (Q0, P0, V0, S0, C0, A0, N0), xs)
    q_arr = Q[:nl]
    # per-link SoA views (tuples of scalars) keep the scalar-path helpers
    # (geom_world, _point_velocity, subtree_*) working unchanged
    soa = (
        tuple(tuple(q_arr[i, k] for k in range(4)) for i in range(nl)),
        tuple(tuple(P[i, k] for k in range(3)) for i in range(nl)),
        tuple(((S[i, 0], S[i, 1], S[i, 2]), (S[i, 3], S[i, 4], S[i, 5]))
              for i in range(nl)),
        tuple(((V[i, 0], V[i, 1], V[i, 2]), (V[i, 3], V[i, 4], V[i, 5]))
              for i in range(nl)),
        tuple(tuple(C[i, k] for k in range(3)) for i in range(nl)),
    )
    return eng.Kin(R=quat_to_mat(q_arr), p=P[:nl], S=S[:nl], v=V[:nl],
                   com=C[:nl], axis_w=Nn[:nl], anchor_w=Aa[:nl], q=q_arr,
                   soa=soa)


def spatial_inertias(model: Model, kin) -> jnp.ndarray:
    """(nl, 6, 6) world spatial inertia of every link about the world origin.

    I = [[A, ĥ], [ĥᵀ, m·I₃]] with A = R I_local Rᵀ + m(|c|²I − ccᵀ),
    h = m·c (matches the scalar `_spi_from_link`/`_spi_apply` algebra)."""
    R = kin.R                                   # (nl, 3, 3)
    c = kin.com                                 # (nl, 3)
    m = jnp.asarray(model.link_mass, _f)        # (nl,)
    I_loc = jnp.asarray(model.link_inertia, _f)  # (nl, 3, 3)
    A_c = jnp.einsum("nij,njk,nlk->nil", R, I_loc, R)
    c2 = jnp.sum(c * c, -1)
    eye = jnp.eye(3, dtype=_f)
    A = A_c + m[:, None, None] * (
        c2[:, None, None] * eye - c[:, :, None] * c[:, None, :])
    h = m[:, None] * c
    hx = _skew(h)
    top = jnp.concatenate([A, hx], -1)                         # (nl, 3, 6)
    bot = jnp.concatenate(
        [jnp.swapaxes(hx, -1, -2), m[:, None, None] * eye], -1)
    return jnp.concatenate([top, bot], -2)                     # (nl, 6, 6)


def mass_matrix(model: Model, kin, I6, anc_f) -> jnp.ndarray:
    """CRBA via composite-inertia einsum + masked Gram product."""
    S = kin.S                                   # (nl, 6)
    # Ic[i] = Σ_{k : i on path(k)} I6[k]  (subtree composite inertia)
    Ic = jnp.einsum("ki,kab->iab", anc_f, I6)
    F = jnp.einsum("iab,ib->ia", Ic, S)          # (nl, 6)
    Mlow = anc_f * (F @ S.T)                     # rows i, ancestor cols j
    M = Mlow + Mlow.T - jnp.diag(jnp.diag(Mlow))
    return M + jnp.diag(jnp.asarray(model.jnt_armature, _f))


def bias_forces(model: Model, kin, I6, qvel, anc_f) -> jnp.ndarray:
    """RNEA with qacc = 0 (Coriolis/centrifugal + gravity), (nv,)."""
    S, v = kin.S, kin.v                          # (nl, 6)
    qd = qvel.astype(_f)
    g = model.gravity
    a_base = jnp.asarray([0, 0, 0, -g[0], -g[1], -g[2]], _f)
    T = crm(v, S * qd[:, None])                  # per-joint velocity product
    a = a_base[None, :] + anc_f @ T              # link accelerations (bias)
    Iv = jnp.einsum("iab,ib->ia", I6, v)
    f = jnp.einsum("iab,ib->ia", I6, a) + crf(v, Iv)
    fsub = anc_f.T @ f                           # subtree force sums
    return jnp.sum(S * fsub, -1)


def project_wrenches(kin, anc_f, F) -> jnp.ndarray:
    """τ from per-link world-origin wrenches F (nl, 6): each link's wrench
    acts through every dof on its support path — one maskᵀ matmul."""
    return jnp.sum(kin.S * (anc_f.T @ F), -1)


def _fluid_boxes(model: Model) -> np.ndarray:
    """(nl, 3) equivalent-inertia-box FULL side lengths (trace-time
    constants) — mj_inertiaBoxFluidModel convention; see the parity note in
    engine.fluid_taus."""
    out = np.zeros((model.nl, 3))
    for i in range(model.nl):
        m = float(model.link_mass[i])
        if m <= 1e-9:
            continue
        Idiag = np.diag(np.asarray(model.link_inertia[i], np.float64))
        out[i] = np.sqrt(np.maximum(
            1e-12, (Idiag.sum() - 2.0 * Idiag) * 6.0 / m))
    return out


def fluid_wrenches(model: Model, kin) -> jnp.ndarray:
    """(nl, 6) world-origin wrenches from the dense/viscous medium —
    the batched form of `engine.fluid_taus`'s inertia-box model."""
    rho = float(model.density)
    visc = float(model.viscosity)
    box = jnp.asarray(_fluid_boxes(model), _f)      # (nl, 3)
    has_mass = jnp.asarray(model.link_mass > 1e-9, _f)[:, None]
    R, c = kin.R, kin.com
    w_w = kin.v[:, :3]
    v_w = kin.v[:, 3:] + jnp.cross(w_w, c)
    # local-frame CoM velocities
    w_l = jnp.einsum("nji,nj->ni", R, w_w)
    v_l = jnp.einsum("nji,nj->ni", R, v_w)
    frc = jnp.zeros_like(v_l)
    trq = jnp.zeros_like(w_l)
    if visc > 0:
        diam = box.mean(-1, keepdims=True)
        trq = trq - np.pi * diam ** 3 * visc * w_l
        frc = frc - 3.0 * np.pi * diam * visc * v_l
    if rho > 0:
        b1 = jnp.roll(box, -1, axis=-1)
        b2 = jnp.roll(box, -2, axis=-1)
        frc = frc - 0.5 * rho * b1 * b2 * jnp.abs(v_l) * v_l
        trq = trq - rho * box * (b1 ** 4 + b2 ** 4) * (
            jnp.abs(w_l) * w_l) / 64.0
    f_w = jnp.einsum("nij,nj->ni", R, frc) * has_mass
    t_w = jnp.einsum("nij,nj->ni", R, trq) * has_mass
    return jnp.concatenate([jnp.cross(c, f_w) + t_w, f_w], -1)


class CollisionProgram:
    """Static (numpy) batched narrow-phase program compiled from the model's
    contact pair list. Two categories cover every supported shape pairing:

      * point-vs-plane — spheres (1 point), capsule/cylinder ends (2),
        box corners (8, radius 0): arrays of (geom, local offset, radius);
      * segment-vs-segment — sphere/capsule/cylinder bodies as segments
        (sphere = zero-length).

    The pair axis becomes the vector lane axis: narrow-phase + penalty
    forces for ANY number of pairs compile to a fixed handful of batched
    ops (the scalar path unrolls ~150 ops per pair — 176 humanoid pairs
    took >9 min of XLA compile)."""

    def __init__(self, model: Model):
        from sgqn_carla_tpu.physics.model import (
            BOX, CAPSULE, CYLINDER, ELLIPSOID, PLANE, SPHERE)

        pp = {k: [] for k in ("geom", "off", "r", "plane", "link_a",
                              "link_b", "pair", "mu")}
        ss = {k: [] for k in ("geom_a", "geom_b", "hl_a", "hl_b", "r_a",
                              "r_b", "link_a", "link_b", "pair", "mu")}
        ep = {k: [] for k in ("geom", "plane", "size", "link_a", "link_b",
                              "pair", "mu")}
        pb = {k: [] for k in ("geom_pt", "off", "r", "geom_box", "size",
                              "link_a", "link_b", "pair", "mu")}
        pe = {k: [] for k in ("geom_pt", "off", "r", "geom_el", "size",
                              "link_a", "link_b", "pair", "mu")}

        def _pt_samples(g):
            """Local-frame sample points + radius for point-vs-box."""
            if g.gtype == SPHERE:
                return [(0.0, 0.0, 0.0)], float(g.size[0])
            if g.gtype in (CAPSULE, CYLINDER):
                hl = float(g.size[1])
                return [(0.0, 0.0, hl * t) for t in
                        (-1.0, -0.5, 0.0, 0.5, 1.0)], float(g.size[0])
            if g.gtype == BOX:
                sx, sy, sz = [float(s) for s in g.size]
                return [(x * sx, y * sy, z * sz) for x in (-1, 1)
                        for y in (-1, 1) for z in (-1, 1)], 0.0
            if g.gtype == ELLIPSOID:
                # axis extremes (ellipsoid↔ellipsoid hand contacts are
                # incidental; min semi-axis as the point radius keeps a
                # contact patch near the true surface)
                sx, sy, sz = [float(s) for s in g.size]
                rmin = min(sx, sy, sz)
                return [(sx - rmin, 0, 0), (rmin - sx, 0, 0),
                        (0, sy - rmin, 0), (0, rmin - sy, 0),
                        (0, 0, sz - rmin), (0, 0, rmin - sz)], rmin
            raise NotImplementedError(
                f"box sampling for geom type {g.gtype}")
        for pi, (gi, gj) in enumerate(np.asarray(model.contact_pairs)):
            a, b = model.geoms[int(gi)], model.geoms[int(gj)]
            ga, gb = int(gi), int(gj)
            if a.gtype == PLANE:
                a, b, ga, gb = b, a, gb, ga
            mu = max(a.friction, b.friction)
            if b.gtype == PLANE and a.gtype == ELLIPSOID:
                # support point along −n: x = c − R·(S²·Rᵀn)/√(nᵀRS²Rᵀn)
                ep["geom"].append(ga)
                ep["plane"].append(gb)
                ep["size"].append([float(s) for s in a.size])
                ep["link_a"].append(a.link)
                ep["link_b"].append(b.link)
                ep["pair"].append(pi)
                ep["mu"].append(mu)
                continue
            if b.gtype == PLANE:
                if a.gtype == SPHERE:
                    pts = [((0.0, 0.0, 0.0), float(a.size[0]))]
                elif a.gtype in (CAPSULE, CYLINDER):
                    hl = float(a.size[1])
                    pts = [((0, 0, -hl), float(a.size[0])),
                           ((0, 0, +hl), float(a.size[0]))]
                elif a.gtype == BOX:
                    sx, sy, sz = [float(s) for s in a.size]
                    pts = [((x * sx, y * sy, z * sz), 0.0)
                           for x in (-1, 1) for y in (-1, 1)
                           for z in (-1, 1)]
                else:
                    raise NotImplementedError(
                        f"plane vs geom type {a.gtype}")
                for off, r in pts:
                    pp["geom"].append(ga)
                    pp["off"].append(off)
                    pp["r"].append(r)
                    pp["plane"].append(gb)
                    pp["link_a"].append(a.link)
                    pp["link_b"].append(b.link)
                    pp["pair"].append(pi)
                    pp["mu"].append(mu)
            elif (a.gtype in (SPHERE, CAPSULE, CYLINDER)
                  and b.gtype in (SPHERE, CAPSULE, CYLINDER)):
                ss["geom_a"].append(ga)
                ss["geom_b"].append(gb)
                ss["hl_a"].append(0.0 if a.gtype == SPHERE
                                  else float(a.size[1]))
                ss["hl_b"].append(0.0 if b.gtype == SPHERE
                                  else float(b.size[1]))
                ss["r_a"].append(float(a.size[0]))
                ss["r_b"].append(float(b.size[0]))
                ss["link_a"].append(a.link)
                ss["link_b"].append(b.link)
                ss["pair"].append(pi)
                ss["mu"].append(mu)
            elif BOX in (a.gtype, b.gtype):
                # point-sample narrow phase (corner-face manifolds)
                def emit(pt_g, pt_id, box_g, box_id):
                    pts, r = _pt_samples(pt_g)
                    for off in pts:
                        pb["geom_pt"].append(pt_id)
                        pb["off"].append(off)
                        pb["r"].append(r)
                        pb["geom_box"].append(box_id)
                        pb["size"].append([float(s) for s in box_g.size])
                        pb["link_a"].append(pt_g.link)
                        pb["link_b"].append(box_g.link)
                        pb["pair"].append(pi)
                        pb["mu"].append(mu)

                if a.gtype == BOX and b.gtype == BOX:
                    emit(a, ga, b, gb)
                    emit(b, gb, a, ga)
                elif a.gtype == BOX:
                    emit(b, gb, a, ga)
                else:
                    emit(a, ga, b, gb)
            elif ELLIPSOID in (a.gtype, b.gtype):
                # point-sample vs ellipsoid (scaled-space distance; exact
                # on the axes — hand-ellipsoid contacts are incidental)
                if a.gtype == ELLIPSOID:
                    a, b, ga, gb = b, a, gb, ga
                pts, r = _pt_samples(a)
                for off in pts:
                    pe["geom_pt"].append(ga)
                    pe["off"].append(off)
                    pe["r"].append(r)
                    pe["geom_el"].append(gb)
                    pe["size"].append([float(s) for s in b.size])
                    pe["link_a"].append(a.link)
                    pe["link_b"].append(b.link)
                    pe["pair"].append(pi)
                    pe["mu"].append(mu)
            else:
                raise NotImplementedError(
                    f"contact pair {a.gtype} vs {b.gtype} not supported")
        self.pp = {k: np.asarray(v) for k, v in pp.items()}
        self.ss = {k: np.asarray(v) for k, v in ss.items()}
        self.ep = {k: np.asarray(v) for k, v in ep.items()}
        self.pb = {k: np.asarray(v) for k, v in pb.items()}
        self.pe = {k: np.asarray(v) for k, v in pe.items()}
        self.npp = len(pp["pair"])
        self.nss = len(ss["pair"])
        self.nep = len(ep["pair"])
        self.npb = len(pb["pair"])
        self.npe = len(pe["pair"])


_PROGRAMS: dict = {}


def collision_program(model: Model) -> CollisionProgram:
    # keyed by id() but identity-verified (a GC'd model's recycled id must
    # not alias another model's program — same guard as
    # engine._SCALES_CACHE); the stored model reference also keeps the id
    # stable for the entry's lifetime
    key = id(model)
    got = _PROGRAMS.get(key)
    if got is not None and got[0] is model:
        return got[1]
    prog = CollisionProgram(model)
    _PROGRAMS[key] = (model, prog)
    return prog


def _contact_depths_points(model, kin, prog):
    """Batched narrow-phase. Returns per-category (depth, point, normal,
    mu, link_a, link_b, pair) with normals pointing at the moving geom."""
    from sgqn_carla_tpu.physics import engine as eng

    Rg, pg = eng.geom_world(model, kin)
    out = []
    if prog.npp:
        d = prog.pp
        Rp = Rg[d["geom"]]                        # (P, 3, 3)
        x = pg[d["geom"]] + jnp.einsum(
            "nij,nj->ni", Rp, jnp.asarray(d["off"], _f))
        n = Rg[d["plane"]][:, :, 2]
        d0 = jnp.sum(n * pg[d["plane"]], -1)
        dist = jnp.sum(n * x, -1) - d0
        depth = jnp.asarray(d["r"], _f) - dist
        point = x - n * dist[:, None]
        out.append((depth, point, n, jnp.asarray(d["mu"], _f),
                    d["link_a"], d["link_b"], d["pair"]))
    if prog.nep:
        d = prog.ep
        Re = Rg[d["geom"]]                        # (E, 3, 3)
        c = pg[d["geom"]]
        n = Rg[d["plane"]][:, :, 2]
        d0 = jnp.sum(n * pg[d["plane"]], -1)
        nl = jnp.einsum("nji,nj->ni", Re, n)      # plane normal, local frame
        s2 = jnp.asarray(d["size"], _f) ** 2
        w = s2 * nl
        denom = jnp.sqrt(jnp.sum(nl * w, -1) + 1e-12)
        x = c - jnp.einsum("nij,nj->ni", Re, w) / denom[:, None]
        dist = jnp.sum(n * x, -1) - d0
        depth = -dist
        point = x - n * dist[:, None]
        out.append((depth, point, n, jnp.asarray(d["mu"], _f),
                    d["link_a"], d["link_b"], d["pair"]))
    if prog.npb:
        d = prog.pb
        Rp = Rg[d["geom_pt"]]                     # (N, 3, 3)
        x = pg[d["geom_pt"]] + jnp.einsum(
            "nij,nj->ni", Rp, jnp.asarray(d["off"], _f))
        Rb = Rg[d["geom_box"]]
        c = pg[d["geom_box"]]
        q = jnp.einsum("nji,nj->ni", Rb, x - c)   # box-local point
        s = jnp.asarray(d["size"], _f)
        cl = jnp.clip(q, -s, s)
        delta = q - cl
        d2 = jnp.sum(delta * delta, -1)
        outside = d2 > 1e-12
        dist_out = jnp.sqrt(jnp.maximum(d2, 1e-12))
        n_out = delta / dist_out[:, None]
        fd = s - jnp.abs(q)
        k_best = jnp.argmin(fd, -1)
        dist_in = -jnp.min(fd, -1)
        sgn = jnp.sign(jnp.where(jnp.abs(q) < 1e-9, 1.0, q))
        n_in = sgn * (jnp.arange(3)[None, :] == k_best[:, None])
        dist = jnp.where(outside, dist_out, dist_in)
        n_l = jnp.where(outside[:, None], n_out, n_in)
        n = jnp.einsum("nij,nj->ni", Rb, n_l)     # box → point-geom normal
        depth = jnp.asarray(d["r"], _f) - dist
        point = x - n * dist[:, None]
        out.append((depth, point, n, jnp.asarray(d["mu"], _f),
                    d["link_a"], d["link_b"], d["pair"]))
    if prog.npe:
        d = prog.pe
        Rp = Rg[d["geom_pt"]]
        x = pg[d["geom_pt"]] + jnp.einsum(
            "nij,nj->ni", Rp, jnp.asarray(d["off"], _f))
        Re = Rg[d["geom_el"]]
        c = pg[d["geom_el"]]
        q = jnp.einsum("nji,nj->ni", Re, x - c)
        s = jnp.asarray(d["size"], _f)
        u = q / s
        nu = jnp.sqrt(jnp.sum(u * u, -1) + 1e-12)
        qn = jnp.sqrt(jnp.sum(q * q, -1) + 1e-12)
        dist = (nu - 1.0) * qn / nu
        n_l = q / (s * s)
        n_l = n_l / jnp.sqrt(jnp.sum(n_l * n_l, -1, keepdims=True) + 1e-12)
        n = jnp.einsum("nij,nj->ni", Re, n_l)
        depth = jnp.asarray(d["r"], _f) - dist
        point = x - n * dist[:, None]
        out.append((depth, point, n, jnp.asarray(d["mu"], _f),
                    d["link_a"], d["link_b"], d["pair"]))
    if prog.nss:
        d = prog.ss
        za = Rg[d["geom_a"]][:, :, 2] * jnp.asarray(d["hl_a"], _f)[:, None]
        zb = Rg[d["geom_b"]][:, :, 2] * jnp.asarray(d["hl_b"], _f)[:, None]
        a0, a1 = pg[d["geom_a"]] - za, pg[d["geom_a"]] + za
        b0, b1 = pg[d["geom_b"]] - zb, pg[d["geom_b"]] + zb
        d1, d2, r = a1 - a0, b1 - b0, a0 - b0
        aa = jnp.sum(d1 * d1, -1) + 1e-12
        ee = jnp.sum(d2 * d2, -1) + 1e-12
        fv = jnp.sum(d2 * r, -1)
        cc = jnp.sum(d1 * r, -1)
        bb = jnp.sum(d1 * d2, -1)
        denom = aa * ee - bb * bb
        s = jnp.clip((bb * fv - cc * ee) / (denom + 1e-12), 0.0, 1.0)
        tt = jnp.clip((bb * s + fv) / ee, 0.0, 1.0)
        s = jnp.clip((bb * tt - cc) / aa, 0.0, 1.0)
        ca = a0 + d1 * s[:, None]
        cb = b0 + d2 * tt[:, None]
        delta = ca - cb
        dist = jnp.sqrt(jnp.sum(delta * delta, -1) + 1e-12)
        n = delta / (dist + 1e-9)[:, None]
        ra = jnp.asarray(d["r_a"], _f)
        rb = jnp.asarray(d["r_b"], _f)
        depth = (ra + rb) - dist
        point = cb + n * (rb - depth / 2)[:, None]
        out.append((depth, point, n, jnp.asarray(d["mu"], _f),
                    d["link_a"], d["link_b"], d["pair"]))
    return out


def contact_wrenches_batched(model: Model, kin):
    """((nl, 6) wrenches, (npair,) normal magnitudes) via the batched
    narrow-phase — fixed op count regardless of pair count."""
    from sgqn_carla_tpu.physics import engine as eng

    prog = collision_program(model)
    npair = len(model.contact_pairs)
    # inertia-scaled soft-constraint gains per pair + gravity feed-forward
    # when one side is static (see engine.constraint_scales docstring)
    m_eff, _ = eng.constraint_scales(model)
    k0, b0, imp = eng._soft_gains(model)
    kp_pair = jnp.asarray(imp * m_eff * k0, _f)
    kd_pair = jnp.asarray(imp * m_eff * b0, _f)
    ka_pair = jnp.asarray(imp * m_eff, _f)
    one_static = jnp.asarray(
        [(model.geoms[int(gi)].link < 0) != (model.geoms[int(gj)].link < 0)
         for gi, gj in model.contact_pairs], _f) if npair else jnp.zeros(0, _f)
    gvec = jnp.asarray(model.gravity, _f)
    # link velocities padded so index −1 (world) reads zeros
    v_pad = jnp.concatenate([kin.v, jnp.zeros((1, 6), _f)], 0)
    F_pad = jnp.zeros((model.nl + 1, 6), _f)
    pf = jnp.zeros((npair,), _f)
    for depth, x, n, mu, la, lb, pair in _contact_depths_points(
            model, kin, prog):
        la_j = jnp.asarray(la)
        lb_j = jnp.asarray(lb)
        pair_j = jnp.asarray(pair)
        kp = kp_pair[pair_j]
        kd = kd_pair[pair_j]
        w_a, v_a = v_pad[la_j, :3], v_pad[la_j, 3:]
        w_b, v_b = v_pad[lb_j, :3], v_pad[lb_j, 3:]
        v_rel = (jnp.cross(w_a, x) + v_a) - (jnp.cross(w_b, x) + v_b)
        vn = jnp.sum(v_rel * n, -1)
        active = (depth > 0).astype(_f)
        fn = kp * depth - kd * vn - (ka_pair[pair_j] * one_static[pair_j]
                                     * jnp.sum(gvec * n, -1))
        fn = jnp.maximum(fn, 0.0) * active
        vt = v_rel - n * vn[:, None]
        vt_norm = jnp.sqrt(jnp.sum(vt * vt, -1)) + 1e-6
        ft_scale = -mu * fn * jnp.tanh(vt_norm / 0.01) / vt_norm
        f3 = n * fn[:, None] + vt * ft_scale[:, None]
        wr = jnp.concatenate([jnp.cross(x, f3), f3], -1)
        F_pad = F_pad.at[la_j].add(wr).at[lb_j].add(-wr)
        pf = pf.at[jnp.asarray(pair)].add(fn)
    return F_pad[:model.nl], pf


def warm_size(model: Model) -> int:
    """Number of candidate contact points the implicit solver tracks —
    the static shape of its warm-start impulse carry (see
    implicit_contact_stage's `warm`)."""
    prog = collision_program(model)
    return prog.npp + prog.nss + prog.nep + prog.npb + prog.npe


def implicit_contact_stage(model: Model, qpos, qvel, h, anc, warm=None):
    """Velocity-level implicit contact solve (model.implicit_contacts).

    Sequential (Gauss-Seidel) projected impulses over all potential
    contacts: for each contact, a velocity-level non-penetration impulse
    along the normal (Baumgarte-stabilized, force-UNBOUNDED — gram-scale
    digits carry newton loads, unlike the explicit penalty's
    k ≤ m_eff/h² stability bound) and a friction impulse targeting ZERO
    tangential slip, clamped to the Coulomb cone (TRUE stiction: a
    squeezed ball stays held, where the regularized tanh friction of the
    explicit path always creeps). Impulses are applied through the EXACT
    damping-implicit inverse inertia (W = (M + h·diag(d))⁻¹Gᵀ, one
    Cholesky per substep, the same operator as the smooth Euler solve) —
    true PGS on the Delassus operator, the role MuJoCo's PGS/Newton
    solvers play.

    `warm` is an optional (warm_size(model), 3) array of λ(n, t1, t2)
    from the previous substep (same model ⇒ same static contact-point
    order): warm-started impulses are applied up front and the sweeps
    only correct them, which removes the per-substep cold-start
    micro-slip that otherwise accumulates as a slow hold creep.

    Returns (qvel', (npair,) normal force magnitudes, λ for warm, dq) —
    `dq` is the split-impulse positional correction the integrator must
    add to qpos (and ONLY to qpos; see the stabilization note below).

    This is the solver-shaped path the grasp domains need; locomotion
    domains keep the golden-validated explicit penalty
    (see Model.implicit_contacts)."""
    from sgqn_carla_tpu.physics import engine as eng

    kin = eng.forward_kinematics(model, qpos, qvel)
    prog = collision_program(model)
    cats = _contact_depths_points(model, kin, prog)
    if not cats:
        return (qvel, jnp.zeros((len(model.contact_pairs),), _f),
                jnp.zeros((0, 3), _f), jnp.zeros_like(qvel))
    D = jnp.concatenate([c[0] for c in cats])
    X = jnp.concatenate([c[1] for c in cats])
    N = jnp.concatenate([c[2] for c in cats])
    MU = jnp.concatenate([jnp.broadcast_to(jnp.asarray(c[3], _f),
                                           c[0].shape) for c in cats])
    LA = np.concatenate([np.asarray(c[4]) for c in cats])
    LB = np.concatenate([np.asarray(c[5]) for c in cats])
    PAIR = np.concatenate([np.asarray(c[6]) for c in cats])

    # generalized directions G[c, j] = (anc[la]−anc[lb])_j · (S_j · w_c)
    anc_pad = np.concatenate([np.asarray(anc, np.float32),
                              np.zeros((1, model.nl), np.float32)], 0)
    mask = jnp.asarray(anc_pad[LA] - anc_pad[LB], _f)       # (C, nl)

    def gdirs(F):
        W = jnp.concatenate([jnp.cross(X, F), F], -1)       # (C, 6)
        return (W @ kin.S.T) * mask                          # (C, nl)

    # orthonormal tangent frame per contact
    ref = jnp.where(jnp.abs(N[:, 2:3]) < 0.9,
                    jnp.asarray([0.0, 0.0, 1.0], _f)[None],
                    jnp.asarray([1.0, 0.0, 0.0], _f)[None])
    T1 = jnp.cross(N, ref)
    T1 = T1 / (jnp.linalg.norm(T1, axis=-1, keepdims=True) + 1e-9)
    T2 = jnp.cross(N, T1)
    Gn, Gt1, Gt2 = gdirs(N), gdirs(T1), gdirs(T2)

    # exact impulse responses W = M⁻¹Gᵀ (true Delassus diagonal, not the
    # diagonal joint-space approximation): applying impulses through an
    # approximate inverse inertia is not momentum-consistent on articulated
    # chains and measurably pumps energy — the manipulator hold probe showed
    # an exponential lateral escape mode (×2 every 0.2 s) under the diagonal
    # response that the exact response removes. One (nl,nl) Cholesky + a
    # 3C-rhs triangular solve per substep; grasp domains only.
    from jax.scipy.linalg import cho_factor, cho_solve

    I6 = spatial_inertias(model, kin)
    anc_f = jnp.asarray(anc, _f)
    M = mass_matrix(model, kin, I6, anc_f)
    # impulse response must see the same implicit dof damping as the
    # smooth dynamics solve (forward_dynamics: (M + h·D)·qacc = τ): without h·D a
    # contact impulse gives a 1e6-damped "pose dof" (manipulator/stacker
    # receptacles ride on these) a velocity that damping only kills the
    # NEXT substep — after qpos integration — so sustained contact loads
    # drift the receptacle ~1000× its documented <0.1 mm budget
    Mreg = (M
            + jnp.diag(jnp.asarray(model.jnt_damping, _f)) * jnp.float32(h)
            + jnp.float32(1e-9) * jnp.eye(model.nl, dtype=_f))
    cho = cho_factor(Mreg, lower=True)
    Wn = cho_solve(cho, Gn.T).T                              # (C, nl)
    Wt1 = cho_solve(cho, Gt1.T).T
    Wt2 = cho_solve(cho, Gt2.T).T

    def eff_m(G, W):
        return 1.0 / (jnp.sum(G * W, -1) + 1e-9)
    m_n, m_t1, m_t2 = eff_m(Gn, Wn), eff_m(Gt1, Wt1), eff_m(Gt2, Wt2)

    active = (D > 0).astype(_f)
    beta = jnp.float32(GS_BETA)                               # Baumgarte ERP

    # sequential (Gauss-Seidel) projected impulses via lax.scan — Jacobi
    # sweeps oscillate on two-sided pinches (a gripped ball) and creep;
    # GS converges in a few sweeps. Velocity-level non-penetration is
    # force-UNBOUNDED (the point vs the spring law: the constraint pushes
    # with whatever impulse zeroes the approach velocity, so gram-scale
    # digits carry newton loads). Penetration recovery is SPLIT-IMPULSE:
    # the velocity pass targets vn ≥ 0 only, and a separate positional
    # pseudo-impulse pass (below) pushes overlap out through qpos without
    # touching qvel — velocity-level Baumgarte (β·D/h folded into vn_tgt)
    # hands every pushed-out body real kinetic energy, which a two-sided
    # pinch (ball resting in the insert-task cup V) alternately amplifies
    # into a measured exponential blow-up (spin → 1500 rad/s within 0.5 s).
    xs = dict(Gn=Gn, Gt1=Gt1, Gt2=Gt2, Wn=Wn, Wt1=Wt1, Wt2=Wt2,
              m_n=m_n, m_t1=m_t1, m_t2=m_t2,
              D=D, MU=MU, active=active,
              i=jnp.arange(D.shape[0], dtype=jnp.int32))

    def one_contact(carry, x):
        v, ln, lt1, lt2 = carry
        idx = x["i"]
        vn = jnp.sum(x["Gn"] * v)
        vn_tgt = jnp.maximum(vn, 0.0)     # non-penetration only, no Baumgarte
        d_n = x["m_n"] * (vn_tgt - vn) * x["active"]
        new_n = jnp.maximum(ln[idx] + d_n, 0.0)               # λn ≥ 0
        d_n = new_n - ln[idx]
        ln = ln.at[idx].set(new_n)
        v = v + d_n * x["Wn"]
        for key, wkey, mkey, lt in (("Gt1", "Wt1", "m_t1", "lt1"),
                                    ("Gt2", "Wt2", "m_t2", "lt2")):
            G = x[key]
            vt = jnp.sum(G * v)
            d_t = x[mkey] * (-vt) * x["active"]
            lam = lt1 if lt == "lt1" else lt2
            new_t = jnp.clip(lam[idx] + d_t, -x["MU"] * new_n,
                             x["MU"] * new_n)
            d_t = new_t - lam[idx]
            if lt == "lt1":
                lt1 = lam.at[idx].set(new_t)
            else:
                lt2 = lam.at[idx].set(new_t)
            v = v + d_t * x[wkey]
        return (v, ln, lt1, lt2), None

    v = qvel
    if warm is not None:
        # apply last substep's converged impulses up front (gated by the
        # current active set; the cone bound μ·λn is inherited): the sweeps
        # below then only *correct*, instead of rebuilding λ from zero
        # through fresh micro-slip every substep
        lam_n = warm[:, 0] * active
        lam_t1 = warm[:, 1] * active
        lam_t2 = warm[:, 2] * active
        v = v + lam_n @ Wn + lam_t1 @ Wt1 + lam_t2 @ Wt2
    else:
        lam_n = jnp.zeros(D.shape, _f)
        lam_t1 = jnp.zeros(D.shape, _f)
        lam_t2 = jnp.zeros(D.shape, _f)
    for _ in range(GS_SWEEPS):
        (v, lam_n, lam_t1, lam_t2), _ = jax.lax.scan(
            one_contact, (v, lam_n, lam_t1, lam_t2), xs)

    # positional pass: pseudo-impulses (normals only, cold each substep)
    # whose resulting pseudo-velocity integrates into qpos ONLY — overlap
    # recovers at rate β·D/h with zero kinetic-energy injection
    def one_pos(carry, x):
        vp, pn = carry
        idx = x["i"]
        vpn = jnp.sum(x["Gn"] * vp)
        d_p = x["m_n"] * (beta * x["D"] / h - vpn) * x["active"]
        new_p = jnp.maximum(pn[idx] + d_p, 0.0)
        d_p = new_p - pn[idx]
        pn = pn.at[idx].set(new_p)
        vp = vp + d_p * x["Wn"]
        return (vp, pn), None

    vp = jnp.zeros_like(qvel)
    pn = jnp.zeros(D.shape, _f)
    for _ in range(POS_SWEEPS):
        (vp, pn), _ = jax.lax.scan(one_pos, (vp, pn), xs)

    npair = len(model.contact_pairs)
    pf = jnp.zeros((npair,), _f).at[jnp.asarray(PAIR)].add(lam_n / h)
    return v, pf, jnp.stack([lam_n, lam_t1, lam_t2], -1), h * vp


def hfield_wrenches(model: Model, kin, terrain):
    """((nl, 6) wrenches, (n_hfield_pairs,) normal magnitudes) from the
    per-episode heightfield terrain grid (physics/hfield.py).

    Narrow phase: each colliding geom's static sample-point spheres
    (model.hfield_pairs, built at compile) against the bilinear surface —
    the smooth-penalty analogue of MuJoCo's prism decomposition for
    `<geom type="hfield">` (reference: suite/quadruped.xml:84). Gains use
    the same inertia-scaled soft-constraint law as the regular pairs
    (engine.constraint_scales), with the static-world gravity feed-forward."""
    from sgqn_carla_tpu.physics import engine as eng
    from sgqn_carla_tpu.physics import hfield as hf

    gh = model.geoms[model.hfield_geom]
    half = float(gh.size[0])
    z0 = float(gh.pos[2])
    Rg, pg = eng.geom_world(model, kin)
    k0, b0, imp = eng._soft_gains(model)
    m_eff, _ = eng.constraint_scales(model)
    m_h = np.asarray(m_eff[-len(model.hfield_pairs):])
    gvec = jnp.asarray(model.gravity, _f)

    xs, rad, links, rows, mus = [], [], [], [], []
    for h_i, (gid, pts) in enumerate(model.hfield_pairs):
        g = model.geoms[gid]
        for lp, r in pts:
            x = pg[gid] + Rg[gid] @ jnp.asarray(lp, _f)
            xs.append(x)
            rad.append(r)
            links.append(g.link)
            rows.append(h_i)
            mus.append(g.friction)
    X = jnp.stack(xs)                                   # (K, 3)
    rad = jnp.asarray(rad, _f)
    rows_j = jnp.asarray(rows)
    links_j = jnp.asarray(links)
    mu = jnp.asarray(mus, _f)

    h, n = hf.sample(terrain, X[:, 0], X[:, 1], half, z0)
    nvec = jnp.stack(n, -1)                             # (K, 3)
    # vertical penetration of each sample sphere, projected on the normal
    depth = (h - (X[:, 2] - rad)) * nvec[:, 2]
    kp = jnp.asarray(imp * m_h * k0, _f)[rows_j]
    kd = jnp.asarray(imp * m_h * b0, _f)[rows_j]
    ka = jnp.asarray(imp * m_h, _f)[rows_j]
    v_pad = jnp.concatenate([kin.v, jnp.zeros((1, 6), _f)], 0)
    w_a, v_a = v_pad[links_j, :3], v_pad[links_j, 3:]
    v_rel = jnp.cross(w_a, X) + v_a
    vn = jnp.sum(v_rel * nvec, -1)
    active = (depth > 0).astype(_f)
    fn = kp * depth - kd * vn - ka * jnp.sum(gvec * nvec, -1)
    fn = jnp.maximum(fn, 0.0) * active
    vt = v_rel - nvec * vn[:, None]
    vt_norm = jnp.sqrt(jnp.sum(vt * vt, -1)) + 1e-6
    ft_scale = -mu * fn * jnp.tanh(vt_norm / 0.01) / vt_norm
    f3 = nvec * fn[:, None] + vt * ft_scale[:, None]
    wr = jnp.concatenate([jnp.cross(X, f3), f3], -1)
    F = jnp.zeros((model.nl, 6), _f).at[links_j].add(wr)
    pf = jnp.zeros((len(model.hfield_pairs),), _f).at[rows_j].add(fn)
    return F, pf


def penetration_depths_batched(model: Model, qpos) -> jnp.ndarray:
    """All contact depths at `qpos` (batched max_penetration backend)."""
    from sgqn_carla_tpu.physics import engine as eng

    kin = eng.forward_kinematics(model, qpos, jnp.zeros_like(qpos))
    prog = collision_program(model)
    depths = [jnp.full((1,), -1.0, _f)]
    for depth, *_ in _contact_depths_points(model, kin, prog):
        depths.append(depth)
    return jnp.concatenate(depths)


def tendon_wrenches(model: Model, kin) -> jnp.ndarray:
    """(nl, 6) wrenches from limited spatial tendons (engine.tendon_taus)."""
    from sgqn_carla_tpu.ops import v3
    from sgqn_carla_tpu.physics import engine as eng

    qs, ps, _, _, _ = kin.soa
    links, wrenches = [], []
    for t in model.tendons:
        def site(link, pos):
            if link < 0:
                return eng._const3(pos)
            return v3.add(ps[link], v3.qrot(qs[link], eng._const3(pos)))

        pa = site(t.link_a, t.pos_a)
        pb = site(t.link_b, t.pos_b)
        delta = v3.sub(pa, pb)
        length = v3.norm(delta, eps=1e-12) + 1e-9
        dirn = v3.scale(delta, 1.0 / length)
        stretch = jnp.maximum(length - t.range[1], 0.0)
        rate = v3.dot(v3.sub(eng._point_velocity(kin, t.link_a, pa),
                             eng._point_velocity(kin, t.link_b, pb)), dirn)
        fmag = t.stiffness * stretch + jnp.where(stretch > 0,
                                                 t.damping * rate, 0.0)
        f3 = v3.scale(dirn, -jnp.maximum(fmag, 0.0))
        for link, sign, x in ((t.link_a, 1.0, pa), (t.link_b, -1.0, pb)):
            if link >= 0:
                links.append(link)
                wrenches.append(sign * jnp.stack([*v3.cross(x, f3), *f3], -1))
    F = jnp.zeros((model.nl, 6), _f)
    if links:
        F = F.at[jnp.asarray(links)].add(jnp.stack(wrenches))
    return F


def forward_dynamics(model: Model, qpos, qvel, ctrl, anc, hfield=None):
    """qacc + per-pair contact normal forces — dense-path twin of
    `engine._forward_dynamics`. For models with an HFIELD geom, `hfield`
    is the per-episode terrain grid; its forces append after the pairs."""
    from jax.scipy.linalg import cho_factor, cho_solve

    from sgqn_carla_tpu.physics import engine as eng

    kin = eng.forward_kinematics(model, qpos, qvel)
    anc_f = jnp.asarray(anc, _f)
    I6 = spatial_inertias(model, kin)
    M = mass_matrix(model, kin, I6, anc_f)
    C = bias_forces(model, kin, I6, qvel, anc_f)
    tau = eng.applied_taus(model, qpos, qvel, ctrl)
    F = jnp.zeros((model.nl, 6), _f)
    any_wrench = False
    if model.tendons:
        F = F + tendon_wrenches(model, kin)
        any_wrench = True
    if model.density > 0 or model.viscosity > 0:
        F = F + fluid_wrenches(model, kin)
        any_wrench = True
    if len(model.contact_pairs) and not model.implicit_contacts:
        Fc, pair_f = contact_wrenches_batched(model, kin)
        F = F + Fc
        any_wrench = True
    else:
        # implicit_contacts: contact impulses are applied post-integration
        # in engine.step (implicit_contact_stage), not as forces here
        pair_f = jnp.zeros((0 if not model.implicit_contacts
                            else len(model.contact_pairs),), _f)
    if model.hfield_pairs:
        if hfield is None:
            raise ValueError(
                "model has an hfield geom: pass the terrain grid via "
                "engine.step/n_steps(..., hfield=...)")
        Fh, pf_h = hfield_wrenches(model, kin, hfield)
        F = F + Fh
        pair_f = jnp.concatenate([pair_f, pf_h])
        any_wrench = True
    if any_wrench:
        tau = tau + project_wrenches(kin, anc_f, F)
    rhs = tau - C
    if model.integrator != "rk4":
        # implicit dof damping, matching MuJoCo's Euler and the SoA path
        # (engine._forward_dynamics): solve (M + h·diag(d))·qacc = τ
        M = M + jnp.diag(jnp.asarray(model.jnt_damping, _f)) * model.timestep
    # keep the regularizer small: fin-class links have ~1e-6 armature and
    # min-eigenvalues ~1e-7 — a larger shift visibly perturbs qacc
    Mreg = M + 1e-10 * jnp.eye(model.nl, dtype=M.dtype)
    qacc = cho_solve(cho_factor(Mreg, lower=True), rhs[..., None])[..., 0]
    return qacc, pair_f
