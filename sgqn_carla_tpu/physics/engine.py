"""Featherstone rigid-body dynamics engine (pure JAX, structure-of-arrays).

TPU-native replacement for the MuJoCo C stepping core the reference reaches
through ctypes (`mj_step1`/`mj_step2`, reference: src/env/dm_control/
dm_control/mujoco/engine.py:148-165). Design:

  * generalized coordinates over single-DoF links (see `model.ModelBuilder`),
    world-frame spatial algebra;
  * **scalar-component (structure-of-arrays) math throughout** (ops/v3.py):
    TPU tiles the last two array dims to (8, 128), so "array-of-vectors"
    shapes like (B, 3) or (B, 6) waste ≥95% of VPU lanes and 42× memory.
    Here every vector is a tuple of scalar components; under `vmap` each
    component becomes a (B,) array that runs full 128-wide lanes;
  * CRBA (composite inertias) + RNEA (qacc=0 bias) unrolled over the static
    topology as pure scalar arithmetic; forward dynamics solves the nv×nv
    SPD system with an **unrolled Cholesky** — no `linalg` loops, no MXU
    micro-dots, everything fuses into wide elementwise code;
  * contacts are smooth penalty forces (spring-damper normal + regularized
    Coulomb friction) over a *static* pair list compiled from
    contype/conaffinity — no LCP solver, no data-dependent control flow;
  * joint limits as one-sided penalty springs (reference semantics:
    solimplimit constraints, suite/walker.xml:11); tendons as one-sided
    stiff springs (ball_in_cup's string);
  * integrators: semi-implicit Euler (MuJoCo default) and RK4 (cartpole,
    suite/cartpole.xml:6).

All trace-time loops unroll over the static topology; every function is
`vmap`-able over an environment batch and jits into one fused XLA program.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sgqn_carla_tpu.ops import v3
from sgqn_carla_tpu.physics.model import (
    BOX, CAPSULE, CYLINDER, ELLIPSOID, HINGE, PLANE, SLIDE, SPHERE, Model,
)


class Kin(NamedTuple):
    """Forward-kinematics caches.

    Public array views (small, built once by stacking) feed tasks/rendering;
    `soa` carries the per-link structure-of-arrays forms the dynamics use:
    soa = (q, p, S, v, com) where q[i] is a 4-tuple quaternion, p[i]/com[i]
    vec3 tuples, S[i]/v[i] spatial (w3, v3) pairs.
    """

    R: jnp.ndarray        # (nl, 3, 3) link orientations
    p: jnp.ndarray        # (nl, 3) link frame origins
    S: jnp.ndarray        # (nl, 6) joint motion subspaces (Plücker)
    v: jnp.ndarray        # (nl, 6) link spatial velocities
    com: jnp.ndarray      # (nl, 3) link COM positions
    axis_w: jnp.ndarray   # (nl, 3) world joint axes
    anchor_w: jnp.ndarray # (nl, 3) world joint anchors
    q: jnp.ndarray        # (nl, 4) link quaternions
    soa: Any = None
    basis: Any = None     # per-link world rotation columns (ex, ey, ez) as
                          # vec3 tuples — cached once per substep so the
                          # dynamics (spatial inertias, geom poses, constant
                          # -offset rotations) never re-derive R from q


class StepOut(NamedTuple):
    qpos: jnp.ndarray
    qvel: jnp.ndarray
    contact_force: jnp.ndarray  # (npair,) accumulated normal force magnitudes


def f32_matmuls(fn):
    """Pin every matmul traced inside `fn` to true f32 accumulation.

    The TPU MXU default-lowers f32 dots to bf16×bf16 multiplies (~8
    mantissa bits); the scalar-component path never emits dots, but the
    dense path's mass matrix / Cholesky / Delassus products (dense.py,
    nl ≥ DENSE_NL) do — and at bf16 the fish free-root fluid dynamics
    accumulate energy until qpos is NaN within ~20 control steps
    (reproduced on v5e; CPU f32 and TPU-with-f32-precision agree to 1e-4).
    Physics must be bit-comparable to the CPU golden suite, so every
    engine entry point trades the (tiny, nl×nl) MXU speedup away."""
    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("float32"):
            return fn(*a, **k)
    return wrapped


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


def _const3(a):
    return (jnp.float32(a[0]), jnp.float32(a[1]), jnp.float32(a[2]))


def _rot_const(basis, a):
    """R·a for a *constant* vec3 `a`, using cached basis columns.

    Zero components of `a` are skipped and ±1 coefficients folded at trace
    time, so the common cases (joint axes like (0,0,1), offsets like
    (0,0,-z)) cost 0-3 VPU ops instead of a 27-op quaternion rotation.
    `basis` is the (ex, ey, ez) column tuple cached in `Kin.basis`."""
    out = [None, None, None]
    for j in range(3):
        aj = float(a[j])
        if aj == 0.0:
            continue
        col = basis[j]
        for r in range(3):
            if aj == 1.0:
                term = col[r]
            elif aj == -1.0:
                term = -col[r]
            else:
                term = col[r] * jnp.float32(aj)
            out[r] = term if out[r] is None else out[r] + term
    zero = jnp.float32(0.0)
    return tuple(zero if o is None else o for o in out)


@f32_matmuls
def forward_kinematics(model: Model, qpos, qvel) -> Kin:
    """Sequential FK over the static chain; all quaternion component math.

    Large trees dispatch to the scan-based FK (`dense.forward_kinematics_
    scan`): XLA compile time on the unrolled chain grows ~3× per 3 links
    of depth (measured: 0.7 s at 8 links → 140 s at 17)."""
    from sgqn_carla_tpu.physics import dense

    if model.nl >= dense.DENSE_NL:
        return dense.forward_kinematics_scan(model, qpos, qvel)
    nl = model.nl
    f = jnp.float32
    theta = qpos.astype(f) - jnp.asarray(model.jnt_ref, f)
    qd = qvel.astype(f)
    qs, ps, Ss, vs, coms, axes, anchors = [], [], [], [], [], [], []
    bases = []
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    id_basis = ((one, zero, zero), (zero, one, zero), (zero, zero, one))
    for i in range(nl):
        par = int(model.link_parent[i])
        if par < 0:
            q_p = (one, zero, zero, zero)
            b_p = id_basis
            p_p = (zero, zero, zero)
            v_p = ((zero, zero, zero), (zero, zero, zero))
        else:
            q_p, p_p, v_p, b_p = qs[par], ps[par], vs[par], bases[par]
        if np.allclose(model.link_quat[i], [1.0, 0, 0, 0]):
            q0, b0 = q_p, b_p
        else:
            q0 = v3.qmul(q_p, tuple(jnp.float32(c) for c in model.link_quat[i]))
            b0 = v3.q_columns(q0)
        off = model.link_pos[i]
        if np.allclose(off, 0.0):
            p0 = p_p
        else:
            p0 = v3.add(p_p, _rot_const(b_p, off))
        n = _rot_const(b0, model.jnt_axis[i])
        jp = model.jnt_pos[i]
        a = p0 if np.allclose(jp, 0.0) else v3.add(p0, _rot_const(b0, jp))
        if int(model.jnt_type[i]) == HINGE:
            q_rot = v3.q_axis_angle(n, theta[i])
            q_i = v3.qmul(q_rot, q0)
            b_i = v3.q_columns(q_i)
            p_i = v3.add(a, v3.qrot(q_rot, v3.sub(p0, a)))
            S_i = (n, v3.cross(a, n))
        else:  # SLIDE
            q_i, b_i = q0, b0
            p_i = v3.add(p0, v3.scale(n, theta[i]))
            S_i = ((zero, zero, zero), n)
        v_i = v3.s_add(v_p, v3.s_scale(S_i, qd[i]))
        com_i = (p_i if np.allclose(model.link_com[i], 0.0)
                 else v3.add(p_i, _rot_const(b_i, model.link_com[i])))
        qs.append(q_i); ps.append(p_i); Ss.append(S_i); vs.append(v_i)
        coms.append(com_i); axes.append(n); anchors.append(a)
        bases.append(b_i)

    def stackv(ts):
        return jnp.stack([v3.stack(t) for t in ts]) if ts else jnp.zeros((0, 3))

    def stacks(ts):
        return (jnp.stack([jnp.stack([*t[0], *t[1]], -1) for t in ts])
                if ts else jnp.zeros((0, 6)))

    q_arr = (jnp.stack([jnp.stack(q, -1) for q in qs])
             if qs else jnp.zeros((0, 4)))
    R_arr = (jnp.stack([jnp.stack([v3.stack(b[0]), v3.stack(b[1]),
                                   v3.stack(b[2])], -1) for b in bases])
             if nl else jnp.zeros((0, 3, 3)))
    return Kin(
        R=R_arr, p=stackv(ps), S=stacks(Ss), v=stacks(vs), com=stackv(coms),
        axis_w=stackv(axes), anchor_w=stackv(anchors), q=q_arr,
        soa=(tuple(qs), tuple(ps), tuple(Ss), tuple(vs), tuple(coms)),
        basis=tuple(bases),
    )


# ------------------------------------------------- spatial inertia (SoA)
# SpI = (A: 3×3 nested tuple [inertia about origin], h: vec3 [m·com], m)

def _mat3_vec(A, w):
    return (
        A[0][0] * w[0] + A[0][1] * w[1] + A[0][2] * w[2],
        A[1][0] * w[0] + A[1][1] * w[1] + A[1][2] * w[2],
        A[2][0] * w[0] + A[2][1] * w[1] + A[2][2] * w[2],
    )


def _spi_from_link(model: Model, i: int, kin: Kin):
    """World spatial inertia of link i about the world origin.

    Op-lean form: reuses the rotation columns cached in `Kin.basis`
    (instead of re-deriving R from the quaternion per call), skips zero
    entries of the constant body-frame inertia at trace time, and builds
    only the 6 unique entries of the symmetric matrices (the mirrored
    entries share the same traced value, so downstream consumers reading
    all 9 cost nothing extra)."""
    _, _, _, _, coms = kin.soa
    m = float(model.link_mass[i])
    c = coms[i]
    I_local = np.asarray(model.link_inertia[i], np.float64)
    basis = (kin.basis[i] if kin.basis is not None
             else v3.q_columns(kin.soa[0][i]))
    zero = jnp.float32(0.0)
    # L = R · I_local:  L[r][k] = Σ_j R[r][j] I[j][k],  R[r][j] = basis[j][r]
    L = [[None] * 3 for _ in range(3)]
    for r in range(3):
        for k in range(3):
            s = None
            for j in range(3):
                aij = float(I_local[j, k])
                if aij == 0.0:
                    continue
                term = basis[j][r] * jnp.float32(aij)
                s = term if s is None else s + term
            L[r][k] = zero if s is None else s
    # A_c = L · Rᵀ (symmetric):  A_c[r][s] = Σ_k L[r][k] * basis[k][s]
    A_c = [[None] * 3 for _ in range(3)]
    for r in range(3):
        for s in range(r, 3):
            A_c[r][s] = A_c[s][r] = (L[r][0] * basis[0][s]
                                     + L[r][1] * basis[1][s]
                                     + L[r][2] * basis[2][s])
    # shift to origin: A = A_c + m (|c|² I − c cᵀ), also symmetric
    c2 = v3.dot(c, c)
    A = [[None] * 3 for _ in range(3)]
    for r in range(3):
        for s in range(r, 3):
            A[r][s] = A[s][r] = (A_c[r][s]
                                 + m * ((c2 if r == s else 0.0) - c[r] * c[s]))
    h = v3.scale(c, m)
    return (A, h, m)


def _spi_add(a, b):
    A = [[a[0][r][s] + b[0][r][s] for s in range(3)] for r in range(3)]
    return (A, v3.add(a[1], b[1]), a[2] + b[2])


def _spi_apply(I, sv):
    """SpI × spatial motion (w, v) → spatial force (n, f)."""
    A, h, m = I
    w, vv = sv
    n = v3.add(_mat3_vec(A, w), v3.cross(h, vv))
    fl = v3.add(v3.scale(vv, m), v3.cross(w, h))
    return (n, fl)


# beyond this many links the unrolled scalar Cholesky's ~n³/3 ops explode
# XLA compile time (swimmer15 alone takes >10 min on CPU); dense
# cho_solve compiles in seconds and batches well under vmap
_DENSE_SOLVE_NL = 12


def _solve_spd(M, b, n: int):
    """SPD mass-matrix solve. M is a nested list of scalars, b a list; under
    vmap each scalar is a (B,) array.

    Small models: unrolled Cholesky — ~n³/3 fused elementwise ops, no
    lax.linalg loops (fastest on TPU). Large models (nl ≥ _DENSE_SOLVE_NL):
    stack into a dense (n, n) matrix and use jax.scipy cho_solve — one
    fused linalg op, tractable compile."""
    if n >= _DENSE_SOLVE_NL:
        from jax.scipy.linalg import cho_factor, cho_solve

        Md = jnp.stack([jnp.stack(row, -1) for row in M], -2)
        bd = jnp.stack(b, -1)
        Md = Md + 1e-10 * jnp.eye(n, dtype=Md.dtype)
        x = cho_solve(cho_factor(Md, lower=True), bd[..., None])[..., 0]
        return [x[..., i] for i in range(n)]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = M[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][i] = jnp.sqrt(jnp.maximum(s, 1e-10))
            else:
                L[i][j] = s / L[j][j]
    # forward: L y = b
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # backward: Lᵀ x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def mass_matrix(model: Model, kin: Kin) -> jnp.ndarray:
    """CRBA (array view, for tests/inspection)."""
    M = _mass_matrix_soa(model, kin)
    return jnp.stack([jnp.stack(row, -1) for row in M], -2)


def _mass_matrix_soa(model: Model, kin: Kin, Iw=None):
    nl = model.nl
    _, _, Ss, _, _ = kin.soa
    Ic = list(Iw) if Iw is not None else [
        _spi_from_link(model, i, kin) for i in range(nl)]
    for i in reversed(range(nl)):
        par = int(model.link_parent[i])
        if par >= 0:
            Ic[par] = _spi_add(Ic[par], Ic[i])
    M = [[None] * nl for _ in range(nl)]
    for i in range(nl):
        F = _spi_apply(Ic[i], Ss[i])
        M[i][i] = v3.s_dot(Ss[i], F) + jnp.float32(model.jnt_armature[i])
        j = int(model.link_parent[i])
        while j >= 0:
            mij = v3.s_dot(Ss[j], F)
            M[i][j] = mij
            M[j][i] = mij
            j = int(model.link_parent[j])
    zero = jnp.float32(0.0)
    for i in range(nl):
        for j in range(nl):
            if M[i][j] is None:
                M[i][j] = zero
    return M


def bias_forces(model: Model, kin: Kin, qvel) -> jnp.ndarray:
    """RNEA with qacc = 0 (array view)."""
    return jnp.stack(_bias_forces_soa(model, kin, qvel), -1)


def _bias_forces_soa(model: Model, kin: Kin, qvel, Iw=None):
    nl = model.nl
    _, _, Ss, vs, _ = kin.soa
    qd = qvel.astype(jnp.float32)
    g = model.gravity
    zero = jnp.float32(0.0)
    a_base = ((zero, zero, zero),
              (-jnp.float32(g[0]), -jnp.float32(g[1]), -jnp.float32(g[2])))
    accs, fs = [], []
    for i in range(nl):
        par = int(model.link_parent[i])
        a_p = a_base if par < 0 else accs[par]
        a_i = v3.s_add(a_p, v3.s_crm(vs[i], v3.s_scale(Ss[i], qd[i])))
        I_i = Iw[i] if Iw is not None else _spi_from_link(model, i, kin)
        f_i = v3.s_add(_spi_apply(I_i, a_i),
                       v3.s_crf(vs[i], _spi_apply(I_i, vs[i])))
        accs.append(a_i); fs.append(f_i)
    fsub = list(fs)
    for i in reversed(range(nl)):
        par = int(model.link_parent[i])
        if par >= 0:
            fsub[par] = v3.s_add(fsub[par], fsub[i])
    return [v3.s_dot(Ss[i], fsub[i]) for i in range(nl)]


# ----------------------------------------------------------------- geometry
def geom_world(model: Model, kin: Kin):
    """World pose of every geom: (ngeom, 3, 3) R and (ngeom, 3) p (array
    view for the renderer; per-geom components are computed scalar-wise)."""
    Rg, pg = [], []
    qs, ps, _, _, _ = kin.soa if kin.soa else ((), (), (), (), ())
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    id_basis = ((one, zero, zero), (zero, one, zero), (zero, zero, one))
    for g in model.geoms:
        if g.link < 0:
            ql, bl = (one, zero, zero, zero), id_basis
            pl = (zero, zero, zero)
        else:
            ql, pl = qs[g.link], ps[g.link]
            bl = kin.basis[g.link] if kin.basis is not None else None
        if np.allclose(g.quat, [1.0, 0, 0, 0]):
            qg, bg = ql, bl
        else:
            qg = v3.qmul(ql, tuple(jnp.float32(c) for c in g.quat))
            bg = None
        if np.allclose(g.pos, 0.0):
            pw = pl
        elif bl is not None:
            pw = v3.add(pl, _rot_const(bl, g.pos))
        else:
            pw = v3.add(pl, v3.qrot(ql, _const3(g.pos)))
        ex, ey, ez = bg if bg is not None else v3.q_columns(qg)
        Rg.append(jnp.stack([v3.stack(ex), v3.stack(ey), v3.stack(ez)], -1))
        pg.append(v3.stack(pw))
    return jnp.stack(Rg), jnp.stack(pg)


def _geom_world_soa(model: Model, kin: Kin):
    """SoA variant used by the contact code: lists of (q, p) per geom."""
    out = []
    qs, ps, _, _, _ = kin.soa
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    for g in model.geoms:
        if g.link < 0:
            ql = (one, zero, zero, zero)
            pl = (zero, zero, zero)
            bl = None
        else:
            ql, pl = qs[g.link], ps[g.link]
            bl = kin.basis[g.link] if kin.basis is not None else None
        qg = ql if np.allclose(g.quat, [1.0, 0, 0, 0]) else v3.qmul(
            ql, tuple(jnp.float32(c) for c in g.quat))
        if np.allclose(g.pos, 0.0):
            pw = pl
        elif bl is not None:
            pw = v3.add(pl, _rot_const(bl, g.pos))
        else:
            pw = v3.add(pl, v3.qrot(ql, _const3(g.pos)))
        out.append((qg, pw))
    return out


def _point_velocity(kin: Kin, link: int, x):
    """World velocity of world point x rigidly attached to `link` (SoA)."""
    if link < 0:
        z = jnp.float32(0.0)
        return (z, z, z)
    w, v0 = kin.soa[3][link]
    return v3.add(v3.cross(w, x), v0)


def _capsule_segment_soa(g, qg, pw):
    hl = float(g.size[1])
    w, x, y, z = qg  # only the z column of R is needed (1/3 the ops)
    ez = (2 * (x * z + w * y), 2 * (y * z - w * x), 1 - 2 * (x * x + y * y))
    d = v3.scale(ez, hl)
    return v3.sub(pw, d), v3.add(pw, d)


def _closest_segment_points(a0, a1, b0, b1):
    """Closest points between segments [a0,a1], [b0,b1] (smooth clamped)."""
    d1 = v3.sub(a1, a0)
    d2 = v3.sub(b1, b0)
    r = v3.sub(a0, b0)
    a = v3.dot(d1, d1) + 1e-12
    e = v3.dot(d2, d2) + 1e-12
    fv = v3.dot(d2, r)
    c = v3.dot(d1, r)
    b = v3.dot(d1, d2)
    denom = a * e - b * b
    s = jnp.clip((b * fv - c * e) / (denom + 1e-12), 0.0, 1.0)
    t = jnp.clip((b * s + fv) / e, 0.0, 1.0)
    s = jnp.clip((b * t - c) / a, 0.0, 1.0)
    return v3.add(a0, v3.scale(d1, s)), v3.add(b0, v3.scale(d2, t))


def _point_box_soa(pt, qb, pb, size):
    """Point vs oriented box (SoA): returns (n, dist) with ``n`` the world
    unit normal pointing from the box surface toward the point and ``dist``
    the signed distance (negative inside). Smooth select between the
    outside (clamp) and inside (nearest face) branches — both always
    computed (static shapes)."""
    ex, ey, ez = v3.q_columns(qb)
    rel = v3.sub(pt, pb)
    q = (v3.dot(rel, ex), v3.dot(rel, ey), v3.dot(rel, ez))
    s = [float(size[k]) for k in range(3)]
    cl = tuple(jnp.clip(q[k], -s[k], s[k]) for k in range(3))
    delta = tuple(q[k] - cl[k] for k in range(3))
    d2 = delta[0] ** 2 + delta[1] ** 2 + delta[2] ** 2
    outside = d2 > 1e-12
    dist_out = jnp.sqrt(jnp.maximum(d2, 1e-12))
    n_out = tuple(delta[k] / dist_out for k in range(3))
    # inside: nearest face along the axis of least remaining clearance
    fd = tuple(s[k] - jnp.abs(q[k]) for k in range(3))
    m01 = fd[0] <= fd[1]
    m = jnp.where(m01, fd[0], fd[1])
    k_best = jnp.where(m01, 0, 1)
    k_best = jnp.where(fd[2] < m, 2, k_best)
    dist_in = -jnp.minimum(m, fd[2])
    sign = [jnp.sign(jnp.where(jnp.abs(q[k]) < 1e-9, 1.0, q[k]))
            for k in range(3)]
    n_in = tuple(jnp.where(k_best == k, sign[k], 0.0) for k in range(3))
    dist = jnp.where(outside, dist_out, dist_in)
    n_local = tuple(jnp.where(outside, n_out[k], n_in[k]) for k in range(3))
    n_world = v3.add(v3.add(v3.scale(ex, n_local[0]),
                            v3.scale(ey, n_local[1])),
                     v3.scale(ez, n_local[2]))
    return n_world, dist


def _box_sample_points(g, qg, pg_):
    """World-space sample points representing a geom for point-vs-box
    narrow phase: sphere center (1), capsule segment samples (5), box
    corners (8, radius 0)."""
    if g.gtype == SPHERE:
        return [pg_], float(g.size[0])
    if g.gtype in (CAPSULE, CYLINDER):
        a, b = _capsule_segment_soa(g, qg, pg_)
        pts = []
        for t in (0.0, 0.25, 0.5, 0.75, 1.0):
            pts.append(v3.add(v3.scale(a, 1 - t), v3.scale(b, t)))
        return pts, float(g.size[0])
    if g.gtype == BOX:
        ex, ey, ez = v3.q_columns(qg)
        pts = []
        for sx in (-1, 1):
            for sy in (-1, 1):
                for sz in (-1, 1):
                    pts.append(v3.add(pg_, v3.add(
                        v3.scale(ex, sx * float(g.size[0])),
                        v3.add(v3.scale(ey, sy * float(g.size[1])),
                               v3.scale(ez, sz * float(g.size[2]))))))
        return pts, 0.0
    raise NotImplementedError(f"box sampling for geom type {g.gtype}")


def _contacts_for_pair(model, kin, gi, gj, gw):
    """Contacts for one static geom pair (SoA).

    Returns a list of ``(point, n, depth, mu, la, lb)`` where ``n`` points
    from geom b toward geom a and the contact force ``+f`` acts on link
    ``la`` (geom a's link), ``-f`` on ``lb``. Every potential contact is
    always emitted — depth ≤ 0 simply yields zero force (static shapes)."""
    a, b = model.geoms[gi], model.geoms[gj]
    if a.gtype == PLANE:  # plane second → normal points at the body
        a, b, gi, gj = b, a, gj, gi
    (qa, pa), (qb, pb) = gw[gi], gw[gj]
    mu = max(a.friction, b.friction)  # MuJoCo default friction combination
    out = []
    if b.gtype == PLANE:
        _, _, n = v3.q_columns(qb)
        d0 = v3.dot(n, pb)
        if a.gtype == SPHERE:
            r = float(a.size[0])
            dist = v3.dot(n, pa) - d0
            out.append((v3.sub(pa, v3.scale(n, dist)), n, r - dist, mu))
        elif a.gtype in (CAPSULE, CYLINDER):
            r = float(a.size[0])
            for e in _capsule_segment_soa(a, qa, pa):
                dist = v3.dot(n, e) - d0
                out.append((v3.sub(e, v3.scale(n, dist)), n, r - dist, mu))
        elif a.gtype == BOX:
            ex, ey, ez = v3.q_columns(qa)
            for sx in (-1, 1):
                for sy in (-1, 1):
                    for sz in (-1, 1):
                        corner = v3.add(pa, v3.add(
                            v3.scale(ex, sx * float(a.size[0])),
                            v3.add(v3.scale(ey, sy * float(a.size[1])),
                                   v3.scale(ez, sz * float(a.size[2])))))
                        dist = v3.dot(n, corner) - d0
                        out.append((v3.sub(corner, v3.scale(n, dist)), n,
                                    -dist, mu))
        elif a.gtype == ELLIPSOID:
            # support point along −n: x = c − R·(S²·Rᵀn)/√(nᵀ·R·S²·Rᵀ·n)
            ex, ey, ez = v3.q_columns(qa)
            s2 = [float(s) * float(s) for s in a.size]
            nl = (v3.dot(n, ex), v3.dot(n, ey), v3.dot(n, ez))
            w = (s2[0] * nl[0], s2[1] * nl[1], s2[2] * nl[2])
            denom = jnp.sqrt(nl[0] * w[0] + nl[1] * w[1] + nl[2] * w[2]
                             + 1e-12)
            off = v3.add(v3.add(v3.scale(ex, w[0]), v3.scale(ey, w[1])),
                         v3.scale(ez, w[2]))
            x = v3.sub(pa, v3.scale(off, 1.0 / denom))
            dist = v3.dot(n, x) - d0
            out.append((v3.sub(x, v3.scale(n, dist)), n, -dist, mu))
        else:
            raise NotImplementedError(f"plane vs geom type {a.gtype}")
    elif (a.gtype in (SPHERE, CAPSULE, CYLINDER)
          and b.gtype in (SPHERE, CAPSULE, CYLINDER)):
        def seg(g, q, p):
            if g.gtype == SPHERE:
                return p, p
            return _capsule_segment_soa(g, q, p)

        a0, a1 = seg(a, qa, pa)
        b0, b1 = seg(b, qb, pb)
        ca, cb = _closest_segment_points(a0, a1, b0, b1)
        delta = v3.sub(ca, cb)
        dist = v3.norm(delta, eps=1e-12)
        n = v3.scale(delta, 1.0 / (dist + 1e-9))
        ra, rb = float(a.size[0]), float(b.size[0])
        depth = (ra + rb) - dist
        point = v3.add(cb, v3.scale(n, rb - depth / 2))
        out.append((point, n, depth, mu))
    elif BOX in (a.gtype, b.gtype):
        # point-sample narrow phase vs the box: sphere center / capsule
        # segment samples / other box's corners, each clamped to the box
        # (corner-face manifolds; edge-edge configurations are not
        # resolved — adequate for resting/stacking contacts)
        if a.gtype == BOX and b.gtype != BOX:
            # normal must point from b toward a: flip roles
            a, b, gi, gj = b, a, gj, gi
            (qa, pa), (qb, pb) = gw[gi], gw[gj]
        box, (qx, px) = b, (qb, pb)
        pts, r = _box_sample_points(a, qa, pa)
        for pt in pts:
            n, dist = _point_box_soa(pt, qx, px, box.size)
            depth = r - dist
            point = v3.sub(pt, v3.scale(n, dist))
            out.append((point, n, depth, mu))
        if a.gtype == BOX:  # box-box: also corners of b clamped to a
            pts2, _ = _box_sample_points(b, qb, pb)
            for pt in pts2:
                n, dist = _point_box_soa(pt, qa, pa, a.size)
                depth = -dist
                point = v3.sub(pt, v3.scale(n, dist))
                # normal from a toward b here → flip to keep b→a convention
                out.append((point, v3.scale(n, -1.0), depth, mu))
    elif ELLIPSOID in (a.gtype, b.gtype):
        # point-sample vs ellipsoid (scaled-space distance, exact on axes)
        if a.gtype == ELLIPSOID:
            a, b, gi, gj = b, a, gj, gi
            (qa, pa), (qb, pb) = gw[gi], gw[gj]
        pts, r = _box_sample_points(a, qa, pa)
        ex, ey, ez = v3.q_columns(qb)
        s = [float(b.size[k]) + 1e-9 for k in range(3)]
        for pt in pts:
            rel = v3.sub(pt, pb)
            q = (v3.dot(rel, ex), v3.dot(rel, ey), v3.dot(rel, ez))
            u2 = (q[0] / s[0]) ** 2 + (q[1] / s[1]) ** 2 + (q[2] / s[2]) ** 2
            nu = jnp.sqrt(u2 + 1e-12)
            qn = jnp.sqrt(q[0] ** 2 + q[1] ** 2 + q[2] ** 2 + 1e-12)
            dist = (nu - 1.0) * qn / nu
            nl = (q[0] / s[0] ** 2, q[1] / s[1] ** 2, q[2] / s[2] ** 2)
            nl, _ = v3.normalize(nl)
            n = v3.add(v3.add(v3.scale(ex, nl[0]), v3.scale(ey, nl[1])),
                       v3.scale(ez, nl[2]))
            depth = r - dist
            point = v3.sub(pt, v3.scale(n, dist))
            out.append((point, n, depth, mu))
    else:
        raise NotImplementedError(
            f"contact pair {a.gtype} vs {b.gtype} not supported")
    la = model.geoms[gi].link
    lb = model.geoms[gj].link
    return [(pt, nn, dd, mm, la, lb) for (pt, nn, dd, mm) in out]


def _project_point_force(kin: Kin, anc, link: int, x, f3):
    """Generalized forces (list of scalars per dof) from a world force f3
    applied at world point x on `link` — τ_j = S_j · (x×f, f) for every dof
    j on the link's support path (static mask)."""
    _, _, Ss, _, _ = kin.soa
    nl = len(Ss)
    fx = v3.cross(x, f3)
    taus = [None] * nl
    for j in range(nl):
        if link >= 0 and anc[link, j]:
            taus[j] = v3.dot(Ss[j][0], fx) + v3.dot(Ss[j][1], f3)
    return taus


_SCALES_CACHE: dict = {}


def constraint_scales(model: Model):
    """MuJoCo-style inertia scaling for soft contact/limit constraints.

    MuJoCo sizes constraint impedance by the effective inertia
    (J·M⁻¹·Jᵀ)⁻¹ of each contact and drives it with the solref
    (timeconst, dampratio) critical-damping law (reference engine steps
    mj_step → mj_fwdConstraint; dm_control/mujoco/engine.py:148-165). A
    fixed global spring constant cannot match that across domains whose
    contacting bodies span four orders of magnitude in mass (walker foot
    vs ball_in_cup ball) — verified against dm_control golden trajectories
    in tests/test_parity.py.

    Computes once per model, at the reference configuration q=0:
      * (npair,) isotropic effective mass per contact pair,
        m_eff = 3 / tr(J·M⁻¹·Jᵀ) with J the relative point Jacobian at the
        (dynamic) geom center;
      * (nl,) joint-space effective inertia 1/(M⁻¹)_jj per dof, scaling the
        joint-limit constraint.
    All values are host numpy; they fold into compiled programs as
    constants.
    """
    key = id(model)
    got = _SCALES_CACHE.get(key)
    if got is not None and got[0] is model:
        return got[1], got[2]

    # Pure numpy float64 FK + CRBA at q=0. f32 CRBA loses positive-
    # definiteness for light chains (swimmer links: m=0.01, I~1e-5 —
    # observed negative eigenvalues), which corrupts M⁻¹ and with it every
    # gain; double precision on the host is exact at these scales.
    nl = model.nl

    def skew(c):
        return np.array([[0, -c[2], c[1]], [c[2], 0, -c[0]],
                         [-c[1], c[0], 0]], np.float64)

    def quat_mat(q):
        w, x, y, z = q
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ], np.float64)

    R = np.zeros((nl, 3, 3))
    p = np.zeros((nl, 3))
    S = np.zeros((nl, 6))          # [ω, v] Plücker at the world origin
    I_O = np.zeros((nl, 6, 6))     # link spatial inertia about the origin
    for i in range(nl):
        par = int(model.link_parent[i])
        Rp = R[par] if par >= 0 else np.eye(3)
        pp = p[par] if par >= 0 else np.zeros(3)
        R[i] = Rp @ quat_mat(np.asarray(model.link_quat[i], np.float64))
        p[i] = pp + Rp @ np.asarray(model.link_pos[i], np.float64)
        ax = R[i] @ np.asarray(model.jnt_axis[i], np.float64)
        anchor = p[i] + R[i] @ np.asarray(model.jnt_pos[i], np.float64)
        if int(model.jnt_type[i]) == HINGE:
            S[i, :3] = ax
            S[i, 3:] = np.cross(anchor, ax)
        else:
            S[i, 3:] = ax
        m = float(model.link_mass[i])
        c = p[i] + R[i] @ np.asarray(model.link_com[i], np.float64)
        Ic = R[i] @ np.asarray(model.link_inertia[i], np.float64) @ R[i].T
        cx = skew(c)
        I_O[i, :3, :3] = Ic + m * (cx @ cx.T)
        I_O[i, :3, 3:] = m * cx
        I_O[i, 3:, :3] = m * cx.T
        I_O[i, 3:, 3:] = m * np.eye(3)

    anc = _ancestors(model)
    M = np.zeros((nl, nl))
    for i in range(nl):
        Ic_sub = I_O[anc[:, i]].sum(axis=0)   # composite inertia of subtree i
        F = Ic_sub @ S[i]
        for j in range(nl):
            if anc[i, j]:
                M[j, i] = M[i, j] = S[j] @ F
    M += np.diag(np.asarray(model.jnt_armature, np.float64))
    reg = 1e-12 * max(np.trace(M) / nl, 1e-9)
    Minv = np.linalg.inv(M + reg * np.eye(nl))

    # world geom centers at q=0
    pg = np.zeros((len(model.geoms), 3))
    for g_i, g in enumerate(model.geoms):
        if g.link < 0:
            pg[g_i] = np.asarray(g.pos, np.float64)
        else:
            pg[g_i] = p[g.link] + R[g.link] @ np.asarray(g.pos, np.float64)

    def point_jac(link, x):
        J = np.zeros((3, nl))
        if link >= 0:
            for j in range(nl):
                if anc[link, j]:
                    J[:, j] = S[j, 3:] + np.cross(S[j, :3], x)
        return J

    m_eff = np.zeros(max(len(model.contact_pairs), 1))
    cap = 2.0 * float(np.sum(model.link_mass)) + 1e-6
    for p_i, (gi, gj) in enumerate(model.contact_pairs):
        ga, gb = model.geoms[int(gi)], model.geoms[int(gj)]
        x = pg[int(gi)] if ga.link >= 0 else pg[int(gj)]
        J = point_jac(ga.link, x) - point_jac(gb.link, x)
        A = J @ Minv @ J.T
        # effective mass along the expected contact normal: the plane's
        # normal when one side is a plane (floor contacts — the dominant
        # case), else the most-mobile eigendirection of A, which is a
        # stable lower bound for arbitrary geom-geom normals. A pure
        # trace average would be diluted by immobile directions
        # (a z-slide ball reads 3× its mass) and overstiffen.
        plane = None
        for gg, other in ((ga, gb), (gb, ga)):
            if gg.gtype == PLANE:
                R_p = (np.eye(3) if gg.link < 0
                       else R[gg.link]) @ quat_mat(
                           np.asarray(gg.quat, np.float64))
                plane = R_p[:, 2]
        if plane is not None:
            mob = float(plane @ A @ plane)
        else:
            mob = float(np.linalg.eigvalsh(A)[-1])
        # cap: a vanishing Jacobian at the q=0 probe pose would otherwise
        # read as near-infinite inertia and get explosive gains; no contact
        # can see more than the whole mechanism's mass
        m_eff[p_i] = min(1.0 / max(mob, 1e-8), cap)
    # hfield pairs: appended after the regular rows, normal ≈ +z (terrain
    # slopes stay under 45°; the vertical mobility is the right scale)
    if model.hfield_pairs:
        m_h = np.zeros(len(model.hfield_pairs))
        up = np.array([0.0, 0.0, 1.0])
        for h_i, (gid, _pts) in enumerate(model.hfield_pairs):
            x = pg[int(gid)]
            J = point_jac(model.geoms[int(gid)].link, x)
            A = J @ Minv @ J.T
            m_h[h_i] = min(1.0 / max(float(up @ A @ up), 1e-8), cap)
        m_eff = np.concatenate([m_eff, m_h])
    dof_m = 1.0 / np.maximum(np.diag(Minv), 1e-12)
    _SCALES_CACHE[key] = (model, m_eff, dof_m)
    return m_eff, dof_m


def _soft_gains(model: Model):
    """(k, b, d): solref-derived constraint gains, to be scaled by the
    effective inertia — k = 1/(tc·dr)², b = 2/tc, impedance d (MuJoCo
    default solimp d0 = 0.9)."""
    tc, dr = getattr(model, "contact_solref", (0.02, 1.0))
    d = getattr(model, "contact_impedance", 0.9)
    return 1.0 / (tc * tc * dr * dr), 2.0 / tc, d


def contact_taus(model: Model, kin: Kin, gw, anc: np.ndarray):
    """Generalized contact forces (nv list) + per-pair normal magnitudes."""
    nl = model.nl
    zero = jnp.float32(0.0)
    tau = [zero] * nl
    pair_forces = []
    m_eff, _ = constraint_scales(model)
    k0, b0, imp = _soft_gains(model)
    # friction regularization velocity: full µ·fn beyond ~vreg slip. The
    # default 1 cm/s is fine for locomotion feet; grasp domains need near-
    # stiction (manipulator/stacker set 1e-3 — at 0.01 a squeezed ball
    # creeps out of the gripper within a second while MuJoCo's cone solver
    # holds it; see docs/PERF.md interaction probes)
    vreg = float(getattr(model, "contact_vreg", 0.01))
    gvec = np.asarray(model.gravity, np.float64)
    for pair_i, (gi, gj) in enumerate(model.contact_pairs):
        contacts = _contacts_for_pair(model, kin, int(gi), int(gj), gw)
        fn_total = zero
        # per-pair inertia-scaled gains (constraint_scales docstring);
        # the gravity feed-forward mirrors the unconstrained-acceleration
        # term of MuJoCo's reference acceleration when one side is static
        kp = jnp.float32(imp * m_eff[pair_i] * k0)
        kd = jnp.float32(imp * m_eff[pair_i] * b0)
        ka = jnp.float32(imp * m_eff[pair_i])
        one_static = (model.geoms[int(gi)].link < 0) != (
            model.geoms[int(gj)].link < 0)
        for (x, n, depth, mu, la, lb) in contacts:
            active = (depth > 0).astype(jnp.float32)
            v_rel = v3.sub(_point_velocity(kin, la, x),
                           _point_velocity(kin, lb, x))
            vn = v3.dot(v_rel, n)
            fn = kp * depth - kd * vn
            if one_static:
                # −g·n: gravity load along the contact normal
                fn = fn - ka * (gvec[0] * n[0] + gvec[1] * n[1]
                                + gvec[2] * n[2])
            fn = jnp.maximum(fn, 0.0) * active
            vt = v3.sub(v_rel, v3.scale(n, vn))
            vt_norm = v3.norm(vt) + 1e-6
            # regularized Coulomb: full µ·fn beyond ~vreg slip
            ft_scale = -mu * fn * jnp.tanh(vt_norm / vreg) / vt_norm
            f3 = v3.add(v3.scale(n, fn), v3.scale(vt, ft_scale))
            for link, sign in ((la, 1.0), (lb, -1.0)):
                ts = _project_point_force(kin, anc, link, x, f3)
                for j, t in enumerate(ts):
                    if t is not None:
                        tau[j] = tau[j] + sign * t
            fn_total = fn_total + fn
        pair_forces.append(fn_total)
    pf = (jnp.stack(pair_forces) if pair_forces
          else jnp.zeros((0,), jnp.float32))
    return tau, pf


def tendon_taus(model: Model, kin: Kin, anc: np.ndarray, tau):
    """Limited spatial tendons as one-sided stiff springs (ball_in_cup's
    string, reference: suite/ball_in_cup.xml tendon range 0-0.3)."""
    qs, ps, _, _, _ = kin.soa
    for t in model.tendons:
        def site(link, pos):
            if link < 0:
                return _const3(pos)
            return v3.add(ps[link], v3.qrot(qs[link], _const3(pos)))

        pa = site(t.link_a, t.pos_a)
        pb = site(t.link_b, t.pos_b)
        delta = v3.sub(pa, pb)
        length = v3.norm(delta, eps=1e-12) + 1e-9
        dirn = v3.scale(delta, 1.0 / length)
        stretch = jnp.maximum(length - t.range[1], 0.0)
        rate = v3.dot(v3.sub(_point_velocity(kin, t.link_a, pa),
                             _point_velocity(kin, t.link_b, pb)), dirn)
        fmag = t.stiffness * stretch + jnp.where(stretch > 0,
                                                 t.damping * rate, 0.0)
        f3 = v3.scale(dirn, -jnp.maximum(fmag, 0.0))
        for link, sign, x in ((t.link_a, 1.0, pa), (t.link_b, -1.0, pb)):
            ts = _project_point_force(kin, anc, link, x, f3)
            for j, val in enumerate(ts):
                if val is not None:
                    tau[j] = tau[j] + sign * val
    return tau


def fluid_taus(model: Model, kin: Kin, anc: np.ndarray, tau):
    """Fluid drag from a dense/viscous medium — MuJoCo's inertia-box model
    (mj_inertiaBoxFluidModel in engine_passive.c; MJX fluid.py mirrors it).
    This is what makes the swimmer/fish domains swim: contact is disabled
    and all locomotion forces come from quadratic drag against the medium
    (reference: suite/swimmer.xml `<option density="3000">`, fish.xml idem).

    Per link with mass: build the equivalent inertia box (half-sizes from
    the principal inertia), express the CoM 6D velocity in the link frame,
    apply per-axis quadratic drag (density) and Stokes-like linear drag
    (viscosity), rotate the wrench back to world and project through the
    joint subspaces of the link's support path."""
    rho = float(model.density)
    visc = float(model.viscosity)
    qs, ps, Ss, vs, coms = kin.soa
    for i in range(model.nl):
        m = float(model.link_mass[i])
        if m <= 1e-9:
            continue
        Idiag = np.diag(np.asarray(model.link_inertia[i], np.float64))
        # FULL side lengths (I = m/12·(s_j²+s_k²) ⇒ s_i = √(6(I_j+I_k−I_i)/m));
        # mj_inertiaBoxFluidModel uses full sizes — half-sizes under-drag
        # linearly by 4× and angularly by 32× (caught by test_parity swimmer)
        box = np.sqrt(np.maximum(
            1e-12, (Idiag.sum() - 2.0 * Idiag) * 6.0 / m))
        # local-frame CoM velocity
        w_w = vs[i][0]
        v_w = v3.add(vs[i][1], v3.cross(w_w, coms[i]))
        w_l = v3.qrot_inv(qs[i], w_w)
        v_l = v3.qrot_inv(qs[i], v_w)
        frc = [jnp.float32(0.0)] * 3
        trq = [jnp.float32(0.0)] * 3
        if visc > 0:
            diam = float(box.mean())
            for j in range(3):
                trq[j] = trq[j] - np.pi * diam ** 3 * visc * w_l[j]
                frc[j] = frc[j] - 3.0 * np.pi * diam * visc * v_l[j]
        if rho > 0:
            for j in range(3):
                b1, b2 = box[(j + 1) % 3], box[(j + 2) % 3]
                frc[j] = frc[j] - 0.5 * rho * b1 * b2 * jnp.abs(v_l[j]) * v_l[j]
                trq[j] = trq[j] - rho * box[j] * (b1 ** 4 + b2 ** 4) * (
                    jnp.abs(w_l[j]) * w_l[j]) / 64.0
        f_w = v3.qrot(qs[i], tuple(frc))
        t_w = v3.qrot(qs[i], tuple(trq))
        # project the wrench (force at CoM + torque) through the chain
        fx = v3.add(v3.cross(coms[i], f_w), t_w)
        for j in range(model.nl):
            if anc[i, j]:
                tau[j] = tau[j] + v3.dot(Ss[j][0], fx) + v3.dot(Ss[j][1], f_w)
    return tau


def _limit_gains(model: Model):
    """Per-dof limit spring/damper (host numpy, folded as constants).

    Base law: solref gains scaled by the joint-space effective inertia
    1/(M⁻¹)_jj — same as contacts (constraint_scales). That alone fails
    for LIGHT dofs driven by STRONG actuators: the spring's maximum
    torque k·overshoot is bounded, and e.g. the manipulator's grasp
    tendon (τ=1 N·m on ~1e-4 kg·m² digits) blows through the −10..60°
    range by radians — MuJoCo's constraint solver, by contrast, applies
    whatever force the limit needs. Remedy: floor k at (actuator
    authority)/0.05 rad, capped at the explicit-Euler stability bound
    k ≤ m_j·(0.5/dt)², with critical damping c = 2·√(k·m_j)."""
    _, dof_m = constraint_scales(model)
    k0, b0, imp = _soft_gains(model)
    k = imp * dof_m * k0
    c = imp * dof_m * b0
    if not model.implicit_limits:
        # explicit path (golden-validated): base solref gains unchanged
        return k, c
    if model.act_moment is not None and model.act_moment.size:
        mom = np.abs(np.asarray(model.act_moment, np.float64))  # (nu, nv)
        fmax = np.ones(mom.shape[0])
        kind = np.asarray(model.act_kind)
        if np.any(kind == 1):  # position servos: |f| ≤ kp·(span bound ~2)
            fmax = np.where(kind == 1, 2.0 * np.asarray(model.act_gain), 1.0)
        authority = (mom * fmax[:, None]).sum(axis=0)  # (nv,)
        k_auth = authority / 0.05
        # no stability cap: the limit is integrated implicitly (see
        # _implicit_limit_stage), stable for arbitrary k
        k_new = np.maximum(k, k_auth)
        c = np.where(k_new > k, 2.0 * np.sqrt(k_new * dof_m), c)
        k = k_new
    if model.implicit_limits:
        # contact impulses can load UNACTUATED limited dofs (gripper tip
        # joints carrying the squeezed ball): floor their stiffness too —
        # free under the implicit integration
        k_floor = 50.0
        k_new = np.maximum(k, k_floor * np.asarray(model.jnt_limited))
        c = np.where(k_new > k, 2.0 * np.sqrt(k_new * dof_m), c)
        k = k_new
    return k, c


def _implicit_limit_stage(model: Model, qpos, qvel, h):
    """Per-dof implicit joint-limit impulse, applied after the velocity
    update on the PREDICTED position qpos + h·qvel.

    Diagonal (joint-space) backward-Euler solve of the limit
    spring-damper:  v' = (v + h·k·viol/m) / (1 + h·(c + h·k)/m·[viol>0]),
    with m the joint-space effective inertia. Unconditionally stable, so
    k can carry full actuator authority — the explicit form is bounded by
    k ≤ m/(h²) and physically cannot stop a strong actuator on a light
    dof (manipulator grasp digits blow 1+ rad through their range; the
    same failure class as MuJoCo run WITHOUT its constraint solver).
    Returns the corrected qvel."""
    if not np.any(model.jnt_limited):
        return qvel
    k_np, c_np = _limit_gains(model)
    dof_m = constraint_scales(model)[1]
    limited = np.asarray(model.jnt_limited, np.float64)
    k = jnp.asarray(k_np * limited / np.maximum(dof_m, 1e-12), jnp.float32)
    c = jnp.asarray(c_np * limited / np.maximum(dof_m, 1e-12), jnp.float32)
    lo = jnp.asarray(model.jnt_range[:, 0], jnp.float32)
    hi = jnp.asarray(model.jnt_range[:, 1], jnp.float32)
    q_pred = qpos + h * qvel
    below = jnp.maximum(lo - q_pred, 0.0)
    above = jnp.maximum(q_pred - hi, 0.0)
    viol = ((below > 0) | (above > 0)).astype(jnp.float32)
    acc = k * (below - above)              # spring accel toward the range
    denom = 1.0 + h * (c + h * k) * viol
    return (qvel + h * acc) / denom


def limit_taus(model: Model, qpos, qvel):
    """Explicit joint-limit soft springs (the golden-validated path used
    by every non-implicit-contacts model): solref gains scaled by the
    joint-space effective inertia, coupled through M⁻¹ within the substep
    (reference semantics: solimplimit constraints, suite/walker.xml:11)."""
    lo = jnp.asarray(model.jnt_range[:, 0], qpos.dtype)
    hi = jnp.asarray(model.jnt_range[:, 1], qpos.dtype)
    limited = jnp.asarray(model.jnt_limited, qpos.dtype)
    k_np, c_np = _limit_gains(model)
    k = jnp.asarray(k_np, qpos.dtype)
    c = jnp.asarray(c_np, qpos.dtype)
    below = jnp.maximum(lo - qpos, 0.0)
    above = jnp.maximum(qpos - hi, 0.0)
    tau = k * below - k * above
    viol = ((below > 0) | (above > 0)).astype(qpos.dtype)
    tau = tau - c * qvel * viol
    return tau * limited


def applied_taus(model: Model, qpos, qvel, ctrl):
    """Joint-space applied torques (small (nv,) arrays; one op each).
    Generalized transmission: τ = Mᵀ·f with M the (nu, nv) moment matrix;
    motors produce f = ctrl (gear folded into M), position servos
    f = kp·(ctrl − L) with transmission length L = M·q (MuJoCo <position>
    actuators and fixed tendons — reference: fish.xml actuator block).
    Shared by the scalar-SoA and dense dynamics paths."""
    tau_vec = jnp.zeros(model.nl, jnp.float32)
    if model.nu:
        if model.act_ctrlrange is not None:
            lo = jnp.asarray(model.act_ctrlrange[:, 0], jnp.float32)
            hi = jnp.asarray(model.act_ctrlrange[:, 1], jnp.float32)
        else:
            lo, hi = -1.0, 1.0
        c_clip = jnp.clip(ctrl.astype(jnp.float32), lo, hi)
        moment = jnp.asarray(model.act_moment, jnp.float32)
        if np.any(np.asarray(model.act_kind) == 1):
            L = moment @ qpos
            gain = jnp.asarray(model.act_gain, jnp.float32)
            kind = jnp.asarray(model.act_kind)
            force = jnp.where(kind == 1, gain * (c_clip - L), c_clip)
        else:
            force = c_clip
        tau_vec = moment.T @ force
    if model.ft_moment is not None and len(model.ft_stiff):
        # passive fixed-tendon springs (reference: fish.xml tendon fins_sym)
        ftm = jnp.asarray(model.ft_moment, jnp.float32)
        Lt = ftm @ qpos
        tau_vec = tau_vec - ftm.T @ (
            jnp.asarray(model.ft_stiff, jnp.float32) * Lt)
    tau_vec = tau_vec - jnp.asarray(model.jnt_damping, jnp.float32) * qvel
    tau_vec = tau_vec - jnp.asarray(model.jnt_stiffness, jnp.float32) * (
        qpos - jnp.asarray(model.jnt_springref, jnp.float32))
    if np.any(model.jnt_frictionloss):
        tau_vec = tau_vec - jnp.asarray(
            model.jnt_frictionloss, jnp.float32) * jnp.tanh(qvel / 0.01)
    if not model.implicit_limits:
        # golden-validated explicit limit springs (coupled through M⁻¹
        # within the substep). Grasp-class models instead integrate limits
        # implicitly in step() (_implicit_limit_stage) so the spring can
        # carry full actuator authority without the explicit-stability cap.
        tau_vec = tau_vec + limit_taus(model, qpos, qvel)
    return tau_vec


def _forward_dynamics(model: Model, qpos, qvel, ctrl, anc, hfield=None):
    assert hfield is None, (
        "heightfield contacts are implemented on the dense path only "
        "(quadruped-class models dispatch there by nl; see dense.py)")
    kin = forward_kinematics(model, qpos, qvel)
    # per-link world spatial inertias, shared by CRBA and the RNEA bias
    # pass (previously traced twice per substep)
    Iw = [_spi_from_link(model, i, kin) for i in range(model.nl)]
    M = _mass_matrix_soa(model, kin, Iw)
    C = _bias_forces_soa(model, kin, qvel, Iw)
    if model.integrator != "rk4" and np.any(np.asarray(model.jnt_damping)):
        # MuJoCo's Euler integrator treats dof damping implicitly: it solves
        # (M + h·diag(damping))·qacc = τ with the explicit −D·v force still in
        # τ (mjModel.opt Euler semantics; reference engine.py:148-165 steps
        # mj_step, whose mj_Euler does exactly this). Without it, domains
        # where h·d is comparable to the joint inertia (reacher wrist,
        # swimmer links) integrate damping explicitly and visibly diverge —
        # caught by tests/test_parity.py golden trajectories.
        h = model.timestep
        for i in range(model.nl):
            di = float(model.jnt_damping[i])
            if di:
                M[i][i] = M[i][i] + jnp.float32(h * di)
    tau_vec = applied_taus(model, qpos, qvel, ctrl)

    tau = [tau_vec[i] for i in range(model.nl)]
    if model.tendons:
        tau = tendon_taus(model, kin, anc, tau)
    if model.density > 0 or model.viscosity > 0:
        tau = fluid_taus(model, kin, anc, tau)
    if len(model.contact_pairs) and not model.implicit_contacts:
        gw = _geom_world_soa(model, kin)
        tau_c, pair_f = contact_taus(model, kin, gw, anc)
        tau = [t + tc for t, tc in zip(tau, tau_c)]
    else:
        pair_f = jnp.zeros((0 if not model.implicit_contacts
                            else len(model.contact_pairs),), jnp.float32)
    rhs = [tau[i] - C[i] for i in range(model.nl)]
    qacc = _solve_spd(M, rhs, model.nl)
    return jnp.stack(qacc, -1), pair_f


@f32_matmuls
def max_penetration(model: Model, qpos) -> jnp.ndarray:
    """Deepest contact penetration at configuration `qpos` (≤ 0 ⇒ free).
    Backs collision-free episode initialization (the reference's retry loop
    checks physics.data.ncon == 0, suite/finger.py:206-216)."""
    from sgqn_carla_tpu.physics import dense

    if model.nl >= dense.DENSE_NL:
        return jnp.max(dense.penetration_depths_batched(model, qpos))
    qvel = jnp.zeros_like(qpos)
    kin = forward_kinematics(model, qpos, qvel)
    gw = _geom_world_soa(model, kin)
    depths = [jnp.float32(-1.0)]
    for (gi, gj) in model.contact_pairs:
        for (x, n, depth, mu, la, lb) in _contacts_for_pair(
                model, kin, int(gi), int(gj), gw):
            depths.append(depth)
    return jnp.max(jnp.stack(depths))


@f32_matmuls
def step(model: Model, qpos, qvel, ctrl, hfield=None) -> StepOut:
    """One physics substep of `model.timestep` seconds.

    Dynamics backend dispatch: the scalar-SoA path below for small trees,
    the dense matmul path (`physics/dense.py`) for nl ≥ dense.DENSE_NL —
    identical physics, bounded compile time (humanoid/swimmer15-class
    models). `hfield` is the per-episode terrain elevation grid for models
    with an HFIELD geom (physics/hfield.py); its contact forces are
    appended to `contact_force` after the regular pairs."""
    out, _ = step_warm(model, qpos, qvel, ctrl, hfield)
    return out


@f32_matmuls
def step_warm(model: Model, qpos, qvel, ctrl, hfield=None, warm=None):
    """`step` plus the implicit-contact-solver warm-start carry: pass the
    `warm` λ array returned by the previous substep (None to cold-start;
    shape (dense.warm_size(model), 3)) and feed the returned one forward.
    Only meaningful for `model.implicit_contacts` models — `n_steps`
    threads it through its substep scan so a held grasp keeps its
    converged contact impulses instead of rebuilding them from zero
    (which accumulates as a slow hold creep). Returns (StepOut, warm')."""
    from sgqn_carla_tpu.physics import dense

    fwd = (dense.forward_dynamics if model.nl >= dense.DENSE_NL
           else _forward_dynamics)
    anc = _ancestors(model)
    h = model.timestep
    qpos = qpos.astype(jnp.float32)
    qvel = qvel.astype(jnp.float32)
    if model.integrator == "rk4":
        def fdyn(q, qd):
            qacc, pf = fwd(model, q, qd, ctrl, anc, hfield)
            return qd, qacc, pf

        k1v, k1a, pf = fdyn(qpos, qvel)
        k2v, k2a, _ = fdyn(qpos + 0.5 * h * k1v, qvel + 0.5 * h * k1a)
        k3v, k3a, _ = fdyn(qpos + 0.5 * h * k2v, qvel + 0.5 * h * k2a)
        k4v, k4a, _ = fdyn(qpos + h * k3v, qvel + h * k3a)
        assert not model.implicit_contacts, (
            "implicit_contacts requires the euler integrator")
        qvel_n = qvel + h / 6 * (k1a + 2 * k2a + 2 * k3a + k4a)
        qpos_n = qpos + h / 6 * (k1v + 2 * k2v + 2 * k3v + k4v)
    else:  # semi-implicit Euler (MuJoCo default)
        qacc, pf = fwd(model, qpos, qvel, ctrl, anc, hfield)
        qvel_n = qvel + h * qacc
        if model.implicit_limits:
            qvel_n = _implicit_limit_stage(model, qpos, qvel_n, h)
        dq = jnp.zeros_like(qpos)
        if model.implicit_contacts and len(model.contact_pairs):
            qvel_n, pf, warm, dq = dense.implicit_contact_stage(
                model, qpos, qvel_n, h, anc, warm)
            # contact impulses may re-violate joint limits (the ball loads
            # the unactuated tip joints): one more implicit limit pass
            if model.implicit_limits:
                qvel_n = _implicit_limit_stage(model, qpos, qvel_n, h)
        # dq: split-impulse positional penetration recovery (qpos only —
        # adding it to qvel would hand pinched bodies kinetic energy)
        qpos_n = qpos + h * qvel_n + dq
    return StepOut(qpos_n, qvel_n, pf), warm


@f32_matmuls
def n_steps(model: Model, qpos, qvel, ctrl, n: int, hfield=None) -> StepOut:
    """`n` substeps under one held control (dm_control's n_sub_steps,
    reference: rl/control.py:102-111). Uses lax.scan: one compiled body.
    For implicit-contact models the solver's warm-start impulses are
    threaded through the scan carry (cold at the first substep)."""
    from sgqn_carla_tpu.physics import dense

    if model.implicit_contacts and len(model.contact_pairs):
        warm0 = jnp.zeros((dense.warm_size(model), 3), jnp.float32)
        out, _ = n_steps_warm(model, qpos, qvel, ctrl, n, warm0, hfield)
        return out

    def body(carry, _):
        q, qd = carry
        out = step(model, q, qd, ctrl, hfield)
        return (out.qpos, out.qvel), out.contact_force

    (q, qd), pf = jax.lax.scan(body, (qpos, qvel), None, length=n)
    return StepOut(q, qd, pf.max(axis=0))


@f32_matmuls
def n_steps_warm(model: Model, qpos, qvel, ctrl, n: int, warm, hfield=None):
    """`n_steps` threading the implicit solver's warm-start impulses in AND
    out, so a caller holding per-episode state (Task.step via
    PhysState.solver_warm) can persist converged contact impulses across
    control steps — measured to turn the manipulator grasp's slow hold
    creep into an mj-parity multi-second static hold. Returns
    (StepOut, warm')."""

    def body(carry, _):
        q, qd, w = carry
        out, w = step_warm(model, q, qd, ctrl, hfield, w)
        return (out.qpos, out.qvel, w), out.contact_force

    (q, qd, warm), pf = jax.lax.scan(body, (qpos, qvel, warm), None, length=n)
    return StepOut(q, qd, pf.max(axis=0)), warm


# ------------------------------------------------------------------ sensors
def _subtree_weights(model: Model, root_dof: int):
    anc = _ancestors(model)
    w = np.asarray(model.link_mass) * anc[:, root_dof]
    return w, max(w.sum(), 1e-12)


def subtree_com(model: Model, kin: Kin, root_dof: int) -> jnp.ndarray:
    """Mass-weighted COM position of the subtree rooted at link `root_dof`."""
    w, total = _subtree_weights(model, root_dof)
    _, _, _, _, coms = kin.soa
    acc = (jnp.float32(0.0),) * 3
    for i in range(model.nl):
        if w[i] > 0:
            acc = v3.add(acc, v3.scale(coms[i], float(w[i])))
    return v3.stack(v3.scale(acc, 1.0 / total))


def subtree_linvel(model: Model, kin: Kin, root_dof: int) -> jnp.ndarray:
    """Mass-weighted COM velocity of the subtree rooted at link `root_dof`
    (MuJoCo `subtreelinvel` sensor, used by walker/cheetah speed)."""
    w, total = _subtree_weights(model, root_dof)
    _, _, _, vs, coms = kin.soa
    acc = (jnp.float32(0.0),) * 3
    for i in range(model.nl):
        if w[i] > 0:
            vcom = v3.add(v3.cross(vs[i][0], coms[i]), vs[i][1])
            acc = v3.add(acc, v3.scale(vcom, float(w[i])))
    return v3.stack(v3.scale(acc, 1.0 / total))
