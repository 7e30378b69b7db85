"""Physics model representation + programmatic builder.

Replaces the reference's MuJoCo C model (`libmujoco200.so` reached via
generated ctypes bindings, reference: src/env/dm_control/dm_control/mujoco/
wrapper/util.py:114-127) with a host-built, device-friendly description:

  * build time (numpy, host): a `ModelBuilder` DSL mirrors MJCF nesting —
    bodies with joints and geoms — and expands every multi-joint body into a
    chain of single-DoF *links* (zero-mass virtual links carry the extra
    joints), producing a topologically sorted tree that the engine unrolls
    statically under `jit`;
  * run time: `Model` holds small numpy/jnp arrays that jitted step functions
    close over as constants. Per-episode mutable appearance (material colors,
    camera pose — what the reference mutates by re-writing MJCF XML,
    reference: src/env/wrappers.py:89-139 and suite/common/settings.py:15-79)
    lives in env state instead, never in the model.

Mass/COM/inertia are derived from geoms (density 1000 unless mass given),
matching MuJoCo's compiler defaults.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from sgqn_carla_tpu.physics.math3d import zaxis_to_quat_np

# geom types
PLANE, SPHERE, CAPSULE, BOX, CYLINDER, ELLIPSOID, HFIELD = 0, 1, 2, 3, 4, 5, 6
# joint types
HINGE, SLIDE = 0, 1

_DENSITY = 1000.0


def _quat_to_mat_np(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _euler_deg_to_quat_np(euler):
    """MuJoCo 'euler' attribute, degrees. The compiler default
    `eulerseq="xyz"` is lowercase = rotations about the *moving* frame
    (intrinsic), i.e. R = Rx·Ry·Rz ⇒ q = qx ⊗ qy ⊗ qz."""
    def axis_quat(axis, deg):
        a = np.deg2rad(deg) / 2
        q = np.zeros(4)
        q[0] = np.cos(a)
        q[1 + axis] = np.sin(a)
        return q

    def qmul(a, b):
        aw, ax, ay, az = a
        bw, bx, by, bz = b
        return np.array(
            [
                aw * bw - ax * bx - ay * by - az * bz,
                aw * bx + ax * bw + ay * bz - az * by,
                aw * by - ax * bz + ay * bw + az * bx,
                aw * bz + ax * by - ay * bx + az * bw,
            ]
        )

    q = np.array([1.0, 0, 0, 0])
    for axis in range(3):
        q = qmul(q, axis_quat(axis, euler[axis]))
    return q


def _geom_mass_com_inertia(gtype, size, pos, quat, mass=None):
    """Mass, COM (geom frame origin = `pos`), rotational inertia about COM in
    the *body* frame, for one geom. MuJoCo-compatible formulas."""
    if gtype == SPHERE:
        r = size[0]
        vol = 4 / 3 * np.pi * r**3
        m = mass if mass is not None else _DENSITY * vol
        i = 2 / 5 * m * r**2
        I_local = np.diag([i, i, i])
    elif gtype == CAPSULE:
        r, hl = size[0], size[1]
        vc = np.pi * r**2 * (2 * hl)
        vs = 4 / 3 * np.pi * r**3
        vol = vc + vs
        m = mass if mass is not None else _DENSITY * vol
        mc = m * vc / vol  # cylinder portion
        ms = m * vs / vol  # two hemispheres
        # cylinder about its COM, axis z
        izz_c = 0.5 * mc * r**2
        ixx_c = mc * (r**2 / 4 + (2 * hl) ** 2 / 12)
        # hemispheres: each at distance hl + 3r/8 from center along z
        izz_s = 2 / 5 * ms * r**2
        d = hl + 3 * r / 8
        ixx_s = 2 / 5 * ms * r**2 + ms * (d**2 - (3 * r / 8) ** 2) + ms * (3 * r / 8) ** 2
        # (parallel-axis from hemisphere COM; standard capsule formula)
        ixx_s = ms * (83 / 320 * r**2 + (hl + 3 * r / 8) ** 2)
        I_local = np.diag([ixx_c + ixx_s, ixx_c + ixx_s, izz_c + izz_s])
    elif gtype == BOX:
        sx, sy, sz = size  # half-sizes
        vol = 8 * sx * sy * sz
        m = mass if mass is not None else _DENSITY * vol
        I_local = np.diag(
            [
                m / 3 * (sy**2 + sz**2),
                m / 3 * (sx**2 + sz**2),
                m / 3 * (sx**2 + sy**2),
            ]
        )
    elif gtype == CYLINDER:
        r, hl = size[0], size[1]
        vol = np.pi * r**2 * 2 * hl
        m = mass if mass is not None else _DENSITY * vol
        I_local = np.diag(
            [
                m * (r**2 / 4 + hl**2 / 3),
                m * (r**2 / 4 + hl**2 / 3),
                0.5 * m * r**2,
            ]
        )
    elif gtype == ELLIPSOID:
        a, b, c = size
        vol = 4 / 3 * np.pi * a * b * c
        m = mass if mass is not None else _DENSITY * vol
        I_local = m / 5 * np.diag([b**2 + c**2, a**2 + c**2, a**2 + b**2])
    else:  # PLANE — massless
        return 0.0, pos, np.zeros((3, 3))
    R = _quat_to_mat_np(quat)
    return m, np.asarray(pos, np.float64), R @ I_local @ R.T


@dataclass
class GeomSpec:
    gtype: int
    size: np.ndarray
    pos: np.ndarray
    quat: np.ndarray
    rgba: np.ndarray
    name: str = ""
    material: str = "self"      # material id for the renderer: self/grid/decoration/target/site/effector
    contype: int = 1
    conaffinity: int = 0
    friction: float = 0.7       # sliding friction coefficient
    mass: Optional[float] = None
    group: int = 0              # >2 → not rendered (MuJoCo visual convention)
    link: int = -1              # filled at build


@dataclass
class JointSpec:
    jtype: int
    axis: np.ndarray
    pos: np.ndarray
    damping: float = 0.0
    armature: float = 0.0
    stiffness: float = 0.0
    springref: float = 0.0
    limited: bool = False
    range: Tuple[float, float] = (0.0, 0.0)
    name: str = ""
    ref: float = 0.0          # qpos at the XML pose (MuJoCo `ref`)
    frictionloss: float = 0.0


@dataclass
class TendonSpec:
    """Two-site spatial tendon with a length limit (MuJoCo <spatial limited>;
    used by ball_in_cup's string). Links/points resolved at finalize."""

    link_a: int
    pos_a: np.ndarray
    link_b: int
    pos_b: np.ndarray
    range: Tuple[float, float] = (0.0, 0.3)
    stiffness: float = 2000.0
    damping: float = 5.0


@dataclass
class CameraSpec:
    name: str
    pos: np.ndarray            # local, in owning body frame
    quat: np.ndarray
    mode: str = "fixed"        # fixed | trackcom | targetbody
    fovy: float = 45.0
    target_body: int = -1
    body: int = 0              # owning body (worldbody by default)
    # resolved at finalize (world pose at qpos0, used by trackcom offset):
    pos0: np.ndarray = field(default_factory=lambda: np.zeros(3))
    R0: np.ndarray = field(default_factory=lambda: np.eye(3))


@dataclass
class _BodySpec:
    parent: int
    pos: np.ndarray
    quat: np.ndarray
    joints: List[JointSpec]
    geoms: List[GeomSpec]
    name: str


class ModelBuilder:
    """Author a model the MJCF way, but in python (no XML on the hot path)."""

    def __init__(self, timestep=0.0025, gravity=(0, 0, -9.81), integrator="euler",
                 settotalmass: Optional[float] = None,
                 density: float = 0.0, viscosity: float = 0.0):
        self.timestep = timestep
        self.gravity = np.asarray(gravity, np.float64)
        self.integrator = integrator
        # fluid medium (MuJoCo <option density= viscosity=>) — drives the
        # swimmer/fish domains (reference: suite/swimmer.xml option density=3000)
        self.density = density
        self.viscosity = viscosity
        self.settotalmass = settotalmass  # MuJoCo <compiler settotalmass>
        self.bodies: List[_BodySpec] = [
            _BodySpec(-1, np.zeros(3), np.array([1.0, 0, 0, 0]), [], [], "world")
        ]
        self.cameras: List[CameraSpec] = []
        self.actuator_joint: List[str] = []
        self.actuator_gear: List[float] = []
        # generalized transmissions: (joints=[(name, coef)...], kind, gain)
        # kind: "motor" (force = ctrl) or "position" (force = kp·(ctrl − L),
        # L = Σ coef·q — MuJoCo position servo / fixed-tendon transmission)
        self.gen_actuators: List = []
        self.fixed_tendons: List = []  # (joints=[(name, coef)...], stiffness)
        self._free_root_prefixes: List[str] = []
        self.tendons: List[TendonSpec] = []
        self._tendon_bodies: List[Tuple] = []
        self.contact_solref = (0.02, 1.0)
        self.implicit_contacts = False
        self.implicit_limits = None  # None → follow implicit_contacts
        # MuJoCo <contact><exclude body1= body2=> pairs (body indices)
        self.excluded_body_pairs: List[Tuple[int, int]] = []

    def exclude_contact(self, body_a: int, body_b: int):
        """MuJoCo `<contact><exclude>`: drop all geom pairs between two
        bodies (reference: humanoid_CMU.xml:211-217 — clavicle/neck geoms
        overlap at rest and must not generate penalty forces)."""
        self.excluded_body_pairs.append((body_a, body_b))

    # -- authoring -----------------------------------------------------------
    def add_body(self, parent: int, pos=(0, 0, 0), quat=None, euler_deg=None,
                 name="") -> int:
        if quat is None:
            quat = (
                _euler_deg_to_quat_np(euler_deg)
                if euler_deg is not None
                else np.array([1.0, 0, 0, 0])
            )
        self.bodies.append(
            _BodySpec(parent, np.asarray(pos, np.float64), np.asarray(quat, np.float64),
                      [], [], name or f"body{len(self.bodies)}")
        )
        return len(self.bodies) - 1

    def add_joint(self, body: int, jtype, axis=(0, 0, 1), pos=(0, 0, 0),
                  damping=0.0, armature=0.0, stiffness=0.0, springref=0.0,
                  limited=False, range=(0.0, 0.0), name="", ref=0.0,
                  frictionloss=0.0):
        self.bodies[body].joints.append(
            JointSpec(jtype, np.asarray(axis, np.float64), np.asarray(pos, np.float64),
                      damping, armature, stiffness, springref, limited,
                      tuple(range), name, ref, frictionloss)
        )

    def add_tendon(self, body_a: int, pos_a, body_b: int, pos_b,
                   range=(0.0, 0.3), stiffness=2000.0, damping=5.0):
        self._tendon_bodies.append(
            (body_a, np.asarray(pos_a, np.float64), body_b,
             np.asarray(pos_b, np.float64), tuple(range), stiffness, damping))

    def add_geom(self, body: int, gtype, size, pos=(0, 0, 0), quat=None,
                 zaxis=None, fromto=None, euler_deg=None,
                 rgba=(0.5, 0.5, 0.5, 1), name="",
                 material="self", contype=1, conaffinity=1, friction=0.7,
                 mass=None, group=0):
        size = np.asarray(np.broadcast_to(np.asarray(size, np.float64), (3,))
                          if np.asarray(size).ndim == 0 else size, np.float64)
        if size.shape[0] < 3:
            size = np.concatenate([size, np.zeros(3 - size.shape[0])])
        if fromto is not None:
            a, b = np.asarray(fromto[:3], np.float64), np.asarray(fromto[3:], np.float64)
            pos = (a + b) / 2
            d = b - a
            hl = np.linalg.norm(d) / 2
            quat = zaxis_to_quat_np(d)
            size = np.array([size[0], hl, 0.0])
        elif zaxis is not None:
            quat = zaxis_to_quat_np(zaxis)
        elif euler_deg is not None:
            quat = _euler_deg_to_quat_np(euler_deg)
        elif quat is None:
            quat = np.array([1.0, 0, 0, 0])
        self.bodies[body].geoms.append(
            GeomSpec(gtype, size, np.asarray(pos, np.float64),
                     np.asarray(quat, np.float64), np.asarray(rgba, np.float64),
                     name, material, contype, conaffinity, friction, mass, group)
        )

    def add_camera(self, name, pos, quat=None, euler_deg=None, xyaxes=None,
                   zaxis=None, mode="fixed", fovy=45.0, target_body=-1, body=0):
        if euler_deg is not None:
            quat = _euler_deg_to_quat_np(euler_deg)
        elif xyaxes is not None:
            x = np.asarray(xyaxes[:3], np.float64)
            y = np.asarray(xyaxes[3:], np.float64)
            x /= np.linalg.norm(x)
            y = y - x * (y @ x)
            y /= np.linalg.norm(y)
            z = np.cross(x, y)
            R = np.stack([x, y, z], axis=1)
            quat = _mat_to_quat_np(R)
        elif zaxis is not None:
            # camera looks along -z; zaxis gives the camera z axis direction
            quat = zaxis_to_quat_np(zaxis)
        elif quat is None:
            quat = np.array([1.0, 0, 0, 0])
        self.cameras.append(
            CameraSpec(name, np.asarray(pos, np.float64), np.asarray(quat, np.float64),
                       mode, fovy, target_body, body)
        )

    def add_actuator(self, joint_name: str, gear: float):
        self.actuator_joint.append(joint_name)
        self.actuator_gear.append(gear)

    def add_free_root(self, body: int, armature: float = 1e-6,
                      prefix: str = "root"):
        """Free 6-DoF root joint as 3 slides (x, y, z) + 3 hinges
        (intrinsic x-y-z) at the body origin.

        Deliberate divergence from MuJoCo's quaternion free joint
        (qpos 7 / qvel 6): the engine's links are single-DoF, so the
        rotational part is an Euler-angle chart — exact dynamics away from
        the ±90° middle-hinge gimbal singularity, regularized there by a
        tiny hinge armature. Root state is qpos[0:3] position +
        qpos[3:6] = `math3d.quat_to_euler_xyz` angles."""
        self._free_root_prefixes.append(prefix)
        self.add_joint(body, SLIDE, axis=(1, 0, 0), name=f"{prefix}_x")
        self.add_joint(body, SLIDE, axis=(0, 1, 0), name=f"{prefix}_y")
        self.add_joint(body, SLIDE, axis=(0, 0, 1), name=f"{prefix}_z")
        self.add_joint(body, HINGE, axis=(1, 0, 0), armature=armature,
                       name=f"{prefix}_rx")
        self.add_joint(body, HINGE, axis=(0, 1, 0), armature=armature,
                       name=f"{prefix}_ry")
        self.add_joint(body, HINGE, axis=(0, 0, 1), armature=armature,
                       name=f"{prefix}_rz")

    def add_position_actuator(self, joints, kp: float, ctrlrange=(-1.0, 1.0)):
        """MuJoCo <position> servo: force = kp·(ctrl − L), L = Σ coef·q.
        `joints`: [(joint_name, coef), ...] — a single joint or a fixed
        tendon (reference: fish.xml actuators tail/fins_flap). `ctrlrange`
        is the MuJoCo ctrlrange the engine clips to (quadruped.xml's
        lift/extend classes use asymmetric ranges)."""
        self.gen_actuators.append((list(joints), "position", float(kp),
                                   tuple(ctrlrange)))

    def add_tendon_motor(self, joints, gear: float = 1.0,
                         ctrlrange=(-1.0, 1.0)):
        """MuJoCo <motor tendon=...>: force = gear·ctrl through a fixed
        tendon, τ = coef·gear·ctrl on each joint (reference:
        manipulator.xml actuator `grasp`)."""
        self.gen_actuators.append(
            ([(j, c * gear) for j, c in joints], "motor", 1.0,
             tuple(ctrlrange)))

    def add_fixed_tendon_spring(self, joints, stiffness: float):
        """Passive fixed tendon: τ −= k·L·coef on each joint, with
        L = Σ coef·q (reference: fish.xml tendon fins_sym)."""
        self.fixed_tendons.append((list(joints), float(stiffness)))

    # -- compilation ---------------------------------------------------------
    def finalize(self) -> "Model":
        """Expand multi-joint bodies into single-DoF link chains and pack."""
        nl = 0
        link_parent, link_pos, link_quat = [], [], []
        link_jtype, link_jaxis, link_jpos = [], [], []
        link_damping, link_armature, link_stiffness, link_springref = [], [], [], []
        link_limited, link_range = [], []
        link_ref, link_frictionloss = [], []
        link_mass, link_com, link_inertia = [], [], []
        joint_names = []
        body_to_link = {0: -1}  # world
        geoms: List[GeomSpec] = []
        body_first_dof = {}

        for bi, body in enumerate(self.bodies):
            if bi == 0:
                for g in body.geoms:
                    g = dataclasses.replace(g, link=-1)
                    geoms.append(g)
                continue
            parent_link = body_to_link[body.parent]
            joints = body.joints
            if not joints:
                # weld: a fixed body — represent as zero-DoF by merging geoms
                # into the parent link (adjusting frames). Rare in our domains;
                # implemented as a chain of zero links is not needed.
                raise NotImplementedError(
                    "fixed (jointless) bodies: attach geoms to parent instead"
                )
            # aggregate inertia of this body's geoms (body frame)
            m_tot, com, I_tot = 0.0, np.zeros(3), np.zeros((3, 3))
            for g in body.geoms:
                m, c, I = _geom_mass_com_inertia(g.gtype, g.size, g.pos, g.quat, g.mass)
                m_tot += m
                com = com + m * c
            com = com / max(m_tot, 1e-12)
            for g in body.geoms:
                m, c, I = _geom_mass_com_inertia(g.gtype, g.size, g.pos, g.quat, g.mass)
                d = c - com
                I_tot = I_tot + I + m * ((d @ d) * np.eye(3) - np.outer(d, d))

            body_first_dof[bi] = nl
            for ji, j in enumerate(joints):
                link_parent.append(parent_link if ji == 0 else nl - 1)
                link_pos.append(body.pos if ji == 0 else np.zeros(3))
                link_quat.append(body.quat if ji == 0 else np.array([1.0, 0, 0, 0]))
                link_jtype.append(j.jtype)
                link_jaxis.append(j.axis / np.linalg.norm(j.axis))
                link_jpos.append(j.pos)
                link_damping.append(j.damping)
                link_armature.append(j.armature)
                link_stiffness.append(j.stiffness)
                link_springref.append(j.springref)
                link_limited.append(j.limited)
                link_range.append(j.range)
                link_ref.append(j.ref)
                link_frictionloss.append(j.frictionloss)
                joint_names.append(j.name or f"{body.name}_j{ji}")
                last = ji == len(joints) - 1
                link_mass.append(m_tot if last else 0.0)
                link_com.append(com if last else np.zeros(3))
                link_inertia.append(I_tot if last else np.zeros((3, 3)))
                nl += 1
            body_to_link[bi] = nl - 1
            for g in body.geoms:
                g = dataclasses.replace(g, link=nl - 1)
                geoms.append(g)

        # settotalmass: rescale so Σ mass == target (MuJoCo compiler option,
        # used by cheetah.xml:6)
        if self.settotalmass is not None:
            total = sum(link_mass)
            scale = self.settotalmass / max(total, 1e-12)
            link_mass = [m * scale for m in link_mass]
            link_inertia = [I * scale for I in link_inertia]

        # tendons: resolve body ids → link ids
        tendons = [
            TendonSpec(body_to_link[ba], pa, body_to_link[bb], pb, rng_, k, c)
            for (ba, pa, bb, pb, rng_, k, c) in self._tendon_bodies
        ]

        # actuators
        act_dof = [joint_names.index(n) for n in self.actuator_joint]
        nu_total = len(act_dof) + len(self.gen_actuators)
        act_moment = np.zeros((nu_total, nl))
        act_kind = np.zeros(nu_total, np.int32)          # 0=motor 1=position
        act_gain = np.ones(nu_total)
        act_ctrlrange = np.tile(np.array([-1.0, 1.0]), (nu_total, 1))
        for a, (dof, gear) in enumerate(zip(act_dof, self.actuator_gear)):
            act_moment[a, dof] = gear
        for a, spec in enumerate(self.gen_actuators):
            joints, kind, gain = spec[0], spec[1], spec[2]
            row = a + len(act_dof)
            for jname, coef in joints:
                act_moment[row, joint_names.index(jname)] = coef
            act_kind[row] = 1 if kind == "position" else 0
            act_gain[row] = gain
            if len(spec) > 3:
                act_ctrlrange[row] = spec[3]
        free_roots = [0] * 0
        free_roots = []
        ft_moment = np.zeros((len(self.fixed_tendons), nl))
        ft_stiff = np.zeros(len(self.fixed_tendons))
        for r, (joints, k) in enumerate(self.fixed_tendons):
            for jname, coef in joints:
                ft_moment[r, joint_names.index(jname)] = coef
            ft_stiff[r] = k
        for pref in self._free_root_prefixes:
            free_roots.append(joint_names.index(f"{pref}_x"))

        # contact pairs: (i, j) if contype/conaffinity match, different links,
        # and not a parent-child link pair (MuJoCo default exclusion)
        excluded = {frozenset((body_to_link[a], body_to_link[b]))
                    for a, b in self.excluded_body_pairs}
        pairs = []
        for i in range(len(geoms)):
            for j in range(i + 1, len(geoms)):
                gi, gj = geoms[i], geoms[j]
                if HFIELD in (gi.gtype, gj.gtype):
                    continue  # hfield narrow phase is separate (below)
                compat = (gi.contype & gj.conaffinity) or (gj.contype & gi.conaffinity)
                if not compat:
                    continue
                if gi.link == gj.link:
                    continue
                if frozenset((gi.link, gj.link)) in excluded:
                    continue
                # parent-child exclusion (MuJoCo default); the world body is
                # exempt, so floor contacts with root bodies survive
                li, lj = gi.link, gj.link
                if li >= 0 and lj >= 0 and link_parent[li] == lj:
                    continue
                if lj >= 0 and li >= 0 and link_parent[lj] == li:
                    continue
                pairs.append((i, j))

        # hfield narrow phase: sample-point spheres per colliding geom
        # (smooth-penalty analogue of MuJoCo's prism decomposition; the
        # terrain grid itself is per-episode dynamic data threaded through
        # engine.step(..., hfield=...) — see physics/hfield.py)
        hfield_geom = next(
            (i for i, g in enumerate(geoms) if g.gtype == HFIELD), -1)
        hfield_pairs = []
        if hfield_geom >= 0:
            gh = geoms[hfield_geom]
            for i, g in enumerate(geoms):
                if g.gtype == HFIELD or g.link < 0:
                    continue
                compat = (g.contype & gh.conaffinity) or (
                    gh.contype & g.conaffinity)
                if not compat:
                    continue
                r = float(g.size[0])
                if g.gtype == SPHERE:
                    pts = (((0.0, 0.0, 0.0), r),)
                elif g.gtype in (CAPSULE, CYLINDER):
                    hl = float(g.size[1])
                    pts = (((0.0, 0.0, -hl), r), ((0.0, 0.0, 0.0), r),
                           ((0.0, 0.0, hl), r))
                elif g.gtype == ELLIPSOID:
                    pts = (((0.0, 0.0, 0.0), float(min(g.size))),)
                else:
                    raise NotImplementedError(
                        f"hfield contact vs gtype {g.gtype}")
                hfield_pairs.append((i, pts))

        # world link poses at qpos0 (joint transforms are identity there)
        R0 = np.zeros((nl, 3, 3))
        p0 = np.zeros((nl, 3))
        for i in range(nl):
            par = link_parent[i]
            Rp = np.eye(3) if par < 0 else R0[par]
            pp = np.zeros(3) if par < 0 else p0[par]
            R0[i] = Rp @ _quat_to_mat_np(link_quat[i])
            p0[i] = pp + Rp @ link_pos[i]
        masses = np.asarray(link_mass).reshape(nl)
        total_mass = masses.sum()
        coms = np.asarray(link_com, np.float64).reshape(nl, 3)
        com0 = (
            (masses[:, None] * (p0 + np.einsum("nij,nj->ni", R0, coms))
             ).sum(0) / max(total_mass, 1e-12)
        )

        # resolve cameras: world pose at qpos0 + link-index remapping
        cameras = []
        for c in self.cameras:
            bl = body_to_link.get(c.body, -1)
            Rb = np.eye(3) if bl < 0 else R0[bl]
            pb = np.zeros(3) if bl < 0 else p0[bl]
            cameras.append(
                dataclasses.replace(
                    c,
                    pos0=pb + Rb @ c.pos,
                    R0=Rb @ _quat_to_mat_np(c.quat),
                    body=bl,
                    target_body=body_to_link.get(c.target_body, -1)
                    if c.target_body >= 0 else -1,
                )
            )
        model = Model(
            nl=nl,
            nu=nu_total,
            timestep=self.timestep,
            integrator=self.integrator,
            gravity=self.gravity,
            link_parent=np.asarray(link_parent, np.int32),
            link_pos=np.asarray(link_pos, np.float64).reshape(nl, 3),
            link_quat=np.asarray(link_quat, np.float64).reshape(nl, 4),
            jnt_type=np.asarray(link_jtype, np.int32),
            jnt_axis=np.asarray(link_jaxis, np.float64).reshape(nl, 3),
            jnt_pos=np.asarray(link_jpos, np.float64).reshape(nl, 3),
            jnt_damping=np.asarray(link_damping, np.float64),
            jnt_armature=np.asarray(link_armature, np.float64),
            jnt_stiffness=np.asarray(link_stiffness, np.float64),
            jnt_springref=np.asarray(link_springref, np.float64),
            jnt_limited=np.asarray(link_limited, bool),
            jnt_range=np.asarray(link_range, np.float64).reshape(nl, 2),
            jnt_ref=np.asarray(link_ref, np.float64),
            jnt_frictionloss=np.asarray(link_frictionloss, np.float64),
            tendons=tendons,
            link_mass=np.asarray(link_mass, np.float64),
            link_com=np.asarray(link_com, np.float64).reshape(nl, 3),
            link_inertia=np.asarray(link_inertia, np.float64).reshape(nl, 3, 3),
            act_dof=np.asarray(act_dof, np.int32),
            act_gear=np.asarray(self.actuator_gear, np.float64),
            act_moment=act_moment,
            act_kind=act_kind,
            act_gain=act_gain,
            act_ctrlrange=act_ctrlrange,
            ft_moment=ft_moment,
            ft_stiff=ft_stiff,
            free_roots=tuple(free_roots),
            geoms=geoms,
            contact_pairs=np.asarray(pairs, np.int32).reshape(-1, 2),
            cameras=cameras,
            joint_names=joint_names,
            body_names=[b.name for b in self.bodies],
            body_last_link=tuple(
                body_to_link[bi] for bi in range(len(self.bodies))
            ),
            com0=com0,
            density=self.density,
            viscosity=self.viscosity,
            contact_solref=tuple(self.contact_solref),
            implicit_contacts=bool(self.implicit_contacts),
            implicit_limits=bool(self.implicit_contacts
                                 if self.implicit_limits is None
                                 else self.implicit_limits),
            hfield_geom=hfield_geom,
            hfield_pairs=tuple(hfield_pairs),
        )
        return model


def _mat_to_quat_np(R):
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1) * 2
        return np.array(
            [0.25 * s, (R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
             (R[1, 0] - R[0, 1]) / s]
        )
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1) * 2
    q = np.zeros(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


@dataclass
class Model:
    """Compiled model. Numeric arrays are numpy; jitted fns close over them
    (they become XLA constants — tiny). Static topology drives trace-time
    loop unrolling in the engine."""

    nl: int
    nu: int
    timestep: float
    integrator: str
    gravity: np.ndarray
    link_parent: np.ndarray
    link_pos: np.ndarray
    link_quat: np.ndarray
    jnt_type: np.ndarray
    jnt_axis: np.ndarray
    jnt_pos: np.ndarray
    jnt_damping: np.ndarray
    jnt_armature: np.ndarray
    jnt_stiffness: np.ndarray
    jnt_springref: np.ndarray
    jnt_limited: np.ndarray
    jnt_range: np.ndarray
    jnt_ref: np.ndarray
    jnt_frictionloss: np.ndarray
    tendons: List[TendonSpec]
    link_mass: np.ndarray
    link_com: np.ndarray
    link_inertia: np.ndarray
    act_dof: np.ndarray
    act_gear: np.ndarray
    geoms: List[GeomSpec]
    contact_pairs: np.ndarray
    cameras: List[CameraSpec]
    joint_names: List[str]
    body_names: List[str]
    # body index → its last link (multi-joint bodies expand to link chains);
    # -1 for the world body. Host metadata for name-based lookups (api.py).
    body_last_link: tuple = ()
    com0: np.ndarray = field(default_factory=lambda: np.zeros(3))
    # contact penalty parameters (spring-damper; see engine.contact_forces)
    act_moment: np.ndarray = None   # (nu, nv) transmission moments
    act_kind: np.ndarray = None     # (nu,) 0=motor 1=position
    act_gain: np.ndarray = None     # (nu,) kp for position actuators
    act_ctrlrange: np.ndarray = None  # (nu, 2) MuJoCo ctrlrange clip bounds
    ft_moment: np.ndarray = None    # (n_fixed_tendons, nv) passive couplings
    ft_stiff: np.ndarray = None     # (n_fixed_tendons,)
    free_roots: tuple = ()          # start dof of each 6-dof slide+hinge root
    density: float = 0.0      # fluid medium density (swimmer/fish)
    viscosity: float = 0.0    # fluid medium viscosity
    contact_stiffness: float = 2e4
    contact_damping: float = 200.0
    limit_stiffness: float = 300.0
    limit_damping: float = 2.0
    # solref (timeconst, dampratio) for the penalty contact gains
    # (engine._soft_gains). The MuJoCo default is (0.02, 1.0); domains whose
    # contact interactions need a stiffer solve override it — finger's
    # spinner paddle-wheel momentum transfer is stiffness-limited (the
    # reference finger.xml demands cone="elliptic" iterations="200"; with
    # the default solref our scripted-rub probe peaks at 6.7 rad/s vs real
    # MuJoCo's 21; at (0.005, 1.0) it matches at 21.6).
    contact_solref: tuple = (0.02, 1.0)
    # True → contacts are solved as implicit velocity-level impulses
    # (dense.implicit_contact_stage: Jacobi sweeps with projected normal/
    # friction cones and TRUE stiction) instead of explicit penalty
    # forces. Required for grasping: explicit penalties are stability-
    # bounded at k ≤ m_eff/h², which on gram-scale gripper digits cannot
    # resist newton-scale grasp loads — the ball falls straight through
    # (see the grasp probes in docs/PERF.md). Opt-in per domain
    # (manipulator/stacker); locomotion domains keep the golden-validated
    # explicit path.
    implicit_contacts: bool = False
    # True → joint limits are integrated as authority-floored implicit
    # impulses (engine._implicit_limit_stage — needed when strong actuators
    # load light limited dofs, e.g. manipulator digits). False → the
    # golden-validated explicit soft limit springs (MuJoCo solref
    # semantics, with overshoot). Defaults to `implicit_contacts`, but a
    # contact-rich LOCOMOTION model wants implicit contacts WITH soft
    # limits: hopper's gait presses joints into their ranges every hop,
    # and the stiff implicit stage both over-constrains that and damps
    # legitimate escape motion (scripts/probe_hopper.py: knee released
    # from below its 5° lower bound under +1 torque moved 0.14 rad vs
    # real MuJoCo's 0.68 before this split).
    implicit_limits: bool = False
    # heightfield terrain (quadruped escape): geom index of the HFIELD geom
    # (size = (half_x, half_y, z_scale, z_base), pos z = base offset) and the
    # static sample-point decomposition of every geom that collides with it:
    # ((geom_id, ((local_pt3, radius), ...)), ...). The elevation grid itself
    # is per-episode data (PhysState.task_aux), not part of the Model.
    hfield_geom: int = -1
    hfield_pairs: tuple = ()

    @property
    def nv(self) -> int:
        return self.nl

    def joint_id(self, name: str) -> int:
        return self.joint_names.index(name)

    def replace(self, **kw) -> "Model":
        return dataclasses.replace(self, **kw)
