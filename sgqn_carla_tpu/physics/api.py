"""dm_control-style `Physics` convenience API.

The reference's primary physics object is `mujoco.Physics`
(reference: src/env/dm_control/dm_control/mujoco/engine.py:85) with
`from_xml_string`/`from_xml_path` constructors (engine.py:379), a
`step()`/`set_control()`/`reset()` lifecycle, `render()` (engine.py:167-200),
and name-based state access through `physics.named.data.*`
(mujoco/index.py — named views over qpos/qvel/ctrl/xpos).

This module provides the same ergonomics over the functional engine so a
dm_control user migrating to the framework keeps their mental model:

    from sgqn_carla_tpu.physics.api import Physics

    physics = Physics.from_xml_path(".../walker.xml")   # MJCF compiler
    with physics.reset_context():
        physics.named.qpos["rootz"] = 0.1
    physics.set_control(np.zeros(physics.model.nu))
    physics.step(10)
    frame = physics.render(84, 84, camera_id=0)
    print(physics.named.qpos["right_hip"], physics.named.qvel["right_hip"])

Internally everything stays functional: `Physics` is a thin mutable shell
holding (model, qpos, qvel, ctrl) and delegating to the jitted pure
`engine.step`; batch/vmap users should keep using the functional API.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sgqn_carla_tpu.physics import engine
from sgqn_carla_tpu.physics.model import Model


class _NamedView:
    """`physics.named.qpos["joint_name"]` read/write view
    (reference: mujoco/index.py named indexers over mjData fields)."""

    def __init__(self, physics: "Physics", field: str):
        self._physics = physics
        self._field = field

    def _idx(self, name: str) -> int:
        try:
            return self._physics.model.joint_names.index(name)
        except ValueError:
            raise KeyError(
                f"unknown joint {name!r}; have {self._physics.model.joint_names}"
            ) from None

    def __getitem__(self, name: str) -> float:
        return float(getattr(self._physics, "_" + self._field)[self._idx(name)])

    def __setitem__(self, name: str, value: float) -> None:
        arr = getattr(self._physics, "_" + self._field)
        arr = np.asarray(arr).copy()
        arr[self._idx(name)] = value
        setattr(self._physics, "_" + self._field, arr)


class _Named:
    def __init__(self, physics: "Physics"):
        self.qpos = _NamedView(physics, "qpos")
        self.qvel = _NamedView(physics, "qvel")


class Physics:
    """Mutable convenience shell over (Model, qpos, qvel, ctrl)."""

    def __init__(self, model: Model):
        self.model = model
        self._run_cache = {}  # n → jitted n-substep scan
        self.reset()

    # -- constructors (reference: engine.py:379-418) -------------------------
    @classmethod
    def from_xml_string(cls, xml: str, base_dir: Optional[str] = None
                        ) -> "Physics":
        from sgqn_carla_tpu.physics.mjcf import load_model_string

        return cls(load_model_string(xml, base_dir=base_dir))

    @classmethod
    def from_xml_path(cls, path: str) -> "Physics":
        from sgqn_carla_tpu.physics.mjcf import load_model

        return cls(load_model(path))

    @classmethod
    def from_model(cls, model: Model) -> "Physics":
        return cls(model)

    # -- lifecycle (reference: engine.py:148-165, rl/control.py) -------------
    def reset(self) -> None:
        """qpos0 state: zeros in joint coordinates (joint `ref` handling is
        inside the engine), zero velocity and control."""
        self._qpos = np.zeros(self.model.nl, np.float32)
        self._qvel = np.zeros(self.model.nl, np.float32)
        self._ctrl = np.zeros(self.model.nu, np.float32)
        self._warm = self._warm0()

    def _warm0(self):
        """Cold implicit-solver warm-start carry (grasp-class models only;
        None elsewhere) — kept across step() calls so the stateful API gets
        the same multi-second static holds as Task.step, and reset with the
        state (see engine.n_steps_warm)."""
        if self.model.implicit_contacts and len(self.model.contact_pairs):
            from sgqn_carla_tpu.physics import dense

            return np.zeros((dense.warm_size(self.model), 3), np.float32)
        return None

    @contextlib.contextmanager
    def reset_context(self):
        """Mirror of dm_control's `physics.reset_context()` — reset, let the
        caller poke state, then changes take effect on the next step."""
        self.reset()
        yield self

    def set_control(self, ctrl) -> None:
        ctrl = np.asarray(ctrl, np.float32).reshape(self.model.nu)
        self._ctrl = ctrl

    def step(self, n: int = 1) -> None:
        """Advance n substeps as ONE fused jitted scan: the runtime charges a
        fixed per-dispatch overhead (docs/PERF.md "dispatch-overhead quirk"),
        so `physics.step(1000)` must not issue 1000 launches."""
        if n not in self._run_cache:
            model = self.model

            if self._warm is not None:
                @jax.jit
                def run(q, v, u, w):
                    out, w = engine.n_steps_warm(model, q, v, u, n, w)
                    return out.qpos, out.qvel, w
            else:
                @jax.jit
                def run(q, v, u, w):
                    def body(carry, _):
                        out = engine.step(model, carry[0], carry[1], u)
                        return (out.qpos, out.qvel), None

                    (q, v), _ = jax.lax.scan(body, (q, v), None, length=n)
                    return q, v, w

            self._run_cache[n] = run
        q, v, w = self._run_cache[n](
            jnp.asarray(self._qpos), jnp.asarray(self._qvel),
            jnp.asarray(self._ctrl),
            None if self._warm is None else jnp.asarray(self._warm))
        self._qpos = np.asarray(q)
        self._qvel = np.asarray(v)
        self._warm = None if w is None else np.asarray(w)

    # -- state access ---------------------------------------------------------
    @property
    def qpos(self) -> np.ndarray:
        return self._qpos

    @property
    def qvel(self) -> np.ndarray:
        return self._qvel

    @property
    def ctrl(self) -> np.ndarray:
        return self._ctrl

    @property
    def named(self) -> _Named:
        return _Named(self)

    def set_state(self, qpos, qvel) -> None:
        self._qpos = np.asarray(qpos, np.float32).reshape(self.model.nl)
        self._qvel = np.asarray(qvel, np.float32).reshape(self.model.nl)
        self._warm = self._warm0()  # teleports invalidate contact impulses

    def body_xpos(self, name: str) -> np.ndarray:
        """World position of a body's frame origin
        (reference: named.data.xpos[body_name])."""
        body = self.model.body_names.index(name)
        link = self.model.body_last_link[body]
        kin = engine.forward_kinematics(
            self.model, jnp.asarray(self._qpos), jnp.asarray(self._qvel))
        if link < 0:  # world body
            return np.zeros(3)
        return np.asarray(kin.p[link])

    # -- rendering (reference: engine.py:167-200 Physics.render) -------------
    def render(self, height: int = 240, width: int = 320,
               camera_id: int = 0) -> np.ndarray:
        from sgqn_carla_tpu.render import raster
        from sgqn_carla_tpu.render.cameras import camera_pose

        kin = engine.forward_kinematics(
            self.model, jnp.asarray(self._qpos), jnp.asarray(self._qvel))
        app = raster.default_appearance(self.model)
        cam = camera_pose(self.model, camera_id, kin)
        rgb, _, _ = raster.render(self.model, kin, app, cam,
                                  height=height, width=width)
        return np.asarray(rgb)
