"""Functional pixel environment: physics → render → distract → frame-stack.

Replaces the reference's wrapper chain — dmc2gym.make → VideoWrapper →
FrameStack → ColorWrapper (reference: src/env/wrappers.py:19-73) — with one
pure function over an explicit `EnvState` pytree. Wrapper attributes (video
playback index, per-episode colors, stacked frames) become state fields, so
thousands of envs vmap and the whole step jits into a single XLA program.

Semantics matched to the reference:
  * action repeat: rewards summed over `action_repeat` physics control steps,
    one render at the end (reference: dmc2gym/wrappers.py:160-176);
  * frame stack: K=3 frames concatenated channel-first, reset fills the stack
    with K copies (reference: env/wrappers.py:240-269, LazyFrames);
  * color modes: per-episode resample from a 100-color table
    (reference: ColorWrapper.reset → reload_physics, wrappers.py:89-139);
  * video modes: per-episode clip choice, one frame advance per env step,
    composited where the segmentation says background — video_easy replaces
    sky only, video_hard also the floor (reference greenscreen setting_kwargs,
    wrappers.py:96-101, do_green_screen:390-420);
  * episode ends only at the time limit (DMC semantics), matching
    max_episode_steps = ceil(episode_length / action_repeat)
    (reference: dmc2gym/__init__.py:33-63).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from sgqn_carla_tpu.data.colors import NUM_COLORS, appearance_from_color, make_color_table
from sgqn_carla_tpu.data.videos import get_videos
from sgqn_carla_tpu.physics import engine
from sgqn_carla_tpu.physics.domains import load as load_task
from sgqn_carla_tpu.physics.task import PhysState
from sgqn_carla_tpu.render.cameras import camera_pose, _root_link
from sgqn_carla_tpu.render.fast import render_scene_fast as render_scene
from sgqn_carla_tpu.render.raster import Appearance, default_appearance

MODES = ("train", "color_easy", "color_hard", "video_easy", "video_hard",
         "distracting_cs")


class EnvState(struct.PyTreeNode):
    phys: PhysState
    frames: jnp.ndarray        # (K*3, H, W) uint8, channel-first like reference
    step_i: jnp.ndarray        # int32 wrapper steps this episode
    rng: jnp.ndarray
    appearance: Appearance
    video_idx: jnp.ndarray     # int32
    video_frame: jnp.ndarray   # int32
    distract: Any = None       # distracting_cs walk state (envs/distracting.py)


class StepResult(struct.PyTreeNode):
    obs: jnp.ndarray           # (K*3, H, W) uint8
    reward: jnp.ndarray        # f32
    done: jnp.ndarray          # bool (time limit only — DMC semantics)


class DMCPixelEnv:
    """Static env configuration; all methods are pure and jit/vmap-safe."""

    def __init__(self, domain_name: str, task_name: str, *, mode: str = "train",
                 image_size: int = 84, action_repeat: int = 4,
                 frame_stack: int = 3, episode_length: int = 1000,
                 intensity: float = 0.0, seed: int = 0,
                 external_data_dir: str = "", video_pool: str = "dmcgb"):
        assert mode in MODES, f'specified mode "{mode}" is not supported'
        self.task = load_task(domain_name, task_name)
        self.mode = mode
        self.image_size = image_size
        self.action_repeat = action_repeat
        self.frame_stack = frame_stack
        self.episode_length = episode_length
        self.intensity = intensity
        self.max_episode_steps = (episode_length + action_repeat - 1) // action_repeat
        self.action_size = self.task.action_size

        self.color_table = (
            make_color_table(mode, seed, external_data_dir)
            if mode.startswith("color") else None
        )
        if mode.startswith("video"):
            vids = get_videos(mode, image_size, image_size, seed,
                              external_data_dir, band=video_pool)
            self.videos = jnp.asarray(vids)  # (V, F, H, W, 3) uint8
            self.num_videos = vids.shape[0]
            self.video_len = vids.shape[1]
        elif mode == "distracting_cs":
            from sgqn_carla_tpu.envs import distracting as dcs

            vids = get_videos("video_hard", image_size, image_size, seed + 5,
                              external_data_dir, band=video_pool)
            self.videos = jnp.asarray(vids)
            self.num_videos = dcs.num_videos_for(intensity, vids.shape[0])
            self.video_len = vids.shape[1]
        else:
            self.videos = None
            self.num_videos = 0
            self.video_len = 1
        self._default_app = default_appearance(self.task.model)
        if mode == "distracting_cs":
            from sgqn_carla_tpu.envs import distracting as dcs

            self.dcs = dcs
            self.cam_cfg = dcs.make_cam_config(
                self.task.model, self.task.camera_id, intensity, domain_name)
            self.color_lo, self.color_hi = dcs.color_bounds(
                self._default_app, intensity)
            self.color_step_std = 0.03 * intensity  # dynamic (suite_utils.py:32)
        else:
            self.cam_cfg = None

    # -- observation ---------------------------------------------------------
    @property
    def obs_shape(self) -> Tuple[int, int, int]:
        return (3 * self.frame_stack, self.image_size, self.image_size)

    def _episode_appearance(self, rng) -> Appearance:
        if self.color_table is not None:
            # row count from the table itself: external .pt tables may
            # carry more than the procedural NUM_COLORS rows
            n = self.color_table["self_rgb"].shape[0]
            idx = jax.random.randint(rng, (), 0, n)
            return appearance_from_color(self.task.model, self.color_table, idx)
        return self._default_app

    def _render_frame(self, state: EnvState, height: Optional[int] = None,
                      width: Optional[int] = None):
        """(3, H, W) uint8 current camera frame with distraction compositing."""
        h = height or self.image_size
        w = width or self.image_size
        kin = engine.forward_kinematics(self.task.model, state.phys.qpos,
                                        state.phys.qvel)
        if self.mode == "distracting_cs":
            com = engine.subtree_com(self.task.model, kin,
                                     _root_link(self.task.model))
            cam = self.dcs.cam_walk_pose(
                self.cam_cfg, state.distract.cam, com,
                self.task.model.cameras[self.task.camera_id].fovy)
        else:
            cam = camera_pose(self.task.model, self.task.camera_id, kin)
        Rg, pg = engine.geom_world(self.task.model, kin)
        if self.task.render_overrides_fn is not None:
            for idx, pos in self.task.render_overrides_fn(
                    self.task.model, state.phys).items():
                pg = pg.at[idx].set(pos)
        background = None
        bg_mats: Tuple[str, ...] = ()
        if self.videos is not None:
            if self.mode == "distracting_cs":
                # ping-pong playback advancing every 2nd step
                # (reference: background.py:217-239)
                fidx = self.dcs.pingpong_index(state.video_frame // 2,
                                               self.video_len)
            else:
                fidx = jnp.mod(state.video_frame, self.video_len)
            frame = self.videos[state.video_idx, fidx].astype(jnp.float32) / 255.0
            if (h, w) != (self.image_size, self.image_size):
                frame = jax.image.resize(frame, (h, w, 3), "linear")
            background = frame
            if self.mode == "video_hard":
                bg_mats = ("grid",)
        hfield = (state.phys.task_aux["terrain"]
                  if self.task.model.hfield_geom >= 0 else None)
        rgb, _, _ = render_scene(
            self.task.model, Rg, pg, state.appearance, cam, h, w,
            background=background, bg_mask_materials=bg_mats,
            hfield=hfield,
        )
        return jnp.transpose(rgb, (2, 0, 1))  # CHW, reference obs layout

    # -- reset / step --------------------------------------------------------
    def reset(self, rng) -> Tuple[EnvState, jnp.ndarray]:
        r_phys, r_app, r_vid, r_dc, r_next = jax.random.split(rng, 5)
        phys = self.task.init(r_phys)
        app = self._episode_appearance(r_app)
        video_idx = (
            jax.random.randint(r_vid, (), 0, self.num_videos)
            if self.num_videos else jnp.int32(0)
        )
        distract = None
        if self.mode == "distracting_cs":
            k_cam, k_col, k_n = jax.random.split(r_dc, 3)
            app = self.dcs.color_init(self.color_lo, self.color_hi, k_col)
            distract = self.dcs.DistractState(
                cam=self.dcs.cam_walk_init(self.cam_cfg, k_cam), rng=k_n)
        state = EnvState(
            phys=phys,
            frames=jnp.zeros(self.obs_shape, jnp.uint8),
            step_i=jnp.int32(0),
            rng=r_next,
            appearance=app,
            video_idx=jnp.int32(video_idx),
            video_frame=jnp.int32(0),
            distract=distract,
        )
        frame = self._render_frame(state)
        frames = jnp.tile(frame, (self.frame_stack, 1, 1))
        state = state.replace(frames=frames)
        return state, frames

    def step(self, state: EnvState, action) -> Tuple[EnvState, StepResult]:
        action = jnp.clip(jnp.asarray(action, jnp.float32), -1.0, 1.0)

        def repeat_body(phys, _):
            phys = self.task.step(phys, action)
            r = self.task.reward(phys, action)
            return phys, r

        phys, rewards = jax.lax.scan(
            repeat_body, state.phys, None, length=self.action_repeat
        )
        reward = jnp.sum(rewards)

        state = state.replace(
            phys=phys,
            step_i=state.step_i + 1,
            video_frame=state.video_frame + 1,
        )
        if self.mode == "distracting_cs":
            # camera + color walk applied every 2nd frame
            # (reference: camera.py:288-291, color.py:82-88)
            d = state.distract
            k_cam, k_col, k_n = jax.random.split(d.rng, 3)
            even = state.step_i % 2 == 0

            def walk(_):
                cam2 = self.dcs.cam_walk_step(self.cam_cfg, d.cam, k_cam)
                app2 = self.dcs.color_step(state.appearance, self.color_lo,
                                           self.color_hi, k_col,
                                           self.color_step_std)
                return cam2, app2

            cam2, app2 = jax.lax.cond(
                even, walk, lambda _: (d.cam, state.appearance), None)
            state = state.replace(
                distract=d.replace(cam=cam2, rng=k_n), appearance=app2)
        frame = self._render_frame(state)
        c = 3
        frames = jnp.concatenate([state.frames[c:], frame], axis=0)
        state = state.replace(frames=frames)
        done = state.step_i >= self.max_episode_steps
        return state, StepResult(obs=frames, reward=reward, done=done)

    def render_eval(self, state: EnvState, size: int = 448) -> jnp.ndarray:
        """High-res frame for the video recorder (reference: src/video.py:12:
        448×448 with the mode's distraction re-applied)."""
        return jnp.transpose(self._render_frame(state, size, size), (1, 2, 0))


def make_env(domain_name, task_name, seed=0, episode_length=1000,
             frame_stack=3, action_repeat=4, image_size=100, mode="train",
             intensity=0.0, external_data_dir="",
             video_pool="dmcgb") -> DMCPixelEnv:
    """Factory mirroring the reference `make_env` signature
    (reference: src/env/wrappers.py:19-73)."""
    return DMCPixelEnv(
        domain_name, task_name, mode=mode, image_size=image_size,
        action_repeat=action_repeat, frame_stack=frame_stack,
        episode_length=episode_length, intensity=intensity, seed=seed,
        external_data_dir=external_data_dir, video_pool=video_pool,
    )
