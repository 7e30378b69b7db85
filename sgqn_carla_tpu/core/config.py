"""Typed experiment configuration.

Mirrors the flag surface of the reference CLI (reference: src/arguments.py:6-144)
as a frozen dataclass so configs are hashable, can be closed over by `jax.jit`,
and thread through pure functions without a global namespace.

Derivations performed by the reference post-parse are reproduced in
`finalize()`: "600k" → 600000 suffix parsing (arguments.py:130-132) and the
crop policy (image_size 100 / crop 84 for {rad, curl, pad, soda}, else 84/84;
arguments.py:137-142).
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass
from typing import Optional

ALGORITHMS = (
    "sac",
    "rad",
    "curl",
    "pad",
    "soda",
    "drq",
    "svea",
    "sgsac",
)

EVAL_MODES = (
    "train",
    "color_easy",
    "color_hard",
    "video_easy",
    "video_hard",
    "distracting_cs",
    "all",
    "none",
)

DISTRACTING_CS_INTENSITIES = (0.0, 0.025, 0.05, 0.1, 0.15, 0.2, 0.3, 0.4, 0.5)


def _parse_k(v) -> int:
    """Parse "600k" → 600000 (reference: arguments.py:130-132)."""
    if isinstance(v, int):
        return v
    return int(str(v).replace("k", "000"))


@dataclass(frozen=True)
class Config:
    """All hyperparameters for one experiment.

    Field names/defaults match the reference flags (src/arguments.py) so shell
    scripts written against the reference CLI port over unchanged. TPU-specific
    fields (num_envs, mesh axes, precision) are additive.
    """

    # environment
    domain_name: str = "walker"
    task_name: str = "walk"
    frame_stack: int = 3
    action_repeat: int = 4
    episode_length: int = 1000
    eval_mode: Optional[str] = "color_easy"

    # agent
    algorithm: str = "sgsac"
    train_steps: int = 600_000
    discount: float = 0.99
    init_steps: int = 1000
    batch_size: int = 128
    hidden_dim: int = 1024

    # actor
    actor_lr: float = 1e-3
    actor_beta: float = 0.9
    actor_log_std_min: float = -10.0
    actor_log_std_max: float = 2.0
    actor_update_freq: int = 2

    # critic
    critic_lr: float = 1e-3
    critic_beta: float = 0.9
    critic_tau: float = 0.01
    critic_target_update_freq: int = 2
    critic_weight_decay: float = 0.0

    # architecture
    num_shared_layers: int = 11
    num_head_layers: int = 0
    num_filters: int = 32
    projection_dim: int = 100
    encoder_tau: float = 0.05

    # entropy maximization
    init_temperature: float = 0.1
    alpha_lr: float = 1e-4
    alpha_beta: float = 0.5

    # auxiliary tasks
    aux_lr: float = 3e-4
    aux_beta: float = 0.9
    aux_update_freq: int = 2

    # soda
    soda_batch_size: int = 256
    soda_tau: float = 0.005

    # svea / sgqn
    svea_alpha: float = 0.5
    svea_beta: float = 0.5
    sgqn_quantile: float = 0.95
    svea_contrastive_coeff: float = 0.1
    svea_norm_coeff: float = 0.1
    attrib_coeff: float = 0.25
    consistency: int = 1
    # masked-obs consistency fill: "scalar" (reference parity — one gray
    # level, sgsac.py:67-70) or "color" (per-sample random RGB — covers
    # robot-on-colored-background scenes the scalar fill never shows the
    # trunk; the measured video_hard camouflage failure axis, see
    # agents/sgsac.py::_fill)
    consistency_fill: str = "scalar"
    consistency_fill_p: float = 0.25  # colored-fill dose per sample when
                                 # consistency_fill="color"; p=1 measured
                                 # dead (flag_r4mix attempt 1)
    consistency_fill_warmup: int = 0  # updates before the colored dose
                                 # activates (curriculum; any colored dose
                                 # from update 1 stalls learning —
                                 # flag_r4mix attempts 1-2)
    alpha_blending: float = 0.2

    # eval
    save_freq: int = 6_000
    eval_freq: int = 6_000
    eval_episodes: int = 6
    distracting_cs_intensity: float = 0.0

    # misc
    seed: int = 10081
    log_dir: str = "logs"
    save_video: bool = False
    # real-dataset root (the reference's setup/config.cfg role,
    # utils.load_config at src/utils.py:60-66): a directory with subdirs
    #   overlay/      *.npy (3,H,W) or (H,W,3) images  → Places365 role
    #   video_easy/   *.npy (F,H,W,3) uint8 clips      → DMCGB easy videos
    #   video_hard/   *.npy clips                      → DMCGB hard / DAVIS
    # Empty → procedural pools; "auto" → first existing path listed in
    # setup/config.cfg's "datasets".
    external_data_dir: str = ""
    # procedural overlay-pool band: "narrow" (single-octave ±3·2π — every
    # committed pre-round-4 generalization result), "palette" (narrow
    # field recentred on a per-image random dominant color — the Places365
    # palette-diversity property; fixes the video_hard camouflage failure
    # mode, data/overlay.py), "mix" (p=0.5 narrow/palette per image — the
    # production compromise: palette alone drags clean-task learning,
    # runs/flag_r4pal) or "wide" (two
    # octaves to ±5·2π covering the video_hard test band — measured
    # NEGATIVE as a default: runs/flag_r2b train 690 vs 896, see
    # data/overlay.py:synth_images)
    overlay_band: str = "narrow"
    video_pool: str = "dmcgb"    # video_easy/hard clip-pool statistics:
    # "dmcgb" (default) resamples the hard pool's per-clip dominant colors
    # out of the saturated-warm band so the procedural stand-in matches
    # real DAVIS/DMCGB dominant-color statistics (the uniform pool was
    # harsher than the reference benchmark in exactly that one dimension —
    # round-4 camouflage study, data/videos.py); "harsh" keeps the original
    # uniform-RGB pool (~19% warm-camouflage clips) for pre-round-5
    # reproducibility and as a harder robustness probe

    # ---- TPU-native additions (no reference equivalent) ----
    num_envs: int = 1            # vectorized env batch per experiment
    render_size: int = 84        # observation render resolution (pre-crop);
                                 # 84 = derive from the algorithm crop policy
                                 # (100 for rad/curl/pad/soda)
    eval_render_size: int = 448  # video-recorder resolution (reference: src/video.py:12)
    mesh_data_axis: int = 1      # data-parallel mesh extent (1 = single chip)
    obs_dtype: str = "uint8"
    precision: str = "bf16"      # trunk conv compute dtype: "bf16" | "f32"
    profile_dir: str = ""        # if set, jax.profiler traces the first
                                 # post-warmup episode chunk into this dir
    resume: bool = True          # auto-restore from <work_dir>/resume if a
                                 # checkpoint exists (reference CANNOT resume:
                                 # train.py:135-137 asserts the dir is new)
    checkpoint_replay: bool = False  # include env states + the full replay
                                 # ring in resume checkpoints (bit-identical
                                 # continuation; costs disk ∝ replay_capacity)
    guard_collapse: float = 0.0  # >0 → failure detection + elastic recovery
                                 # (SURVEY §5: the reference has neither): if a
                                 # chunk's mean episode reward falls below this
                                 # fraction of the best reward EMA, the trainer
                                 # rolls back to the latest resume checkpoint
                                 # with jittered RNG. Positive-reward tasks only
                                 # (the trigger requires best EMA > 0).
    guard_max_rollbacks: int = 3  # rollback budget before the guard disarms
    q_target_clip: float = 0.0   # >0 → clip the TD target to ±this value.
                                 # Safety rail against runaway critic targets.
                                 # The bound must account for frame-skip: one
                                 # replay transition spans action_repeat
                                 # control steps, so r_max = action_repeat ×
                                 # max per-control-step reward (walker: 4×1 →
                                 # bound 4/(1−γ) = 400, NOT 100). Measured
                                 # ablation (docs/PERF.md): an over-tight clip
                                 # (110, walker 16-env) silently caps learning
                                 # at ~reward 430 — pre-collapse Q values are
                                 # honest, not overestimates. Off by default
                                 # (reference parity).
    q_head_layernorm: bool = False  # LayerNorm before each hidden activation
                                 # in the twin Q-head MLPs. Stabilizer probe
                                 # for the late-training collapse study
                                 # (docs/PERF.md): slot policy / replay
                                 # corruption / entropy collapse / Q over-
                                 # estimation are all ruled out; the remaining
                                 # candidates are critic instability near the
                                 # reward optimum — critic-LayerNorm is the
                                 # literature's fix for exactly that class.
                                 # Off by default (reference parity).
    td_gate_latch: int = 750     # >0 → latch breaker: if the gate keeps the
    # agent frozen for this many CONSECUTIVE updates, treat the "burst" as
    # a loss-regime shift — snap the EMA to the observed loss, release the
    # freeze, zero the cooldown. The EMA ignores frozen losses by design,
    # so without this a sustained shift freezes the agent forever
    # (measured: runs/flag_r5 seed 2, fired=1.0 for >5k updates, policy
    # dead at ~50 reward). 750 = three 250-update chunks, safely above the
    # longest measured benign containment (~95% of one chunk). 0 disables.
    td_gate_cooldown: int = 0    # >0 → after a TD burst, freeze critic AND
    #                              actor/alpha for this many further updates
    #                              (containment for the measured sub-threshold
    #                              cascade, docs/PERF.md collapse signature)
    td_anomaly_gate: float = 10.0  # >0 → reject critic updates whose loss
                                 # exceeds this multiple of its own running
                                 # EMA. Measured collapse onset (docs/PERF.md,
                                 # runs/flag_r2): critic_loss bursts 24 → 228
                                 # (9.5×) within one 250-step chunk and the
                                 # policy is poisoned before the chunk ends —
                                 # the gate freezes critic params + optimizer
                                 # through the burst (actor keeps training
                                 # against the intact critic). Normal learning
                                 # never hits 10× the EMA (walker chunk means
                                 # vary 21-29 around EMA≈25), so steady-state
                                 # behavior is untouched. 0 disables
                                 # (exact reference parity).
    replay_policy: str = "fifo"  # episode-slot replacement once the ring is
                                 # full: "fifo" (reference semantics) or
                                 # "reservoir" (uniform-random victim slot —
                                 # geometric age tail keeps early diverse
                                 # data; counters replay homogenization at
                                 # high num_envs, data/replay.py)
    replay_capacity: int = 0     # 0 → derived: min(train_steps, 100_000).
                                 # Deliberate HBM-driven divergence: the reference
                                 # allocates capacity=train_steps (600k) of host RAM
                                 # (reference: train.py:148-153); an on-device uint8
                                 # frame ring at 600k steps is ~15 GB/env-stream
                                 # (SURVEY §7 hard part #6), so we cap at 100k and
                                 # let users raise it explicitly when HBM allows —
                                 # or set --replay_spill host for full reference
                                 # capacity behind a device working set.
    replay_spill: str = "none"   # "host": keep the FULL replay_capacity in a
                                 # host-RAM ring (reference semantics,
                                 # train.py:148-153) behind the HBM working
                                 # set; episodes spill D2H and random host
                                 # episodes refresh device slots at each
                                 # fused-chunk boundary (data/spill.py) — no
                                 # per-step host traffic.
    replay_spill_refresh: int = 2  # host→device episodes uploaded per chunk
                                 # boundary when replay_spill=host. Default
                                 # sized for the axon TUNNEL's ~50 MB/s H2D
                                 # (refresh 8 measured +40% chunk time at
                                 # num_envs=1; 2 ≈ <10%); on a standard
                                 # PCIe TPU host the exchange is <1% even
                                 # at 8 — raise it there for faster
                                 # working-set mixing.
    replay_device_capacity: int = 100_000  # HBM working-set size (steps) when
                                 # replay_spill=host (docs/PERF.md HBM table:
                                 # 200k fits at 16 envs beside the sgsac
                                 # program; 100k is the safe default)

    # derived (set by finalize)
    image_size: int = 84
    image_crop_size: int = 84

    def finalize(self) -> "Config":
        """Validate and apply the reference's post-parse derivations."""
        assert self.algorithm in ALGORITHMS, (
            f'specified algorithm "{self.algorithm}" is not supported'
        )
        if self.eval_mode is not None:
            assert self.eval_mode in EVAL_MODES, (
                f'specified mode "{self.eval_mode}" is not supported'
            )
        assert self.distracting_cs_intensity in DISTRACTING_CS_INTENSITIES, (
            f"distracting_cs has only been implemented for intensities: "
            f"{DISTRACTING_CS_INTENSITIES}"
        )
        updates = {}
        eval_mode = None if self.eval_mode == "none" else self.eval_mode
        updates["eval_mode"] = eval_mode
        # crop policy (reference: arguments.py:137-142)
        if self.algorithm in {"rad", "curl", "pad", "soda"}:
            updates["image_size"] = 100
            updates["image_crop_size"] = 84
        else:
            updates["image_size"] = 84
            updates["image_crop_size"] = 84
        if self.render_size == 84:  # untouched default → follow crop policy
            updates["render_size"] = updates["image_size"]
        else:
            updates["render_size"] = self.render_size
        if self.replay_capacity == 0:
            # spill mode restores the reference default (train.py:148-153:
            # capacity = train_steps); device-only mode caps for HBM
            updates["replay_capacity"] = (
                self.train_steps if self.replay_spill == "host"
                else min(self.train_steps, 100_000))
        assert self.replay_spill in ("none", "host"), self.replay_spill
        return dataclasses.replace(self, **updates)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def load_data_config(key=None, path=None):
    """Read the JSON dataset-path config (reference: setup/config.cfg via
    utils.load_config, src/utils.py:60-66). Returns {} / [] when absent."""
    import json
    import os

    path = path or os.path.join("setup", "config.cfg")
    if not os.path.exists(path):
        return [] if key else {}
    with open(path) as f:
        data = json.load(f)
    if key is not None:
        return data.get(key, [])
    return data


def resolve_data_dir(cfg: "Config") -> str:
    """Resolve `external_data_dir`: verbatim path, or "auto" → the first
    existing directory listed under "datasets" in setup/config.cfg."""
    import os

    if cfg.external_data_dir != "auto":
        return cfg.external_data_dir
    for d in load_data_config("datasets"):
        if os.path.isdir(d):
            return d
    return ""


_INT_K_FIELDS = {"train_steps", "save_freq", "eval_freq"}


def parse_args(argv=None) -> Config:
    """CLI entry: same flag names as the reference (src/arguments.py)."""
    parser = argparse.ArgumentParser()
    for f in dataclasses.fields(Config):
        if f.name in ("image_size", "image_crop_size"):
            continue  # derived
        arg = f"--{f.name}"
        if f.type == "bool" or isinstance(f.default, bool):
            # BooleanOptionalAction: `--flag` stays reference-compatible AND
            # default-True extras (resume, ...) get a working `--no-flag`
            # spelling (plain store_true made them CLI-unswitchable)
            parser.add_argument(arg, default=f.default,
                                action=argparse.BooleanOptionalAction)
        elif f.name in _INT_K_FIELDS:
            parser.add_argument(arg, default=f.default, type=str)
        elif f.name == "eval_mode":
            parser.add_argument(arg, default=f.default, type=str)
        else:
            ty = type(f.default) if f.default is not None else str
            parser.add_argument(arg, default=f.default, type=ty)
    ns = parser.parse_args(argv)
    kw = vars(ns)
    for k in _INT_K_FIELDS:
        kw[k] = _parse_k(kw[k])
    return Config(**kw).finalize()
