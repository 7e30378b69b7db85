"""Training loop shared by the DMC and CARLA drivers.

Mirrors the reference experiment driver (reference: src/train.py:67-256):
work dir `logs/<domain>_<task>/<algo>/<seed>`, info.log metadata, JSONL
train/eval logs, periodic evaluation on train + per-mode test envs,
periodic checkpoints. Differences, all deliberate (SURVEY §5/§7):

  * N vectorized envs step in lockstep on device; `step` still counts
    wrapper steps per env, so flags keep their reference meaning;
  * the update is one jitted program (sample→augment→grads→optimizers);
  * checkpoints are full-state (params+opt+rng) and resumable — the
    reference asserts the work dir does NOT exist (train.py:135-137) and
    can only save.
"""

from __future__ import annotations

import json
import os
import subprocess
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sgqn_carla_tpu.agents import make_agent
from sgqn_carla_tpu.core import checkpoint as ckpt
from sgqn_carla_tpu.core.config import Config
from sgqn_carla_tpu.core.logger import Logger
from sgqn_carla_tpu.data.replay import ReplayBuffer
from sgqn_carla_tpu.envs import make_env
from sgqn_carla_tpu.envs.vector import VectorEnv
from sgqn_carla_tpu.train.video import VideoRecorder

# metric-name map: agent metrics → reference logger keys
_METRIC_KEYS = {
    "critic_loss": "train_critic/loss",
    "actor_loss": "train_actor/loss",
    "alpha_loss": "train_alpha/loss",
    "alpha_value": "train_alpha/value",
    "aux_loss": "train/aux_loss",
}


def work_dir_for(cfg: Config) -> str:
    return os.path.join(cfg.log_dir, f"{cfg.domain_name}_{cfg.task_name}",
                        cfg.algorithm, str(cfg.seed))


def write_info(cfg: Config, work_dir: str):
    """Run metadata: git hash + args (reference: utils.py:48-57)."""
    try:
        git = subprocess.check_output(
            ["git", "rev-parse", "HEAD"], stderr=subprocess.DEVNULL
        ).decode().strip()
    except Exception:
        git = "unknown"
    with open(os.path.join(work_dir, "info.log"), "w") as f:
        f.write(json.dumps({"timestamp": time.time(), "git": git,
                            "args": cfg.__dict__}, default=str) + "\n")


def _reset_burst_log(astate):
    """Clear the burst snapshot's valid flag (after a drain or a restore —
    a restored checkpoint can carry a stale already-dumped snapshot whose
    set flag would block the next burst from being recorded)."""
    if getattr(astate, "burst_log", None) is None:
        return astate
    return astate.replace(
        burst_log={**astate.burst_log, "valid": jnp.int32(0)})


def _append_jsonl(work_dir: str, rec: Dict):
    with open(os.path.join(work_dir, "burst_log.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")


def drain_burst_log(work_dir: str, astate, metrics: Dict, step: int,
                    rollbacks: int, last_rollback):
    """Persist the agent's burst-forensics snapshot when the TD gate fired
    inside the chunk (docs/PERF.md open collapse trigger): the first flagged
    minibatch's replay slots, their write ordinals (ages), per-sample TD
    errors, plus the driver's rollback context — the data the boundary-slot
    vs tail-of-distribution hypothesis test needs. One host pull per
    firing chunk; zero cost otherwise."""
    if getattr(astate, "burst_log", None) is None or not metrics:
        return astate
    if float(np.asarray(metrics.get("td_gate_fired", 0.0))) <= 0:
        return astate
    bl = jax.device_get(astate.burst_log)
    if not int(bl["valid"]):
        return astate
    ages = (int(bl["ep_counter"]) - bl["slot_ep"]).tolist()
    _append_jsonl(work_dir, {
        "type": "burst", "chunk_step": step,
        "update_step": int(bl["step"]),
        "ring_ep_counter": int(bl["ep_counter"]),
        "rollbacks_so_far": rollbacks, "last_rollback": last_rollback,
        "env_i": bl["env_i"].tolist(), "ep_i": bl["ep_i"].tolist(),
        "s": bl["s"].tolist(), "slot_ep": bl["slot_ep"].tolist(),
        "age_eps": ages, "reward": np.round(bl["reward"], 4).tolist(),
        "td1": np.round(bl["td1"], 3).tolist(),
        "td2": np.round(bl["td2"], 3).tolist()})
    return _reset_burst_log(astate)


def evaluate(agent, astate, env, num_episodes: int, rng,
             video: Optional[VideoRecorder] = None,
             video_name: str = "") -> np.ndarray:
    """Run `num_episodes` eval episodes in parallel (one env per episode),
    deterministic policy (reference: train.py:29-64 evaluate). Returns the
    per-episode reward array — callers take `.mean()` for the headline
    number; offline eval persists the full array so episode variance is
    reportable (reference eval.py:107-112 role).

    The whole rollout — act → step (→ 448² render for the video) — is one
    jitted `lax.scan`: a single device dispatch and a single host pull per
    eval call. The per-step loop paid two dispatches per step, which the
    runtime's fixed ~26 ms dispatch overhead (docs/PERF.md) turned into
    ~13 s per eval mode (round-1 VERDICT weak #6)."""
    venv = VectorEnv(env, num_episodes)
    record = video is not None and video.enabled
    height = video.height if record else 0
    # id()-keyed but identity-verified: a GC'd agent/env whose id is
    # recycled must not hit a rollout whose closure captured the OLD
    # objects (same guard as physics/dense.collision_program). The stored
    # references also keep the ids stable for the entry's lifetime.
    key = (id(agent), id(env), num_episodes, record, height)
    got = _EVAL_ROLLOUTS.get(key)
    rollout = (got[2] if got is not None
               and got[0] is agent and got[1] is env else None)
    if rollout is None:
        def rollout_fn(astate, states, obs):
            def body(carry, _):
                states, obs = carry
                actions = agent._select_action(astate, obs)
                states, res = venv.step(states, actions)
                frame = (env.render_eval(
                    jax.tree_util.tree_map(lambda x: x[0], states),
                    height) if record else jnp.int32(0))
                return (states, res.obs), (res.reward, frame)

            (states, obs), (rewards, frames) = jax.lax.scan(
                body, (states, obs), None, length=env.max_episode_steps)
            return rewards.sum(0), frames

        rollout = jax.jit(rollout_fn)
        _EVAL_ROLLOUTS[key] = (agent, env, rollout)

    states, obs = venv.reset(rng)
    totals, frames = rollout(astate, states, obs)
    if record:
        video.record_frames(frames)
    if video is not None:
        video.save(video_name)
    return np.asarray(totals)


# trace-cached fused eval rollouts, keyed by (agent, env, episodes, video)
_EVAL_ROLLOUTS: Dict = {}


def run_training(cfg: Config, env_factory=make_env) -> Dict:
    """Train per `cfg`; returns summary stats. `env_factory` lets the CARLA
    driver reuse this loop with its twin env."""
    work_dir = work_dir_for(cfg)
    os.makedirs(work_dir, exist_ok=True)
    write_info(cfg, work_dir)
    L = Logger(work_dir)
    video_dir = os.path.join(work_dir, "video")
    model_dir = os.path.join(work_dir, "model")
    video = VideoRecorder(video_dir if cfg.save_video else None,
                          height=cfg.eval_render_size,
                          width=cfg.eval_render_size,
                          enabled=cfg.save_video)

    from sgqn_carla_tpu.core.config import resolve_data_dir
    data_dir = resolve_data_dir(cfg)

    env = env_factory(
        domain_name=cfg.domain_name, task_name=cfg.task_name, seed=cfg.seed,
        episode_length=cfg.episode_length, action_repeat=cfg.action_repeat,
        frame_stack=cfg.frame_stack, image_size=cfg.image_size, mode="train",
        external_data_dir=data_dir, video_pool=cfg.video_pool)
    test_envs: List = []
    test_modes: List[str] = []
    eval_modes = (["color_hard", "video_easy", "video_hard"]
                  if cfg.eval_mode == "all"
                  else [cfg.eval_mode] if cfg.eval_mode not in (None, "train")
                  else [])
    if cfg.domain_name == "carla":
        # the CARLA twin supports train/color_* only (reference
        # train_carla.py:98-152 builds exactly a color_easy test env);
        # video modes would raise in the env constructor
        eval_modes = [m for m in eval_modes if m.startswith("color")]
        if cfg.eval_mode == "all":
            eval_modes = ["color_easy"]
    for m in eval_modes:
        test_envs.append(env_factory(
            domain_name=cfg.domain_name, task_name=cfg.task_name,
            seed=cfg.seed + 42, episode_length=cfg.episode_length,
            action_repeat=cfg.action_repeat, frame_stack=cfg.frame_stack,
            image_size=cfg.image_size, mode=m,
            intensity=cfg.distracting_cs_intensity,
            external_data_dir=data_dir, video_pool=cfg.video_pool))
        test_modes.append(m)

    venv = VectorEnv(env, cfg.num_envs)
    spill = None
    device_capacity = cfg.replay_capacity
    if cfg.replay_spill == "host":
        # full reference capacity in host RAM behind the HBM working set
        # (data/spill.py); the device ring samples as usual inside the
        # fused chunk, episodes exchange at chunk boundaries only
        device_capacity = min(cfg.replay_device_capacity, cfg.replay_capacity)
    buffer = ReplayBuffer(
        num_envs=cfg.num_envs, episode_len=env.max_episode_steps,
        capacity=device_capacity, image_size=cfg.image_size,
        action_size=env.action_size, frame_stack=cfg.frame_stack,
        batch_size=cfg.batch_size, policy=cfg.replay_policy)
    rstate = buffer.init()
    if cfg.replay_spill == "host" and cfg.replay_capacity > device_capacity:
        assert cfg.mesh_data_axis <= 1, (
            "replay_spill=host is single-chip for now (the chunk-boundary "
            "exchange would need per-shard transfers under a mesh)")
        from sgqn_carla_tpu.data.spill import HostSpill
        spill = HostSpill(buffer, capacity=cfg.replay_capacity,
                          refresh=cfg.replay_spill_refresh, seed=cfg.seed)

    agent = make_agent((3 * cfg.frame_stack, cfg.image_crop_size,
                        cfg.image_crop_size), (env.action_size,), cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    rng, k_init, k_env = jax.random.split(rng, 3)
    astate = agent.init_state(k_init)

    # ---- multi-chip mesh: env batch / replay sharded over `data`,
    # parameters + optimizer state replicated (gradient combination =
    # XLA-inserted psum over ICI). SURVEY §2.4: data parallelism over the
    # env batch IS the production multi-chip layout for this workload.
    mesh = None
    if cfg.mesh_data_axis > 1:
        from sgqn_carla_tpu import parallel as par

        assert cfg.num_envs % cfg.mesh_data_axis == 0, (
            f"num_envs={cfg.num_envs} must divide over "
            f"mesh_data_axis={cfg.mesh_data_axis}")
        mesh = par.make_mesh(par.MeshSpec(data=cfg.mesh_data_axis))

    def shard_env(tree):
        if mesh is None:
            return tree
        return par.put_env_batch(tree, mesh, cfg.num_envs)

    def shard_repl(tree):
        if mesh is None:
            return tree
        return par.put_replicated(tree, mesh)

    astate = shard_repl(astate)
    states, obs = venv.reset(k_env)
    states, obs = shard_env(states), shard_env(obs)
    rstate = shard_env(jax.jit(buffer.add_reset)(rstate, obs))
    # donate the ring: add_reset at every episode boundary would otherwise
    # hold input AND output copies of the replay ring (the HBM-dominant
    # buffer) while it runs
    add_reset_fn = jax.jit(buffer.add_reset, donate_argnums=(0,))

    from sgqn_carla_tpu.train.fused import FusedTrainer

    trainer = FusedTrainer(agent, venv, buffer)
    ep_len = env.max_episode_steps

    episode = 0
    step = 0  # wrapper steps per env (reference `step` semantics)
    start = time.time()
    total_steps = cfg.train_steps
    last_metrics = {}
    caught_up = cfg.init_steps <= 0
    next_eval = cfg.eval_freq
    next_save = cfg.save_freq
    next_viz = 10_000

    # ---- failure detection + elastic recovery (SURVEY §5: the reference
    # has neither). A late-training Q-divergence event can knock a
    # near-optimal policy over in one chunk with no recourse (observed on
    # walker sgsac at num_envs=16: reward 888 → 35, docs/PERF.md); with
    # guard_collapse > 0 the trainer detects the cliff and rolls back to
    # the latest resume checkpoint with jittered RNG so the replayed
    # segment diverges. SGQN_FAULT_INJECT_COLLAPSE=<step> fakes one
    # collapsed chunk at <step> (fault-injection hook for tests).
    reward_ema = None
    best_ema = 0.0
    rollbacks = 0
    last_rollback = None  # {"to_step", "at_step", "ring_ep_counter"} context
    #                       stamped onto burst-forensics records
    _fault = os.environ.get("SGQN_FAULT_INJECT_COLLAPSE")
    fault_at = int(_fault) if _fault else None

    # ---- true resume (reference CANNOT: train.py:135-137 asserts the work
    # dir does not exist; optimizer/rng/replay never persisted — SURVEY §5).
    # The resume checkpoint snapshots the loop state exactly at the top of
    # the while loop: agent (params + all optimizer states + agent rng),
    # driver rng, counters, and — when cfg.checkpoint_replay — the env
    # states, obs, and the full replay ring, so a killed run continues
    # bit-identically.
    resume_dir = os.path.join(work_dir, "resume")
    rewarm_until = -1  # no-update replay rewarm horizon after partial resume
    if cfg.resume:
        last = ckpt.latest_step(resume_dir)
        if last is not None:
            full_like = {"astate": astate, "rng": rng, "episode": 0,
                         "caught_up": False, "next_eval": 0, "next_save": 0,
                         "next_viz": 0}
            if cfg.checkpoint_replay:
                full_like.update(states=states, obs=obs, rstate=rstate)
            restored = ckpt.restore(resume_dir, last, full_like)
            if restored is not None:
                to_dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
                astate = shard_repl(to_dev(restored["astate"]))
                rng = jnp.asarray(restored["rng"])
                step = last
                episode = int(restored["episode"])
                caught_up = bool(restored["caught_up"])
                next_eval = int(restored["next_eval"])
                next_save = int(restored["next_save"])
                next_viz = int(restored["next_viz"])
                if cfg.checkpoint_replay:
                    states = shard_env(to_dev(restored["states"]))
                    obs = shard_env(jnp.asarray(restored["obs"]))
                    rstate = shard_env(to_dev(restored["rstate"]))
                else:
                    # the replay ring was NOT checkpointed — it is empty now.
                    # Updating against it immediately would train on garbage
                    # batches and destroy the restored policy within one
                    # chunk (observed: walker sgsac reward 380 → 50 in one
                    # episode). Rewarm: collect with the restored policy,
                    # no updates, until the ring holds init_steps fresh steps.
                    rewarm_until = step + max(cfg.init_steps, 0)
                astate = _reset_burst_log(astate)
                print(f"Resumed from {resume_dir} at step {step}")

    # The fused chunk DONATES astate and rstate; the TPU runtime rejects a
    # donation set where one device buffer appears twice (measured:
    # INVALID_ARGUMENT on the first donated call). init/restore paths can
    # legitimately produce value-equal leaves (params ↔ targets, SODA EMA)
    # — one eager deep copy guarantees every donated leaf owns its buffer.
    astate = jax.tree_util.tree_map(jnp.copy, astate)
    rstate = jax.tree_util.tree_map(jnp.copy, rstate)

    while step < total_steps:
        # ---- one fused episode chunk: act → env → replay [→ update] × T
        length = min(ep_len, total_steps - step)
        spill_slot = (int(jax.device_get(rstate.ep_ptr))
                      if spill is not None and length == ep_len else None)
        if step + length <= cfg.init_steps:
            rng, k = jax.random.split(rng)
            states, rstate, obs, _, ep_rewards = trainer.random_chunk(
                length, states, rstate, obs, k)
            metrics = {}
        else:
            if not caught_up:
                # reference init_steps update burst (train.py:241-246)
                astate, _ = trainer.catch_up(cfg.init_steps, astate, rstate)
                caught_up = True
            rng, k = jax.random.split(rng)
            profiling = bool(cfg.profile_dir) and episode == (
                cfg.init_steps // ep_len + 2)
            if profiling:  # trace one steady-state chunk (SURVEY §5: the
                # reference has no profiler hooks; we bake them in)
                jax.profiler.start_trace(cfg.profile_dir)
            astate, states, rstate, obs, _, ep_rewards, metrics = (
                trainer.run_chunk(length, step >= rewarm_until, astate,
                                  states, rstate, obs, k))
            if profiling:
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready()
                    if hasattr(x, "block_until_ready") else x, ep_rewards)
                jax.profiler.stop_trace()
        step += length

        if spill_slot is not None:
            # chunk boundary: spill the completed episode, refresh the
            # device working set from the host window (data/spill.py)
            rstate = spill.after_chunk(rstate, spill_slot)

        ep_reward = float(np.asarray(ep_rewards).mean())
        L.log("train/episode_reward", ep_reward, step)
        L.log("train/episode", episode, step)
        L.log("train/duration", time.time() - start, step)
        for k2, v in metrics.items():
            L.log(_METRIC_KEYS.get(k2, f"train/{k2}"), v, step)
            last_metrics[k2] = float(np.asarray(v))
        astate = drain_burst_log(work_dir, astate, metrics, step,
                                 rollbacks, last_rollback)
        L.dump(step)
        start = time.time()
        episode += 1

        # ---- reset all envs (lockstep episodes; DMC has no early term)
        rng, k_r = jax.random.split(rng)
        states, obs = venv.reset(k_r)
        states, obs = shard_env(states), shard_env(obs)
        rstate = add_reset_fn(rstate, obs)

        # ---- collapse guard: detect the cliff, roll back, jitter, continue
        if fault_at is not None and step >= fault_at:
            ep_reward, fault_at = 0.0, None  # injected fault (tests)
        if not np.isfinite(ep_reward):
            # a NaN episode IS a collapse: NaN fails every ordered
            # comparison, so without this the guard never fires and the
            # reward EMA is poisoned forever (runs/flag_r5 seed 2 zombied
            # from 214.25k to the end exactly this way). The raw value was
            # already logged above; the guard sees a zero.
            ep_reward = 0.0
        reward_ema = (ep_reward if reward_ema is None
                      else 0.9 * reward_ema + 0.1 * ep_reward)
        best_ema = max(best_ema, reward_ema)
        if (cfg.guard_collapse > 0.0 and caught_up
                and rollbacks < cfg.guard_max_rollbacks and best_ema > 0.0
                and ep_reward < cfg.guard_collapse * best_ema):
            # health-aware target: a periodic save can land ON the collapse
            # chunk (measured in runs/flag_r2 — save_freq boundary at the
            # second cliff), and rolling back to a poisoned checkpoint burns
            # the whole budget re-collapsing instantly. Skip saves whose
            # recorded reward level was already below 0.5 × best.
            last = ckpt.healthy_step(resume_dir, best_ema)
            detect_step = step  # the pre-rollback step (the restore below
            #                     rewinds `step`; forensics want both)
            if last is not None and last < step:
                full_like = {"astate": astate, "rng": rng, "episode": 0,
                             "caught_up": False, "next_eval": 0,
                             "next_save": 0, "next_viz": 0}
                if cfg.checkpoint_replay:
                    full_like.update(states=states, obs=obs, rstate=rstate)
                restored = ckpt.restore(resume_dir, last, full_like)
                if restored is not None:
                    rollbacks += 1
                    to_dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
                    astate = shard_repl(to_dev(restored["astate"]))
                    # jittered RNG: a bit-identical replay would collapse at
                    # the same point; fold in the rollback ordinal instead
                    rng = jax.random.fold_in(
                        jnp.asarray(restored["rng"]), 1_000_003 + rollbacks)
                    step = last
                    episode = int(restored["episode"])
                    caught_up = bool(restored["caught_up"])
                    next_eval = int(restored["next_eval"])
                    next_save = int(restored["next_save"])
                    next_viz = int(restored["next_viz"])
                    if cfg.checkpoint_replay:
                        states = shard_env(to_dev(restored["states"]))
                        obs = shard_env(jnp.asarray(restored["obs"]))
                        rstate = shard_env(to_dev(restored["rstate"]))
                    else:
                        # the ring holds collapse-era data; rebuild it fresh
                        # and rewarm with the restored policy (same protocol
                        # as a process-level partial resume above)
                        rng, k_g = jax.random.split(rng)
                        states, obs = venv.reset(k_g)
                        states, obs = shard_env(states), shard_env(obs)
                        rstate = shard_env(add_reset_fn(buffer.init(), obs))
                        rewarm_until = step + max(cfg.init_steps, 0)
                        if spill is not None:
                            # the host window has absorbed collapse-era
                            # episodes too — drop it with the device ring
                            spill.reset()
                    astate = _reset_burst_log(astate)
                    last_rollback = {
                        "to_step": last, "at_step": detect_step,
                        "ring_ep_counter": int(jax.device_get(
                            rstate.ep_counter))}
                    _append_jsonl(work_dir, {"type": "rollback",
                                             "detected_reward": ep_reward,
                                             "rollback": rollbacks,
                                             **last_rollback})
                    print(f"Collapse guard: reward {ep_reward:.1f} < "
                          f"{cfg.guard_collapse:.2f} x best {best_ema:.1f}; "
                          f"rolled back to step {last} "
                          f"({rollbacks}/{cfg.guard_max_rollbacks})")
                    continue

        # ---- periodic evaluation (reference: train.py:184-204)
        if cfg.eval_mode is not None and step >= next_eval:
            next_eval += cfg.eval_freq * ((step - next_eval) // cfg.eval_freq + 1)
            rng, k_ev = jax.random.split(rng)
            video.init(enabled=True)
            L.log("eval/episode_reward",
                  float(evaluate(agent, astate, env, cfg.eval_episodes, k_ev,
                                 video, f"{step}.mp4").mean()), step)
            for te, tm in zip(test_envs, test_modes):
                rng, k_te = jax.random.split(rng)
                L.log(f"eval/episode_reward_test_env_{tm}",
                      float(evaluate(agent, astate, te, cfg.eval_episodes,
                                     k_te).mean()), step)
            L.dump(step)

        # ---- SGQN attribution imagery every 10k steps
        # (reference: sgsac.py:99-102 tensorboard logging cadence)
        if cfg.algorithm == "sgsac" and step >= next_viz and caught_up:
            next_viz += 10_000 * ((step - next_viz) // 10_000 + 1)
            from sgqn_carla_tpu.agents.visualize import save_attribution_images
            from sgqn_carla_tpu.ops import augment

            rng, k_v, k_c, k_o, k_a = jax.random.split(rng, 5)
            batch = buffer.sample_raw(rstate, k_v, 4)
            vb_obs = augment.random_crop(k_c, batch.obs, cfg.image_crop_size)
            out_dir = os.path.join(work_dir, "output")
            save_attribution_images(
                agent, astate, np.asarray(vb_obs), np.asarray(batch.action),
                out_dir, step)
            # the reference also dumps the two augmented views: s̃ (overlay)
            # and s′ (attribution_augmentation) — sgsac.py:99-102
            from sgqn_carla_tpu.ops.guided_backprop import (
                compute_attribution_mask)
            obs_f = jnp.asarray(vb_obs, jnp.float32)
            act_f = jnp.asarray(batch.action, jnp.float32)
            grad = agent.attribution_grad(astate.params, obs_f, act_f)
            mask = compute_attribution_mask(grad, agent.quantile)
            s_tilde = augment.random_overlay(k_o, obs_f, agent.overlay_pool,
                                             cfg.alpha_blending)
            s_prime = augment.attribution_augmentation(
                k_a, obs_f, mask, agent.overlay_pool)
            save_attribution_images(
                agent, astate, np.asarray(s_tilde), np.asarray(batch.action),
                out_dir, step, prefix="augmented")
            save_attribution_images(
                agent, astate, np.asarray(s_prime), np.asarray(batch.action),
                out_dir, step, prefix="super_augmented")

        # ---- periodic checkpoint (reference: train.py:206-219)
        if step >= next_save:
            next_save += cfg.save_freq * ((step - next_save) // cfg.save_freq + 1)
            # weights-only checkpoint: reference-parity format, consumed by
            # the offline eval driver (train/eval.py)
            ckpt.save(model_dir,
                      {"params": astate.params,
                       "target_params": astate.target_params,
                       "log_alpha": astate.log_alpha,
                       "aux_params": astate.aux_params}, step)
            # full resume checkpoint: loop state at the top of the while loop
            full = {"astate": astate, "rng": rng, "episode": episode,
                    "caught_up": caught_up, "next_eval": next_eval,
                    "next_save": next_save, "next_viz": next_viz}
            if cfg.checkpoint_replay:
                full.update(states=states, obs=obs, rstate=rstate)
            ckpt.save(resume_dir, full, step)
            # health sidecar for the collapse guard's rollback-target choice
            ckpt.record_health(resume_dir, step, ep_reward,
                               reward_ema if reward_ema is not None else 0.0)

    print("Completed training for", work_dir)
    return {"work_dir": work_dir, "episodes": episode,
            "rollbacks": rollbacks, "final_metrics": last_metrics}
