"""Offline evaluation CLI (reference: src/eval.py).

Loads a saved checkpoint, runs eval episodes in the requested mode, writes
an `eval_<mode>.json` results file (the reference writes a torch .pt of the
same payload, eval.py:107-112). Includes the PAD test-time adaptation branch
(reference: eval.py:94-104)."""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from sgqn_carla_tpu.agents import make_agent
from sgqn_carla_tpu.core import checkpoint as ckpt
from sgqn_carla_tpu.core.config import parse_args, resolve_data_dir
from sgqn_carla_tpu.envs import make_env
from sgqn_carla_tpu.train.loop import evaluate, work_dir_for
from sgqn_carla_tpu.train.video import VideoRecorder


def main(argv=None):
    from sgqn_carla_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()
    cfg = parse_args(argv)
    work_dir = work_dir_for(cfg)
    model_dir = os.path.join(work_dir, "model")

    env = make_env(
        domain_name=cfg.domain_name, task_name=cfg.task_name,
        seed=cfg.seed + 42, episode_length=cfg.episode_length,
        action_repeat=cfg.action_repeat, frame_stack=cfg.frame_stack,
        image_size=cfg.image_size, mode=cfg.eval_mode or "train",
        intensity=cfg.distracting_cs_intensity,
        external_data_dir=resolve_data_dir(cfg), video_pool=cfg.video_pool)

    agent = make_agent((3 * cfg.frame_stack, cfg.image_crop_size,
                        cfg.image_crop_size), (env.action_size,), cfg)
    astate = agent.init_state(jax.random.PRNGKey(cfg.seed))

    # checkpoint selection mirrors the reference: eval.py:86 loads
    # model_dir/<train_steps>.pt — prefer the checkpoint at --train_steps,
    # fall back to the latest one
    step = ckpt.latest_step(model_dir)
    assert step is not None, f"no checkpoint under {model_dir}"
    # both checkpoint layouts: orbax step directory, or the dependency-free
    # numpy fallback's <step>.npz file (core/checkpoint.py:48)
    wanted = os.path.join(model_dir, str(cfg.train_steps))
    if os.path.isdir(wanted) or os.path.isfile(wanted + ".npz"):
        step = cfg.train_steps
    like = {"params": astate.params, "target_params": astate.target_params,
            "log_alpha": astate.log_alpha, "aux_params": astate.aux_params}
    restored = ckpt.restore(model_dir, step, like)
    astate = astate.replace(**restored)

    video = VideoRecorder(
        os.path.join(work_dir, "video") if cfg.save_video else None,
        height=cfg.eval_render_size, width=cfg.eval_render_size,
        enabled=cfg.save_video)

    # distracting_cs results are per-intensity — key the output files so a
    # multi-intensity sweep doesn't overwrite itself (the reference's
    # eval.py:107-112 <mode>.pt naming would)
    mode_tag = cfg.eval_mode or "train"
    if mode_tag == "distracting_cs":
        mode_tag += f"_{cfg.distracting_cs_intensity}"

    rng = jax.random.PRNGKey(cfg.seed + 1)
    episode_rewards = evaluate(agent, astate, env, cfg.eval_episodes, rng,
                               video, f"eval_{mode_tag}.mp4")
    reward = float(episode_rewards.mean())
    print(f"Average episode reward: {round(reward, 2)}")

    # per-episode payload: the reference's results .pt records the scalar
    # only (eval.py:107-112); the collapse/generalization studies need the
    # across-episode variance, so persist the full array too
    out = {"args": {k: str(v) for k, v in cfg.__dict__.items()},
           "step": step, "reward": reward,
           "episode_rewards": [float(r) for r in episode_rewards]}

    if cfg.algorithm == "pad":
        # PAD reports BOTH the frozen-policy reward above and the test-time
        # adapted reward (reference: eval.py:94-112 reward + adapt_reward)
        rng, k_ad = jax.random.split(rng)
        adapt_rewards = _evaluate_pad(agent, astate, env, cfg, k_ad)
        out["adapt_reward"] = float(adapt_rewards.mean())
        out["adapt_episode_rewards"] = [float(r) for r in adapt_rewards]
        print(f"Adapted episode reward: {round(out['adapt_reward'], 2)}")

    with open(os.path.join(work_dir, f"eval_{mode_tag}.json"), "w") as f:
        json.dump(out, f)
    return reward


def _evaluate_pad(agent, astate, env, cfg, rng) -> np.ndarray:
    """PAD: adapt the inverse-dynamics head online during evaluation
    (reference: eval.py:16-41 — per-step update_inverse_dynamics, with a
    fresh agent copy per episode).

    Fused: episodes run in parallel (one per-episode AgentState, vmapped)
    and the whole act → env step → adapt cadence is one `lax.scan` — one
    device dispatch per eval instead of one per step. The per-step host
    loop paid the runtime's fixed ~26 ms dispatch tax twice per step
    (docs/PERF.md), ~52 s per 1000-step episode."""
    import jax.numpy as jnp

    from sgqn_carla_tpu.envs.vector import VectorEnv

    n = cfg.eval_episodes
    venv = VectorEnv(env, n)
    # episodic agent copies (reference deepcopies the agent per episode)
    astates = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n,) + x.shape), astate)

    def body(carry, _):
        astates, states, obs, rng = carry
        rng, k = jax.random.split(rng)
        actions = jax.vmap(
            lambda a, o: agent._select_action(a, o[None])[0])(astates, obs)
        states, res = venv._step(states, actions)
        ks = jax.random.split(k, n)
        astates, _ = jax.vmap(agent.adapt)(astates, ks, obs, res.obs, actions)
        return (astates, states, res.obs, rng), res.reward

    @jax.jit
    def rollout(astates, states, obs, rng):
        (_, _, _, _), rewards = jax.lax.scan(
            body, (astates, states, obs, rng), None,
            length=env.max_episode_steps)
        return rewards.sum(0)

    rng, k_r = jax.random.split(rng)
    states, obs = venv.reset(k_r)
    return np.asarray(rollout(astates, states, obs, rng))


if __name__ == "__main__":
    main()
