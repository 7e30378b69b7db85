"""SAC from pixels — the base agent (jitted, functional).

Behavioral port of the reference SAC (reference: src/algorithms/sac.py):
shared CNN trunk between actor and critic (:29-44), tanh-squashed Gaussian
actor, twin Q critics with a target copy (:53-54), learnable log_alpha with
target entropy −|A| (:56-58), three Adam optimizers with the reference betas
(:60-68), clipped double-Q critic target (:107-123), delayed actor/alpha
updates and soft target updates with separate taus for Q heads vs encoder
(:125-158).

The whole update — replay sample → augmentation → losses → grads → optimizer
→ target EMA — is ONE jitted function over pytrees; frequency-gated branches
(actor every 2 steps, targets every 2) use `lax.cond`. `vmap`/`pjit` see a
pure `(AgentState, ReplayState, rng) -> AgentState` transformer.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from sgqn_carla_tpu.agents import nets
from sgqn_carla_tpu.core.config import Config
from sgqn_carla_tpu.data.replay import Batch, ReplayBuffer, ReplayState
from sgqn_carla_tpu.ops import augment


class AgentState(struct.PyTreeNode):
    params: Any                 # {"trunk", "actor", "critic"}
    target_params: Any          # {"trunk", "critic"}
    log_alpha: jnp.ndarray
    actor_opt: Any
    critic_opt: Any
    alpha_opt: Any
    step: jnp.ndarray
    rng: jnp.ndarray
    aux_params: Any = None      # algorithm-specific (CURL W, SGQN decoder, ...)
    aux_opt: Any = None
    aux_extra: Any = None       # e.g. SODA target predictor / batch stats
    critic_loss_ema: Any = None  # running critic-loss EMA for the TD-anomaly
    #                              gate (cfg.td_anomaly_gate, docs/PERF.md
    #                              collapse study); None when the gate is off
    gate_cooldown: Any = None   # int32 updates left in the post-burst freeze
    #                             (cfg.td_gate_cooldown); None when disabled.
    #                             Kept None unless configured so older
    #                             resume checkpoints keep their tree shape.
    gate_latch: Any = None      # int32 consecutive-frozen-update counter for
    #                             the latch breaker (cfg.td_gate_latch): the
    #                             gate's EMA deliberately ignores burst
    #                             losses, so a sustained loss-regime shift
    #                             freezes the agent FOREVER (measured live:
    #                             runs/flag_r5 seed 2, td_gate_fired=1.0 for
    #                             >5k consecutive updates, policy dead at
    #                             ~50 reward). None when disabled.
    burst_log: Any = None       # forensic snapshot of the FIRST gate-flagged
    #                             minibatch since the driver last drained it:
    #                             replay provenance (env/slot/step indices,
    #                             slot write ordinals) + per-sample TD errors
    #                             (docs/PERF.md open collapse trigger). Dict of
    #                             fixed-shape arrays; None when the gate is off.


def _init_burst_log(batch_size: int):
    """Empty burst-forensics snapshot (see AgentState.burst_log)."""
    zi = lambda *s: jnp.zeros(s, jnp.int32)
    zf = lambda *s: jnp.zeros(s, jnp.float32)
    B = batch_size
    return {"valid": jnp.int32(0), "step": jnp.int32(0),
            "ep_counter": jnp.int32(0),
            "env_i": zi(B), "ep_i": zi(B), "s": zi(B), "slot_ep": zi(B),
            "reward": zf(B), "td1": zf(B), "td2": zf(B)}


class SAC:
    """Static agent definition. All compute methods are pure; `update` and
    the action fns are jit-compiled once per (obs, action) shape."""

    name = "sac"

    def __init__(self, obs_shape: Tuple[int, ...], action_shape: Tuple[int, ...],
                 cfg: Config, overlay_pool: Optional[jnp.ndarray] = None):
        self.cfg = cfg
        self.obs_shape = obs_shape
        self.action_dim = int(np.prod(action_shape))
        self.discount = cfg.discount
        self.critic_tau = cfg.critic_tau
        self.encoder_tau = cfg.encoder_tau
        self.actor_update_freq = cfg.actor_update_freq
        self.critic_target_update_freq = cfg.critic_target_update_freq
        self.target_entropy = -float(np.prod(action_shape))
        self.overlay_pool = overlay_pool

        compute_dtype = (jnp.bfloat16 if cfg.precision == "bf16"
                         else jnp.float32)
        self._compute_dtype = compute_dtype
        # Grouped-conv packing of co-occurring trunk traversals
        # (nets.trunk_packed_apply): numerically equivalent, and ~1.2-1.4×
        # ONE traversal in the conv microbenchmark — but a measured NET
        # LOSS in the fused update on the chip (round-4 A/B, 3 reps:
        # sgsac 8.70 ms packed vs 6.36 ms separate at b128; XLA's CSE and
        # fusion do more for the separate forwards than grouping saves —
        # exactly docs/PERF.md's microbench-transfer caveat). Default OFF;
        # SGQN_PACKED=1 opts the packed formulation back in. The separate
        # path also restores the reference's actor-update encoder
        # recompute ordering (PARITY.md deviations note).
        self._packed = os.environ.get("SGQN_PACKED", "0") == "1"
        self.trunk_def = nets.Trunk(cfg.num_shared_layers, cfg.num_head_layers,
                                    cfg.num_filters, dtype=compute_dtype)
        self.actor_def = nets.ActorHead(
            self.action_dim, cfg.hidden_dim, cfg.projection_dim,
            cfg.actor_log_std_min, cfg.actor_log_std_max)
        self.critic_def = nets.CriticHead(cfg.hidden_dim, cfg.projection_dim,
                                          q_layernorm=cfg.q_head_layernorm)

        self.actor_tx = optax.adam(cfg.actor_lr, b1=cfg.actor_beta, b2=0.999)
        if cfg.critic_weight_decay:
            self.critic_tx = optax.adamw(cfg.critic_lr, b1=cfg.critic_beta,
                                         b2=0.999,
                                         weight_decay=cfg.critic_weight_decay)
        else:
            self.critic_tx = optax.adam(cfg.critic_lr, b1=cfg.critic_beta,
                                        b2=0.999)
        self.alpha_tx = optax.adam(cfg.alpha_lr, b1=cfg.alpha_beta, b2=0.999)

        self._select = jax.jit(self._select_action)
        self._sample = jax.jit(self._sample_action)

    # ----------------------------------------------------------- forward fns
    def feats(self, params, obs, act: Callable = jax.nn.relu):
        return self.trunk_def.apply({"params": params["trunk"]}, obs, act)

    def actor_forward(self, params, obs, detach: bool = False):
        h = self.feats(params, obs)
        if detach:
            h = jax.lax.stop_gradient(h)
        return self.actor_def.apply({"params": params["actor"]}, h)

    def critic_forward(self, params, obs, action, detach: bool = False,
                       act: Callable = jax.nn.relu, trunk_key: str = "trunk",
                       critic_key: str = "critic"):
        h = self.feats({"trunk": params[trunk_key]}, obs, act)
        if detach:
            h = jax.lax.stop_gradient(h)
        return self.critic_def.apply({"params": params[critic_key]}, h, action,
                                     act)

    def policy(self, params, obs, rng):
        """(mu, pi, log_pi, log_std) with squashing (reference: sac.py:95-105
        via modules.Actor.forward)."""
        h = self.feats(params, obs)
        return self.policy_from_feats(params, h, rng)

    def policy_from_feats(self, params, feats, rng):
        """`policy` on precomputed trunk features (the packed target pass
        hands the next-obs features in directly)."""
        mu, log_std = self.actor_def.apply({"params": params["actor"]}, feats)
        noise = jax.random.normal(rng, mu.shape)
        pi = mu + noise * jnp.exp(log_std)
        log_pi = nets.gaussian_logprob(noise, log_std)
        mu, pi, log_pi = nets.squash(mu, pi, log_pi)
        return mu, pi, log_pi, log_std

    def _packed_trunk(self, trunks, inputs, act: Callable = jax.nn.relu):
        """Grouped-conv pack of len(trunks) trunk forwards (nets.
        trunk_packed_apply bound to this agent's architecture)."""
        return nets.trunk_packed_apply(
            trunks, inputs, self.cfg.num_shared_layers,
            self.cfg.num_head_layers, self._compute_dtype, act)

    # ------------------------------------------------------------------ init
    def init_state(self, rng) -> AgentState:
        k_t, k_a, k_c, k_next = jax.random.split(rng, 4)
        dummy = jnp.zeros((1,) + tuple(self.obs_shape), jnp.float32)
        trunk = self.trunk_def.init(k_t, dummy)["params"]
        feats = self.trunk_def.apply({"params": trunk}, dummy)
        actor = self.actor_def.init(k_a, feats)["params"]
        dummy_act = jnp.zeros((1, self.action_dim), jnp.float32)
        critic = self.critic_def.init(k_c, feats, dummy_act)["params"]
        params = {"trunk": trunk, "actor": actor, "critic": critic}
        # jnp.copy, not identity: the fused trainer DONATES the agent state,
        # and a pytree holding the same device buffer twice (params + target
        # aliased at init) is an INVALID_ARGUMENT at donation time on the
        # TPU runtime
        target = jax.tree_util.tree_map(
            jnp.copy, {"trunk": trunk, "critic": critic})
        state = AgentState(
            params=params,
            target_params=target,
            log_alpha=jnp.log(jnp.float32(self.cfg.init_temperature)),
            actor_opt=self.actor_tx.init(actor),
            critic_opt=self.critic_tx.init(
                {"trunk": trunk, "critic": critic}),
            alpha_opt=self.alpha_tx.init(jnp.zeros(())),
            step=jnp.int32(0),
            rng=k_next,
            critic_loss_ema=(jnp.float32(0.0)
                             if self.cfg.td_anomaly_gate > 0 else None),
            gate_cooldown=(jnp.int32(0)
                           if self.cfg.td_anomaly_gate > 0
                           and self.cfg.td_gate_cooldown > 0 else None),
            gate_latch=(jnp.int32(0)
                        if self.cfg.td_anomaly_gate > 0
                        and self.cfg.td_gate_latch > 0 else None),
            burst_log=(_init_burst_log(self.cfg.batch_size)
                       if self.cfg.td_anomaly_gate > 0 else None),
        )
        return self.init_aux(state, rng)

    def init_aux(self, state: AgentState, rng) -> AgentState:
        return state

    # --------------------------------------------------------------- acting
    def _obs_batch(self, obs):
        obs = jnp.asarray(obs)
        if obs.ndim == 3:
            obs = obs[None]
        return obs.astype(jnp.float32)

    def _select_action(self, state: AgentState, obs):
        mu, _ = self.actor_forward(state.params, self._obs_batch(obs))
        return jnp.tanh(mu)

    def _sample_action(self, state: AgentState, obs, rng):
        _, pi, _, _ = self.policy(state.params, self._obs_batch(obs), rng)
        return pi

    def select_action(self, state: AgentState, obs):
        return self._select(state, obs)

    def sample_action(self, state: AgentState, obs, rng):
        return self._sample(state, obs, rng)

    # -------------------------------------------------------------- sampling
    def sample_batch(self, buffer: ReplayBuffer, rstate: ReplayState,
                     rng) -> Batch:
        """Default sampler: independent random crops of obs / next_obs
        (reference: utils.py:185-198 `sample` → random_crop)."""
        k0, k1, k2 = jax.random.split(rng, 3)
        raw = buffer.sample_raw(rstate, k0)
        size = self.cfg.image_crop_size
        return raw.replace(
            obs=augment.random_crop(k1, raw.obs, size),
            next_obs=augment.random_crop(k2, raw.next_obs, size),
        )

    # --------------------------------------------------------------- losses
    def critic_target_values(self, state: AgentState, batch: Batch, rng,
                             ctx=None):
        nobs = batch.next_obs.astype(jnp.float32)
        if ctx is not None and "next_feats" in ctx:
            # the algorithm's update_context already ran next_obs through
            # both trunks (e.g. packed with SGQN's attribution pass)
            f_on, f_tg = ctx["next_feats"], ctx["next_tfeats"]
        elif self._packed:
            # ONE grouped conv pass for the two next-obs traversals
            # (online trunk for π, target trunk for the backup Q)
            f_on, f_tg = self._packed_trunk(
                [state.params["trunk"], state.target_params["trunk"]],
                [nobs, nobs])
        else:
            f_on = self.feats(state.params, nobs)
            f_tg = self.feats(state.target_params, nobs)
        _, pi, log_pi, _ = self.policy_from_feats(state.params, f_on, rng)
        tq1, tq2 = self.critic_def.apply(
            {"params": state.target_params["critic"]}, f_tg, pi)
        alpha = jnp.exp(state.log_alpha)
        tv = jnp.minimum(tq1, tq2) - alpha * log_pi
        target_q = batch.reward + batch.not_done * self.discount * tv
        if self.cfg.q_target_clip:
            # bound the backup (safety rail; see core/config.py
            # q_target_clip for the frame-skip-aware bound)
            c = self.cfg.q_target_clip
            target_q = jnp.clip(target_q, -c, c)
        return jax.lax.stop_gradient(target_q)

    def update_context(self, state: AgentState, batch: Batch, rng):
        """Per-update precomputation shared between the critic and aux
        losses (None for plain SAC). SGQN computes its guided-backprop
        attribution mask once here instead of once in the critic loss and
        again in the aux step (round-2 item #2)."""
        return None

    def critic_loss_fn(self, params, state: AgentState, batch: Batch,
                       target_q, rng, ctx=None) -> Tuple[jnp.ndarray, Dict]:
        feats = self.feats(params, batch.obs.astype(jnp.float32))
        q1, q2 = self.critic_def.apply({"params": params["critic"]}, feats,
                                       batch.action)
        loss = jnp.mean((q1 - target_q) ** 2) + jnp.mean((q2 - target_q) ** 2)
        out = {"critic_loss": loss,
               **self._critic_diag(q1, q2, batch, target_q)}
        if self._packed:
            # hand the (detached) obs features to the actor update — its
            # cond branch would otherwise re-run the trunk, and CSE cannot
            # reach across a lax.cond boundary
            out["_obs_feats"] = jax.lax.stop_gradient(feats)
        return loss, out

    def _critic_diag(self, q1, q2, batch: Batch, target_q=None) -> Dict:
        """Collapse-study diagnostics (docs/PERF.md open trigger): Q level,
        twin disagreement, and the batch reward level — logged every update
        so a late-training Q-divergence event has a measured signature
        instead of a post-hoc guess. Costs a few reductions. With target_q,
        also emits PER-SAMPLE TD errors ("_td1"/"_td2", stop-gradient
        by-products) for the burst-forensics snapshot; _update pops them
        before metrics leave the program."""
        out = {
            "q1_mean": jnp.mean(jax.lax.stop_gradient(q1)),
            "q_twin_gap": jnp.mean(jnp.abs(jax.lax.stop_gradient(q1 - q2))),
            "batch_reward": jnp.mean(batch.reward),
        }
        if target_q is not None:
            out["_td1"] = jax.lax.stop_gradient(
                (q1 - target_q).reshape(-1).astype(jnp.float32))
            out["_td2"] = jax.lax.stop_gradient(
                (q2 - target_q).reshape(-1).astype(jnp.float32))
        return out

    def _target_lag(self, state: AgentState) -> jnp.ndarray:
        """‖critic − target‖ / ‖critic‖ over the Q heads: how far the online
        critic has run from its target (drift candidate for the collapse
        trigger, docs/PERF.md)."""
        heads = {k: v for k, v in state.params["critic"].items()
                 if k != "projection"}
        theads = {k: v for k, v in state.target_params["critic"].items()
                  if k != "projection"}
        diff = jax.tree_util.tree_map(lambda a, b: a - b, heads, theads)
        return optax.global_norm(diff) / (optax.global_norm(heads) + 1e-8)

    # TD-anomaly gate: updates younger than this never gate (the loss EMA
    # is still settling through the early fast-decay phase)
    GATE_WARMUP = 2000

    def update_critic(self, state: AgentState, batch: Batch, rng, ctx=None):
        k_t, k_l = jax.random.split(rng)
        target_q = self.critic_target_values(state, batch, k_t, ctx)
        c_params = {"trunk": state.params["trunk"],
                    "critic": state.params["critic"]}
        (loss, metrics), grads = jax.value_and_grad(
            self.critic_loss_fn, has_aux=True)(
                c_params, state, batch, target_q, k_l, ctx)
        return self._apply_critic_grads(state, c_params, loss, grads, metrics)

    def _apply_critic_grads(self, state: AgentState, c_params, loss, grads,
                            metrics):
        """TD-anomaly gate + cooldown + Adam application on critic grads
        (shared by the base update and SGQN's folded critic+aux pass)."""
        if state.critic_loss_ema is not None:
            # TD-anomaly gate (cfg.td_anomaly_gate): the measured collapse
            # onset (docs/PERF.md) is a critic-loss burst ~10× its running
            # level that poisons the policy within one episode chunk. A
            # bursting update contributes a gradient that is mostly
            # target-error noise — freeze params AND optimizer moments
            # through it. jnp.where keeps the whole update one fused jitted
            # program (no host round-trip, no lax.cond re-trace).
            ema = state.critic_loss_ema
            armed = (state.step >= self.GATE_WARMUP) & (ema > 0)
            # a non-finite loss is ALWAYS a burst: NaN fails every ordered
            # comparison, so without this the gate waves the batch through
            # and the Adam step corrupts the params instantly (measured:
            # runs/flag_r5 seed 2 NaN'd at 214.25k and zombied to the end)
            burst = armed & ((loss > jnp.float32(self.cfg.td_anomaly_gate)
                              * ema) | ~jnp.isfinite(loss))
            frozen = burst
            if state.gate_cooldown is not None:
                # post-burst cooldown (cfg.td_gate_cooldown): the measured
                # cascade (docs/PERF.md collapse signature) compounds through
                # follow-on updates that each sit BELOW the burst threshold —
                # after a burst, freeze the whole agent for K more updates so
                # the poisoned target surface never propagates. Benign bursts
                # cost K skipped updates (~0.1% of a run); a real onset is
                # contained before the twins co-diverge.
                in_cd = state.gate_cooldown > 0
                frozen = burst | in_cd
                new_cd = jnp.where(
                    burst, jnp.int32(self.cfg.td_gate_cooldown),
                    jnp.maximum(state.gate_cooldown - 1, 0))
                state = state.replace(gate_cooldown=new_cd)
            latched = None
            if state.gate_latch is not None:
                # Latch breaker (cfg.td_gate_latch): the EMA ignores frozen
                # losses BY DESIGN (a burst must not raise its own
                # threshold), which means a genuine loss-regime shift —
                # loss persistently above gate×EMA — freezes the agent
                # forever: measured live on runs/flag_r5 seed 2
                # (td_gate_fired=1.0 for >5k consecutive updates, policy
                # pinned at ~50 reward, every guard rollback burned). A
                # freeze sustained for td_gate_latch consecutive updates is
                # a regime change, not an anomaly: accept the new level
                # (EMA := observed loss), release the freeze, and zero the
                # cooldown so the actor resumes too. Benign containments
                # are far shorter (worst measured: ~95% of one 250-update
                # chunk, flag_r3 149k), so the default window (750 = three
                # chunks) never triggers on them.
                run = jnp.where(frozen, state.gate_latch + 1, jnp.int32(0))
                # never release onto a non-finite loss: a NaN plateau must
                # stay frozen (the regime-shift reading only applies to a
                # real, finite new loss level)
                latched = (run >= jnp.int32(self.cfg.td_gate_latch)
                           ) & jnp.isfinite(loss)
                frozen = frozen & jnp.logical_not(latched)
                state = state.replace(
                    gate_latch=jnp.where(latched, jnp.int32(0), run))
                if state.gate_cooldown is not None:
                    state = state.replace(gate_cooldown=jnp.where(
                        latched, jnp.int32(0), state.gate_cooldown))
            keep = jnp.where(frozen, 0.0, 1.0).astype(jnp.float32)
            grads = jax.tree_util.tree_map(lambda g: g * keep, grads)
            updates, opt2 = self.critic_tx.update(grads, state.critic_opt,
                                                  c_params)
            new_opt = jax.tree_util.tree_map(
                lambda a, b: keep * b + (1 - keep) * a
                if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else b,
                state.critic_opt, opt2)
            updates = jax.tree_util.tree_map(lambda u: u * keep, updates)
            # the EMA ignores burst/frozen losses (they would drag the
            # threshold up and disarm the gate for the very next update);
            # on a latch break it SNAPS to the observed loss — a 1%/update
            # crawl would re-fire the gate immediately and re-enter the
            # latch at a 1-in-td_gate_latch duty cycle
            ema = jnp.where(frozen, ema,
                            jnp.where(state.step == 0, loss,
                                      0.99 * ema + 0.01 * loss))
            if latched is not None:
                # snap only to a FINITE loss — a latch break on a NaN
                # plateau must keep the old (finite) threshold
                ema = jnp.where(latched & jnp.isfinite(loss), loss, ema)
            state = state.replace(critic_loss_ema=ema)
            metrics = {**metrics, "td_gate_fired": burst.astype(jnp.float32),
                       "td_gate_frozen": frozen.astype(jnp.float32)}
            if latched is not None:
                metrics["td_gate_latched"] = latched.astype(jnp.float32)
        else:
            updates, new_opt = self.critic_tx.update(grads, state.critic_opt,
                                                     c_params)
        new_c = optax.apply_updates(c_params, updates)
        params = dict(state.params)
        params["trunk"] = new_c["trunk"]
        params["critic"] = new_c["critic"]
        return state.replace(params=params, critic_opt=new_opt), metrics

    def update_actor_and_alpha(self, state: AgentState, batch: Batch, rng,
                               feats=None):
        """When `feats` is given it is the critic pass's detached trunk(obs)
        — computed with the params ONE critic-Adam-step before this call
        (the reference recomputes the encoder after the critic step,
        sac.py:137-140). Same one-step-stale sharing as SGQN's update_context
        mask (measured indistinguishable there); validated against the
        recompute formulation by the cartpole/walker learning-curve smokes
        (SGQN_PACKED=0 restores the recompute)."""
        if feats is None:
            obs = batch.obs.astype(jnp.float32)
            feats = jax.lax.stop_gradient(self.feats(state.params, obs))

        def actor_loss_fn(actor_params):
            mu, log_std = self.actor_def.apply({"params": actor_params}, feats)
            noise = jax.random.normal(rng, mu.shape)
            pi = mu + noise * jnp.exp(log_std)
            log_pi = nets.gaussian_logprob(noise, log_std)
            mu_s, pi_s, log_pi = nets.squash(mu, pi, log_pi)
            # reuse the detached trunk features computed above instead of
            # re-running the trunk inside the loss (critic_forward(detach=True)
            # would trace a second, identical trunk forward; reference
            # sac.py:137-140 likewise reuses detached encoder output)
            q1, q2 = self.critic_def.apply(
                {"params": state.params["critic"]}, feats, pi_s)
            q = jnp.minimum(q1, q2)
            alpha = jnp.exp(jax.lax.stop_gradient(state.log_alpha))
            loss = jnp.mean(alpha * log_pi - q)
            return loss, log_pi

        (a_loss, log_pi), a_grads = jax.value_and_grad(
            actor_loss_fn, has_aux=True)(state.params["actor"])
        a_updates, new_a_opt = self.actor_tx.update(
            a_grads, state.actor_opt, state.params["actor"])
        new_actor = optax.apply_updates(state.params["actor"], a_updates)

        def alpha_loss_fn(log_alpha):
            alpha = jnp.exp(log_alpha)
            target = jax.lax.stop_gradient(-log_pi - self.target_entropy)
            return jnp.mean(alpha * target)

        al_loss, al_grad = jax.value_and_grad(alpha_loss_fn)(state.log_alpha)
        al_updates, new_al_opt = self.alpha_tx.update(
            al_grad, state.alpha_opt, state.log_alpha)
        new_log_alpha = optax.apply_updates(state.log_alpha, al_updates)

        params = dict(state.params)
        params["actor"] = new_actor
        return state.replace(params=params, actor_opt=new_a_opt,
                             log_alpha=new_log_alpha, alpha_opt=new_al_opt), {
            "actor_loss": a_loss, "alpha_loss": al_loss,
            "alpha_value": jnp.exp(new_log_alpha)}

    def soft_update_targets(self, state: AgentState) -> AgentState:
        """Separate taus: Q heads (critic_tau) vs encoder = trunk + critic
        projection (encoder_tau) (reference: sac.py:153-158)."""

        def ema(tau):
            return lambda t, p: (1 - tau) * t + tau * p

        tgt = state.target_params
        new_trunk = jax.tree_util.tree_map(
            ema(self.encoder_tau), tgt["trunk"], state.params["trunk"])
        new_critic = {}
        for k, sub in state.params["critic"].items():
            tau = self.encoder_tau if k == "projection" else self.critic_tau
            new_critic[k] = jax.tree_util.tree_map(
                ema(tau), tgt["critic"][k], sub)
        return state.replace(
            target_params={"trunk": new_trunk, "critic": new_critic})

    # ---------------------------------------------------------------- update
    def update_aux(self, state: AgentState, batch: Batch,
                   buffer: ReplayBuffer, rstate: ReplayState, rng, ctx=None):
        return state, {}

    def _update(self, state: AgentState, rstate: ReplayState,
                buffer: ReplayBuffer):
        rng, k_s, k_c, k_a, k_x, k_ctx = jax.random.split(state.rng, 6)
        state = state.replace(rng=rng)
        batch = self.sample_batch(buffer, rstate, k_s)
        ctx = self.update_context(state, batch, k_ctx)

        state, c_metrics = self.update_critic(state, batch, k_c, ctx)
        # detached obs features from the critic pass (see critic_loss_fn) —
        # reused by the actor so its cond branch skips a trunk traversal
        obs_feats = c_metrics.pop("_obs_feats", None)
        # per-sample TD errors (critic_loss_fn by-products) feed the burst-
        # forensics snapshot; never let the (B,)-arrays leave as metrics
        td1 = c_metrics.pop("_td1", None)
        td2 = c_metrics.pop("_td2", None)
        B_log = (state.burst_log["td1"].shape[0]
                 if state.burst_log is not None else -1)
        if (state.burst_log is not None and td1 is not None
                and batch.idx is not None
                and td1.shape == (B_log,)
                and batch.idx.shape[0] == B_log
                and batch.reward.shape[0] == B_log):
            # Record the FIRST gate-flagged minibatch since the driver last
            # drained the snapshot (docs/PERF.md open collapse trigger): its
            # replay provenance — (env, slot, step) indices and each slot's
            # completion ordinal (age = ep_counter − slot_ep) — plus the
            # per-sample TD errors and rewards. jnp.where keeps the whole
            # thing inside the fused update; the driver dumps + resets it at
            # the chunk boundary (train/loop.py burst_log.jsonl).
            bl = state.burst_log
            fired = c_metrics.get("td_gate_fired", jnp.float32(0)) > 0
            fresh = fired & (bl["valid"] == 0)
            env_i = batch.idx[:, 0]
            ep_i = batch.idx[:, 1]
            rec = {"valid": jnp.int32(1), "step": state.step,
                   "ep_counter": rstate.ep_counter,
                   "env_i": env_i, "ep_i": ep_i, "s": batch.idx[:, 2],
                   "slot_ep": rstate.slot_ep[env_i, ep_i],
                   "reward": batch.reward.reshape(-1), "td1": td1, "td2": td2}
            state = state.replace(burst_log=jax.tree_util.tree_map(
                lambda new, old: jnp.where(fresh, new, old), rec, bl))

        def do_actor(s):
            s2, m = self.update_actor_and_alpha(s, batch, k_a, obs_feats)
            return s2, m

        def skip_actor(s):
            z = {"actor_loss": jnp.float32(0), "alpha_loss": jnp.float32(0),
                 "alpha_value": jnp.exp(s.log_alpha)}
            return s, z

        do_act = state.step % self.actor_update_freq == 0
        if state.gate_cooldown is not None:
            # post-burst cooldown freezes the actor/alpha too: the burst
            # batch (and the corrupted critic surface it implies) must not
            # steer the policy while the critic sits out its freeze
            do_act = do_act & (state.gate_cooldown == 0)
        state, a_metrics = jax.lax.cond(do_act, do_actor, skip_actor, state)

        state = jax.lax.cond(
            state.step % self.critic_target_update_freq == 0,
            self.soft_update_targets, lambda s: s, state)

        state, x_metrics = self.update_aux(state, batch, buffer, rstate, k_x,
                                           ctx)
        state = state.replace(step=state.step + 1)
        return state, {**c_metrics, **a_metrics, **x_metrics,
                       "target_lag": self._target_lag(state)}

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _update_jit(self, state, rstate, buffer):
        return self._update(state, rstate, buffer)

    def update(self, state: AgentState, rstate: ReplayState,
               buffer: ReplayBuffer):
        """Uniform update signature for every algorithm (fixes the
        train.py/sgsac `count` mismatch noted in SURVEY §2.1)."""
        return self._update_jit(state, rstate, buffer)
