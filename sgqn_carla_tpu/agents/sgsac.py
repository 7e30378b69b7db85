"""SGQN ("sgsac"): saliency-guided Q-networks.

Behavioral port of the reference SGSAC (reference: src/algorithms/sgsac.py):

  * critic consistency loss (:64-74): guided-backprop attribution of Q1
    w.r.t. the observation → per-sample quantile mask → masked obs with
    non-salient pixels filled by ONE uniform random value drawn from
    [obs.min(), obs.max()] → MSE(Q(s), Q(masked s)) × 0.5 added to the
    critic loss;
  * auxiliary attribution predictor (:82-102, 163-167): the critic encoder
    + a deconv decoder predicts the attribution mask from an overlay-
    augmented observation, trained with BCE-with-logits; the aux optimizer
    also updates the critic encoder (reference: sgsac.py:35-39 — the
    predictor's parameter list includes the encoder).

TPU-native difference: captum's GuidedBackprop hook machinery becomes a
custom-VJP activation (`ops/guided_backprop.py`), so attribution + mask +
consistency + aux all fuse into the one jitted update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from sgqn_carla_tpu.agents import nets
from sgqn_carla_tpu.agents.sac import SAC, AgentState
from sgqn_carla_tpu.data.replay import Batch, ReplayBuffer, ReplayState
from sgqn_carla_tpu.ops import augment
from sgqn_carla_tpu.ops.guided_backprop import (
    compute_attribution, compute_attribution_mask, guided_relu,
)


class SGSAC(SAC):
    name = "sgsac"

    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        self.quantile = self.cfg.sgqn_quantile
        self.consistency = bool(self.cfg.consistency)
        import os
        self._concat_consistency = (
            os.environ.get("SGQN_SGSAC_CONCAT", "0") == "1")
        # (round 4: the SGQN_AUX_FOLD packed-fold variant was removed after
        # the on-chip A/B measured it at parity with the plain packed path
        # — 8.70 ms either way — while the packed path itself lost to the
        # separate forwards; no fold can recover a formulation that is
        # slower before folding. docs/PERF.md learner table.)
        self._fill_mode = getattr(self.cfg, "consistency_fill", "scalar")
        self._fill_p = float(getattr(self.cfg, "consistency_fill_p", 0.25))
        self._fill_warmup = int(getattr(self.cfg,
                                        "consistency_fill_warmup", 0))
        # trunk output spatial dim: (84-3)//2+1 = 41, minus 2 per s1 conv
        spatial = 41 - 2 * (self.cfg.num_shared_layers - 1
                            + self.cfg.num_head_layers)
        self.decoder_def = nets.AttributionDecoder(
            self.action_dim, self.cfg.projection_dim, spatial=max(spatial, 1),
            out_channels=self.obs_shape[0], out_size=self.obs_shape[-1],
            dtype=(jnp.bfloat16 if self.cfg.precision == "bf16"
                   else jnp.float32))
        self.aux_tx = optax.adam(self.cfg.aux_lr, b1=self.cfg.aux_beta,
                                 b2=0.999)

    def init_aux(self, state: AgentState, rng) -> AgentState:
        feat = jnp.zeros((1, self.cfg.projection_dim))
        act = jnp.zeros((1, self.action_dim))
        decoder = self.decoder_def.init(rng, feat, act)["params"]
        aux_params = {"decoder": decoder}
        full = self._aux_tree(state.params, aux_params)
        return state.replace(aux_params=aux_params,
                             aux_opt=self.aux_tx.init(full))

    def _aux_tree(self, params, aux_params):
        """attribution_predictor.parameters() = critic encoder + decoder."""
        return {"trunk": params["trunk"],
                "projection": params["critic"]["projection"],
                "decoder": aux_params["decoder"]}

    # ------------------------------------------------------------ attribution
    def attribution_grad(self, params, obs, action):
        """Guided-backprop d(ΣQ1)/d(obs) with frozen params."""
        p = jax.lax.stop_gradient(params)

        def q1_fn(o, a):
            q1, _ = self.critic_forward(p, o, a, act=guided_relu)
            return q1

        return compute_attribution(q1_fn, obs, action)

    def predict_attribution(self, full_params, obs, action):
        feats = self.trunk_def.apply({"params": full_params["trunk"]},
                                     obs.astype(jnp.float32))
        z = self.critic_def.apply(
            {"params": {"projection": full_params["projection"]}}, feats,
            method=nets.CriticHead.encode)
        return self.decoder_def.apply({"params": full_params["decoder"]}, z,
                                      action)

    def _fill(self, rng, obs, step=None):
        """Background fill for the masked-obs consistency view.

        "scalar" (default, reference parity): one uniform scalar in
        [obs.min, obs.max] — r=g=b, every fill is GRAY (reference
        sgsac.py:67-70 random.uniform on scalars). "color": a per-sample
        random RGB color, tiled over the frame stack — measured round 4:
        with the scalar fill the trunk never sees the robot on a COLORED
        background, and video_hard clips whose dominant color matches the
        walker's body collapse the policy to ~50 while the robot is
        plainly visible in the frame (representation failure, not
        information loss; even all-palette overlay training does not fix
        it — runs/flag_r4pal eval arrays: warm-clip episodes 50.7 vs
        344.8 non-warm). The colored fill covers exactly that axis at
        zero extra traversals."""
        if self._fill_mode == "color":
            b = obs.shape[0]
            frames = obs.shape[1] // 3
            k_c, k_s, k_b = jax.random.split(rng, 3)
            col = jax.random.uniform(k_c, (b, 3), jnp.float32,
                                     jnp.min(obs), jnp.max(obs))
            col = jnp.tile(col, (1, frames))[..., None, None]
            # dose: per-sample Bernoulli(p) colored fill, else the easy
            # scalar fill. Full-strength colored fill (p=1) measured DEAD
            # (runs flag_r4mix attempt 1: walker roll-20 flat ~55 through
            # 58k updates vs ~420 @25k with the scalar fill) — the
            # consistency target Q(obs)=Q(robot-on-saturated-color) from
            # update 1 swamps TD learning before the critic knows
            # anything. A p-dose keeps most of the batch on the easy
            # invariance while still covering the camouflage axis.
            p = self._fill_p
            scalar = jax.random.uniform(k_s, (), jnp.float32,
                                        jnp.min(obs), jnp.max(obs))
            use = (jax.random.uniform(k_b, (b, 1, 1, 1)) < p)
            # curriculum: colored fill only once the critic has stabilized
            # — measured: a colored dose from update 1 stalls walker at
            # roll-20 ~55-80 even at p=0.25 (flag_r4mix attempts 1-2); the
            # from-scratch critic cannot absorb the colored invariance and
            # the TD signal at once. Before `consistency_fill_warmup`
            # updates the fill reduces to the reference scalar exactly.
            if step is not None and self._fill_warmup > 0:
                use = use & (step >= self._fill_warmup)
            return jnp.where(use, col, scalar)
        return jax.random.uniform(rng, (), jnp.float32,
                                  jnp.min(obs), jnp.max(obs))

    # ---------------------------------------------------------------- critic
    def update_context(self, state, batch: Batch, rng):
        """Guided-backprop attribution mask, computed ONCE per update with
        the pre-update params and shared by the consistency loss and the
        aux BCE target. The reference computes it twice — inside
        update_critic (sgsac.py:64-66) and again inside update_aux
        (:82-87, one Adam step later) — each a full trunk forward+backward;
        the masks differ only through that single critic Adam step on a
        0.95-quantile threshold, measured indistinguishable, and the shared
        pass removes a third of the update's trunk traversals."""
        if not self.consistency:
            # mask only needed at aux steps then — let update_aux compute it
            # inside its own cond instead of paying for it every update
            return None
        obs = batch.obs.astype(jnp.float32)
        if not self._packed:
            obs_grad = self.attribution_grad(state.params, obs, batch.action)
            return {"mask": compute_attribution_mask(obs_grad, self.quantile)}
        # Packed pass 1 (g=3): the attribution forward shares ONE grouped
        # conv pass with the two next-obs traversals the critic target needs
        # (online trunk for π, target trunk for the backup Q). guided_relu's
        # FORWARD is plain ReLU, so applying it to the whole packed tensor
        # leaves the next-obs groups' features untouched; its VJP gate only
        # matters on the attribution group, the one the input-grad flows
        # through. The packed backward (one grouped transposed-conv chain)
        # replaces the standalone attribution backward.
        nobs = batch.next_obs.astype(jnp.float32)
        po = jax.lax.stop_gradient(state.params)
        pt = jax.lax.stop_gradient(state.target_params)

        def q1_sum(o):
            f_attr, f_on, f_tg = self._packed_trunk(
                [po["trunk"], po["trunk"], pt["trunk"]], [o, nobs, nobs],
                act=guided_relu)
            q1, _ = self.critic_def.apply({"params": po["critic"]}, f_attr,
                                          batch.action, guided_relu)
            return jnp.sum(q1), (f_on, f_tg)

        obs_grad, (f_on, f_tg) = jax.grad(q1_sum, has_aux=True)(obs)
        return {"mask": compute_attribution_mask(obs_grad, self.quantile),
                "next_feats": f_on, "next_tfeats": f_tg}

    def critic_loss_fn(self, params, state, batch: Batch, target_q, rng,
                       ctx=None):
        obs = batch.obs.astype(jnp.float32)
        if not self.consistency:
            q1, q2 = self.critic_forward(params, obs, batch.action)
            loss = (jnp.mean((q1 - target_q) ** 2)
                    + jnp.mean((q2 - target_q) ** 2))
            return loss, {"critic_loss": loss,
                          **self._critic_diag(q1, q2, batch, target_q)}
        mask = ctx["mask"]
        masked_obs = jnp.where(mask, obs, self._fill(rng, obs, state.step))
        if self._packed:
            # packed pass 2 (g=2): obs + masked-obs through the online trunk
            # as one grouped conv fwd+bwd; the tied kernel concat makes the
            # param cotangent the sum over both groups (= two shared-weight
            # forwards). Heads run once at 2B on the concatenated features.
            b = obs.shape[0]
            f_obs, f_m = self._packed_trunk(
                [params["trunk"], params["trunk"]], [obs, masked_obs])
            fc = jnp.concatenate([f_obs, f_m], axis=0)
            bq1, bq2 = self.critic_def.apply(
                {"params": params["critic"]}, fc,
                jnp.concatenate([batch.action] * 2, 0))
            q1, mq1 = bq1[:b], bq1[b:]
            q2, mq2 = bq2[:b], bq2[b:]
            loss = (jnp.mean((q1 - target_q) ** 2)
                    + jnp.mean((q2 - target_q) ** 2))
            loss = loss + 0.5 * (jnp.mean((q1 - mq1) ** 2)
                                 + jnp.mean((q2 - mq2) ** 2))
            return loss, {"critic_loss": loss,
                          "_obs_feats": jax.lax.stop_gradient(f_obs),
                          **self._critic_diag(q1, q2, batch, target_q)}
        if self._concat_consistency:
            # one trunk traversal at 2B instead of two at B — numerically
            # identical (convs are batch-parallel) and fewer dispatches, BUT
            # it defeats XLA's CSE of the attribution forward against the
            # B-sized obs forward (measured in HLO: sac compiles to exactly
            # its nominal conv count, so that CSE is the only free sharing
            # in the program). Which wins is a TPU measurement
            # (SGQN_SGSAC_CONCAT=1, scripts/profile_update.py).
            both = jnp.concatenate([obs, masked_obs], axis=0)
            bq1, bq2 = self.critic_forward(
                params, both, jnp.concatenate([batch.action] * 2, 0))
            b = obs.shape[0]
            q1, mq1 = bq1[:b], bq1[b:]
            q2, mq2 = bq2[:b], bq2[b:]
        else:
            q1, q2 = self.critic_forward(params, obs, batch.action)
            mq1, mq2 = self.critic_forward(params, masked_obs, batch.action)
        loss = jnp.mean((q1 - target_q) ** 2) + jnp.mean((q2 - target_q) ** 2)
        loss = loss + 0.5 * (jnp.mean((q1 - mq1) ** 2)
                             + jnp.mean((q2 - mq2) ** 2))
        return loss, {"critic_loss": loss, **self._critic_diag(q1, q2, batch, target_q)}

    # ------------------------------------------------------------------- aux
    def update_aux(self, state: AgentState, batch: Batch, buffer: ReplayBuffer,
                   rstate: ReplayState, rng, ctx=None):

        def do(state):
            k_m, k_o = jax.random.split(rng)
            obs = batch.obs.astype(jnp.float32)
            if ctx is not None:  # shared attribution pass (update_context)
                mask = ctx["mask"]
            else:
                obs_grad = self.attribution_grad(state.params, obs,
                                                 batch.action)
                mask = compute_attribution_mask(obs_grad, self.quantile)
            s_tilde = augment.random_overlay(k_o, obs, self.overlay_pool,
                                             self.cfg.alpha_blending)
            s_tilde = jax.lax.stop_gradient(s_tilde)
            full = self._aux_tree(state.params, state.aux_params)
            target_mask = jax.lax.stop_gradient(mask.astype(jnp.float32))

            def loss_fn(fp):
                logits = self.predict_attribution(fp, s_tilde, batch.action)
                return jnp.mean(
                    optax.sigmoid_binary_cross_entropy(logits, target_mask))

            loss, grads = jax.value_and_grad(loss_fn)(full)
            updates, new_opt = self.aux_tx.update(grads, state.aux_opt, full)
            new = optax.apply_updates(full, updates)
            params = dict(state.params)
            params["trunk"] = new["trunk"]
            critic = dict(params["critic"])
            critic["projection"] = new["projection"]
            params["critic"] = critic
            return state.replace(params=params,
                                 aux_params={"decoder": new["decoder"]},
                                 aux_opt=new_opt), {"aux_loss": loss}

        def skip(state):
            return state, {"aux_loss": jnp.float32(0)}

        do_aux = state.step % self.cfg.aux_update_freq == 0
        if state.gate_cooldown is not None:
            # the post-burst freeze must cover the aux optimizer too: it
            # trains the TRUNK (the predictor's parameter list includes the
            # encoder), so an unfrozen aux step on a poisoned/NaN batch
            # corrupts the whole agent while critic+actor sit frozen
            # (measured: runs/flag_r5 seed 2 — params went NaN through
            # exactly this path at 214.25k while fully "frozen")
            do_aux = do_aux & (state.gate_cooldown == 0)
        return jax.lax.cond(do_aux, do, skip, state)
