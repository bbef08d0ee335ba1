"""SAC agent — the reference's learn loop as ONE jitted, donated train step.

The reference performs ~8 separate device dispatches per environment step
(DRL.py:373-437: next-action sample, target critic, critic fwd/bwd + Adam,
policy fwd/bwd + Adam, alpha fwd/bwd + Adam, Polyak copy). Here the whole
update is a single XLA program over a functional `SACTrainState`, so one
dispatch per step, fully fusable and shardable over the `data` mesh axis.

Replicated reference semantics (each a deliberate decision, SURVEY.md §7):
  * TD target r + gamma*(minQ' - alpha*logpi') with NO done mask
    (DRL.py:390-394). `done_mask_in_target=True` opts into the fix.
  * Q nets output `action_dim` values; the (B,1) reward broadcasts against
    (B,2) minQ (DRL.py:394,396-399) — preserved bit-for-bit.
  * policy_loss = mean(alpha*logpi - minQ_pi) with (B,1)-(B,2) broadcast
    (DRL.py:405-410).
  * alpha used this step is the PREVIOUS step's exp(log_alpha); log_alpha
    updates after the actor loss (DRL.py:417-424).
  * actor update sees the ALREADY-UPDATED critic (critic_optim.step() runs
    before the policy forward, DRL.py:401-407).
  * soft target update when itera % policy_freq == 0, tau from config
    (DRL.py:431-432; utils.py:31-33).
  * learn_guidence (DRL.py:187-301): critic/actor batch is agent batch ++
    expert batch (dynamic expert count -> fixed-shape mask here), plus
    guidence_weight * MSE(mean_action(expert obs), expert act) and
    engage_weight * MSE on engage==1 agent rows.
  * dropout: the reference never calls .eval(), so emb-dropout 0.1 is live
    in every learn forward pass; train_step matches. choose_action defaults
    to no-dropout (sane inference); `dropout_in_inference=True` replicates
    the reference exactly.
  * opt-in deviations behind flags (default off = reference semantics):
    `sac.alpha_max` / `sac.alpha_min` clamp the auto-tuned temperature —
    both failure directions were MEASURED (alpha 10.3 on the 2400-ep
    hospital run, BENCH.md round 3; alpha 0.003 with inf critics on the
    per-reset-DR arm, round 4); the reference auto-tune (DRL.py:417-424)
    has no clamp either way. `sac.critic_latent_reuse` trades the
    reference's update ordering for one fewer trunk pass.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from dgvit_tpu.config import Config
from dgvit_tpu.models import distributions
from dgvit_tpu.models.policies import build_actor, build_critic


def _attention_fix_tx(lr: float, frozen: Tuple[str, ...] = ("trans", "fc_embed")):
    """Head-only fine-tuning optimizer (P_ATTENTION_FIX / C_ATTENTION_FIX).

    The reference builds Adam over ONLY the head layers — fc1/fc2(/fc3) and
    mean/log_std (actor, DRL.py:144-149,155-161) or the twin-MLP heads
    (critic, DRL.py:107-110) — leaving the transformer trunk AND fc_embed
    out of the optimizer entirely. optax.multi_transform with set_to_zero
    reproduces that: frozen subtrees receive exactly-zero updates and carry
    no optimizer state."""

    def label_fn(params):
        return {
            k: jax.tree_util.tree_map(
                lambda _: "freeze" if k in frozen else "train", v)
            for k, v in params.items()
        }

    return optax.multi_transform(
        {"train": optax.adam(lr, eps=1e-8), "freeze": optax.set_to_zero()},
        label_fn)


@struct.dataclass
class SACTrainState:
    actor_params: Any
    critic_params: Any
    critic_target_params: Any
    actor_opt: Any
    critic_opt: Any
    log_alpha: jax.Array          # scalar (auto-tuned entropy temperature)
    alpha_opt: Any
    itera: jax.Array              # int32 update counter (DRL.py:50)
    rng: jax.Array                # base key; per-step keys are folded in


class SACAgent:
    """Builds modules/optimizers and exposes jitted functional steps."""

    def __init__(self, cfg: Config, dtype=None, grad_axis: Optional[str] = None,
                 row_noise: Optional[bool] = None):
        """`grad_axis`: name of a mapped mesh axis (shard_map/pmap) the step
        runs under — gradients/metrics are pmean'd over it and sum-form loss
        denominators are psum'd, so a batch sharded over that axis computes
        the SAME update as the unsharded step. This is how the fused Pallas
        train path composes with the `data` mesh (parallel.shardmap_learn):
        GSPMD cannot partition pl.pallas_call, but shard_map hands each
        device its local batch shard and the kernels run unchanged.

        `row_noise`: draw per-row (globally-indexed) action noise so shard i
        reproduces exactly rows [i*b_local, (i+1)*b_local) of the
        single-device noise stream (defaults to True when grad_axis is set;
        settable on an unsharded agent to build the equality baseline)."""
        self.cfg = cfg
        self.grad_axis = grad_axis
        self.row_noise = bool(row_noise) if row_noise is not None \
            else grad_axis is not None
        if dtype is None and getattr(cfg.model, "compute_dtype",
                                     "float32") == "bfloat16":
            # model.compute_dtype drives the TPU fast path (bf16 matmuls,
            # fp32 params/accumulation) without callers threading a dtype
            dtype = jnp.bfloat16
        self.actor = build_actor(cfg, dtype=dtype)
        self.critic = build_critic(cfg, dtype=dtype)
        s = cfg.sac
        self.gamma = float(s.gamma)
        self.tau = float(s.tau)
        self.policy_freq = int(s.policy_freq)
        self.target_entropy = -float(s.action_dim)
        self.auto_tune = bool(s.auto_tune_alpha)
        self.fixed_alpha = float(s.alpha)
        am = getattr(s, "alpha_max", None)
        self.alpha_max = None if am is None else float(am)
        an = getattr(s, "alpha_min", None)
        self.alpha_min = None if an is None else float(an)
        self.done_mask = bool(s.done_mask_in_target)
        self.nan_guard = bool(getattr(s, "nan_guard", False))
        # update-time DrQ-v2 random-shift augmentation (ops/augment.py) —
        # opt-in extension, the reference trains on raw replayed frames
        self.aug_shift = int(getattr(s, "aug_shift", 0))
        # DrQ-collapse diagnosis knobs (config.py): critic-only views
        # (the actual DrQ-v2 routing) and a raw-frame warm-up window
        self.aug_actor = bool(getattr(s, "aug_actor", True))
        self.aug_warmup = int(getattr(s, "aug_warmup", 0))
        # perf opt-in (non-parity, config.py sac.critic_latent_reuse): actor
        # loss reuses the critic-update's trunk latent + PRE-update params
        # instead of re-running the GoT trunk on the updated critic
        self.latent_reuse = bool(getattr(s, "critic_latent_reuse", False))
        if self.latent_reuse and self.aug_shift and not self.aug_actor:
            # the reused latent was computed on SHIFTED frames; handing it
            # to an actor step that must see raw frames would silently
            # re-augment the actor's Q — refuse the combination instead
            raise ValueError("critic_latent_reuse is incompatible with "
                             "aug_actor=False (the stashed critic latent "
                             "is an augmented view)")
        if self.latent_reuse:
            from dgvit_tpu.models.policies import GoTQNetwork
            if not isinstance(self.critic, GoTQNetwork):
                raise ValueError(
                    "critic_latent_reuse requires the GoT critic "
                    f"(critic_type=Transformer, got {type(self.critic).__name__})")
        self.guidence_weight = float(s.guidence_weight)
        self.engage_weight = float(s.engage_weight)
        gw_final = getattr(s, "guidence_weight_final", None)
        self.gw_final = None if gw_final is None else float(gw_final)
        self.gw_decay_steps = int(getattr(s, "guidence_decay_steps", 0) or 0)
        self.deterministic_actor = cfg.model.actor_type.startswith("Deterministic")
        # unbatched observation rank: 2 for single-frame (H, W); 3 for the
        # frame-stacked GoT 'channels' mode (C, H, W) and the 4-channel CNN
        # Deterministic actor (H, W, C) — used by choose_action to decide
        # whether to add a batch dim
        self.frame_stack = int(getattr(getattr(cfg, "env", None),
                                       "frame_stack", 4) or 4)
        self.channels_obs = (
            getattr(cfg.model, "patch_mode", "2d") == "channels"
            or cfg.model.actor_type == "Deterministic")
        self.obs_ndim = 3 if self.channels_obs else 2
        if self.deterministic_actor:
            # DRL.py:152-168: deterministic policies force alpha=0, no tuning
            self.auto_tune = False
            self.fixed_alpha = 0.0

        # attention-freeze fine-tuning (DRL.py:107-110,144-161): only the
        # Transformer variants carry the flags in the reference
        tcfg = getattr(cfg, "train", None)
        p_fix = bool(getattr(tcfg, "policy_attention_fix", False)) \
            and cfg.model.actor_type.endswith("Transformer")
        c_fix = bool(getattr(tcfg, "critic_attention_fix", False)) \
            and cfg.model.critic_type == "Transformer"
        self.actor_tx = (_attention_fix_tx(s.lr_actor) if p_fix
                         else optax.adam(s.lr_actor, eps=1e-8))
        self.critic_tx = (_attention_fix_tx(s.lr_critic) if c_fix
                          else optax.adam(s.lr_critic, eps=1e-8))
        self.alpha_tx = optax.adam(s.lr_alpha, eps=1e-8)

        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._per_step = jax.jit(self._per_step_impl, donate_argnums=(0,))
        self._guided_step = jax.jit(self._guided_step_impl, donate_argnums=(0,))
        self._guided_per_step = jax.jit(self._guided_per_step_impl,
                                        donate_argnums=(0,))
        self._act = jax.jit(self._act_impl, static_argnames=("evaluate", "dropout"))

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------
    def init_state(self, seed: int) -> SACTrainState:
        key = jax.random.PRNGKey(int(seed))
        k_actor, k_critic, k_rng = jax.random.split(key, 3)
        ih, iw = self.cfg.model.image_size
        if getattr(self.cfg.model, "patch_mode", "2d") == "channels":
            # frame-stacked GoT (Imitation_learning.py:118-121 layout)
            obs = jnp.zeros((1, self.frame_stack, ih, iw), jnp.float32)
        else:
            obs = jnp.zeros((1, ih, iw), jnp.float32)
        if self.cfg.model.actor_type == "Deterministic":
            obs_a = jnp.zeros((1, ih, iw, 4), jnp.float32)  # 4-chan CNN actor
        else:
            obs_a = obs
        pobs = jnp.zeros((1, self.cfg.sac.pstate_dim), jnp.float32)
        act = jnp.zeros((1, self.cfg.sac.action_dim), jnp.float32)

        actor_params = self.actor.init(k_actor, obs_a, pobs)["params"]
        critic_params = self.critic.init(k_critic, obs, pobs, act)["params"]
        # hard_update(critic_target, critic) (DRL.py:123)
        target_params = jax.tree_util.tree_map(jnp.copy, critic_params)
        return SACTrainState(
            actor_params=actor_params,
            critic_params=critic_params,
            critic_target_params=target_params,
            actor_opt=self.actor_tx.init(actor_params),
            critic_opt=self.critic_tx.init(critic_params),
            # DRL.py:129 zeros init == log(ALPHA=1.0); honoring cfg.sac.alpha
            # as the auto-tune STARTING point generalizes it (an IL-warm-
            # started fine-tune wants a low initial temperature so early
            # entropy bonuses don't wash out the cloned policy)
            log_alpha=jnp.log(jnp.asarray(self.cfg.sac.alpha, jnp.float32)),
            alpha_opt=self.alpha_tx.init(jnp.zeros((), jnp.float32)),
            itera=jnp.zeros((), jnp.int32),
            rng=k_rng,
        )

    # ------------------------------------------------------------------
    # grad-axis (shard_map DP) plumbing — all no-ops when grad_axis is None
    # ------------------------------------------------------------------
    def _sync_grads(self, grads):
        """pmean over the mapped data axis: with per-shard mean losses this
        yields exactly the global-batch gradient."""
        if self.grad_axis is None:
            return grads
        return jax.lax.pmean(grads, self.grad_axis)

    def _sync_mean(self, x):
        if self.grad_axis is None:
            return x
        return jax.lax.pmean(x, self.grad_axis)

    def _denom(self, denom_local, guard: Optional[float] = None):
        """Sum-form loss denominator. Under grad_axis, returns
        max(psum(denom), guard) / n so that local_loss = local_num / denom
        pmean-syncs to the exact global weighted loss."""
        if self.grad_axis is None:
            d = denom_local
        else:
            n = jax.lax.psum(jnp.ones((), jnp.float32), self.grad_axis)
            d = jax.lax.psum(denom_local, self.grad_axis)
            if guard is not None:
                return jnp.maximum(d, guard) / n
            return d / n
        return jnp.maximum(d, guard) if guard is not None else d

    def _shard_key(self, key):
        """Decorrelate batch-shaped draws (dropout masks) across shards.
        NOT bit-equal to the single-device stream — exact-equality tests run
        with dropout off; live training only needs independence."""
        if self.grad_axis is None:
            return key
        return jax.random.fold_in(key, jax.lax.axis_index(self.grad_axis) + 1)

    def _row_noise_draw(self, key, b: int, dim: int, rows=None):
        """(b, dim) standard-normal noise where row r depends only on
        (key, global row index) — shard-invariant by construction. `rows`
        overrides the global indices for batches whose local rows are not a
        contiguous global slice (the guided step's agent++expert concat)."""
        if rows is None:
            row0 = jnp.int32(0)
            if self.grad_axis is not None:
                row0 = jax.lax.axis_index(self.grad_axis) * b
            rows = jnp.arange(b, dtype=jnp.int32) + row0
        keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, rows)
        return jax.vmap(lambda k: jax.random.normal(k, (dim,)))(keys)

    # ------------------------------------------------------------------
    # pieces
    # ------------------------------------------------------------------
    def _alpha_of(self, state: SACTrainState) -> jax.Array:
        if self.auto_tune:
            return jnp.exp(state.log_alpha)
        return jnp.asarray(self.fixed_alpha, jnp.float32)

    def _sample_actor(self, params, obs, pobs, key, dropout_key=None,
                      inference: bool = False, noise_rows=None):
        """(action, log_prob, mean_action) with optional live dropout.
        `inference=True` routes eligible no-grad forwards through the
        whole-trunk megakernel (ops/got_megakernel.py)."""
        kwargs: Dict[str, Any] = {"inference": inference}
        if dropout_key is not None:
            kwargs.update(deterministic=False,
                          rngs={"dropout": self._shard_key(dropout_key)})
        else:
            kwargs.update(deterministic=True)
        noise = None
        if self.row_noise:
            noise = self._row_noise_draw(key, obs.shape[0],
                                         int(self.cfg.sac.action_dim),
                                         rows=noise_rows)
        if self.deterministic_actor:
            mean = self.actor.apply({"params": params}, obs, pobs, **kwargs)
            return distributions.deterministic_sample(key, mean, noise=noise)
        mean, log_std = self.actor.apply({"params": params}, obs, pobs, **kwargs)
        return distributions.sample(key, mean, log_std, noise=noise)

    def _apply_critic(self, params, obs, pobs, act, dropout_key=None,
                      inference: bool = False):
        if dropout_key is not None:
            return self.critic.apply({"params": params}, obs, pobs, act,
                                     deterministic=False,
                                     rngs={"dropout": self._shard_key(dropout_key)},
                                     inference=inference)
        return self.critic.apply({"params": params}, obs, pobs, act,
                                 deterministic=True, inference=inference)

    def _apply_critic_trunk(self, params, obs, pobs, dropout_key=None,
                            inference: bool = False):
        """Action-independent critic half (GoTQNetwork.trunk)."""
        if dropout_key is not None:
            return self.critic.apply({"params": params}, obs, pobs,
                                     deterministic=False,
                                     rngs={"dropout": self._shard_key(dropout_key)},
                                     inference=inference, method="trunk")
        return self.critic.apply({"params": params}, obs, pobs,
                                 deterministic=True, inference=inference,
                                 method="trunk")

    def _apply_critic_heads(self, params, latent, act):
        return self.critic.apply({"params": params}, latent, act,
                                 method="heads")

    # ------------------------------------------------------------------
    # acting
    # ------------------------------------------------------------------
    def _act_impl(self, actor_params, rng, obs, pobs, evaluate: bool,
                  dropout: bool):
        k_noise, k_drop = jax.random.split(rng)
        s = self._sample_actor(actor_params, obs, pobs, k_noise,
                               dropout_key=k_drop if dropout else None,
                               inference=True)
        return s.mean if evaluate else s.action

    def act_batch(self, actor_params, obs, pobs, rng,
                  evaluate: bool = False) -> jax.Array:
        """Batched action from bare actor params — the serving-layer entry
        (serve/fleet, train/train_fleet): callers that hold a latest-wins
        params mailbox rather than a full SACTrainState. Stochastic unless
        evaluate=True."""
        return self._act(actor_params, rng, jnp.asarray(obs, jnp.float32),
                         jnp.asarray(pobs, jnp.float32), evaluate, False)

    def choose_action(self, state: SACTrainState, obs, pobs, rng,
                      evaluate: bool = False,
                      dropout: Optional[bool] = None) -> jax.Array:
        """Single- or batched-state action (DRL.py:170-185). Unbatched inputs
        get a leading batch dim added and squeezed back."""
        obs = jnp.asarray(obs, jnp.float32)
        pobs = jnp.asarray(pobs, jnp.float32)
        squeeze = obs.ndim == self.obs_ndim
        if squeeze:
            obs, pobs = obs[None], pobs[None]
        if dropout is None:
            dropout = False
        a = self._act(state.actor_params, rng, obs, pobs, evaluate, dropout)
        return a[0] if squeeze else a

    # ------------------------------------------------------------------
    # core SAC update (DRL.py learn)
    # ------------------------------------------------------------------
    def _td_target(self, state, alpha, batch, key, noise_rows=None):
        k1, k2, k3 = jax.random.split(key, 3)
        # both TD-target forwards are no-grad (stop_gradient below): route
        # them through the blocks megakernel (embed+dropout stay in XLA)
        nxt = self._sample_actor(state.actor_params, batch["next_obs"],
                                 batch["next_pobs"], k1, dropout_key=k2,
                                 inference=True, noise_rows=noise_rows)
        q1_t, q2_t = self._apply_critic(state.critic_target_params,
                                        batch["next_obs"], batch["next_pobs"],
                                        nxt.action, dropout_key=k3,
                                        inference=True)
        min_q = jnp.minimum(q1_t, q2_t) - alpha * nxt.log_prob
        rew = batch["rew"].reshape(-1, 1)
        target = rew + self.gamma * min_q
        if self.done_mask:
            target = rew + self.gamma * (1.0 - batch["done"].reshape(-1, 1)) * min_q
        return jax.lax.stop_gradient(target)

    def _critic_update(self, state, batch, target, key, weights=None,
                       return_latent: bool = False):
        def loss_fn(cp):
            k1 = key
            if return_latent:
                # split apply so the trunk latent can be handed to the actor
                # step (critic_latent_reuse); numerically identical to the
                # composed __call__
                latent = self._apply_critic_trunk(cp, batch["obs"],
                                                  batch["pobs"], dropout_key=k1)
                q1, q2 = self._apply_critic_heads(cp, latent, batch["act"])
            else:
                latent = None
                q1, q2 = self._apply_critic(cp, batch["obs"], batch["pobs"],
                                            batch["act"], dropout_key=k1)
            if weights is None:
                l1 = jnp.mean(jnp.square(q1 - target))
                l2 = jnp.mean(jnp.square(q2 - target))
            else:
                w = weights.reshape(-1, 1)
                denom = self._denom(jnp.sum(w) * q1.shape[1])
                l1 = jnp.sum(w * jnp.square(q1 - target)) / denom
                l2 = jnp.sum(w * jnp.square(q2 - target)) / denom
            return l1 + l2, (l1, l2, latent)

        (qf_loss, (qf1_loss, qf2_loss, latent)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.critic_params)
        grads = self._sync_grads(grads)
        updates, new_opt = self.critic_tx.update(grads, state.critic_opt,
                                                 state.critic_params)
        new_params = optax.apply_updates(state.critic_params, updates)
        new_state = state.replace(critic_params=new_params, critic_opt=new_opt)
        if return_latent:
            return new_state, qf1_loss, qf2_loss, \
                jax.lax.stop_gradient(latent)
        return new_state, qf1_loss, qf2_loss

    def _actor_update(self, state, alpha, batch, key, weights=None,
                      extra_loss_fn=None, noise_rows=None,
                      critic_latent=None, critic_heads_params=None):
        """`critic_latent`/`critic_heads_params`: critic_latent_reuse mode —
        evaluate only the twin heads on a trunk latent stashed by the critic
        update (PRE-update params), skipping the trunk re-forward."""
        k1, k2, k3 = jax.random.split(key, 3)

        def loss_fn(ap):
            s = self._sample_actor(ap, batch["obs"], batch["pobs"], k1,
                                   dropout_key=k2, noise_rows=noise_rows)
            # the critic TRUNK latent is constant w.r.t. ap (the action joins
            # after the trunk, got_sac_network.py:114) — no gradient flows
            # into it, so the fused no-grad path applies
            if critic_latent is not None:
                q1_pi, q2_pi = self._apply_critic_heads(
                    critic_heads_params, critic_latent, s.action)
            else:
                q1_pi, q2_pi = self._apply_critic(state.critic_params,
                                                  batch["obs"], batch["pobs"],
                                                  s.action, dropout_key=k3,
                                                  inference=True)
            min_q = jnp.minimum(q1_pi, q2_pi)
            per_elem = alpha * s.log_prob - min_q  # (B,1)-(B,2) broadcast
            if weights is None:
                ploss = jnp.mean(per_elem)
            else:
                w = weights.reshape(-1, 1)
                ploss = jnp.sum(w * per_elem) / self._denom(
                    jnp.sum(w) * per_elem.shape[1])
            if extra_loss_fn is not None:
                ploss = ploss + extra_loss_fn(ap)
            return ploss, s.log_prob

        (policy_loss, log_pi), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.actor_params)
        grads = self._sync_grads(grads)
        updates, new_opt = self.actor_tx.update(grads, state.actor_opt,
                                                state.actor_params)
        new_params = optax.apply_updates(state.actor_params, updates)
        return state.replace(actor_params=new_params, actor_opt=new_opt), \
            policy_loss, log_pi

    def _alpha_update(self, state, log_pi):
        if not self.auto_tune:
            return state, jnp.asarray(0.0, jnp.float32)

        def loss_fn(la):
            return -jnp.mean(la * jax.lax.stop_gradient(
                log_pi + self.target_entropy))

        alpha_loss, grad = jax.value_and_grad(loss_fn)(state.log_alpha)
        grad = self._sync_grads(grad)
        updates, new_opt = self.alpha_tx.update(grad, state.alpha_opt,
                                                state.log_alpha)
        new_log_alpha = optax.apply_updates(state.log_alpha, updates)
        if self.alpha_max is not None:
            # opt-in ceiling (cfg.sac.alpha_max) — reference auto-tune has
            # no clamp (DRL.py:417-424) and measurably diverges on long
            # hard-world runs (BENCH.md round-3 session 6: alpha 10.3,
            # deterministic eval 0/100)
            new_log_alpha = jnp.minimum(
                new_log_alpha, jnp.log(jnp.asarray(self.alpha_max,
                                                   jnp.float32)))
        if self.alpha_min is not None:
            # opt-in floor (cfg.sac.alpha_min) — the symmetric failure:
            # alpha collapse (0.003 on the per-reset-DR arm, BENCH.md
            # round 4) removes the entropy regularizer from the Q-targets
            # mid-training and the critics diverge to inf
            new_log_alpha = jnp.maximum(
                new_log_alpha, jnp.log(jnp.asarray(self.alpha_min,
                                                   jnp.float32)))
        return state.replace(log_alpha=new_log_alpha, alpha_opt=new_opt), \
            alpha_loss

    def _polyak(self, state):
        def do(target):
            return jax.tree_util.tree_map(
                lambda t, s: t * (1.0 - self.tau) + s * self.tau,
                target, state.critic_params)

        new_target = jax.lax.cond(
            state.itera % self.policy_freq == 0,
            do, lambda t: t, state.critic_target_params)
        return state.replace(critic_target_params=new_target,
                             itera=state.itera + 1)

    def _apply_nan_guard(self, prev: SACTrainState, state: SACTrainState,
                         metrics: Dict[str, jax.Array]
                         ) -> Tuple[SACTrainState, Dict[str, jax.Array]]:
        """Roll the whole update back when any loss went non-finite (a bf16
        overflow in an amplified guidance loss, a saturated log-prob, ...).
        The step counter still advances so RNG/polyak cadence move on.
        Applied by EVERY update flavor — plain, guided, PER."""
        ok = jnp.logical_and(
            jnp.isfinite(metrics["qf1_loss"] + metrics["qf2_loss"]),
            jnp.isfinite(metrics["policy_loss"]))
        rolled = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), state, prev)
        state = rolled.replace(itera=state.itera)
        metrics["skipped_nonfinite"] = (~ok).astype(jnp.float32)
        return state, metrics

    def _augment(self, batch, key, expert_batch=None, itera=None):
        """Opt-in DrQ-v2 random-shift augmentation of the replayed frames
        (sac.aug_shift pixels; 0 = reference behavior, bit-identical — the
        extra keys below are fold_ins off the step key, so existing RNG
        streams never move). obs and next_obs shift independently per
        sample (DrQ-v2); expert frames augment too (the RAD/DrQ-BC
        convention — the BC regression sees the same view statistics as
        the RL losses). Under a sharded step the shard index folds in so
        lanes draw decorrelated offsets; that stream deliberately differs
        from the single-device one (augmentation is a regularizer, not a
        parity path — same stance as dropout under sharding).

        `itera` (traced step counter) gates the sac.aug_warmup window: for
        the first aug_warmup learn steps the raw frames pass through (the
        where() keeps shapes static — one compiled program either way)."""
        if not self.aug_shift:
            return batch if expert_batch is None else (batch, expert_batch)
        from dgvit_tpu.ops.augment import random_shift

        if self.grad_axis is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(self.grad_axis))
        on = jnp.asarray(True)
        if self.aug_warmup and itera is not None:
            on = itera >= self.aug_warmup

        def shift(d, tag):
            d = dict(d)
            d["obs"] = jnp.where(on, random_shift(
                d["obs"], jax.random.fold_in(key, tag), self.aug_shift),
                d["obs"])
            d["next_obs"] = jnp.where(on, random_shift(
                d["next_obs"], jax.random.fold_in(key, tag + 1),
                self.aug_shift), d["next_obs"])
            return d

        batch = shift(batch, 101)
        if expert_batch is None:
            return batch
        return batch, shift(expert_batch, 103)

    def _train_step_impl(self, state: SACTrainState, batch
                         ) -> Tuple[SACTrainState, Dict[str, jax.Array]]:
        prev = state
        key = jax.random.fold_in(state.rng, state.itera)
        clean = batch
        batch = self._augment(batch, key, itera=state.itera)
        # sac.aug_actor=False: the actor step (policy forward + its critic
        # Q evaluation) sees raw frames; only TD target + critic regression
        # see the shifted views (DrQ-v2 routing)
        actor_batch = batch if self.aug_actor else clean
        k_tgt, k_crit, k_act = jax.random.split(key, 3)
        alpha = self._alpha_of(state)

        target = self._td_target(state, alpha, batch, k_tgt)
        if self.latent_reuse:
            pre_critic = state.critic_params
            state, qf1_loss, qf2_loss, latent = self._critic_update(
                state, batch, target, k_crit, return_latent=True)
            state, policy_loss, log_pi = self._actor_update(
                state, alpha, actor_batch, k_act, critic_latent=latent,
                critic_heads_params=pre_critic)
        else:
            state, qf1_loss, qf2_loss = self._critic_update(state, batch,
                                                            target, k_crit)
            state, policy_loss, log_pi = self._actor_update(
                state, alpha, actor_batch, k_act)
        state, alpha_loss = self._alpha_update(state, log_pi)
        state = self._polyak(state)
        metrics = {
            "qf1_loss": qf1_loss, "qf2_loss": qf2_loss,
            "policy_loss": policy_loss, "alpha_loss": alpha_loss,
            "alpha": alpha, "entropy": -jnp.mean(log_pi),
        }
        metrics = {k: self._sync_mean(v) for k, v in metrics.items()}
        if self.nan_guard:
            state, metrics = self._apply_nan_guard(prev, state, metrics)
        return state, metrics

    def learn(self, state: SACTrainState, batch) -> Tuple[SACTrainState, Dict]:
        """One fused SAC update (DRL.py:373-437)."""
        return self._train_step(state, batch)

    # ------------------------------------------------------------------
    # PER update — the path the reference stubs out (DRL.py:365-368)
    # ------------------------------------------------------------------
    def _per_step_impl(self, state: SACTrainState, batch, is_weights):
        """Importance-weighted critic loss + per-sample TD errors returned
        for priority updates."""
        prev = state
        key = jax.random.fold_in(state.rng, state.itera)
        clean = batch
        batch = self._augment(batch, key, itera=state.itera)
        actor_batch = batch if self.aug_actor else clean
        k_tgt, k_crit, k_act = jax.random.split(key, 3)
        alpha = self._alpha_of(state)
        target = self._td_target(state, alpha, batch, k_tgt)

        def loss_fn(cp):
            if self.latent_reuse:
                latent = self._apply_critic_trunk(cp, batch["obs"],
                                                  batch["pobs"],
                                                  dropout_key=k_crit)
                q1, q2 = self._apply_critic_heads(cp, latent, batch["act"])
            else:
                latent = None
                q1, q2 = self._apply_critic(cp, batch["obs"], batch["pobs"],
                                            batch["act"], dropout_key=k_crit)
            td = jnp.abs(q1 - target).mean(axis=1)  # per-sample TD error
            w = is_weights.reshape(-1, 1)
            l1 = jnp.mean(w * jnp.square(q1 - target))
            l2 = jnp.mean(w * jnp.square(q2 - target))
            return l1 + l2, (l1, l2, td, latent)

        pre_critic = state.critic_params
        (qf_loss, (qf1_loss, qf2_loss, td, latent)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.critic_params)
        grads = self._sync_grads(grads)
        updates, new_opt = self.critic_tx.update(grads, state.critic_opt,
                                                 state.critic_params)
        state = state.replace(
            critic_params=optax.apply_updates(state.critic_params, updates),
            critic_opt=new_opt)

        if self.latent_reuse:
            state, policy_loss, log_pi = self._actor_update(
                state, alpha, batch, k_act,
                critic_latent=jax.lax.stop_gradient(latent),
                critic_heads_params=pre_critic)
        else:
            state, policy_loss, log_pi = self._actor_update(
                state, alpha, actor_batch, k_act)
        state, alpha_loss = self._alpha_update(state, log_pi)
        state = self._polyak(state)
        metrics = {"qf1_loss": qf1_loss, "qf2_loss": qf2_loss,
                   "policy_loss": policy_loss, "alpha_loss": alpha_loss,
                   "alpha": alpha}
        metrics = {k: self._sync_mean(v) for k, v in metrics.items()}
        if self.nan_guard:
            state, metrics = self._apply_nan_guard(prev, state, metrics)
            # the TD errors feed the PER sum-tree: an inf priority would
            # poison tree totals (and every IS weight after) permanently —
            # report neutral priorities for a rolled-back step. "Neutral"
            # must be scale-aware (typical |td| >> 1 at the ±200 reward
            # scale, so a fixed 1.0 would sharply demote affected rows):
            # use the batch mean of the finite |td| values (hosts apply
            # abs() before update_priorities, so a signed mean would land
            # near zero and demote the rows anyway), falling back to
            # 1.0 only when the whole batch went non-finite.
            bad = metrics["skipped_nonfinite"] > 0
            finite = jnp.isfinite(td)
            n_fin = jnp.sum(finite.astype(jnp.float32))
            neutral = jnp.where(
                n_fin > 0,
                jnp.sum(jnp.where(finite, jnp.abs(td), 0.0))
                / jnp.maximum(n_fin, 1.0),
                1.0)
            td = jnp.where(jnp.logical_or(bad, ~finite), neutral, td)
        return state, metrics, td

    def learn_per(self, state: SACTrainState, batch, is_weights):
        """PER update: pass cpprb-style importance weights, receive TD errors
        to feed PrioritizedReplayBuffer.update_priorities."""
        return self._per_step(state, batch, jnp.asarray(is_weights, jnp.float32))

    # ------------------------------------------------------------------
    # guided update (DRL.py learn_guidence)
    # ------------------------------------------------------------------
    def _guided_core(self, state: SACTrainState, batch, expert_batch,
                     n_expert: jax.Array, agent_weights: jax.Array):
        """batch: agent transitions (B, ...), includes 'engage';
        expert_batch: expert transitions (B, ...) with 'act' = expert action;
        n_expert: number of valid expert rows (rest are mask padding) —
        the reference's dynamic concat (DRL.py:195-220) with static shapes;
        agent_weights: per-agent-row loss weights — all-ones for the plain
        guided step, PER importance weights for the guided+PER combination.
        Returns (state, metrics, td) with td = per-agent-row |TD error| so
        the PER path can update priorities."""
        prev = state
        key = jax.random.fold_in(state.rng, state.itera)
        clean, clean_expert = batch, expert_batch
        batch, expert_batch = self._augment(batch, key, expert_batch,
                                            itera=state.itera)
        if not self.aug_actor:
            # DrQ-v2 routing: the actor-side losses (policy objective,
            # expert BC, engage BC) regress on raw frames; only the merged
            # critic path below keeps the shifted views
            actor_batch, actor_expert = clean, clean_expert
        else:
            actor_batch, actor_expert = batch, expert_batch
        k_tgt, k_crit, k_act, k_g, k_e = jax.random.split(key, 5)
        alpha = self._alpha_of(state)

        b = batch["obs"].shape[0]
        be = expert_batch["obs"].shape[0]
        # "first n_expert GLOBAL rows are valid" — under a data-sharded step
        # each shard holds rows [i*be, (i+1)*be) of the global expert batch
        row0 = jnp.int32(0)
        merged_rows = None
        if self.grad_axis is not None:
            i = jax.lax.axis_index(self.grad_axis)
            nsh = jax.lax.psum(jnp.ones((), jnp.int32), self.grad_axis)
            row0 = i * be
            # the local merged concat is NOT a contiguous global slice: the
            # global layout is [all agent rows (n*b)] ++ [all expert rows];
            # row-noise draws need the true global indices so the sharded
            # step reproduces the single-device stream
            merged_rows = jnp.concatenate([
                jnp.arange(b, dtype=jnp.int32) + i * b,
                nsh * b + jnp.arange(be, dtype=jnp.int32) + i * be])
        valid = ((jnp.arange(be) + row0) < n_expert).astype(jnp.float32)
        merged = {
            k: jnp.concatenate([batch[k], expert_batch[k]], axis=0)
            for k in ("obs", "pobs", "act", "rew", "next_obs", "next_pobs", "done")
        }
        weights = jnp.concatenate([agent_weights, valid])

        target = self._td_target(state, alpha, merged, k_tgt,
                                 noise_rows=merged_rows)

        def critic_loss_fn(cp):
            if self.latent_reuse:
                lat = self._apply_critic_trunk(cp, merged["obs"],
                                               merged["pobs"],
                                               dropout_key=k_crit)
                q1, q2 = self._apply_critic_heads(cp, lat, merged["act"])
            else:
                lat = None
                q1, q2 = self._apply_critic(cp, merged["obs"], merged["pobs"],
                                            merged["act"], dropout_key=k_crit)
            td = jnp.abs(q1 - target).mean(axis=1)[:b]
            w = weights.reshape(-1, 1)
            denom = self._denom(jnp.sum(w) * q1.shape[1])
            l1 = jnp.sum(w * jnp.square(q1 - target)) / denom
            l2 = jnp.sum(w * jnp.square(q2 - target)) / denom
            return l1 + l2, (l1, l2, td, lat)

        pre_critic = state.critic_params
        (_, (qf1_loss, qf2_loss, td, latent)), grads = jax.value_and_grad(
            critic_loss_fn, has_aux=True)(state.critic_params)
        grads = self._sync_grads(grads)
        updates, new_opt = self.critic_tx.update(grads, state.critic_opt,
                                                 state.critic_params)
        state = state.replace(
            critic_params=optax.apply_updates(state.critic_params, updates),
            critic_opt=new_opt)

        # guidance-weight curriculum: geometric decay w0 -> wf over
        # gw_decay_steps learn steps, computed from the traced step counter
        # (no retrace; constant when gw_final is unset)
        gw = jnp.asarray(self.guidence_weight, jnp.float32)
        if self.gw_final is not None and self.gw_decay_steps > 0 \
                and self.gw_final != self.guidence_weight:
            frac = jnp.clip(prev.itera.astype(jnp.float32)
                            / float(self.gw_decay_steps), 0.0, 1.0)
            gw = self.guidence_weight * jnp.power(
                self.gw_final / self.guidence_weight, frac)

        # expert BC loss on deterministic mean action (DRL.py:257-265)
        def guidence_loss(ap):
            s = self._sample_actor(ap, actor_expert["obs"],
                                   actor_expert["pobs"], k_g, dropout_key=None)
            sq = jnp.square(s.mean - actor_expert["act"])
            denom = self._denom(jnp.sum(valid) * sq.shape[1], guard=1.0)
            mse = jnp.sum(valid.reshape(-1, 1) * sq) / denom
            has_expert = (n_expert > 0).astype(jnp.float32)
            return gw * mse * has_expert

        # real-time intervention loss on engage==1 rows (DRL.py:267-276)
        def engage_loss(ap):
            eng = actor_batch["engage"].reshape(-1).astype(jnp.float32)
            s = self._sample_actor(ap, actor_batch["obs"],
                                   actor_batch["pobs"], k_e, dropout_key=None)
            sq = jnp.square(s.mean - actor_batch["act"])
            denom = self._denom(jnp.sum(eng) * sq.shape[1], guard=1.0)
            mse = jnp.sum(eng.reshape(-1, 1) * sq) / denom
            total_eng = jnp.sum(eng)
            if self.grad_axis is not None:
                total_eng = jax.lax.psum(total_eng, self.grad_axis)
            has_engage = (total_eng > 0).astype(jnp.float32)
            return self.engage_weight * mse * has_engage

        extra = lambda ap: guidence_loss(ap) + engage_loss(ap)
        if self.aug_actor:
            actor_merged = merged
        else:
            # raw-frame view of the same merged rows (actions/rewards are
            # identical; only the frames differ between the two views)
            actor_merged = {
                k: jnp.concatenate([actor_batch[k], actor_expert[k]], axis=0)
                for k in ("obs", "pobs", "act", "rew", "next_obs",
                          "next_pobs", "done")
            }
        reuse_kw = {}
        if self.latent_reuse:
            reuse_kw = dict(critic_latent=jax.lax.stop_gradient(latent),
                            critic_heads_params=pre_critic)
        state, policy_loss, log_pi = self._actor_update(
            state, alpha, actor_merged, k_act, weights=weights,
            extra_loss_fn=extra, noise_rows=merged_rows, **reuse_kw)
        state, alpha_loss = self._alpha_update(state, log_pi)
        state = self._polyak(state)
        metrics = {
            "qf1_loss": qf1_loss, "qf2_loss": qf2_loss,
            "policy_loss": policy_loss, "alpha_loss": alpha_loss,
            "alpha": alpha, "n_expert": n_expert.astype(jnp.float32),
            "guidence_weight": gw,
        }
        metrics = {k: self._sync_mean(v) for k, v in metrics.items()}
        if self.nan_guard:
            state, metrics = self._apply_nan_guard(prev, state, metrics)
            # scale-aware neutral priorities for rolled-back steps (see
            # _per_step_impl for rationale)
            bad = metrics["skipped_nonfinite"] > 0
            finite = jnp.isfinite(td)
            n_fin = jnp.sum(finite.astype(jnp.float32))
            neutral = jnp.where(
                n_fin > 0,
                jnp.sum(jnp.where(finite, jnp.abs(td), 0.0))
                / jnp.maximum(n_fin, 1.0),
                1.0)
            td = jnp.where(jnp.logical_or(bad, ~finite), neutral, td)
        return state, metrics, td

    def _guided_step_impl(self, state: SACTrainState, batch, expert_batch,
                          n_expert: jax.Array
                          ) -> Tuple[SACTrainState, Dict[str, jax.Array]]:
        b = batch["obs"].shape[0]
        state, metrics, _td = self._guided_core(
            state, batch, expert_batch, n_expert, jnp.ones((b,), jnp.float32))
        return state, metrics

    def _guided_per_step_impl(self, state: SACTrainState, batch, expert_batch,
                              n_expert: jax.Array, is_weights: jax.Array):
        """Guided + PER composition: agent rows weighted by PER importance
        weights, expert rows by validity; per-agent-row TD errors returned so
        the caller updates sum-tree priorities (fixes the silently-degenerate
        pre_buffer+prioritized_replay combination that paid sum-tree costs to
        sample uniformly)."""
        return self._guided_core(state, batch, expert_batch, n_expert,
                                 is_weights)

    def learn_guidence(self, state, batch, expert_batch, n_expert):
        return self._guided_step(state, batch, expert_batch,
                                 jnp.asarray(n_expert, jnp.int32))

    def learn_guidence_per(self, state, batch, expert_batch, n_expert,
                           is_weights):
        """PER-aware guided update: returns (state, metrics, td_errors)."""
        return self._guided_per_step(
            state, batch, expert_batch, jnp.asarray(n_expert, jnp.int32),
            jnp.asarray(is_weights, jnp.float32))

    @staticmethod
    def expert_batch_size(exp_buffer_size: int, agent_buffer_size: int,
                          batch_size: int) -> int:
        """DRL.py:195: min(floor(exp/agent * batch), batch)."""
        if agent_buffer_size <= 0:
            return batch_size
        return int(min(np.floor(exp_buffer_size / agent_buffer_size * batch_size),
                       batch_size))

    # ------------------------------------------------------------------
    # checkpoint conveniences mirroring the DRL.py API surface
    # ------------------------------------------------------------------
    def save(self, state: SACTrainState, filename: str, directory: str,
             reward: float, seed: int, nb_col: int = 100):
        """DRL.py:489-491 metric-encoded actor+critic export."""
        from dgvit_tpu.core import checkpoint as ckpt

        name = ckpt.reference_name(filename, reward, seed, nb_col)
        a = ckpt.save_params_npz(directory, name,
                                 jax.tree_util.tree_map(np.asarray,
                                                        state.actor_params),
                                 kind="actor")
        c = ckpt.save_params_npz(directory, name,
                                 jax.tree_util.tree_map(np.asarray,
                                                        state.critic_params),
                                 kind="critic")
        return a, c

    def load(self, state: SACTrainState, filename: str, directory: str,
             actor_only: bool = False) -> SACTrainState:
        """DRL.py:493-503 load/load_actor."""
        from dgvit_tpu.core import checkpoint as ckpt

        actor = ckpt.load_params_npz(f"{directory}/{filename}_actor.npz",
                                     state.actor_params)
        state = state.replace(actor_params=actor)
        if not actor_only:
            critic = ckpt.load_params_npz(f"{directory}/{filename}_critic.npz",
                                          state.critic_params)
            state = state.replace(critic_params=critic)
        return state

    def load_target(self, state: SACTrainState) -> SACTrainState:
        """DRL.py:499-500 hard_update(critic_target, critic)."""
        return state.replace(critic_target_params=jax.tree_util.tree_map(
            jnp.copy, state.critic_params))
