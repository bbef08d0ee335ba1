"""Behavior-cloning / imitation trainer (Imitation_learning.py semantics).

Reference pipeline (Imitation_learning.py:656-719,721-845):
  * demo npz glob -> concat -> 80/20 random split (:776-794)
  * shuffled minibatches of 32 (:798-801)
  * loss = RMSE(clip(mean_action, +-1), demo_action) on the policy's
    deterministic tanh mean (:671-696)
  * global grad-norm clip 10 BEFORE Adam(lr=1e-3) (:692-693,812)
  * 600 epochs, keep the lowest-validation-loss actor (:821-834)

The IL fork's model deltas (vs GoalFormer.py) are reproduced via GoTPolicy
options: channels-aware patch embed for (B, 4, 128, 160) frame stacks
(Imitation_learning.py:118-121), final LayerNorm instead of RMSNorm (:110),
emb_dropout 0 (:105).

The whole epoch runs as one jitted scan over device-resident batches — no
DataLoader workers, no per-batch dispatch.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from dgvit_tpu.models.policies import GoTPolicy


def il_policy(block: int = 4, head: int = 4, l_f_size: int = 32,
              mlp_dim: int = 2048, dtype=None) -> GoTPolicy:
    """The Imitation_learning.py actor (note the reference's IL __main__
    does NOT pass l_f_size, so it uses SAC's default 32, DRL dup :319)."""
    return GoTPolicy(block=block, head=head, l_f_size=l_f_size,
                     mlp_dim=mlp_dim, patch_mode="channels",
                     final_norm="layer", emb_dropout=0.0, dtype=dtype)


@struct.dataclass
class BCTrainState:
    params: Any
    opt: Any
    epoch: jax.Array


@functools.partial(jax.jit, static_argnames=("nb", "bs"))
def _gather_batches(obs_d, goal_d, act_d, idx, *, nb: int, bs: int):
    """On-device shuffled batch stacking: (N, ...) corpus + (nb*bs,) index
    permutation -> (nb, bs, ...) stacks. Module-level jit so the compile is
    cached ACROSS BCTrainer.fit calls — a per-fit closure over the device
    arrays re-traced (and re-compiled, ~1 min on the tunneled backend) every
    invocation."""
    shape = lambda a: (nb, bs) + a.shape[1:]
    return (jnp.take(obs_d, idx, axis=0).reshape(shape(obs_d)),
            jnp.take(goal_d, idx, axis=0).reshape(shape(goal_d)),
            jnp.take(act_d, idx, axis=0).reshape(shape(act_d)))


def split_80_20(n: int, seed: int) -> Tuple[np.ndarray, np.ndarray]:
    """torch.random_split-style random index split (4:1)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    k = int(0.8 * n)
    return perm[:k], perm[k:]


class BCTrainer:
    def __init__(self, model: Optional[GoTPolicy] = None, lr: float = 1e-3,
                 grad_clip: float = 10.0, max_action: float = 1.0,
                 batch_size: int = 32, seed: int = 1):
        self.model = model or il_policy()
        self.max_action = float(max_action)
        self.batch_size = int(batch_size)
        self.seed = int(seed)
        self.tx = optax.chain(optax.clip_by_global_norm(grad_clip),
                              optax.adam(lr, eps=1e-8))
        self._epoch_fn = jax.jit(self._epoch_impl, donate_argnums=(0,))
        self._eval_fn = jax.jit(self._eval_impl)

    def init_state(self, obs_shape=(4, 128, 160), pstate_dim=2) -> BCTrainState:
        key = jax.random.PRNGKey(self.seed)
        params = self.model.init(
            key, jnp.zeros((1,) + tuple(obs_shape)), jnp.zeros((1, pstate_dim))
        )["params"]
        return BCTrainState(params=params, opt=self.tx.init(params),
                            epoch=jnp.zeros((), jnp.int32))

    # -- loss ----------------------------------------------------------------
    def _rmse(self, params, obs, goal, act):
        mean, _ = self.model.apply({"params": params}, obs, goal)
        pred = jnp.clip(jnp.tanh(mean) * self.max_action,
                        -self.max_action, self.max_action)
        return jnp.sqrt(jnp.mean(jnp.square(pred - act)))

    # -- one full epoch as a scan over (nb, B, ...) stacked batches -----------
    def _epoch_impl(self, state: BCTrainState, obs, goal, act):
        nb = obs.shape[0]

        def body(carry, xs):
            params, opt = carry
            o, g, a = xs
            loss, grads = jax.value_and_grad(self._rmse)(params, o, g, a)
            updates, opt = self.tx.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
            return (params, opt), loss

        (params, opt), losses = jax.lax.scan(
            body, (state.params, state.opt), (obs, goal, act))
        return BCTrainState(params=params, opt=opt, epoch=state.epoch + 1), \
            jnp.mean(losses)

    def _eval_impl(self, params, obs, goal, act):
        def body(carry, xs):
            o, g, a = xs
            return carry, self._rmse(params, o, g, a)

        _, losses = jax.lax.scan(body, None, (obs, goal, act))
        return jnp.mean(losses)

    # -- host-side data plumbing ----------------------------------------------
    @staticmethod
    def _batch_stack(arrs, idx, batch_size):
        """Shuffle + drop remainder + stack into (nb, B, ...)."""
        n = (len(idx) // batch_size) * batch_size
        idx = idx[:n]
        return [a[idx].reshape((-1, batch_size) + a.shape[1:]) for a in arrs]

    def fit(self, obs: np.ndarray, goal: np.ndarray, act: np.ndarray,
            epochs: int = 600, seed: Optional[int] = None, verbose: bool = False,
            to_chw: bool = True):
        """obs (N, 128, 160, 4) NHWC demo recordings; goal (N, >=2); act (N, 2).
        Returns (best_params, history dict)."""
        seed = self.seed if seed is None else seed
        if to_chw and obs.ndim == 4:
            obs = np.transpose(obs, (0, 3, 1, 2))  # torch permute(0,3,1,2)
        goal = goal[:, :2]
        tr, va = split_80_20(len(obs), seed)
        # degenerate tiny datasets: int(0.8*1) == 0 makes the TRAIN split
        # empty (zero batches -> NaN epoch loss); guard both splits so losses
        # stay finite and best-checkpoint selection still works
        if len(tr) == 0:
            tr = va
        if len(va) == 0:
            va = tr[: max(1, len(tr) // 5)]
        rng = np.random.default_rng(seed)

        state = self.init_state(obs_shape=obs.shape[1:],
                                pstate_dim=goal.shape[1])
        # clamp the val batch to the split size — a val split smaller than
        # batch_size would otherwise stack to ZERO batches and make every
        # val loss nan (empty-scan mean)
        vb = max(1, min(self.batch_size, len(va)))
        vo, vg, va_ = [jnp.asarray(x) for x in
                       self._batch_stack((obs, goal, act), va, vb)]
        # Device-resident dataset: the whole corpus moves to HBM ONCE and
        # each epoch gathers its shuffled batches on-device (jnp.take) — the
        # only per-epoch host->device transfer is the (N,) permutation.
        # Re-staging the full dataset every epoch costs ~dataset-size x
        # epochs of PCIe/tunnel traffic and dominated BC wall-clock.
        obs_d, goal_d, act_d = (jnp.asarray(obs), jnp.asarray(goal),
                                jnp.asarray(act))
        # clamp the TRAIN batch too: a train split smaller than batch_size
        # would stack to zero batches and silently skip every update
        tb_size = max(1, min(self.batch_size, len(tr)))
        nb = len(tr) // tb_size

        gather = functools.partial(_gather_batches, obs_d, goal_d, act_d,
                                   nb=nb, bs=tb_size)

        # DEVICE-side copy (jnp.copy): state.params buffers get DONATED by
        # _epoch_fn, so a bare alias would be deleted — but a host pull here
        # costs a device->host round trip PER LEAF per improving epoch
        # (~1s/epoch on a tunneled backend); materialize on host ONCE at
        # return instead
        best_val = np.inf
        best_params = jax.tree_util.tree_map(jnp.copy, state.params)
        hist = {"train": [], "val": []}
        for ep in range(epochs):
            order = rng.permutation(tr)[: nb * tb_size]
            bo, bg, ba = gather(jnp.asarray(order))
            state, tr_loss = self._epoch_fn(state, bo, bg, ba)
            val_loss = float(self._eval_fn(state.params, vo, vg, va_))
            hist["train"].append(float(tr_loss))
            hist["val"].append(val_loss)
            if val_loss < best_val:   # keep lowest-val actor (:830-834)
                best_val = val_loss
                best_params = jax.tree_util.tree_map(jnp.copy, state.params)
            if verbose:
                print(f"Epoch:{ep}, Train and Validation loss are:"
                      f"{hist['train'][-1]:.4f}, {val_loss:.4f}")
        # single host materialization of the winning snapshot
        return jax.tree_util.tree_map(np.asarray, best_params), hist
