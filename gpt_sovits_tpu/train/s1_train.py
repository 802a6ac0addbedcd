"""S1 AR model training: jitted step with grad accumulation and DPO.

Re-design of the reference Lightning trainer (GPT_SoVITS/s1_train.py +
AR/models/t2s_lightning_module.py): manual-optimization grad-accum-4
becomes optax.MultiSteps; ScaledAdam + WarmupCosineLRSchedule become AdamW
+ warmup-cosine (the reference's scheduler hard-locks lr=0.002 after the
first step anyway — lr_schedulers.py:58 — so the effective reference recipe
is "constant 0.002 after warmup", which warmup_constant reproduces; a true
cosine decay is available as an option).

DPO branch (t2s_model.py:408-448 forward + utils.make_reject_y): the
chosen/rejected double forward and preference loss run inside the same
jitted step when enabled.
"""

from __future__ import annotations

from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax

from gpt_sovits_tpu.models.t2s import T2SDecoder, t2s_loss
from gpt_sovits_tpu.utils.config import TrainConfig


@flax.struct.dataclass
class S1TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def make_schedule(cfg: TrainConfig, *, peak_lr: float = 0.002, cosine: bool = False, decay_steps: int = 40000):
    if cosine:
        return optax.warmup_cosine_decay_schedule(
            init_value=1e-5, peak_value=peak_lr, warmup_steps=cfg.warmup_steps,
            decay_steps=decay_steps, end_value=1e-4,
        )
    warm = optax.linear_schedule(1e-5, peak_lr, cfg.warmup_steps)
    return lambda step: jnp.where(step < cfg.warmup_steps, warm(step), peak_lr)


def make_optimizer(cfg: TrainConfig, *, optimizer: str = "adamw", **sched_kw):
    if optimizer == "scaled_adam":
        from gpt_sovits_tpu.train.scaled_adam import scaled_adam

        inner = scaled_adam(make_schedule(cfg, peak_lr=sched_kw.pop("peak_lr", 0.025), **sched_kw))
    else:
        inner = optax.adamw(make_schedule(cfg, **sched_kw), b1=0.9, b2=0.95, eps=1e-8)
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), inner)
    if cfg.grad_accum > 1:
        tx = optax.MultiSteps(tx, cfg.grad_accum)
    return tx


def init_state(key: jax.Array, model: T2SDecoder, cfg: TrainConfig, **sched_kw) -> S1TrainState:
    params = model.init(key, method=T2SDecoder.init_all)
    opt = make_optimizer(cfg, **sched_kw)
    return S1TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt.init(params["params"]))


def make_reject_y(y: jnp.ndarray, y_lens: jnp.ndarray, key: jax.Array):
    """Synthesize DPO rejected samples (ref AR/models/utils.py:244
    make_reject_y): randomly repeat or drop a token run in each sequence.

    Shape-stable variant: instead of variable-length splice, corrupt by
    shifting a random suffix by one (drop) or duplicating a random token
    (repeat) within the fixed buffer."""
    b, t = y.shape
    k1, k2, k3 = jax.random.split(key, 3)
    pos = jax.random.randint(k1, (b,), 0, jnp.maximum(y_lens - 1, 1))
    mode = jax.random.bernoulli(k2, 0.5, (b,))  # True: repeat, False: drop
    ar = jnp.arange(t)[None, :]

    # repeat: y' = [..y[pos], y[pos], y[pos+1..]] (suffix shifted right)
    shift_right = jnp.where(ar > pos[:, None], jnp.roll(y, 1, axis=1), y)
    rep = jnp.where(ar == pos[:, None] + 1, jnp.take_along_axis(y, pos[:, None], 1), shift_right)
    # drop: y' = [..y[pos-1], y[pos+1..]] (suffix shifted left)
    drop = jnp.where(ar >= pos[:, None], jnp.roll(y, -1, axis=1), y)

    reject = jnp.where(mode[:, None], rep, drop)
    reject_lens = jnp.where(mode, jnp.minimum(y_lens + 1, t), jnp.maximum(y_lens - 1, 1))
    return reject, reject_lens


def dpo_loss(chosen_logps, rejected_logps, beta: float = 0.2):
    """Reference-free DPO (ref utils.py:202, reference_free=True)."""
    logits = chosen_logps - rejected_logps
    return -jax.nn.log_sigmoid(beta * logits).mean()


def make_train_step(model: T2SDecoder, cfg: TrainConfig, *, use_dpo: bool = False, **sched_kw):
    opt = make_optimizer(cfg, **sched_kw)

    def train_step(state: S1TrainState, batch: dict, rng: jax.Array):
        def loss_fn(params):
            loss, aux = t2s_loss(
                model, params,
                batch["phoneme_ids"], batch["phoneme_lens"],
                batch["semantic_ids"], batch["semantic_lens"],
                batch["bert_features"],
            )
            if use_dpo:
                rej_y, rej_lens = make_reject_y(
                    batch["semantic_ids"], batch["semantic_lens"], jax.random.fold_in(rng, state.step)
                )
                rej_loss, rej_aux = t2s_loss(
                    model, params,
                    batch["phoneme_ids"], batch["phoneme_lens"],
                    rej_y, rej_lens, batch["bert_features"],
                )
                chosen_logps = (aux["logp"] * aux["mask"]).sum(-1)
                rejected_logps = (rej_aux["logp"] * rej_aux["mask"]).sum(-1)
                loss = loss + dpo_loss(chosen_logps, rejected_logps)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        upd, new_opt = opt.update(grads["params"], state.opt_state, state.params["params"])
        new_params = {"params": optax.apply_updates(state.params["params"], upd)}
        metrics = {"loss": loss, "acc": aux["acc"], "tokens": aux["tokens"]}
        return S1TrainState(state.step + 1, new_params, new_opt), metrics

    return jax.jit(train_step, donate_argnums=(0,))
