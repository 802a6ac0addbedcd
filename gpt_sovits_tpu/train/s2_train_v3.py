"""v3/v4 CFM training: full fine-tune and LoRA.

Re-design of the reference s2_train_v3.py / s2_train_v3_lora.py: one jitted
update. No discriminator — the loss is the flow-matching MSE from
SynthesizerTrnV3.forward (models.py:1214-1242).

Freezing matches the reference:
  * full fine-tune: ssl_proj, quantizer and enc_p frozen
    (models.py:1212-1215 set_no_grad)
  * LoRA: only LoRA A/B factors on the DiT attention projections
    (to_q/to_k/to_v/to_out — s2_train_v3_lora.py:134-139) plus the
    unfrozen front-end train; base weights stay fixed. LoRA is realized
    functionally: params stay intact, a parallel low-rank delta tree is
    trained and merged into the base weights at export (TTS.py:560-572
    merge_and_unload equivalent).
"""

from __future__ import annotations

from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax

from gpt_sovits_tpu.models.v3 import SynthesizerTrnV3
from gpt_sovits_tpu.utils.config import TrainConfig

FROZEN_V3 = ("ssl_proj", "quantizer", "enc_p")
LORA_TARGETS = ("to_q", "to_k", "to_v", "to_out")


def _label_params(params):
    def label(path, _):
        keys = [getattr(p, "key", None) for p in path]
        return "frozen" if any(k in FROZEN_V3 for k in keys) else "base"

    return jax.tree_util.tree_map_with_path(label, params)


@flax.struct.dataclass
class V3TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    lora: Any = None  # {path: {"a": (r, in), "b": (out, r)}} when LoRA


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int = 100):
    lr = optax.exponential_decay(cfg.learning_rate, steps_per_epoch, cfg.lr_decay)
    return optax.multi_transform(
        {"base": optax.adamw(lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps), "frozen": optax.set_to_zero()},
        lambda params: _label_params(params),
    )


def make_train_step(model: SynthesizerTrnV3, cfg: TrainConfig, steps_per_epoch: int = 100):
    opt = make_optimizer(cfg, steps_per_epoch)

    def train_step(state: V3TrainState, batch: dict, rng: jax.Array):
        def loss_fn(params):
            return model.apply(
                params,
                batch["ssl"], batch["spec"], batch["spec_lengths"],
                batch["mel"], batch["mel_lengths"],
                batch["text"], batch["text_lengths"],
                rng=jax.random.fold_in(rng, state.step),
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        upd, new_opt = opt.update(grads["params"], state.opt_state, state.params["params"])
        new_params = {"params": optax.apply_updates(state.params["params"], upd)}
        return V3TrainState(state.step + 1, new_params, new_opt), {"cfm_loss": loss}

    return jax.jit(train_step, donate_argnums=(0,))


def init_state(key: jax.Array, model: SynthesizerTrnV3, cfg: TrainConfig, sample_batch: dict) -> V3TrainState:
    params = model.init(
        {"params": key, "noise": jax.random.fold_in(key, 1)},
        sample_batch["ssl"], sample_batch["spec"], sample_batch["spec_lengths"],
        sample_batch["mel"], sample_batch["mel_lengths"],
        sample_batch["text"], sample_batch["text_lengths"],
        method=SynthesizerTrnV3.init_all,
    )
    opt = make_optimizer(cfg)
    return V3TrainState(jnp.zeros((), jnp.int32), params, opt.init(params["params"]))


# ---------------------------------------------------------------------------
# LoRA
# ---------------------------------------------------------------------------


def init_lora(params, rank: int, key: jax.Array):
    """Low-rank deltas for DiT attention projections. Returns a pytree with
    the same structure as params but only at LORA_TARGET leaves:
    {"a": (in, r) ~ N(0, 1/r), "b": (r, out) = 0} so the initial delta is 0
    (peft LoraConfig default init)."""
    flat = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            if len(path) >= 2 and path[-1] == "kernel" and path[-2] in LORA_TARGETS:
                flat[path] = node.shape

    walk(params["params"], ())
    lora = {}
    for i, (path, shape) in enumerate(sorted(flat.items())):
        sub = jax.random.fold_in(key, i)
        node = lora
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = {
            "a": jax.random.normal(sub, (shape[0], rank)) / jnp.sqrt(rank),
            "b": jnp.zeros((rank, shape[1])),
        }
    return lora


def merge_lora(params, lora, scale: float = 1.0):
    """Base weights + a@b deltas -> merged params (export-time merge,
    equivalent of peft merge_and_unload in TTS.py:560-572)."""

    def walk(node, delta):
        if not isinstance(delta, dict):
            return node
        if set(delta.keys()) == {"a", "b"}:
            return node + scale * (delta["a"] @ delta["b"])
        out = dict(node)
        for k, v in delta.items():
            if k in out:
                out[k] = walk(out[k], v)
        return out

    return {"params": walk(params["params"], lora)}


def make_lora_optimizer(cfg: TrainConfig, steps_per_epoch: int = 100):
    lr = optax.exponential_decay(cfg.learning_rate, steps_per_epoch, cfg.lr_decay)
    return optax.adamw(lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps)


def make_lora_train_step(model: SynthesizerTrnV3, cfg: TrainConfig, steps_per_epoch: int = 100):
    """Trains ONLY the LoRA deltas (base params fixed)."""
    opt = make_lora_optimizer(cfg, steps_per_epoch)

    def train_step(state: V3TrainState, batch: dict, rng: jax.Array):
        def loss_fn(lora):
            merged = merge_lora(state.params, lora)
            return model.apply(
                merged,
                batch["ssl"], batch["spec"], batch["spec_lengths"],
                batch["mel"], batch["mel_lengths"],
                batch["text"], batch["text_lengths"],
                rng=jax.random.fold_in(rng, state.step),
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.lora)
        upd, new_opt = opt.update(grads, state.opt_state, state.lora)
        new_lora = optax.apply_updates(state.lora, upd)
        return V3TrainState(state.step + 1, state.params, new_opt, new_lora), {"cfm_loss": loss}

    return jax.jit(train_step, donate_argnums=(0,))
