"""S2 GAN training: one jitted two-optimizer update.

Re-design of the reference trainer (GPT_SoVITS/s2_train.py): the
mp.spawn-per-GPU + DDP + GradScaler scaffolding collapses into a single
`train_step` jitted over a (data, model) mesh — bf16 removes the need for
loss scaling, the gradient allreduce is a compiler-inserted psum, and the
D-then-G sequence runs inside one compiled step.

Loss recipe (s2_train.py:432-461):
  D:  LSGAN discriminator loss on (real, stop_grad(fake))
  G:  adv + feature-matching + 45*mel L1 + KL + VQ commit

Optimizer parity (s2_train.py:172-192): AdamW(lr, betas=(0.8,0.99),
eps=1e-9); text modules (enc_p text_embedding / encoder_text / mrte) at
lr * text_low_lr_rate; exponential decay lr *= 0.999875 per epoch;
ssl_proj + quantizer frozen when freeze_quantizer (models.py:915-920).
"""

from __future__ import annotations

from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax

from gpt_sovits_tpu.dsp.mel import mel_spectrogram, spec_to_mel
from gpt_sovits_tpu.models.discriminators import (
    MultiPeriodDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
    kl_loss,
)
from gpt_sovits_tpu.models.vits import SynthesizerTrn
from gpt_sovits_tpu.utils.config import MelConfig, S2Config, TrainConfig


@flax.struct.dataclass
class S2TrainState:
    step: jnp.ndarray
    params_g: Any
    params_d: Any
    opt_g: Any
    opt_d: Any


TEXT_MODULES = ("text_embedding", "encoder_text", "mrte")
FROZEN_MODULES = ("quantizer", "ssl_proj")


@flax.struct.dataclass
class VQEmaState:
    """EMA-kmeans codebook statistics (ref core_vq.py EuclideanCodebook:
    cluster_size + embed_avg buffers)."""

    cluster_size: jnp.ndarray  # (K,)
    embed_avg: jnp.ndarray  # (K, D)

    @classmethod
    def init(cls, embed: jnp.ndarray) -> "VQEmaState":
        return cls(cluster_size=jnp.zeros(embed.shape[0]), embed_avg=jnp.asarray(embed))


def vq_ema_update(
    embed: jnp.ndarray,  # (K, D) current codebook
    state: VQEmaState,
    x: jnp.ndarray,  # (N, D) encoder outputs assigned this step
    codes: jnp.ndarray,  # (N,) assignments
    *,
    decay: float = 0.99,
    epsilon: float = 1e-5,
) -> tuple[jnp.ndarray, VQEmaState]:
    """One EMA-kmeans codebook step (core_vq.py:199-225): EMA of per-code
    counts and sums, then laplace-smoothed normalization. Pure function —
    from-scratch S2 training applies it after each train step (the
    fine-tune recipe keeps freeze_quantizer=True and never calls this)."""
    k = embed.shape[0]
    onehot = jax.nn.one_hot(codes, k, dtype=x.dtype)  # (N, K)
    counts = onehot.sum(axis=0)
    sums = onehot.T @ x  # (K, D)
    cluster_size = state.cluster_size * decay + counts * (1 - decay)
    embed_avg = state.embed_avg * decay + sums * (1 - decay)
    n = cluster_size.sum()
    smoothed = (cluster_size + epsilon) / (n + k * epsilon) * n
    new_embed = embed_avg / smoothed[:, None]
    return new_embed, VQEmaState(cluster_size, embed_avg)


def _label_params_g(params, freeze_quantizer: bool):
    """'text' for low-lr text modules, 'frozen' for vq, 'base' otherwise."""

    def label(path, _):
        keys = [getattr(p, "key", None) for p in path]
        if freeze_quantizer and any(k in FROZEN_MODULES for k in keys):
            return "frozen"
        if any(k in TEXT_MODULES for k in keys):
            return "text"
        return "base"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer_g(cfg: TrainConfig, s2: S2Config, steps_per_epoch: int = 100):
    lr = optax.exponential_decay(cfg.learning_rate, steps_per_epoch, cfg.lr_decay)
    lr_text = optax.exponential_decay(cfg.learning_rate * cfg.text_low_lr_rate, steps_per_epoch, cfg.lr_decay)

    def adamw(sched):
        return optax.adamw(sched, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps)

    return optax.multi_transform(
        {"base": adamw(lr), "text": adamw(lr_text), "frozen": optax.set_to_zero()},
        lambda params: _label_params_g(params, s2.freeze_quantizer),
    )


def make_optimizer_d(cfg: TrainConfig, steps_per_epoch: int = 100):
    lr = optax.exponential_decay(cfg.learning_rate, steps_per_epoch, cfg.lr_decay)
    return optax.adamw(lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps)


def init_state(
    key: jax.Array,
    s2: S2Config,
    train_cfg: TrainConfig,
    sample_batch: dict,
    steps_per_epoch: int = 100,
) -> tuple[S2TrainState, SynthesizerTrn, MultiPeriodDiscriminator]:
    gen = SynthesizerTrn(s2)
    periods = (2, 3, 5, 7, 11, 17, 23) if s2.is_pro else (2, 3, 5, 7, 11)
    disc = MultiPeriodDiscriminator(periods)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params_g = gen.init(
        {"params": k1, "noise": k2, "slice": k3},
        sample_batch["ssl"], sample_batch["spec"], sample_batch["spec_lengths"],
        sample_batch["text"], sample_batch["text_lengths"],
        sv_emb=sample_batch.get("sv_emb"),
        method=SynthesizerTrn.init_all,
    )
    seg_wav = sample_batch["wav"][:, : 64, :]
    params_d = disc.init(k4, seg_wav, seg_wav)
    opt_g = make_optimizer_g(train_cfg, s2, steps_per_epoch)
    opt_d = make_optimizer_d(train_cfg, steps_per_epoch)
    state = S2TrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=params_g,
        params_d=params_d,
        opt_g=opt_g.init(params_g["params"]),
        opt_d=opt_d.init(params_d["params"]),
    )
    return state, gen, disc


def make_train_step(
    gen: SynthesizerTrn,
    disc: MultiPeriodDiscriminator,
    train_cfg: TrainConfig,
    mel_cfg: MelConfig,
    steps_per_epoch: int = 100,
):
    """Build the jitted (donated) train step closure."""
    s2 = gen.cfg
    opt_g = make_optimizer_g(train_cfg, s2, steps_per_epoch)
    opt_d = make_optimizer_d(train_cfg, steps_per_epoch)
    hop = mel_cfg.hop_size
    seg_frames = s2.segment_size
    seg_samples = seg_frames * hop

    def train_step(state: S2TrainState, batch: dict, rng: jax.Array):
        rng_noise, rng_slice = jax.random.split(jax.random.fold_in(rng, state.step))

        # ---- generator forward ----
        def g_forward(params_g):
            out = gen.apply(
                params_g,
                batch["ssl"], batch["spec"], batch["spec_lengths"],
                batch["text"], batch["text_lengths"],
                rngs_noise=rng_noise, rng_slice=rng_slice,
                sv_emb=batch.get("sv_emb"),
            )
            return out

        # ---- D step ----
        out_for_d = g_forward(state.params_g)
        starts = out_for_d["ids_slice"]
        wav_real = jax.vmap(
            lambda w, st: jax.lax.dynamic_slice(w, (st * hop, 0), (seg_samples, 1))
        )(batch["wav"], starts)
        wav_fake = jax.lax.stop_gradient(out_for_d["wav_hat"])

        def d_loss_fn(params_d):
            y_d_rs, y_d_gs, _, _ = disc.apply(params_d, wav_real, wav_fake)
            loss_d, _, _ = discriminator_loss(y_d_rs, y_d_gs)
            return loss_d

        loss_d, grads_d = jax.value_and_grad(d_loss_fn)(state.params_d)
        upd_d, new_opt_d = opt_d.update(grads_d["params"], state.opt_d, state.params_d["params"])
        new_params_d = {"params": optax.apply_updates(state.params_d["params"], upd_d)}

        # ---- G step (with updated D, as in the reference ordering) ----
        mel_real_full = spec_to_mel(jnp.swapaxes(batch["spec"], 1, 2), mel_cfg)  # (B, M, T)
        mel_real = jax.vmap(
            lambda m, st: jax.lax.dynamic_slice(m, (0, st), (m.shape[0], seg_frames))
        )(mel_real_full, starts)

        def g_loss_fn(params_g):
            out = g_forward(params_g)
            wav_hat = out["wav_hat"]
            mel_hat = mel_spectrogram(wav_hat[..., 0], mel_cfg)
            y_d_rs, y_d_gs, fmap_rs, fmap_gs = disc.apply(new_params_d, wav_real, wav_hat)
            loss_adv, _ = generator_loss(y_d_gs)
            loss_fm = feature_loss(fmap_rs, fmap_gs)
            loss_mel = jnp.mean(jnp.abs(mel_real - mel_hat)) * train_cfg.c_mel
            loss_kl = kl_loss(out["z_p"], out["logs_q"], out["m_p"], out["logs_p"], out["y_mask"]) * train_cfg.c_kl
            loss = loss_adv + loss_fm + loss_mel + loss_kl + out["commit_loss"]
            return loss, {
                "loss_adv": loss_adv,
                "loss_fm": loss_fm,
                "loss_mel": loss_mel,
                "loss_kl": loss_kl,
                "loss_commit": out["commit_loss"],
            }

        (loss_g, metrics), grads_g = jax.value_and_grad(g_loss_fn, has_aux=True)(state.params_g)
        upd_g, new_opt_g = opt_g.update(grads_g["params"], state.opt_g, state.params_g["params"])
        new_params_g = {"params": optax.apply_updates(state.params_g["params"], upd_g)}

        metrics = dict(metrics, loss_g=loss_g, loss_d=loss_d)
        new_state = S2TrainState(
            step=state.step + 1,
            params_g=new_params_g,
            params_d=new_params_d,
            opt_g=new_opt_g,
            opt_d=new_opt_d,
        )
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))
