"""S1: autoregressive text→semantic transformer ("GPT" stage), TPU-native.

Re-design of the reference `Text2SemanticDecoder`
(GPT_SoVITS/AR/models/t2s_model.py:260) and its sampling utilities
(AR/models/utils.py:119-201). Behavioral parity targets:

  * post-LN transformer (torch nn.TransformerEncoderLayer norm_first=False),
    16 heads, 24 layers, d=512, ffn=2048, ReLU MLP
  * prefix = phoneme embeddings (+ projected BERT features) with sinusoidal
    positions (learnable alpha), then prompt semantic tokens with their own
    positional stream; text prefix attends bidirectionally, audio suffix is
    causal (mask built at t2s_model.py:377-399)
  * sampling = repetition penalty over history ids -> top-p -> temperature
    -> top-k -> multinomial (utils.py:147-201); EOS excluded for the first
    11 steps (t2s_model.py:889-890); EOS id 1024 stops a sequence
  * decode positions continue the prompt: token sampled at step t sits at
    position y_len + t (t2s_model.py:765-768)

TPU-first differences from the reference (deliberate):

  * decode is ONE compiled `lax.while_loop` over a **preallocated KV cache**
    (layers, B, T_total, H, Dh) — not a Python loop with `torch.cat` cache
    growth (t2s_model.py:186-187); finished sequences are masked, not
    evicted (shape-stable; replaces the eviction logic at :720-745)
  * repetition penalty uses an O(vocab) presence mask updated per step —
    equivalent to the reference's gather/scatter over history (scatter of
    duplicate ids writes the same value, so only *presence* matters)
  * sampling runs on device with explicit PRNG keys (no global seed)
  * text is left-padded, audio right-padded, matching the reference's
    batched layout (make_pad_mask_left, utils.py:44) so batches of uneven
    lengths share one compiled shape per bucket
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gpt_sovits_tpu.utils.config import S1Config

EOS_MASK_WARMUP_STEPS = 11  # ref t2s_model.py:889 — no EOS before 0.4 s


def sine_position_table(max_len: int, dim: int) -> np.ndarray:
    """Sinusoidal position table, matches AR/modules/embedding.py:52-62."""
    pe = np.zeros((max_len, dim), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, dim, 2, dtype=np.float64) * -(np.log(10000.0) / dim))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class TransformerLayer(nn.Module):
    """Post-LN encoder layer: x = LN1(x + attn(x)); x = LN2(x + relu-MLP(x))."""

    dim: int
    num_heads: int
    ffn_dim: int
    dtype: Any = jnp.float32

    def setup(self):
        d = self.dim
        self.wqkv = nn.Dense(3 * d, dtype=self.dtype, name="wqkv")
        self.wo = nn.Dense(d, dtype=self.dtype, name="wo")
        self.norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        self.norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        self.fc1 = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")
        self.fc2 = nn.Dense(d, dtype=self.dtype, name="fc2")

    def _split(self, x):
        b, t, _ = x.shape
        return x.reshape(b, t, self.num_heads, self.dim // self.num_heads)

    def attention(self, x, attn_bias):
        """Full-sequence attention. attn_bias: (B, 1|H, T, T) additive."""
        b, t, d = x.shape
        qkv = self.wqkv(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = self._split(q), self._split(k), self._split(v)
        scale = 1.0 / np.sqrt(d // self.num_heads)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
        scores = scores + attn_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, d)
        return self.wo(out), k, v

    def __call__(self, x, attn_bias):
        attn_out, k, v = self.attention(x, attn_bias)
        x = self.norm1(x + attn_out)
        x = self.norm2(x + self.fc2(nn.relu(self.fc1(x))))
        return x, k, v

    def decode(self, x, k_cache, v_cache, valid_mask, write_idx):
        """Single-token step. x: (B,1,D); caches (B,T,H,Dh); valid: (B,T).

        write_idx: scalar (all rows at the same decode step — the batched
        generate() case) or (B,) vector (rows at independent steps — the
        continuous-batching case, where each slot joined at its own time)."""
        b, _, d = x.shape
        h, dh = self.num_heads, d // self.num_heads
        qkv = self.wqkv(x)
        q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
        if jnp.ndim(write_idx) == 0:
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k_new.reshape(b, 1, h, dh).astype(k_cache.dtype), (0, write_idx, 0, 0)
            )
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v_new.reshape(b, 1, h, dh).astype(v_cache.dtype), (0, write_idx, 0, 0)
            )
        else:
            rows = jnp.arange(b)
            k_cache = k_cache.at[rows, write_idx].set(k_new.reshape(b, h, dh).astype(k_cache.dtype))
            v_cache = v_cache.at[rows, write_idx].set(v_new.reshape(b, h, dh).astype(v_cache.dtype))
        q = q.reshape(b, h, dh)
        scale = 1.0 / np.sqrt(dh)
        scores = jnp.einsum("bhd,bkhd->bhk", q, k_cache, preferred_element_type=jnp.float32) * scale
        scores = jnp.where(valid_mask[:, None, :], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhk,bkhd->bhd", probs, v_cache).reshape(b, 1, d)
        x = self.norm1(x + self.wo(out))
        x = self.norm2(x + self.fc2(nn.relu(self.fc1(x))))
        return x, k_cache, v_cache


class T2SDecoder(nn.Module):
    """The S1 model. Methods are entry points used via `.apply(..., method=)`."""

    cfg: S1Config
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.text_embedding = nn.Embed(c.phoneme_vocab_size, c.embedding_dim, dtype=self.dtype, name="text_embedding")
        self.audio_embedding = nn.Embed(c.vocab_size, c.embedding_dim, dtype=self.dtype, name="audio_embedding")
        self.bert_proj = nn.Dense(c.embedding_dim, dtype=self.dtype, name="bert_proj")
        self.alpha_text = self.param("alpha_text", nn.initializers.ones, (1,))
        self.alpha_audio = self.param("alpha_audio", nn.initializers.ones, (1,))
        self.pe = jnp.asarray(sine_position_table(c.max_len, c.embedding_dim))
        self.layers = [
            TransformerLayer(c.hidden_dim, c.num_heads, c.ffn_dim, dtype=self.dtype, name=f"layer_{i}")
            for i in range(c.num_layers)
        ]
        self.predict = nn.Dense(c.vocab_size, use_bias=False, dtype=self.dtype, name="predict")

    # -- embedding streams ---------------------------------------------------

    def embed_text(self, phoneme_ids, bert_features, positions):
        """(B,Tx) ids + (B,Tx,bert_dim) + (B,Tx) position idx -> (B,Tx,D)."""
        x = self.text_embedding(phoneme_ids) + self.bert_proj(bert_features)
        return x + self.alpha_text * self.pe[positions].astype(self.dtype)

    def embed_audio(self, semantic_ids, positions):
        y = self.audio_embedding(semantic_ids)
        return y + self.alpha_audio * self.pe[positions].astype(self.dtype)

    def init_all(self):
        """Touch every submodule so .init() creates the full param tree."""
        c = self.cfg
        x = self.embed_text(jnp.zeros((1, 2), jnp.int32), jnp.zeros((1, 2, c.bert_dim)), jnp.zeros((1, 2), jnp.int32))
        y = self.embed_audio(jnp.zeros((1, 2), jnp.int32), jnp.zeros((1, 2), jnp.int32))
        xy = jnp.concatenate([x, y], axis=1)
        return self(xy, jnp.zeros((1, 1, 4, 4)))

    # -- training forward ----------------------------------------------------

    def __call__(self, xy_emb, attn_bias):
        """Full-sequence forward -> logits (B, T, vocab)."""
        x = xy_emb
        for layer in self.layers:
            x, _, _ = layer(x, attn_bias)
        return self.predict(x)

    # -- inference -----------------------------------------------------------

    def prefill(self, xy_emb, attn_bias):
        """Full forward returning last hidden logits and per-layer K/V.

        Returns (logits_last (B,vocab), k_caches, v_caches) where caches are
        (L, B, T_prefill, H, Dh)."""
        x = xy_emb
        ks, vs = [], []
        for layer in self.layers:
            x, k, v = layer(x, attn_bias)
            ks.append(k)
            vs.append(v)
        logits = self.predict(x[:, -1])
        return logits, jnp.stack(ks), jnp.stack(vs)

    def decode_step(self, tok_emb, k_caches, v_caches, valid_mask, write_idx):
        """One decode step across all layers.

        tok_emb: (B,1,D); caches: (L,B,T,H,Dh); valid_mask: (B,T) — which
        cache slots are attendable (includes the slot being written)."""
        x = tok_emb
        new_ks, new_vs = [], []
        for i, layer in enumerate(self.layers):
            x, k, v = layer.decode(x, k_caches[i], v_caches[i], valid_mask, write_idx)
            new_ks.append(k)
            new_vs.append(v)
        return self.predict(x[:, 0]), jnp.stack(new_ks), jnp.stack(new_vs)


# ---------------------------------------------------------------------------
# Masks (parity with t2s_model.py:355-406 / :858-877, adapted to left-padded
# text + right-padded audio)
# ---------------------------------------------------------------------------


def build_prefix_attn_bias(
    x_valid: jnp.ndarray,  # (B, Tx) bool, left-padded text validity
    y_valid: jnp.ndarray,  # (B, Ty) bool, right-padded audio validity
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Additive bias (B, 1, T, T): text rows attend to all valid text; audio
    rows attend to valid text + causal valid audio."""
    b, tx = x_valid.shape
    ty = y_valid.shape[1]
    t = tx + ty
    key_valid = jnp.concatenate([x_valid, y_valid], axis=1)  # (B, T)
    allow = jnp.broadcast_to(key_valid[:, None, :], (b, t, t))
    # causal restriction for audio queries over audio keys
    causal = np.tril(np.ones((ty, ty), dtype=bool))
    audio_block = jnp.broadcast_to(causal[None], (b, ty, ty))
    allow = allow.at[:, tx:, tx:].set(allow[:, tx:, tx:] & audio_block)
    # text queries must not see audio keys
    allow = allow.at[:, :tx, tx:].set(False)
    # fully-masked (padding) query rows would softmax to NaN and the NaN
    # would leak through the additive bias of later layers; let every query
    # attend to itself (padding embeddings are zeroed, outputs are ignored)
    allow = allow | jnp.eye(t, dtype=bool)[None]
    return jnp.where(allow[:, None, :, :], 0.0, -jnp.inf).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Sampling (parity with AR/models/utils.py:147-201)
# ---------------------------------------------------------------------------


def sample_token(
    key: jax.Array,
    logits: jnp.ndarray,  # (B, V) f32
    presence: jnp.ndarray,  # (B, V) bool — ids seen in history (incl. prompt)
    *,
    top_k: int,
    top_p: float,
    temperature: float,
    repetition_penalty: float,
) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    if repetition_penalty != 1.0:
        penalized = jnp.where(logits < 0, logits * repetition_penalty, logits / repetition_penalty)
        logits = jnp.where(presence, penalized, logits)
    if top_p < 1.0:
        sorted_idx = jnp.argsort(-logits, axis=-1)
        sorted_logits = jnp.take_along_axis(logits, sorted_idx, axis=-1)
        cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        remove_sorted = cum > top_p
        remove_sorted = remove_sorted.at[:, 0].set(False)
        # map back to vocab order via scatter
        remove = jnp.zeros_like(remove_sorted).at[
            jnp.arange(logits.shape[0])[:, None], sorted_idx
        ].set(remove_sorted)
        logits = jnp.where(remove, -jnp.inf, logits)
    if top_k > 0:
        # categorical restricted to the top-k support: distribution-identical
        # to masking the full vocab to -inf, but the gumbel/argmax runs on
        # (B, k) instead of (B, V) — measurably cheaper inside the decode loop
        vals, idxs = jax.lax.top_k(logits, top_k)
        choice = jax.random.categorical(key, vals / max(temperature, 1e-5), axis=-1)
        return jnp.take_along_axis(idxs, choice[:, None], axis=1)[:, 0]
    return jax.random.categorical(key, logits / max(temperature, 1e-5), axis=-1)


# ---------------------------------------------------------------------------
# Generation driver
# ---------------------------------------------------------------------------


class GenResult(NamedTuple):
    tokens: jnp.ndarray  # (B, max_new) int32, 0-filled after EOS
    lengths: jnp.ndarray  # (B,) int32 — number of valid semantic tokens
    steps: jnp.ndarray  # () int32 — loop iterations executed


class _LoopState(NamedTuple):
    step: jnp.ndarray
    tok_emb: jnp.ndarray  # (B,1,D) embedding feeding the next decode step
    k_caches: jnp.ndarray
    v_caches: jnp.ndarray
    valid: jnp.ndarray  # (B, T_total)
    tokens: jnp.ndarray
    lengths: jnp.ndarray
    done: jnp.ndarray
    presence: jnp.ndarray
    key: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "max_new_tokens", "top_k", "top_p", "temperature", "repetition_penalty",
        "early_stop_num", "use_fused_kernel", "weight_quant", "kv_cache_quant",
    ),
)
def generate(
    model: T2SDecoder,
    params,
    phoneme_ids: jnp.ndarray,  # (B, Tx) int32, LEFT-padded
    phoneme_lens: jnp.ndarray,  # (B,)
    bert_features: jnp.ndarray,  # (B, Tx, bert_dim) aligned with phoneme_ids
    prompt_ids: jnp.ndarray,  # (B, Tp) int32, RIGHT-padded semantic prompt
    prompt_lens: jnp.ndarray,  # (B,)
    key: jax.Array,
    *,
    max_new_tokens: int = 1500,
    top_k: int = 15,
    top_p: float = 1.0,
    temperature: float = 1.0,
    repetition_penalty: float = 1.35,
    early_stop_num: int = -1,
    use_fused_kernel: bool = False,
    weight_quant: str = "bf16",
    kv_cache_quant: str = "bf16",
) -> GenResult:
    """Batched zero/few-shot semantic token generation.

    Equivalent of `infer_panel_batch_infer` (t2s_model.py:583) as a single
    compiled while_loop. All shapes static; finished sequences are masked.
    With use_fused_kernel=True the per-token transformer step runs as the
    fused Pallas kernel (ops/pallas/decode_step.py) instead of ~250 XLA ops.
    """
    cfg: S1Config = model.cfg
    b, tx = phoneme_ids.shape
    tp = prompt_ids.shape[1]
    t_total = tx + tp + max_new_tokens
    if use_fused_kernel:
        t_total = -(-t_total // 512) * 512  # pad cache to the kernel's chunk
    eos = cfg.eos_id

    # --- validity & positions ---
    ar = jnp.arange(tx)
    x_valid = ar[None, :] >= (tx - phoneme_lens[:, None])  # left-padded
    x_pos = jnp.clip(ar[None, :] - (tx - phoneme_lens[:, None]), 0)
    arp = jnp.arange(tp)
    p_valid = arp[None, :] < prompt_lens[:, None]  # right-padded
    p_pos = jnp.clip(arp[None, :], 0, cfg.max_len - 1)

    x_emb = model.apply(params, phoneme_ids, bert_features, x_pos, method=T2SDecoder.embed_text)
    p_emb = model.apply(params, prompt_ids, p_pos, method=T2SDecoder.embed_audio)
    x_emb = jnp.where(x_valid[..., None], x_emb, 0.0)
    p_emb = jnp.where(p_valid[..., None], p_emb, 0.0)
    xy_emb = jnp.concatenate([x_emb, p_emb], axis=1)

    attn_bias = build_prefix_attn_bias(x_valid, p_valid)
    _, k_pre, v_pre = model.apply(params, xy_emb, attn_bias, method=T2SDecoder.prefill)
    # The prefill head logits are taken at the last *slot*; with right-padded
    # prompts the last valid prompt position differs per sequence, so the
    # per-sequence first logits are recomputed below instead.

    # pad caches to t_total
    pad_t = t_total - (tx + tp)
    k_caches = jnp.pad(k_pre, ((0, 0), (0, 0), (0, pad_t), (0, 0), (0, 0)))
    v_caches = jnp.pad(v_pre, ((0, 0), (0, 0), (0, pad_t), (0, 0), (0, 0)))

    # Per-sequence first logits: re-feed each sequence's LAST valid prompt
    # token as a decode query attending to all valid prefill slots (its own
    # prefill K/V slot included — exactly what full attention at that
    # position saw). The K/V this step writes goes to a scratch slot that is
    # excluded from the valid mask and is overwritten by the first generated
    # token at loop step 1.
    last_tok = jnp.take_along_axis(prompt_ids, jnp.maximum(prompt_lens - 1, 0)[:, None], axis=1)
    last_emb = model.apply(params, last_tok, jnp.maximum(prompt_lens - 1, 0)[:, None], method=T2SDecoder.embed_audio)

    prefill_valid = jnp.concatenate(
        [x_valid, p_valid, jnp.zeros((b, t_total - tx - tp), dtype=bool)], axis=1
    )
    scratch_idx = tx + tp

    if use_fused_kernel:
        from gpt_sovits_tpu.ops.pallas.decode_step import fused_decode_supported

        # large batches exceed the kernel's VMEM scratch budget; the XLA
        # step is KV-bound there anyway
        use_fused_kernel = fused_decode_supported(b, cfg.hidden_dim)
    if use_fused_kernel:
        from gpt_sovits_tpu.ops.pallas.decode_step import fused_decode_step, stack_weights_from_params

        fused_weights = stack_weights_from_params(params, cfg.num_layers, quant=weight_quant)
        head_kernel = params["params"]["predict"]["kernel"].astype(jnp.float32)
        d_model = cfg.hidden_dim
        # combined K||V cache: one DMA per attention chunk in the kernel
        kv_caches = jnp.concatenate(
            [
                k_caches.reshape(cfg.num_layers, b, t_total, d_model),
                v_caches.reshape(cfg.num_layers, b, t_total, d_model),
            ],
            axis=-1,
        ).astype(jnp.bfloat16)

        kv8 = kv_cache_quant == "int8"
        kv_scales0 = None
        if kv8:
            # int8 KV serving: halves the decode's dominant HBM stream
            # (benchmarks/TRIAGE_s1_r04.json); scales ride the v slot of
            # the loop state (unused in fused mode)
            from gpt_sovits_tpu.ops.pallas.decode_step import quantize_kv_cache

            kv_caches, kv_scales0 = quantize_kv_cache(kv_caches)

        def fused_step(tok_emb, kv_c, kv_s, valid_excl, write_idx):
            if kv8:
                y, kv_c, kv_s = fused_decode_step(
                    tok_emb[:, 0].astype(jnp.float32), fused_weights, kv_c,
                    valid_excl.astype(jnp.float32), write_idx, kv_s, num_heads=cfg.num_heads,
                )
            else:
                y, kv_c = fused_decode_step(
                    tok_emb[:, 0].astype(jnp.float32), fused_weights, kv_c,
                    valid_excl.astype(jnp.float32), write_idx, num_heads=cfg.num_heads,
                )
            return y @ head_kernel, kv_c, kv_s

        # step -1: the kernel always attends to the query's own fresh K/V, so
        # exclude the last prompt token's prefill slot (identical values)
        valid_excl = prefill_valid.at[jnp.arange(b), tx + jnp.maximum(prompt_lens - 1, 0)].set(False)
        first_logits, kv_caches, kv_scales0 = fused_step(
            last_emb, kv_caches, kv_scales0, valid_excl, jnp.asarray(scratch_idx, jnp.int32)
        )
        # the loop state carries the combined cache in the k slot; the v
        # slot carries the kv scales (int8 mode) or stays empty
        k_caches = kv_caches
        v_caches = kv_scales0 if kv8 else jnp.zeros((0,), jnp.bfloat16)
    else:
        first_logits, k_caches, v_caches = model.apply(
            params, last_emb, k_caches, v_caches, prefill_valid, scratch_idx, method=T2SDecoder.decode_step
        )

    presence = jnp.zeros((b, cfg.vocab_size), dtype=bool)
    presence = presence.at[jnp.arange(b)[:, None], jnp.where(p_valid, prompt_ids, eos)].set(True)
    presence = presence.at[:, eos].set(False)  # pad writes pointed at EOS slot

    key, k0 = jax.random.split(key)
    fl = first_logits.astype(jnp.float32).at[:, eos].set(-jnp.inf)  # step 0 < 11
    tok0 = sample_token(
        k0, fl, presence, top_k=top_k, top_p=top_p, temperature=temperature, repetition_penalty=repetition_penalty
    ).astype(jnp.int32)
    done0 = jnp.zeros((b,), dtype=bool)
    tokens = jnp.zeros((b, max_new_tokens), dtype=jnp.int32).at[:, 0].set(tok0)
    presence = presence.at[jnp.arange(b), tok0].set(True)
    tok0_emb = model.apply(params, tok0[:, None], prompt_lens[:, None], method=T2SDecoder.embed_audio)

    init = _LoopState(
        step=jnp.asarray(1, jnp.int32),
        tok_emb=tok0_emb,
        k_caches=k_caches,
        v_caches=v_caches,
        valid=prefill_valid,
        tokens=tokens,
        lengths=jnp.ones((b,), jnp.int32),
        done=done0,
        presence=presence,
        key=key,
    )

    stop_at = max_new_tokens if early_stop_num < 0 else min(early_stop_num, max_new_tokens)

    def cond(s: _LoopState):
        return (s.step < stop_at) & ~jnp.all(s.done)

    def body(s: _LoopState):
        # token sampled at step t-1 lives in cache slot scratch_idx + t - 1
        write_idx = scratch_idx + s.step - 1
        valid = s.valid.at[:, write_idx].set(True)
        if use_fused_kernel:
            # the kernel adds the current token itself; mask excludes it
            logits, k_c, v_c = fused_step(s.tok_emb, s.k_caches, s.v_caches, s.valid, write_idx)
            if not (kv_cache_quant == "int8"):
                v_c = s.v_caches
        else:
            logits, k_c, v_c = model.apply(
                params, s.tok_emb, s.k_caches, s.v_caches, valid, write_idx, method=T2SDecoder.decode_step
            )
        logits = logits.astype(jnp.float32)
        # EOS exclusion happens BEFORE the argmax stop-check (ref slices
        # logits[:, :-1] for idx<11 and checks argmax on the sliced logits)
        logits = jnp.where(s.step < EOS_MASK_WARMUP_STEPS, logits.at[:, eos].set(-jnp.inf), logits)
        argmax_is_eos = jnp.argmax(logits, axis=-1) == eos
        key, sub = jax.random.split(s.key)
        tok = sample_token(
            sub, logits, s.presence,
            top_k=top_k, top_p=top_p, temperature=temperature, repetition_penalty=repetition_penalty,
        ).astype(jnp.int32)
        newly_done = argmax_is_eos | (tok == eos)
        tok = jnp.where(s.done | newly_done, 0, tok)
        tokens = s.tokens.at[:, s.step].set(jnp.where(s.done, s.tokens[:, s.step], tok))
        done = s.done | newly_done
        lengths = jnp.where(s.done, s.lengths, jnp.where(newly_done, s.lengths, s.lengths + 1))
        presence = s.presence.at[jnp.arange(tok.shape[0]), tok].set(True)
        pos = prompt_lens + s.step  # position of the token just sampled
        tok_emb = model.apply(params, tok[:, None], pos[:, None], method=T2SDecoder.embed_audio)
        return _LoopState(s.step + 1, tok_emb, k_c, v_c, valid, tokens, lengths, done, presence, key)

    final = jax.lax.while_loop(cond, body, init)
    lengths = jnp.where(final.done, final.lengths, final.lengths)
    return GenResult(tokens=final.tokens, lengths=lengths, steps=final.step)


# ---------------------------------------------------------------------------
# Training forward + loss (parity with t2s_model.py:408-448 forward)
# ---------------------------------------------------------------------------


def t2s_loss(
    model: T2SDecoder,
    params,
    phoneme_ids: jnp.ndarray,  # (B, Tx) LEFT-padded
    phoneme_lens: jnp.ndarray,
    semantic_ids: jnp.ndarray,  # (B, Ty) RIGHT-padded (no EOS)
    semantic_lens: jnp.ndarray,
    bert_features: jnp.ndarray,  # (B, Tx, bert_dim)
):
    """Cross-entropy (sum) over semantic targets with EOS appended, plus
    top-1 accuracy. Mirrors `forward_old` (t2s_model.py:450+); the DPO branch
    lives in train/s1_train.py."""
    cfg = model.cfg
    b, tx = phoneme_ids.shape
    ty = semantic_ids.shape[1]
    ar_x = jnp.arange(tx)
    x_valid = ar_x[None, :] >= (tx - phoneme_lens[:, None])
    x_pos = jnp.clip(ar_x[None, :] - (tx - phoneme_lens[:, None]), 0)
    ar_y = jnp.arange(ty + 1)
    # Input y stream = [y_0..y_{L-1}, pads]; target[t] = y[t] for t<L, EOS at
    # t==L (pad_y_eos semantics: prediction slot for y_t is the slot of
    # y_{t-1}, with the last text token predicting y_0 and y_{L-1}'s slot
    # predicting EOS). Positions >= L are attention padding.
    y_in = jnp.where(ar_y[None, :] < semantic_lens[:, None], jnp.pad(semantic_ids, ((0, 0), (0, 1))), 0)
    y_valid = ar_y[None, :] < semantic_lens[:, None]  # attention validity
    loss_valid = ar_y[None, :] < (semantic_lens[:, None] + 1)
    targets = jnp.where(
        ar_y[None, :] < semantic_lens[:, None],
        jnp.pad(semantic_ids, ((0, 0), (0, 1)), constant_values=0),
        cfg.eos_id,
    )
    y_pos = jnp.broadcast_to(ar_y[None, :], (b, ty + 1))

    x_emb = model.apply(params, phoneme_ids, bert_features, x_pos, method=T2SDecoder.embed_text)
    y_emb = model.apply(params, y_in, y_pos, method=T2SDecoder.embed_audio)
    x_emb = jnp.where(x_valid[..., None], x_emb, 0.0)
    y_emb = jnp.where(y_valid[..., None], y_emb, 0.0)
    xy_emb = jnp.concatenate([x_emb, y_emb], axis=1)
    attn_bias = build_prefix_attn_bias(x_valid, y_valid)
    logits = model.apply(params, xy_emb, attn_bias)  # (B, T, V)

    # predictions for y_t come from slot tx-1+t (text last token predicts y_0)
    pred = logits[:, tx - 1 : tx + ty]  # (B, ty+1, V)
    logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
    tgt_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = loss_valid.astype(jnp.float32)
    loss = -(tgt_logp * mask).sum()
    acc = ((jnp.argmax(pred, axis=-1) == targets) & loss_valid & (targets != cfg.eos_id)).sum() / jnp.maximum(
        ((targets != cfg.eos_id) & loss_valid).sum(), 1
    )
    return loss, {"acc": acc, "tokens": mask.sum(), "logp": tgt_logp, "mask": mask}
