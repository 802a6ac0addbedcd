"""Continuous batching for the S1 AR decode (iteration-level scheduling).

The batched `generate()` (models/t2s.py:302) decodes one fixed batch to
completion: a request arriving mid-decode waits for the whole batch — the
same limitation as the reference's `infer_panel_batch_infer` eviction
scheme (AR/models/t2s_model.py:583-779), which shrinks the batch but
never grows it. This module is the TPU-native superset: a fixed pool of
B cache slots, decode advanced in short jitted segments, and between
segments the host scheduler evicts finished rows and admits queued
requests into free slots via per-slot prefill. All shapes are static
(slot layout below), so the segment step compiles once; per-row cache
write indices (each slot joined at its own time) ride the vector
`write_idx` path of TransformerLayer.decode.

Slot cache layout (static, per row):
  [0, tx_max)                left-padded phoneme prefix
  [tx_max, tx_max+tp_max)    right-padded semantic prompt
  scratch = tx_max+tp_max    re-fed last prompt token (first-logits trick,
                             overwritten by generated token 0)
  scratch + i                generated token i
Attention only ever sees `valid` slots, so per-row gaps from the fixed
layout are invisible to the math.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpt_sovits_tpu.models.t2s import (
    EOS_MASK_WARMUP_STEPS,
    T2SDecoder,
    build_prefix_attn_bias,
    sample_token,
)


class _SlotState(NamedTuple):
    """Device-resident pool state (leading dim B = slots everywhere)."""

    k_caches: jnp.ndarray  # (L, B, T, H, Dh)
    v_caches: jnp.ndarray  # (L, B, T, H, Dh)
    valid: jnp.ndarray  # (B, T) attendable cache slots
    presence: jnp.ndarray  # (B, V) sampled/prompt ids (repetition penalty)
    tok_emb: jnp.ndarray  # (B, 1, D) embedding of the last sampled token
    tokens: jnp.ndarray  # (B, max_new) generated ids
    gen_count: jnp.ndarray  # (B,) tokens sampled so far (>=1 once admitted)
    lengths: jnp.ndarray  # (B,) valid semantic tokens (pre-EOS)
    prompt_lens: jnp.ndarray  # (B,)
    active: jnp.ndarray  # (B,) slot holds a live request
    done: jnp.ndarray  # (B,) row finished (EOS or cap)
    key: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("model", "tx_max", "tp_max", "t_total", "top_k", "top_p", "temperature", "repetition_penalty"),
)
def _prefill_one(
    model: T2SDecoder,
    params,
    phones,  # (1, tx_max) int32 LEFT-padded
    phone_len,  # (1,)
    bert,  # (1, tx_max, bert_dim)
    prompt,  # (1, tp_max) int32 RIGHT-padded
    prompt_len,  # (1,)
    key,
    *,
    tx_max: int,
    tp_max: int,
    t_total: int,
    top_k: int,
    top_p: float,
    temperature: float,
    repetition_penalty: float,
):
    """One request's prefill -> per-row cache/state slices (mirrors the
    prefix stage of generate(), models/t2s.py:336-428, at B=1)."""
    cfg = model.cfg
    eos = cfg.eos_id
    ar = jnp.arange(tx_max)
    x_valid = ar[None, :] >= (tx_max - phone_len[:, None])
    x_pos = jnp.clip(ar[None, :] - (tx_max - phone_len[:, None]), 0)
    arp = jnp.arange(tp_max)
    p_valid = arp[None, :] < prompt_len[:, None]
    p_pos = jnp.clip(arp[None, :], 0, cfg.max_len - 1)

    x_emb = model.apply(params, phones, bert, x_pos, method=T2SDecoder.embed_text)
    p_emb = model.apply(params, prompt, p_pos, method=T2SDecoder.embed_audio)
    x_emb = jnp.where(x_valid[..., None], x_emb, 0.0)
    p_emb = jnp.where(p_valid[..., None], p_emb, 0.0)
    xy_emb = jnp.concatenate([x_emb, p_emb], axis=1)

    attn_bias = build_prefix_attn_bias(x_valid, p_valid)
    _, k_pre, v_pre = model.apply(params, xy_emb, attn_bias, method=T2SDecoder.prefill)
    pad_t = t_total - (tx_max + tp_max)
    k_row = jnp.pad(k_pre, ((0, 0), (0, 0), (0, pad_t), (0, 0), (0, 0)))
    v_row = jnp.pad(v_pre, ((0, 0), (0, 0), (0, pad_t), (0, 0), (0, 0)))

    scratch = tx_max + tp_max
    valid_row = jnp.concatenate(
        [x_valid, p_valid, jnp.zeros((1, t_total - scratch), bool)], axis=1
    )
    last_tok = jnp.take_along_axis(prompt, jnp.maximum(prompt_len - 1, 0)[:, None], axis=1)
    last_emb = model.apply(
        params, last_tok, jnp.maximum(prompt_len - 1, 0)[:, None], method=T2SDecoder.embed_audio
    )
    first_logits, k_row, v_row = model.apply(
        params, last_emb, k_row, v_row, valid_row, scratch, method=T2SDecoder.decode_step
    )

    presence = jnp.zeros((1, cfg.vocab_size), bool)
    presence = presence.at[jnp.zeros((tp_max,), jnp.int32), jnp.where(p_valid[0], prompt[0], eos)].set(True)
    presence = presence.at[:, eos].set(False)

    key, k0 = jax.random.split(key)
    fl = first_logits.astype(jnp.float32).at[:, eos].set(-jnp.inf)
    tok0 = sample_token(
        k0, fl, presence, top_k=top_k, top_p=top_p, temperature=temperature,
        repetition_penalty=repetition_penalty,
    ).astype(jnp.int32)
    presence = presence.at[jnp.arange(1), tok0].set(True)
    tok0_emb = model.apply(params, tok0[:, None], prompt_len[:, None], method=T2SDecoder.embed_audio)
    return k_row, v_row, valid_row, presence, tok0, tok0_emb


@functools.partial(
    jax.jit,
    static_argnames=("model", "scratch", "n_steps", "max_new", "use_fused", "kv_quant", "top_k", "top_p", "temperature", "repetition_penalty"),
    donate_argnums=(2,),  # the KV pool updates in place across segments
)
def _segment(
    model: T2SDecoder,
    params,
    state: _SlotState,
    fused_weights=None,
    head_kernel=None,
    *,
    scratch: int,
    n_steps: int,
    max_new: int,
    use_fused: bool = False,
    kv_quant: bool = False,
    top_k: int,
    top_p: float,
    temperature: float,
    repetition_penalty: float,
) -> _SlotState:
    """Advance every active row n_steps tokens (one fori_loop; per-row
    write indices). Inactive/done rows run masked — their state is
    untouched. Mirrors generate()'s body (models/t2s.py:448-478).

    use_fused: run the per-token transformer step as the fused Pallas
    kernel (ops/pallas/decode_step.py) with vector write indices — the
    XLA step at production size copies the stacked KV pool every token.
    In fused mode state.k_caches holds the combined K||V cache
    (L, B, T, 2D) and v_caches is empty, matching generate()."""
    cfg = model.cfg
    eos = cfg.eos_id
    b = state.valid.shape[0]
    rows = jnp.arange(b)

    if use_fused:
        from gpt_sovits_tpu.ops.pallas.decode_step import fused_decode_step

    def body(_, s: _SlotState):
        # token sampled g-1 steps ago lives at scratch + g - 1
        write_idx = scratch + jnp.maximum(s.gen_count - 1, 0)
        live = s.active & ~s.done
        valid = s.valid.at[rows, write_idx].set(s.valid[rows, write_idx] | live)
        if use_fused:
            # the kernel adds the query's own fresh K/V itself, so it gets
            # the PRE-update mask (generate(), models/t2s.py:452-455).
            # smaller KV scratch chunk: inside the segment loop the
            # kernel's outputs stay in scoped VMEM and the default 256
            # chunk overflows the 16 MB budget by ~0.8 MB at B=8
            if kv_quant:
                # v slot carries the (L,B,2,T) dequant scales
                y, k_c, v_c = fused_decode_step(
                    s.tok_emb[:, 0].astype(jnp.float32), fused_weights, s.k_caches,
                    s.valid.astype(jnp.float32), write_idx, s.v_caches,
                    num_heads=cfg.num_heads, chunk=128,
                )
            else:
                y, k_c = fused_decode_step(
                    s.tok_emb[:, 0].astype(jnp.float32), fused_weights, s.k_caches,
                    s.valid.astype(jnp.float32), write_idx, num_heads=cfg.num_heads,
                    chunk=128,
                )
                v_c = s.v_caches
            logits = y @ head_kernel
        else:
            logits, k_c, v_c = model.apply(
                params, s.tok_emb, s.k_caches, s.v_caches, valid, write_idx,
                method=T2SDecoder.decode_step,
            )
        logits = logits.astype(jnp.float32)
        logits = jnp.where(
            (s.gen_count < EOS_MASK_WARMUP_STEPS)[:, None], logits.at[:, eos].set(-jnp.inf), logits
        )
        argmax_is_eos = jnp.argmax(logits, axis=-1) == eos
        key, sub = jax.random.split(s.key)
        tok = sample_token(
            sub, logits, s.presence,
            top_k=top_k, top_p=top_p, temperature=temperature, repetition_penalty=repetition_penalty,
        ).astype(jnp.int32)
        hit_cap = s.gen_count >= max_new
        newly_done = live & (argmax_is_eos | (tok == eos) | hit_cap)
        tok = jnp.where(~live | newly_done, 0, tok)
        write_pos = jnp.minimum(s.gen_count, max_new - 1)
        tokens = s.tokens.at[rows, write_pos].set(
            jnp.where(live & ~newly_done, tok, s.tokens[rows, write_pos])
        )
        lengths = jnp.where(live & ~newly_done, s.lengths + 1, s.lengths)
        done = s.done | newly_done
        presence = s.presence.at[rows, tok].set(s.presence[rows, tok] | live)
        pos = jnp.clip(s.prompt_lens + s.gen_count, 0, cfg.max_len - 1)
        tok_emb = model.apply(params, tok[:, None], pos[:, None], method=T2SDecoder.embed_audio)
        # embed_audio promotes to f32 under a bf16 model (f32 alpha_audio);
        # the carry dtype is pinned by the pool state
        tok_emb = jnp.where(live[:, None, None], tok_emb.astype(s.tok_emb.dtype), s.tok_emb)
        gen_count = jnp.where(live & ~newly_done, s.gen_count + 1, s.gen_count)
        return _SlotState(
            k_c, v_c, valid, presence, tok_emb, tokens, gen_count, lengths,
            s.prompt_lens, s.active, done, key,
        )

    return jax.lax.fori_loop(0, n_steps, body, state)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("fused", "kv_quant"))
def _install_row(
    state: _SlotState,
    slot,
    k_row,
    v_row,
    valid_row,
    presence,
    tok0,
    tok0_emb,
    prompt_len,
    key,
    *,
    fused: bool,
    kv_quant: bool = False,
):
    """Write one prefilled request into pool slot `slot` — a single jitted
    call with the pool DONATED, so the multi-hundred-MB KV cache updates in
    place instead of being copied once per .at[].set (13 separate host-side
    updates measured ~0.3 s per admission at production size)."""
    s = state
    max_new = s.tokens.shape[1]
    if fused:
        L, T = k_row.shape[0], k_row.shape[2]
        d = k_row.shape[3] * k_row.shape[4]
        kv_row = jnp.concatenate(
            [k_row[:, 0].reshape(L, T, d), v_row[:, 0].reshape(L, T, d)], axis=-1
        )
        if kv_quant:
            from gpt_sovits_tpu.ops.pallas.decode_step import quantize_kv_cache

            kv_q, scales = quantize_kv_cache(kv_row[:, None])  # (L,1,T,2D)
            new_k = s.k_caches.at[:, slot].set(kv_q[:, 0])
            new_v = s.v_caches.at[:, slot].set(scales[:, 0])
        else:
            new_k = s.k_caches.at[:, slot].set(kv_row.astype(jnp.bfloat16))
            new_v = s.v_caches
    else:
        new_k = s.k_caches.at[:, slot].set(k_row[:, 0].astype(s.k_caches.dtype))
        new_v = s.v_caches.at[:, slot].set(v_row[:, 0].astype(s.v_caches.dtype))
    return _SlotState(
        k_caches=new_k,
        v_caches=new_v,
        valid=s.valid.at[slot].set(valid_row[0]),
        presence=s.presence.at[slot].set(presence[0]),
        tok_emb=s.tok_emb.at[slot].set(tok0_emb[0].astype(s.tok_emb.dtype)),
        tokens=s.tokens.at[slot].set(jnp.zeros((max_new,), jnp.int32).at[0].set(tok0[0])),
        gen_count=s.gen_count.at[slot].set(1),
        lengths=s.lengths.at[slot].set(1),
        prompt_lens=s.prompt_lens.at[slot].set(prompt_len),
        active=s.active.at[slot].set(True),
        done=s.done.at[slot].set(False),
        key=key,
    )


@dataclasses.dataclass
class _Request:
    rid: int
    phones: np.ndarray
    bert: np.ndarray
    prompt: np.ndarray


class ContinuousBatcher:
    """Host-side scheduler over the slot pool.

    submit() enqueues; step(n) admits queued requests into free slots,
    advances all live rows n tokens, and returns {rid: semantic tokens}
    for rows that finished. Requests join at segment boundaries instead
    of waiting out a whole batch (reference eviction only shrinks,
    t2s_model.py:720-745)."""

    def __init__(
        self,
        model: T2SDecoder,
        params,
        *,
        slots: int = 8,
        tx_max: int = 160,
        tp_max: int = 256,
        max_new: int = 500,
        top_k: int = 15,
        top_p: float = 1.0,
        temperature: float = 1.0,
        repetition_penalty: float = 1.35,
        seed: int = 0,
        use_fused: Optional[bool] = None,
        weight_quant: str = "bf16",
        kv_quant: str = "bf16",
    ):
        cfg = model.cfg
        self.model, self.params = model, params
        self.slots, self.tx_max, self.tp_max, self.max_new = slots, tx_max, tp_max, max_new
        self.scratch = tx_max + tp_max
        t_total = tx_max + tp_max + 1 + max_new
        self.t_total = -(-t_total // 512) * 512  # tile-friendly cache length
        self.sampling = dict(
            top_k=top_k, top_p=top_p, temperature=temperature, repetition_penalty=repetition_penalty
        )
        b, L = slots, cfg.num_layers
        h, dh = cfg.num_heads, cfg.hidden_dim // cfg.num_heads
        dt = model.dtype
        if use_fused is None:
            from gpt_sovits_tpu.ops.pallas.decode_step import fused_decode_supported

            use_fused = jax.default_backend() == "tpu" and fused_decode_supported(b, cfg.hidden_dim)
        self.use_fused = use_fused
        self.kv_quant = use_fused and kv_quant == "int8"
        self.fused_weights = None
        self.head_kernel = None
        if use_fused:
            from gpt_sovits_tpu.ops.pallas.decode_step import stack_weights_from_params

            self.fused_weights = stack_weights_from_params(params, L, quant=weight_quant)
            self.head_kernel = params["params"]["predict"]["kernel"].astype(jnp.float32)
        self.state = _SlotState(
            k_caches=(
                jnp.zeros(
                    (L, b, self.t_total, 2 * cfg.hidden_dim),
                    jnp.int8 if self.kv_quant else jnp.bfloat16,
                )
                if use_fused
                else jnp.zeros((L, b, self.t_total, h, dh), dt)
            ),
            # fused: the v slot carries the KV dequant scales (int8 mode)
            v_caches=(
                (jnp.zeros((L, b, 2, self.t_total), jnp.float32) if self.kv_quant else jnp.zeros((0,), dt))
                if use_fused
                else jnp.zeros((L, b, self.t_total, h, dh), dt)
            ),
            valid=jnp.zeros((b, self.t_total), bool),
            presence=jnp.zeros((b, cfg.vocab_size), bool),
            tok_emb=jnp.zeros((b, 1, cfg.embedding_dim), dt),
            tokens=jnp.zeros((b, max_new), jnp.int32),
            gen_count=jnp.zeros((b,), jnp.int32),
            lengths=jnp.zeros((b,), jnp.int32),
            prompt_lens=jnp.zeros((b,), jnp.int32),
            active=jnp.zeros((b,), bool),
            done=jnp.zeros((b,), bool),
            key=jax.random.PRNGKey(seed),
        )
        self._queue: list[_Request] = []
        self._slot_rid: list[Optional[int]] = [None] * slots
        self._next_rid = 0
        self.admitted_at: dict[int, int] = {}  # rid -> segment index when admitted
        self.finished_at: dict[int, int] = {}
        self._segments_run = 0

    # -- public API ---------------------------------------------------------

    def submit(self, phones, bert=None, prompt=None) -> int:
        """phones: (tx,) ids; bert: (tx, bert_dim) or None; prompt: (tp,) ids."""
        phones = np.asarray(phones, np.int32)
        if phones.shape[0] > self.tx_max:
            raise ValueError(f"phones length {phones.shape[0]} > tx_max {self.tx_max}")
        prompt = np.asarray(prompt if prompt is not None else [0], np.int32)
        if prompt.shape[0] > self.tp_max:
            raise ValueError(f"prompt length {prompt.shape[0]} > tp_max {self.tp_max}")
        if bert is None:
            bert = np.zeros((phones.shape[0], self.model.cfg.bert_dim), np.float32)
        rid = self._next_rid
        self._next_rid += 1
        self._queue.append(_Request(rid, phones, np.asarray(bert, np.float32), prompt))
        return rid

    def _admit(self, req: _Request, slot: int) -> None:
        tx, tp = self.tx_max, self.tp_max
        phones = np.zeros((1, tx), np.int32)
        phones[0, tx - len(req.phones):] = req.phones  # left-pad
        bert = np.zeros((1, tx, self.model.cfg.bert_dim), np.float32)
        bert[0, tx - len(req.phones):] = req.bert
        prompt = np.zeros((1, tp), np.int32)
        prompt[0, : len(req.prompt)] = req.prompt  # right-pad
        key, sub = jax.random.split(self.state.key)
        k_row, v_row, valid_row, presence, tok0, tok0_emb = _prefill_one(
            self.model, self.params, jnp.asarray(phones), jnp.asarray([len(req.phones)]),
            jnp.asarray(bert), jnp.asarray(prompt), jnp.asarray([len(req.prompt)]), sub,
            tx_max=tx, tp_max=tp, t_total=self.t_total, **self.sampling,
        )
        self.state = _install_row(
            self.state, jnp.asarray(slot, jnp.int32), k_row, v_row, valid_row,
            presence, tok0, tok0_emb, jnp.asarray(len(req.prompt), jnp.int32), key,
            fused=self.use_fused, kv_quant=self.kv_quant,
        )
        self._slot_rid[slot] = req.rid
        self.admitted_at[req.rid] = self._segments_run

    def step(self, n: int = 25) -> dict[int, np.ndarray]:
        """Admit queued requests into free slots, advance n tokens, evict +
        return finished rows ({rid: token array})."""
        for slot in range(self.slots):
            if self._slot_rid[slot] is None and self._queue:
                self._admit(self._queue.pop(0), slot)
        if not any(r is not None for r in self._slot_rid):
            return {}
        self.state = _segment(
            self.model, self.params, self.state, self.fused_weights, self.head_kernel,
            scratch=self.scratch, n_steps=n, max_new=self.max_new,
            use_fused=self.use_fused, kv_quant=self.kv_quant, **self.sampling,
        )
        self._segments_run += 1
        # ONE host fetch for the scheduler flags (each np.asarray is a
        # separate device round trip — they add up over the tunnel)
        done, active, lengths = jax.device_get(
            (self.state.done, self.state.active, self.state.lengths)
        )
        out: dict[int, np.ndarray] = {}
        evicted = []
        for slot in range(self.slots):
            rid = self._slot_rid[slot]
            if rid is not None and active[slot] and done[slot]:
                self.finished_at[rid] = self._segments_run
                evicted.append((slot, rid, int(lengths[slot])))
                self._slot_rid[slot] = None
        if evicted:
            rows = jax.device_get(self.state.tokens[jnp.asarray([s for s, _, _ in evicted])])
            for (slot, rid, length), toks in zip(evicted, rows):
                out[rid] = np.asarray(toks[:length])
            s = self.state
            idx = jnp.asarray([s_ for s_, _, _ in evicted])
            self.state = s._replace(
                active=s.active.at[idx].set(False),
                valid=s.valid.at[idx].set(False),
            )
        return out

    @property
    def pending(self) -> int:
        return len(self._queue) + sum(r is not None for r in self._slot_rid)

    def drain(self, n: int = 25, max_segments: int = 10000) -> dict[int, np.ndarray]:
        out: dict[int, np.ndarray] = {}
        for _ in range(max_segments):
            if not self.pending:
                break
            out.update(self.step(n))
        return out
