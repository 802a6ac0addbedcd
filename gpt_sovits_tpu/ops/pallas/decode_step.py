"""Fused AR decode step — Pallas TPU kernel.

One kernel invocation computes the ENTIRE 24-layer transformer step for one
new token (the hot loop of S1 inference, reference t2s_model.py:176-221
`decode_next_token`). The XLA version launches ~250 small ops per token and
is overhead-bound (~0.6 ms/token on v5e); this kernel runs the layers as a
sequential TPU grid with BlockSpec-pipelined weight streaming, so the step
cost approaches the HBM bound (weights + KV cache reads).

Design notes:
  * grid = (num_layers,); TPU grids execute sequentially, so the hidden
    state is carried across layers in a VMEM scratch buffer.
  * per-layer weights arrive as pipelined BlockSpec blocks (the next
    layer's weights DMA while the current layer computes).
  * the KV cache stays in HBM (ANY); attention streams it through VMEM as
    ONE flat double-buffered chunk stream across (layer[, row], chunk) —
    layer i+1's first chunk DMAs during layer i's epilogue — with
    online-softmax (flash) accumulation.
  * the sweep runs in the (H, C)/(H, D) orientation so every chunk-sized
    op is an MXU matmul (no (C, D) VPU passes on the critical path):
    scores  = (q ⊙ head_mask) @ K_chunk^T   — (H,D)·(C,D) -> (H,C)
    ctx_hd  = P @ V_chunk                   — (H,C)·(C,D) -> (H,D)
    ctx    += Σ_h head_mask ⊙ ctx_hd        — (H,D) select, tiny
    with int8 KV, both matmuls take the s8 x s8 MXU path (q and the probs
    are dynamically quantized per head; K/V dequant scales fold into the
    (H, C) score/prob matrices).
  * the new token's K/V are returned as outputs; the caller scatters them
    into the big cache with one dynamic_update_slice (avoids in-kernel
    read-modify-write aliasing).

Matches models/t2s.py TransformerLayer.decode numerically (post-LN, ReLU
MLP, f32 softmax).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _head_mask(d: int, h: int) -> np.ndarray:
    """(H, D) one-hot head membership: m[j, dd] = 1 iff channel dd belongs
    to head j."""
    dh = d // h
    m = np.zeros((h, d), np.float32)
    for j in range(h):
        m[j, j * dh : (j + 1) * dh] = 1.0
    return m


def _make_kernel(
    num_layers: int, b: int, d: int, h: int, t_pad: int, chunk: int,
    quant: bool = False, row_stream: bool = False, kv_quant: bool = False,
    n_buf: int = 2,
):
    dh = d // h
    n_chunks = t_pad // chunk

    def kernel(
        # scalar prefetch
        nvalid_ref,  # (1,) int32 — number of live cache slots (= write_idx)
        # inputs
        x_ref,  # (B, D) f32
        wqkv_ref,  # (1, D, 3D) bf16 | int8
        bqkv_ref,  # (1, 3D)
        wo_ref,  # (1, D, D)
        bo_ref,  # (1, D)
        n1s_ref, n1b_ref, n2s_ref, n2b_ref,  # (1, D) each
        fc1_ref,  # (1, D, F)
        b1_ref,  # (1, F)
        fc2_ref,  # (1, F, D)
        b2_ref,  # (1, D)
        *rest,
        # quant-only inputs (per-output-channel f32 dequant scales):
        #   wqkv_s (1,1,3D), wo_s (1,1,D), fc1_s (1,1,F), fc2_s (1,1,D)
        # then: kv_hbm (ANY), mask (VMEM), head mask (VMEM)
        # outputs: y (B,D), kvnew (1,B,2D)
        # scratch: x_scr, kvbuf, sems
    ):
        rest = list(rest)
        if quant:
            wqkv_s_ref, wo_s_ref, fc1_s_ref, fc2_s_ref = rest[:4]
            rest = rest[4:]
        else:
            wqkv_s_ref = wo_s_ref = fc1_s_ref = fc2_s_ref = None
        kv_hbm = rest.pop(0)
        kvs_hbm = rest.pop(0) if kv_quant else None  # (L, B, 2, T) f32 K/V scales
        mask_ref, hm_ref, y_ref, kvnew_ref, x_scr, kvbuf = rest[:6]
        rest = rest[6:]
        ksbuf = rest.pop(0) if kv_quant else None
        sems = rest.pop(0)
        ssems = rest.pop(0) if kv_quant else None

        li = pl.program_id(0)

        if quant:
            # W8A8 (round 5): the weight matrices stay int8 all the way
            # into the MXU (s8 x s8 -> s32 runs at 2x the bf16 rate), with
            # per-row dynamic activation scales folded back with the
            # per-output-channel weight scales. Round 4 lifted the int8
            # weights to bf16 in-kernel — a VPU pass over ~3.3M weight
            # elements per layer that made the B=1 step COMPUTE-bound at
            # 211 us/token while the int8 DMA roofline is ~94
            # (benchmarks/TRIAGE_s1_r05.json).
            def mm(xf, w_ref, s_ref):
                xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6) * (1.0 / 127.0)
                xq = jnp.clip(
                    jnp.round(xf * pl.reciprocal(xs, approx=False)), -127, 127
                ).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    xq, w_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
                )
                return acc.astype(jnp.float32) * xs * s_ref[0, 0][None, :]
        else:
            # bf16 operands + f32 accumulation: f32 MXU matmuls cost
            # several bf16 passes and made the kernel compute-bound (the
            # flax reference computes in bf16 anyway, so this matches it)
            def mm(xf, w_ref, s_ref):
                return jnp.dot(
                    xf.astype(jnp.bfloat16), w_ref[0].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )

        # live-prefix sweep bound (slots >= n_valid are never attendable)
        n_live = pl.cdiv(nvalid_ref[0], chunk)

        # ---- flat cross-layer KV streaming ------------------------------
        # ONE n_buf-deep chunk stream across the whole kernel: the flat
        # chunk counter g runs over (layer[, row], chunk), so layer li+1's
        # first chunks DMA during layer li's last chunks + epilogue
        # (self-attn, MLP, norms). The round-4 per-layer schedule issued
        # chunk 0 only after the qkv matmul of its own layer, exposing the
        # full DMA latency once per layer (~3 us x 24, probe_decode_floor).
        n_streams = b * n_live if row_stream else n_live
        total_chunks = num_layers * n_streams

        def _copies(g):
            slot = jax.lax.rem(g, n_buf)
            lj = jax.lax.div(g, n_streams)
            ci = jax.lax.rem(g, n_live)
            if row_stream:
                bj = jax.lax.rem(jax.lax.div(g, n_live), b)
                kv_src = kv_hbm.at[lj, bj, pl.ds(ci * chunk, chunk), :]
                ks_src = kvs_hbm.at[lj, bj, :, pl.ds(ci * chunk, chunk)] if kv_quant else None
            else:
                kv_src = kv_hbm.at[lj, :, pl.ds(ci * chunk, chunk), :]
                ks_src = kvs_hbm.at[lj, :, :, pl.ds(ci * chunk, chunk)] if kv_quant else None
            cps = [pltpu.make_async_copy(kv_src, kvbuf.at[slot], sems.at[slot])]
            if kv_quant:
                cps.append(pltpu.make_async_copy(ks_src, ksbuf.at[slot], ssems.at[slot]))
            return cps

        def _start_g(g):
            for c in _copies(g):
                c.start()

        def _wait_g(g):
            for c in _copies(g):
                c.wait()

        @pl.when(li == 0)
        def _():
            x_scr[:] = x_ref[:]

            # prime the pipeline: n_buf - 1 chunks in flight before this
            # layer's qkv matmul
            for j in range(n_buf - 1):

                @pl.when(j < total_chunks)
                def _(j=j):
                    _start_g(j)

        x = x_scr[:]  # (B, D) f32
        qkv = mm(x, wqkv_ref, wqkv_s_ref) + bqkv_ref[0, 0][None, :]
        q, k_new, v_new = qkv[:, :d], qkv[:, d : 2 * d], qkv[:, 2 * d :]
        kvnew_ref[0] = qkv[:, d:].astype(kvnew_ref.dtype)

        scale = 1.0 / np.sqrt(dh)
        hmT = hm_ref[:]  # (H, D) one-hot head membership

        # Per-row (H, D) head-expanded query: q_hd[h, dd] = q[dd] * hmT[h, dd]
        # — built elementwise from the (H, D) head mask, no transposes. The
        # whole sweep runs in the (H, C)/(H, D) orientation so every
        # chunk-sized op is an MXU matmul; the round-4 (C, H)->(C, D)
        # head-expansion kept (C, D)-sized f32 VPU passes (cast, dequant,
        # P*V product, tree-reduce) on the critical path — ~1.4 us/chunk of
        # pure VPU time that made the sweep compute-bound and int8 KV
        # worthless (probe_decode_floor).
        q_rows, qi_rows, qs_rows = [], [], []
        for bi in range(b):
            q_hd = (q[bi] * scale)[None, :] * hmT  # (H, D) f32
            if kv_quant:
                # int8 q -> scores ride the s8 x s8 MXU path against the
                # raw int8 K codes (no (C, D) dequant lift); one scale per
                # head (off-head lanes are zero so the row max is per-head)
                qs = jnp.maximum(jnp.max(jnp.abs(q_hd), axis=1, keepdims=True), 1e-9) * (1.0 / 127.0)
                qi_rows.append(jnp.clip(jnp.round(q_hd / qs), -127, 127).astype(jnp.int8))
                qs_rows.append(qs)
            q_rows.append(q_hd.astype(jnp.bfloat16))

        def _attend(bi, g, ci, m_run, s_run, ctx):
            """One (row, chunk) flash-attention update. Carries: (H,), (H,), (D,)."""
            slot = jax.lax.rem(g, n_buf)
            slab = kvbuf[slot] if row_stream else kvbuf[slot, bi]  # (C, 2D)
            kc, vc = slab[:, :d], slab[:, d:]
            if kv_quant:
                ksc = ksbuf[slot] if row_stream else ksbuf[slot, bi]  # (2, C)
                sc = jax.lax.dot_general(
                    qi_rows[bi], kc, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)  # (H, C)
                sc = sc * (qs_rows[bi] * ksc[0][None, :])
            else:
                sc = jax.lax.dot_general(
                    q_rows[bi], kc, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (H, C)
            msk = mask_ref[bi, pl.ds(ci * chunk, chunk)]  # (C,)
            sc = jnp.where(msk[None, :] > 0, sc, NEG)
            m_new = jnp.maximum(m_run, jnp.max(sc, axis=1))  # (H,)
            alpha = jnp.exp(m_run - m_new)
            p = jnp.exp(sc - m_new[:, None])  # (H, C) f32
            s_new = s_run * alpha + jnp.sum(p, axis=1)
            if kv_quant:
                # V dequant scale folds into the (H, C) probs (NOT a
                # (C, D) pass over V); probs then quantize per head so
                # P @ V is s8 x s8 on the MXU as well
                pv = p * ksc[1][None, :]
                ps = jnp.maximum(jnp.max(pv, axis=1, keepdims=True), 1e-9) * (1.0 / 127.0)
                pq = jnp.clip(jnp.round(pv / ps), -127, 127).astype(jnp.int8)
                hd_ctx = jax.lax.dot_general(
                    pq, vc, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
                ).astype(jnp.float32) * ps  # (H, D)
            else:
                # probs in bf16 for the PV path — same as the flax step's
                # probs.astype(x.dtype) before the value einsum
                hd_ctx = jax.lax.dot_general(
                    p.astype(jnp.bfloat16), vc, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (H, D)
            ctx_c = jnp.sum(hmT * hd_ctx, axis=0)  # own-head columns -> (D,)
            ctx_new = ctx * jnp.dot(alpha[None, :], hmT)[0] + ctx_c
            return m_new, s_new, ctx_new

        if row_stream:
            m_out, s_out, c_out = [], [], []
            for bi in range(b):

                def chunk_body(ci, carry, bi=bi):
                    g = (li * b + bi) * n_live + ci

                    @pl.when(g + n_buf - 1 < total_chunks)
                    def _():
                        _start_g(g + n_buf - 1)

                    _wait_g(g)
                    return _attend(bi, g, ci, *carry)

                m0 = jnp.full((h,), NEG, jnp.float32)
                s0 = jnp.zeros((h,), jnp.float32)
                c0 = jnp.zeros((d,), jnp.float32)
                m_b, s_b, c_b = jax.lax.fori_loop(0, n_live, chunk_body, (m0, s0, c0))
                m_out.append(m_b)
                s_out.append(s_b)
                c_out.append(c_b)
            m_run, s_run, ctx0 = jnp.stack(m_out), jnp.stack(s_out), jnp.stack(c_out)
        else:

            def chunk_body(ci, carry):
                m_run, s_run, ctx = carry  # (B,H), (B,H), (B,D)
                g = li * n_live + ci

                @pl.when(g + n_buf - 1 < total_chunks)
                def _():
                    _start_g(g + n_buf - 1)

                _wait_g(g)
                m_out, s_out, c_out = [], [], []
                for bi in range(b):
                    m_b, s_b, c_b = _attend(bi, g, ci, m_run[bi], s_run[bi], ctx[bi])
                    m_out.append(m_b)
                    s_out.append(s_b)
                    c_out.append(c_b)
                return jnp.stack(m_out), jnp.stack(s_out), jnp.stack(c_out)

            m0 = jnp.full((b, h), NEG, jnp.float32)
            s0 = jnp.zeros((b, h), jnp.float32)
            c0 = jnp.zeros((b, d), jnp.float32)
            m_run, s_run, ctx0 = jax.lax.fori_loop(0, n_live, chunk_body, (m0, s0, c0))

        # current token's own K/V (always attendable); per-head dot via the
        # head-mask matmul (Mosaic cannot shape-cast (D,) -> (H, dh))
        sc_self = jax.lax.dot_general(
            q * scale * k_new, hmT, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, H)
        m_new = jnp.maximum(m_run, sc_self)
        alpha = jnp.exp(m_run - m_new)
        p_self = jnp.exp(sc_self - m_new)  # (B, H)
        s_fin = s_run * alpha + p_self
        alpha_d = jnp.dot(alpha, hmT)  # (B, D)
        p_self_d = jnp.dot(p_self, hmT)
        ctx = (ctx0 * alpha_d + p_self_d * v_new) / jnp.dot(s_fin, hmT)

        attn_out = mm(ctx, wo_ref, wo_s_ref) + bo_ref[0, 0][None, :]
        xa = x + attn_out
        mu = jnp.mean(xa, axis=-1, keepdims=True)
        var = jnp.mean((xa - mu) ** 2, axis=-1, keepdims=True)
        xn = (xa - mu) * jax.lax.rsqrt(var + 1e-5) * n1s_ref[0, 0][None, :] + n1b_ref[0, 0][None, :]

        hdn = jnp.maximum(mm(xn, fc1_ref, fc1_s_ref) + b1_ref[0, 0][None, :], 0.0)
        x2 = mm(hdn, fc2_ref, fc2_s_ref) + b2_ref[0, 0][None, :]
        xb = xn + x2
        mu2 = jnp.mean(xb, axis=-1, keepdims=True)
        var2 = jnp.mean((xb - mu2) ** 2, axis=-1, keepdims=True)
        out = (xb - mu2) * jax.lax.rsqrt(var2 + 1e-5) * n2s_ref[0, 0][None, :] + n2b_ref[0, 0][None, :]

        x_scr[:] = out

        @pl.when(li == num_layers - 1)
        def _():
            y_ref[:] = out

    return kernel


def quantize_kv_cache(kv_cache):
    """(L, B, T, 2D) float K||V cache -> (int8 cache, (L, B, 2, T) f32
    scales), per-token symmetric for K and V separately. Used to convert
    the prefill cache when serving with kv int8."""
    L, B, T, d2 = kv_cache.shape
    d = d2 // 2
    kf = kv_cache[..., :d].astype(jnp.float32)
    vf = kv_cache[..., d:].astype(jnp.float32)
    sk = jnp.maximum(jnp.max(jnp.abs(kf), axis=-1) / 127.0, 1e-8)  # (L,B,T)
    sv = jnp.maximum(jnp.max(jnp.abs(vf), axis=-1) / 127.0, 1e-8)
    kq = jnp.clip(jnp.round(kf / sk[..., None]), -127, 127)
    vq = jnp.clip(jnp.round(vf / sv[..., None]), -127, 127)
    cache = jnp.concatenate([kq, vq], axis=-1).astype(jnp.int8)
    scales = jnp.stack([sk, sv], axis=2)  # (L, B, 2, T)
    return cache, scales


def fused_decode_supported(bsz: int, d_model: int, itemsize: int = 2) -> bool:
    """True when the double-buffered per-ROW KV scratch fits next to the
    pipelined weight blocks (~12 MB of the 16 MB scoped VMEM) at the
    minimum 128-row chunk. The scratch is (2, chunk, 2D) — independent of
    batch size since the per-row streaming rewrite — so this only excludes
    pathological model widths."""
    return 2 * 2 * d_model * 128 * itemsize <= (2 << 20)


@functools.partial(jax.jit, static_argnames=("chunk", "num_heads"))
def fused_decode_step(
    x,  # (B, D) f32 — token embedding / hidden input
    weights: dict,  # stacked per-layer weights, see below
    kv_cache,  # (L, B, T_pad, 2D) bf16 | int8 — K||V on the channel axis
    mask,  # (B, T_pad) f32, 1 = attendable cache slot (EXCLUDES current token)
    write_idx,  # () int32 — slot for the new token's K/V
    kv_scales=None,  # (L, B, 2, T_pad) f32 — REQUIRED when kv_cache is int8
    *,
    chunk: int = 512,
    num_heads: int = 16,
):
    """Returns (hidden (B,D), kv_cache') — plus kv_scales' when the cache
    is int8 — with the new K||V written at write_idx. weights keys:
    wqkv (L,D,3D), bqkv (L,3D), wo (L,D,D), bo (L,D), n1s/n1b/n2s/n2b
    (L,D), fc1 (L,D,F), b1 (L,F), fc2 (L,F,D), b2 (L,D).

    int8 KV mode halves the decode's dominant HBM stream (the KV sweep —
    ~470 MB/token at B=8 late in a 745-slot decode, benchmarks/
    TRIAGE_s1_r04.json): per-token symmetric scales for K and V ride a
    separate (L,B,2,T) array; scores/values are rescaled in-kernel.
    Quantization of the NEW token's K/V happens here (XLA, tiny)."""
    L, bsz, t_pad, d2 = kv_cache.shape
    d = d2 // 2
    h = num_heads
    kv_quant = kv_cache.dtype == jnp.int8
    if kv_quant and kv_scales is None:
        raise ValueError("int8 kv_cache requires kv_scales (L,B,2,T)")
    # The pipelined weight blocks already hold ~12 MB of the 16 MB scoped
    # VMEM (qkv/wo/fc1/fc2 double-buffered), so the double-buffered KV
    # scratch must stay within ~2 MB. Prefer the batched-DMA layout
    # (2, B, chunk, 2D) — one strided copy serves all rows; when that
    # cannot fit at the minimum 128-row chunk (large B), stream per row
    # with a batch-independent (2, chunk, 2D) scratch instead.
    batch_row_bytes = 2 * bsz * d2 * kv_cache.dtype.itemsize
    # >=: at exactly the budget boundary (B=8 int8 KV) the batched layout
    # would be forced down to 128-row chunks — per-chunk overhead dominates;
    # per-row 512-row slabs amortize better
    row_stream = 128 * batch_row_bytes >= (2 << 20)
    kv_row_bytes = (2 * d2 * kv_cache.dtype.itemsize) if row_stream else batch_row_bytes
    budget_rows = (2 << 20) // kv_row_bytes
    chunk = min(chunk, 1 << max(budget_rows.bit_length() - 1, 7))  # pow2 divides t_pad; >=128 (Mosaic lane tile)
    if chunk * kv_row_bytes > (2 << 20):
        raise ValueError(
            f"fused decode KV scratch would exceed VMEM at d_model {d} "
            f"(use fused_decode_supported() and fall back to the flax step)"
        )
    assert t_pad % chunk == 0, (t_pad, chunk)
    f = weights["fc1"].shape[-1]
    quant = weights["wqkv"].dtype == jnp.int8
    # deeper buffering when the budget allows: extra slots absorb HBM
    # contention between the KV stream and the pipelined weight blocks
    # (both run near peak aggregate bandwidth in int8 mode). int8 weight
    # blocks take ~6.3 MB of scoped VMEM double-buffered vs ~12.6 bf16,
    # freeing ~6 MB for the KV stream.
    buf_budget = (6 << 20) if quant else (2 << 20)
    n_buf = max(2, min(4, buf_budget // (chunk * kv_row_bytes)))

    kernel = _make_kernel(L, bsz, d, h, t_pad, chunk, quant, row_stream, kv_quant, n_buf)

    def lspec(shape):
        return pl.BlockSpec((1,) + shape, lambda i, *_s: (i,) + (0,) * len(shape), memory_space=pltpu.VMEM)

    def vspec(dim):
        # vectors are stored (L, 1, dim) so the block's trailing dims match
        # the array dims (TPU lowering requirement)
        return pl.BlockSpec((1, 1, dim), lambda i, *_s: (i, 0, 0), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x
            lspec((d, 3 * d)),
            vspec(3 * d),
            lspec((d, d)),
            vspec(d),
            vspec(d), vspec(d), vspec(d), vspec(d),
            lspec((d, f)),
            vspec(f),
            lspec((f, d)),
            vspec(d),
            *((vspec(3 * d), vspec(d), vspec(f), vspec(d)) if quant else ()),  # dequant scales
            pl.BlockSpec(memory_space=pltpu.ANY),  # kv_hbm
            *((pl.BlockSpec(memory_space=pltpu.ANY),) if kv_quant else ()),  # kv scales hbm
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mask
            pl.BlockSpec(memory_space=pltpu.VMEM),  # head mask
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, 2 * d), lambda i, *_s: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((bsz, d), jnp.float32),
            pltpu.VMEM(
                (n_buf, chunk, 2 * d) if row_stream else (n_buf, bsz, chunk, 2 * d), kv_cache.dtype
            ),
            *((pltpu.VMEM((n_buf, 2, chunk) if row_stream else (n_buf, bsz, 2, chunk), jnp.float32),) if kv_quant else ()),
            pltpu.SemaphoreType.DMA((n_buf,)),
            *((pltpu.SemaphoreType.DMA((n_buf,)),) if kv_quant else ()),
        ],
    )
    # write_idx: scalar (all rows at the same step — generate()) or (B,)
    # vector (rows at independent steps — continuous batching). The kernel
    # itself only needs the sweep BOUND (slots beyond it are never valid);
    # the fresh K/V is added in-kernel and scattered into the cache here.
    rowwise = jnp.ndim(write_idx) != 0
    nvalid = jnp.max(write_idx) if rowwise else write_idx
    y, kv_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bsz, d), jnp.float32),
            # the NEW token's K/V leaves the kernel full-precision even in
            # int8-KV mode (quantized on the way into the cache below)
            jax.ShapeDtypeStruct((L, bsz, 2 * d), jnp.bfloat16 if kv_quant else kv_cache.dtype),
        ],
    )(
        jnp.asarray(nvalid, jnp.int32).reshape(1),
        x,
        weights["wqkv"], weights["bqkv"], weights["wo"], weights["bo"],
        weights["n1s"], weights["n1b"], weights["n2s"], weights["n2b"],
        weights["fc1"], weights["b1"], weights["fc2"], weights["b2"],
        *((weights["wqkv_s"], weights["wo_s"], weights["fc1_s"], weights["fc2_s"]) if quant else ()),
        kv_cache, *((kv_scales,) if kv_quant else ()), mask, jnp.asarray(_head_mask(d, h)),
    )

    if kv_quant:
        # quantize the new token's K/V (per layer/row symmetric scales)
        kf = kv_new[..., :d].astype(jnp.float32)
        vf = kv_new[..., d:].astype(jnp.float32)
        sk = jnp.maximum(jnp.max(jnp.abs(kf), axis=-1) / 127.0, 1e-8)  # (L,B)
        sv = jnp.maximum(jnp.max(jnp.abs(vf), axis=-1) / 127.0, 1e-8)
        kq = jnp.clip(jnp.round(kf / sk[..., None]), -127, 127)
        vq = jnp.clip(jnp.round(vf / sv[..., None]), -127, 127)
        kv_new = jnp.concatenate([kq, vq], axis=-1).astype(jnp.int8)
        new_scales = jnp.stack([sk, sv], axis=2)  # (L, B, 2)

    if rowwise:
        # per-row dynamic_update_slice instead of one scatter: scatter on
        # the (L,B,T,2D) pool defeats XLA's in-place buffer reuse inside
        # the decode loop (measured: the whole multi-hundred-MB cache was
        # copied every token); B unrolled DUS ops alias in place
        for i in range(bsz):
            kv_cache = jax.lax.dynamic_update_slice(
                kv_cache,
                kv_new[:, i : i + 1, None, :].astype(kv_cache.dtype),
                (0, i, write_idx[i], 0),
            )
            if kv_quant:
                kv_scales = jax.lax.dynamic_update_slice(
                    kv_scales, new_scales[:, i : i + 1, :, None], (0, i, 0, write_idx[i])
                )
    else:
        kv_cache = jax.lax.dynamic_update_slice(
            kv_cache, kv_new[:, :, None, :].astype(kv_cache.dtype), (0, 0, write_idx, 0)
        )
        if kv_quant:
            kv_scales = jax.lax.dynamic_update_slice(
                kv_scales, new_scales[:, :, :, None], (0, 0, 0, write_idx)
            )
    if kv_quant:
        return y, kv_cache, kv_scales
    return y, kv_cache


def _quantize_cols(w):
    """(L, Din, Dout) f32 -> per-output-channel symmetric int8 + scales.

    y = (x @ w_q) * s is exact modulo rounding of w (activations stay f32);
    the dequant scale applies after the matmul since s varies only along
    the output channel."""
    w = jnp.asarray(w, jnp.float32)
    s = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0  # (L, 1, Dout)
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s


def stack_weights_from_params(params: dict, num_layers: int, quant: str = "bf16") -> dict:
    """Build the stacked-weight dict from a T2SDecoder param tree.

    quant="int8": weight-only per-output-channel symmetric quantization —
    halves the per-token HBM weight streaming (the decode bound)."""
    p = params["params"]
    get = lambda i: p[f"layer_{i}"]
    if quant == "int8":
        out = {}
        for name, key in [("wqkv", "wqkv"), ("wo", "wo"), ("fc1", "fc1"), ("fc2", "fc2")]:
            w = jnp.stack([get(i)[key]["kernel"] for i in range(num_layers)])
            q, s = _quantize_cols(w)
            out[name] = q
            out[f"{name}_s"] = s
        out.update({
            "bqkv": jnp.stack([get(i)["wqkv"]["bias"] for i in range(num_layers)])[:, None].astype(jnp.float32),
            "bo": jnp.stack([get(i)["wo"]["bias"] for i in range(num_layers)])[:, None].astype(jnp.float32),
            "n1s": jnp.stack([get(i)["norm1"]["scale"] for i in range(num_layers)])[:, None].astype(jnp.float32),
            "n1b": jnp.stack([get(i)["norm1"]["bias"] for i in range(num_layers)])[:, None].astype(jnp.float32),
            "n2s": jnp.stack([get(i)["norm2"]["scale"] for i in range(num_layers)])[:, None].astype(jnp.float32),
            "n2b": jnp.stack([get(i)["norm2"]["bias"] for i in range(num_layers)])[:, None].astype(jnp.float32),
            "b1": jnp.stack([get(i)["fc1"]["bias"] for i in range(num_layers)])[:, None].astype(jnp.float32),
            "b2": jnp.stack([get(i)["fc2"]["bias"] for i in range(num_layers)])[:, None].astype(jnp.float32),
        })
        return out
    return {
        "wqkv": jnp.stack([get(i)["wqkv"]["kernel"] for i in range(num_layers)]).astype(jnp.bfloat16),
        "bqkv": jnp.stack([get(i)["wqkv"]["bias"] for i in range(num_layers)])[:, None].astype(jnp.float32),
        "wo": jnp.stack([get(i)["wo"]["kernel"] for i in range(num_layers)]).astype(jnp.bfloat16),
        "bo": jnp.stack([get(i)["wo"]["bias"] for i in range(num_layers)])[:, None].astype(jnp.float32),
        "n1s": jnp.stack([get(i)["norm1"]["scale"] for i in range(num_layers)])[:, None].astype(jnp.float32),
        "n1b": jnp.stack([get(i)["norm1"]["bias"] for i in range(num_layers)])[:, None].astype(jnp.float32),
        "n2s": jnp.stack([get(i)["norm2"]["scale"] for i in range(num_layers)])[:, None].astype(jnp.float32),
        "n2b": jnp.stack([get(i)["norm2"]["bias"] for i in range(num_layers)])[:, None].astype(jnp.float32),
        "fc1": jnp.stack([get(i)["fc1"]["kernel"] for i in range(num_layers)]).astype(jnp.bfloat16),
        "b1": jnp.stack([get(i)["fc1"]["bias"] for i in range(num_layers)])[:, None].astype(jnp.float32),
        "fc2": jnp.stack([get(i)["fc2"]["kernel"] for i in range(num_layers)]).astype(jnp.bfloat16),
        "b2": jnp.stack([get(i)["fc2"]["bias"] for i in range(num_layers)])[:, None].astype(jnp.float32),
    }
