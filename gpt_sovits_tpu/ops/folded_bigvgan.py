"""Lane-folded BigVGAN vocoder (v3 serving path).

Same exact space-to-depth rewrite as the folded HiFiGAN
(ops/folded_conv.py): BigVGAN's late stages run k=3/7/11 dilated convs on
24-96-channel activations over 10^5-10^6 samples, wasting most of the
TPU's 128-wide lane axis. Folding r timesteps into channels (a free
contiguous reshape) and building block-Toeplitz folded weights once at
load restores full lane occupancy.

Differences from the HiFiGAN fold:
  - the inter-conv activation is the anti-aliased snake (up x2 -> snakeβ
    -> down x2, the reference's CUDA kernel — BigVGAN/alias_free_activation).
    It runs IN the folded layout via a Pallas kernel
    (ops/pallas/snake_aa.py:snake_aa_folded) — a time shift by δ equals a
    flat lane shift by δ·ch, so the whole composition stays in VMEM with
    no relayout and no channel padding (round 2 unfolded per activation:
    the relayouts + 128-lane padding dominated the vocoder's runtime).
  - convs run as per-tap matmul accumulations on TPU
    (folded_conv.conv_apply), not lax.conv — XLA's conv lowering reached
    only ~20-38% MXU on the (kq, R, R) folded weights.
  - conv_post has no bias and the output clamps to [-1, 1]
    (use_bias_at_final=False, use_tanh_at_final=False in the 24 kHz config).
Bench numbers: benchmarks/BENCH_v3_r03.json (scripts/profile_voc.py to
re-measure; the round-2 docstring's "60 ms" figure was an async-timing
artifact of the tunnel device — see scripts/_trace_time.py).

Numerically identical to models/bigvgan.py:BigVGAN.__call__ modulo float
reassociation (parity-tested in tests/test_folded_conv.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gpt_sovits_tpu.ops.folded_conv import LANES, fold_conv_weight, fold_convt_weight


def _lane_optimal_divisor(r_fine: int, ch: int) -> int:
    """Divisor of r_fine maximizing lane occupancy of r*ch (ties -> smaller r)."""
    return max(
        (rr for rr in range(1, r_fine + 1) if r_fine % rr == 0),
        key=lambda rr: ((rr * ch) / (LANES * -(-(rr * ch) // LANES)), -rr),
    )


def fold_bigvgan_params(params: dict, cfg, dtype=jnp.float32) -> dict:
    """BigVGAN params["params"] -> folded weight tree.

    cfg: models/bigvgan.py:BigVGANConfig (or any object with the same
    upsample/resblock fields + snake_logscale/use_bias_at_final).
    """
    p = jax.tree.map(lambda a: np.asarray(a, np.float32), params)
    rates = tuple(cfg.upsample_rates)
    kernels = tuple(cfg.upsample_kernel_sizes)
    uic = cfg.upsample_initial_channel
    rks = tuple(cfg.resblock_kernel_sizes)
    rds = tuple(tuple(d) for d in cfg.resblock_dilation_sizes)

    out: dict = {
        "conv_pre_w": p["conv_pre"]["Conv_0"]["kernel"],
        "conv_pre_b": p["conv_pre"]["Conv_0"]["bias"],
    }
    pads_tree: dict = {}
    plan = []  # per stage: (rate, ch, r_in, r_out)
    r = 1
    for i, (u, k) in enumerate(zip(rates, kernels)):
        ch = uic // (2 ** (i + 1))
        r_in = r
        r_fine = r_in * u
        wf, ct_pads = fold_convt_weight(np.asarray(p[f"up_{i}"]["kernel"]), u, (k - u) // 2, r_in)
        out[f"up_{i}_w"] = wf
        out[f"up_{i}_b"] = np.tile(p[f"up_{i}"]["bias"], r_fine)
        pads_tree[f"up_{i}"] = ct_pads
        r = _lane_optimal_divisor(r_fine, ch)

        for j, rk in enumerate(rks):
            rb = p[f"resblock_{i}_{j}"]
            for jj, d in enumerate(rds[j]):
                for name, dd in (("c1", d), ("c2", 1)):
                    w = rb[f"{name}_{jj}"]["Conv_0"]["kernel"]
                    b = rb[f"{name}_{jj}"]["Conv_0"]["bias"]
                    pad = (rk - 1) * dd // 2
                    if r > 1:
                        wf, pads = fold_conv_weight(w, dd, pad, r)
                        out[f"rb_{i}_{j}_{name}_{jj}_w"] = wf
                        out[f"rb_{i}_{j}_{name}_{jj}_b"] = np.tile(b, r)
                    else:
                        out[f"rb_{i}_{j}_{name}_{jj}_w"] = w
                        out[f"rb_{i}_{j}_{name}_{jj}_b"] = b
                        pads = (pad, pad)
                    pads_tree[f"rb_{i}_{j}_{name}_{jj}"] = pads
                # snake params stay per-original-channel (used unfolded)
                for act in ("act1", "act2"):
                    out[f"rb_{i}_{j}_{act}_{jj}_alpha"] = rb[f"{act}_{jj}"]["alpha"]
                    out[f"rb_{i}_{j}_{act}_{jj}_beta"] = rb[f"{act}_{jj}"]["beta"]
        plan.append((u, ch, r_in, r))

    out["act_post_alpha"] = p["activation_post"]["alpha"]
    out["act_post_beta"] = p["activation_post"]["beta"]
    w = p["conv_post"]["Conv_0"]["kernel"]  # (7, ch, 1)
    if r > 1:
        wf, pads = fold_conv_weight(w, 1, 3, r)
        out["conv_post_w"] = wf
    else:
        out["conv_post_w"] = w
        pads = (3, 3)
    pads_tree["conv_post"] = pads
    if cfg.use_bias_at_final and "bias" in p["conv_post"]["Conv_0"]:
        b = p["conv_post"]["Conv_0"]["bias"]
        out["conv_post_b"] = np.tile(b, r) if r > 1 else b

    meta = {
        "plan": tuple(plan),
        "rks": rks,
        "rds": rds,
        "final_r": r,
        "logscale": bool(cfg.snake_logscale),
        "tanh": bool(cfg.use_tanh_at_final),
    }
    arrs = {k2: jnp.asarray(v, dtype) for k2, v in out.items()}
    return {"arrays": arrs, "pads": pads_tree, "meta": meta}


def _aa_snake(x, alpha, beta, r: int, ch: int, logscale: bool):
    """Anti-aliased snakeβ on a folded (B, Q, r*ch) activation: unfold
    (free reshape), run the exact up x2 -> snakeβ -> down x2 composition,
    refold. On TPU the fused Pallas kernel (ops/pallas/snake_aa.py) does
    the whole composition in VMEM — the XLA path materializes f32
    intermediates at 2x temporal resolution in HBM, which dominates the
    vocoder's runtime at 10^5-10^6 samples. On CPU the XLA composition
    runs (snake in f32 on the VPU, cast at the boundary)."""
    import os

    impl = os.environ.get("GSVT_SNAKE", "folded")
    if jax.default_backend() != "cpu" and impl == "folded":
        # fastest path: never leave the folded layout (no relayout, no
        # 128-lane channel padding) — ops/pallas/snake_aa.py:snake_aa_folded
        from gpt_sovits_tpu.ops.pallas.snake_aa import snake_aa_folded

        return snake_aa_folded(x, alpha, beta, r=r, ch=ch, logscale=logscale)
    b, q, rc = x.shape
    if r > 1:
        x = x.reshape(b, q * r, ch)
    if jax.default_backend() != "cpu" and impl == "pallas":
        from gpt_sovits_tpu.ops.pallas.snake_aa import snake_aa_fused

        h = snake_aa_fused(x, alpha, beta, logscale=logscale)
    else:
        from gpt_sovits_tpu.models.bigvgan import downsample1d, snake_beta, upsample1d

        dt = x.dtype
        h = upsample1d(x.astype(jnp.float32), 2)
        h = snake_beta(h, alpha.astype(jnp.float32), beta.astype(jnp.float32), logscale)
        h = downsample1d(h, 2).astype(dt)
    if r > 1:
        h = h.reshape(b, q, rc)
    return h


def bigvgan_apply(folded: dict, mel: jnp.ndarray) -> jnp.ndarray:
    """Pure forward equal to BigVGAN.__call__: (B, T, num_mels) -> (B, T*256, 1)."""
    a = folded["arrays"]
    pads = folded["pads"]
    meta = folded["meta"]
    plan, rks, rds = meta["plan"], meta["rks"], meta["rds"]
    logscale = meta["logscale"]

    from gpt_sovits_tpu.ops.folded_conv import conv_apply_taps as conv  # per-tap matmuls win for BigVGAN's folded weights

    x = conv(mel, a["conv_pre_w"], a["conv_pre_b"], 3)
    B = x.shape[0]
    for i, (u, ch, r_in, r_out) in enumerate(plan):
        y = conv(x, a[f"up_{i}_w"], a[f"up_{i}_b"], pads[f"up_{i}"])
        r_fine = r_in * u
        if r_fine != r_out:  # refold to the MRF's lane-optimal r (free)
            y = y.reshape(B, y.shape[1] * r_fine // r_out, r_out * ch)
        x = y

        xs = None
        for j, rk in enumerate(rks):
            h = x
            for jj, d in enumerate(rds[j]):
                y = _aa_snake(h, a[f"rb_{i}_{j}_act1_{jj}_alpha"], a[f"rb_{i}_{j}_act1_{jj}_beta"],
                              r_out, ch, logscale)
                y = conv(y, a[f"rb_{i}_{j}_c1_{jj}_w"], a[f"rb_{i}_{j}_c1_{jj}_b"],
                         pads[f"rb_{i}_{j}_c1_{jj}"], dil=d if r_out == 1 else 1)
                y = _aa_snake(y, a[f"rb_{i}_{j}_act2_{jj}_alpha"], a[f"rb_{i}_{j}_act2_{jj}_beta"],
                              r_out, ch, logscale)
                y = conv(y, a[f"rb_{i}_{j}_c2_{jj}_w"], a[f"rb_{i}_{j}_c2_{jj}_b"],
                         pads[f"rb_{i}_{j}_c2_{jj}"])
                h = h + y
            xs = h if xs is None else xs + h
        x = xs / len(rks)

    r = meta["final_r"]
    x = _aa_snake(x, a["act_post_alpha"], a["act_post_beta"], r, plan[-1][1], logscale)
    x = conv(x, a["conv_post_w"], a.get("conv_post_b"), pads["conv_post"])
    if r > 1:
        x = x.reshape(B, x.shape[1] * r, 1)
    return jnp.tanh(x) if meta["tanh"] else jnp.clip(x, -1.0, 1.0)
