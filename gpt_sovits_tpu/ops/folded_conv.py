"""Space-to-depth ("folded") HiFiGAN generator for full TPU lane occupancy.

The MRF generator's late stages run dilated k=3/7/11 convs on activations
with 16-64 channels over 10^5-10^6 timesteps (models.py:452-469).  On TPU
a (T, C) array is tiled (8, 128) in the minor dims: with C=16 every load,
store and MXU tile is 128/16 = 8x padding waste, which makes those stages
the serving bottleneck (measured ~60% of the S2 decode).

Fix: fold r = 128//C consecutive timesteps into channels, x(T, C) ->
X(T/r, r*C) (a free, contiguous reshape), and rewrite each dilated conv
as an EXACT folded conv with block-Toeplitz weights:

    y[t] = sum_m w[m] x[t + d*m - pad]
    Y[q, i] = sum_tau W'[tau] X[q + tau]      (same zero-padding semantics)

where W'[tau][j*C:(j+1)C, i*C:(i+1)C] = sum over taps m with
i + d*m - pad == (tau * r + j).  The folded conv runs at full 128-lane
occupancy; measured ~2.8x (f32) on the C=16 stage, exact to float
reassociation.  Transposed convs with kernel == stride fold into a single
block matmul (y[s*t + p] = w[p]^T x[t]).

`fold_generator_params` prepares the folded weight tree once from the
standard Generator param tree (models/vits.py names, checkpoint-compatible
— nothing about stored checkpoints changes); `generator_apply` is the pure
jittable forward used by the serving path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128


def fold_conv_weight(w: np.ndarray, dilation: int, pad: int, r: int):
    """(k, Cin, Cout) dilated conv -> folded ((k', r*Cin, r*Cout), (lpad, rpad))."""
    k, cin, cout = w.shape
    entries = []
    for i in range(r):
        for m in range(k):
            s = i + dilation * m - pad
            entries.append((s // r, s % r, i, m))
    tmin = min(e[0] for e in entries)
    tmax = max(e[0] for e in entries)
    wf = np.zeros((tmax - tmin + 1, r * cin, r * cout), w.dtype)
    for tau, j, i, m in entries:
        wf[tau - tmin, j * cin : (j + 1) * cin, i * cout : (i + 1) * cout] += w[m]
    return wf, (-tmin, tmax)


def conv_apply(x, w, b, pad, dil: int = 1, default_impl: str = "conv"):
    """Folded/plain 1D conv with a per-call lowering policy.

    "taps": per-tap dot_general accumulation — wins for the folded BigVGAN
    (small fold tap counts; XLA's conv lowering reached only ~20-38% MXU
    there). "conv": lax.conv — wins for the v2/v4 folded HiFiGAN (large
    folded tap counts make per-tap accumulation re-materialize the output
    kq times; measured 4x slower than conv at b4/T1000). GSVT_VOC_CONV
    overrides both call sites."""
    import os

    pl_, pr_ = pad if isinstance(pad, tuple) else (pad, pad)
    impl = os.environ.get("GSVT_VOC_CONV", default_impl)
    if jax.default_backend() != "cpu" and impl == "taps":
        k = w.shape[0]
        xp = jnp.pad(x, ((0, 0), (pl_, pr_), (0, 0)))
        q_out = x.shape[1] + pl_ + pr_ - (k - 1) * dil
        acc = None
        for i in range(k):
            t = jax.lax.dot_general(
                xp[:, i * dil : i * dil + q_out], w[i],
                (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            acc = t if acc is None else acc + t
        y = acc.astype(x.dtype)
    else:
        y = jax.lax.conv_general_dilated(
            x, w, (1,), [(pl_, pr_)], rhs_dilation=(dil,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
    return y + b if b is not None else y


def folded_conv(x: jnp.ndarray, wf: jnp.ndarray, pads: tuple[int, int]) -> jnp.ndarray:
    return conv_apply(x, wf, None, pads)


def conv_apply_taps(x, w, b, pad, dil: int = 1):
    return conv_apply(x, w, b, pad, dil, default_impl="taps")


def _leaky(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def fold_convt_weight(w: np.ndarray, stride: int, pad: int, r_in: int):
    """Transposed conv (torch semantics, kernel (k, Cin, Cout)) as a folded
    subpixel conv: input folded by r_in -> output folded by r_in*stride.

    ConvT = conv(zero-stuffed input, flipped kernel, pad k-1-p). On the
    stride-fine grid the stuffed signal folded by r_in*stride has only
    every stride-th input block nonzero, so the folded block-Toeplitz
    weights collapse to (k', r_in*Cin, r_in*stride*Cout) — no zero
    multiplies, full lane occupancy. Exact.
    """
    k, cin, cout = w.shape
    if k - stride - 2 * pad != 0:
        raise ValueError(f"folded convT assumes length-preserving config, got k={k} s={stride} p={pad}")
    flipw = w[::-1]
    r_fine = r_in * stride
    wf_full, pads = fold_conv_weight(np.ascontiguousarray(flipw), 1, k - 1 - pad, r_fine)
    kp = wf_full.shape[0]
    wf = wf_full.reshape(kp, r_fine, cin, r_fine * cout)[:, ::stride]  # keep stuffed-nonzero blocks
    return np.ascontiguousarray(wf.reshape(kp, r_in * cin, r_fine * cout)), pads


def _pick_r(ch: int, max_r: int = 8) -> int:
    """Smallest power-of-two fold maximizing lane occupancy of r*ch."""
    import math

    def eff(r):
        return (r * ch) / (LANES * math.ceil(r * ch / LANES))

    best, best_eff = 1, eff(1)
    r = 2
    while r <= max_r:
        if eff(r) > best_eff + 1e-9:
            best, best_eff = r, eff(r)
        r *= 2
    return best


def fold_generator_params(dec_params, cfg, dtype=jnp.float32) -> dict:
    """Generator param subtree -> folded weight tree (+ fold plan in meta).

    dec_params: params["dec"] of SynthesizerTrn (or a standalone Generator).
    """
    p = jax.tree.map(lambda a: np.asarray(a, np.float32), dec_params)
    rates = tuple(cfg.upsample_rates)
    kernels = tuple(cfg.upsample_kernel_sizes)
    uic = cfg.upsample_initial_channel
    rks = tuple(cfg.resblock_kernel_sizes)
    rds = tuple(tuple(d) for d in cfg.resblock_dilation_sizes)

    out: dict = {
        "conv_pre_w": p["conv_pre"]["Conv_0"]["kernel"],
        "conv_pre_b": p["conv_pre"]["Conv_0"]["bias"],
    }
    if "cond" in p:
        out["cond_w"] = p["cond"]["Conv_0"]["kernel"]
        out["cond_b"] = p["cond"]["Conv_0"]["bias"]

    plan = []  # per stage: (rate, kernel, ch, r_in, r_out)
    r = 1
    for i, (u, k) in enumerate(zip(rates, kernels)):
        ch = uic // (2 ** (i + 1))
        up = p[f"up_{i}"]
        r_in = r
        # every transposed conv runs as a folded subpixel conv — no
        # zero-stuffed multiplies, full lanes (fold_convt_weight)
        r_fine = r_in * u
        wf, ct_pads = fold_convt_weight(np.asarray(up["kernel"]), u, (k - u) // 2, r_in)
        out[f"up_{i}_w"] = wf
        out[f"up_{i}_b"] = np.tile(up["bias"], r_fine)
        out.setdefault("_pads", {})[f"up_{i}"] = ct_pads
        # relax the fold to the lane-optimal divisor of r_fine for the MRF
        r_out = max(
            (rr for rr in range(1, r_fine + 1) if r_fine % rr == 0),
            key=lambda rr: ((rr * ch) / (LANES * -(-(rr * ch) // LANES)), -rr),
        )
        r = r_out

        for j, (rk, rd) in enumerate(zip(rks, rds)):
            rb = p[f"resblock_{i}_{j}"]
            for jj, d in enumerate(rd):
                for which, (dd, name) in enumerate([(d, "c1"), (1, "c2")]):
                    w = rb[f"{name}_{jj}"]["Conv_0"]["kernel"]
                    b = rb[f"{name}_{jj}"]["Conv_0"]["bias"]
                    pad = (rk - 1) * dd // 2
                    if r > 1:
                        wf, pads = fold_conv_weight(w, dd, pad, r)
                        out[f"rb_{i}_{j}_{name}_{jj}_w"] = wf
                        out[f"rb_{i}_{j}_{name}_{jj}_b"] = np.tile(b, r)
                        plan_pads = pads
                    else:
                        out[f"rb_{i}_{j}_{name}_{jj}_w"] = w
                        out[f"rb_{i}_{j}_{name}_{jj}_b"] = b
                        plan_pads = (pad, pad)
                    out.setdefault("_pads", {})[f"rb_{i}_{j}_{name}_{jj}"] = plan_pads
        plan.append((u, k, ch, r_in, r_out))

    w = p["conv_post"]["Conv_0"]["kernel"]  # (7, ch, 1)
    if r > 1:
        wf, pads = fold_conv_weight(w, 1, 3, r)
        out["conv_post_w"] = wf
    else:
        out["conv_post_w"] = w
        pads = (3, 3)
    out["_pads"]["conv_post"] = pads
    if "bias" in p["conv_post"]["Conv_0"]:
        b = p["conv_post"]["Conv_0"]["bias"]
        out["conv_post_b"] = np.tile(b, r) if r > 1 else b

    meta = {"plan": tuple(plan), "rks": rks, "rds": rds, "final_r": r}
    pads_tree = out.pop("_pads")
    arrs = {k2: jnp.asarray(v, dtype) for k2, v in out.items()}
    return {"arrays": arrs, "pads": pads_tree, "meta": meta}


def generator_apply(folded: dict, x: jnp.ndarray, g: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Pure forward equal to Generator.__call__ (models/vits.py:94).

    x: (B, T0, inter_channels); g: (B, 1, gin) or None -> (B, T_wav, 1).
    """
    a = folded["arrays"]
    pads = folded["pads"]
    plan = folded["meta"]["plan"]
    rks = folded["meta"]["rks"]
    rds = folded["meta"]["rds"]

    conv = conv_apply

    x = conv(x, a["conv_pre_w"], a["conv_pre_b"], 3)
    if g is not None and "cond_w" in a:
        x = x + conv(g, a["cond_w"], a["cond_b"], 0)

    B = x.shape[0]
    r = 1
    for i, (u, k, ch, r_in, r_out) in enumerate(plan):
        x = _leaky(x, 0.1)
        y = conv(x, a[f"up_{i}_w"], a[f"up_{i}_b"], pads[f"up_{i}"])
        cur_r = r_in * u
        if cur_r != r_out:  # relax the fold to the MRF's lane-optimal r
            y = y.reshape(B, y.shape[1] * cur_r // r_out, r_out * ch)
        x = y
        r = r_out

        xs = None
        for j, (rk, rd) in enumerate(zip(rks, rds)):
            h = x
            for jj, d in enumerate(rd):
                y = _leaky(h, 0.1)
                y = conv(y, a[f"rb_{i}_{j}_c1_{jj}_w"], a[f"rb_{i}_{j}_c1_{jj}_b"],
                         pads[f"rb_{i}_{j}_c1_{jj}"], dil=d if r == 1 else 1)
                y = _leaky(y, 0.1)
                y = conv(y, a[f"rb_{i}_{j}_c2_{jj}_w"], a[f"rb_{i}_{j}_c2_{jj}_b"],
                         pads[f"rb_{i}_{j}_c2_{jj}"])
                h = h + y
            xs = h if xs is None else xs + h
        x = xs / len(rks)

    x = _leaky(x, 0.01)
    x = conv(x, a["conv_post_w"], a.get("conv_post_b"), pads["conv_post"])
    if r > 1:
        x = x.reshape(B, x.shape[1] * r, 1)
    return jnp.tanh(x)
