"""UVR5 "VR" spectrogram-mask separators, TPU-native.

Re-design of the reference VR family (tools/uvr5/vr.py `AudioPre` /
`AudioPreDeEcho`, nets tools/uvr5/lib/lib_v5/nets_61968KB.py
`CascadedASPPNet` and nets_new.py `CascadedNet`, processing
lib/lib_v5/spec_utils.py, windowed inference lib/utils.py:25):

- a 4-band multirate STFT front end (672-bin combined magnitude spec),
- a cascaded U-Net with ASPP (HP2/HP5-family) or the LSTM-augmented
  CascadedNet (DeEcho/DeReverb) predicting a sigmoid magnitude mask,
- aggressiveness post-powers, high-end mirroring, and per-band iSTFT
  reconstruction.

TPU mapping: the network forward is one jitted NHWC function over a fixed
(1, 2, 673|769, 576) window, so every window of a track reuses one
compilation; convs/BN fold to MXU matmuls, bilinear align-corners
upsampling is expressed as two static interpolation matmuls.  Parameters
are kept keyed by the torch state_dict names (the public .pth files load
verbatim) — BN is folded into an inference-time scale/shift at load.

The band filterbank/resample chain stays on host (numpy/scipy), exactly
like the reference (librosa-side).  `librosa` res_types (polyphase,
kaiser_fast, sinc_*) are all realized as scipy polyphase resampling — a
documented deviation that changes the anti-aliasing filter slightly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gpt_sovits_tpu.dsp.stft import istft_center, stft_center

# ---------------------------------------------------------------------------
# Band parameter tables (lib/lib_v5/modelparams/4band_v2.json, 4band_v3.json)
# ---------------------------------------------------------------------------

_BANDS_V2 = {
    1: dict(sr=7350, hl=80, n_fft=640, crop_start=0, crop_stop=85, lpf_start=25, lpf_stop=53),
    2: dict(sr=7350, hl=80, n_fft=320, crop_start=4, crop_stop=87, hpf_start=25, hpf_stop=12, lpf_start=31, lpf_stop=62),
    3: dict(sr=14700, hl=160, n_fft=512, crop_start=17, crop_stop=216, hpf_start=48, hpf_stop=24, lpf_start=139, lpf_stop=210),
    4: dict(sr=44100, hl=480, n_fft=960, crop_start=78, crop_stop=383, hpf_start=130, hpf_stop=86),
}

MODEL_PARAMS_4BAND_V2 = dict(bins=672, sr=44100, pre_filter_start=668, pre_filter_stop=672, band=_BANDS_V2)
MODEL_PARAMS_4BAND_V3 = dict(bins=672, sr=44100, pre_filter_start=668, pre_filter_stop=672, band=_BANDS_V2)


# ---------------------------------------------------------------------------
# Functional NHWC building blocks over torch-keyed params
# ---------------------------------------------------------------------------


def _fold_bn(sd: dict, conv_w, bn_prefix: str, eps: float = 1e-5):
    """Fold BatchNorm2d running stats into conv weight + bias."""
    g = sd[f"{bn_prefix}.weight"]
    b = sd[f"{bn_prefix}.bias"]
    mu = sd[f"{bn_prefix}.running_mean"]
    var = sd[f"{bn_prefix}.running_var"]
    scale = g / np.sqrt(var + eps)
    return conv_w * scale[:, None, None, None], b - mu * scale


def _conv_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def fold_params(state_dict: dict) -> dict:
    """torch state_dict -> jnp tree: BN folded, convs HWIO, linears kept."""
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v, np.float32) for k, v in state_dict.items()}
    out: dict = {}
    done = set()
    for k in sd:
        if k.endswith(".conv.0.weight"):  # Conv2DBNActiv (or separable stage 1)
            pre = k[: -len(".0.weight")]
            if f"{pre}.1.running_mean" in sd:  # conv + BN
                w, b = _fold_bn(sd, sd[k], f"{pre}.1")
                out[f"{pre}.w"] = jnp.asarray(_conv_hwio(w))
                out[f"{pre}.b"] = jnp.asarray(b)
                done.update({k, f"{pre}.1.weight", f"{pre}.1.bias", f"{pre}.1.running_mean", f"{pre}.1.running_var"})
            elif f"{pre}.2.running_mean" in sd:  # separable: depthwise, pointwise, BN
                w1 = sd[k]  # (nin, 1, H, W) depthwise
                w2, b2 = _fold_bn(sd, sd[f"{pre}.1.weight"], f"{pre}.2")
                out[f"{pre}.dw"] = jnp.asarray(_conv_hwio(w1))
                out[f"{pre}.w"] = jnp.asarray(_conv_hwio(w2))
                out[f"{pre}.b"] = jnp.asarray(b2)
                done.update({k, f"{pre}.1.weight", f"{pre}.2.weight", f"{pre}.2.bias", f"{pre}.2.running_mean", f"{pre}.2.running_var"})
    for k, v in sd.items():
        if k in done or k.endswith("num_batches_tracked"):
            continue
        if k not in out:
            if v.ndim == 4:
                out[k] = jnp.asarray(_conv_hwio(v))
            else:
                out[k] = jnp.asarray(v)
    return out


def _conv(p, pre, x, *, stride=1, dilation=1, pad=None, act="relu", groups=1):
    """Folded Conv2DBNActiv. x NHWC."""
    w = p[f"{pre}.conv.w"]
    kh = p[f"{pre}.conv.dw"].shape[0] if f"{pre}.conv.dw" in p else w.shape[0]
    if pad is None:
        pad = dilation * (kh - 1) // 2
    if f"{pre}.conv.dw" in p:  # separable
        dw = p[f"{pre}.conv.dw"]
        x = jax.lax.conv_general_dilated(
            x, dw, (stride, stride), [(pad, pad), (pad, pad)],
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=x.shape[-1],
        )
        x = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
    else:
        x = jax.lax.conv_general_dilated(
            x, w, (stride, stride), [(pad, pad), (pad, pad)],
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )
    x = x + p[f"{pre}.conv.b"]
    if act == "relu":
        x = jax.nn.relu(x)
    elif act == "lrelu":
        x = jnp.where(x >= 0, x, 0.01 * x)
    return x


@functools.lru_cache(maxsize=64)
def _lerp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_in, n_out) align_corners=True bilinear interpolation matrix."""
    if n_in == 1:
        return np.ones((1, n_out), np.float32)
    pos = np.arange(n_out) * (n_in - 1) / max(n_out - 1, 1)
    lo = np.floor(pos).astype(int)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (pos - lo).astype(np.float32)
    m = np.zeros((n_in, n_out), np.float32)
    np.add.at(m, (lo, np.arange(n_out)), 1 - frac)
    np.add.at(m, (hi, np.arange(n_out)), frac)
    return m


def _upsample_ac(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """NHWC bilinear, align_corners=True (torch F.interpolate semantics)."""
    h, w = x.shape[1], x.shape[2]
    if h != out_h:
        x = jnp.einsum("nhwc,ho->nowc", x, jnp.asarray(_lerp_matrix(h, out_h)))
    if w != out_w:
        x = jnp.einsum("nhwc,wo->nhoc", x, jnp.asarray(_lerp_matrix(w, out_w)))
    return x


def _crop_center_w(h1: jnp.ndarray, w_target: int) -> jnp.ndarray:
    s = (h1.shape[2] - w_target) // 2
    return h1[:, :, s : s + w_target, :]


# --- v2 layers (lib/lib_v5/layers_123821KB.py) -----------------------------


def _enc_v2(p, pre, x):
    skip = _conv(p, f"{pre}.conv1", x, act="lrelu")
    h = _conv(p, f"{pre}.conv2", skip, stride=2, act="lrelu")
    return h, skip


def _dec_v2(p, pre, x, skip=None):
    x = _upsample_ac(x, x.shape[1] * 2, x.shape[2] * 2)
    if skip is not None:
        skip = _crop_center_w(skip, x.shape[2])
        x = jnp.concatenate([x, skip], axis=-1)
    return _conv(p, f"{pre}.conv", x)


def _aspp_v2(p, pre, x, dilations=(4, 8, 16)):
    h, w = x.shape[1], x.shape[2]
    pooled = jnp.mean(x, axis=1, keepdims=True)  # AdaptiveAvgPool2d((1, None))
    feat1 = _upsample_ac(_conv(p, f"{pre}.conv1.1", pooled, pad=0), h, w)
    feat2 = _conv(p, f"{pre}.conv2", x, pad=0)
    feat3 = _conv(p, f"{pre}.conv3", x, dilation=dilations[0])
    feat4 = _conv(p, f"{pre}.conv4", x, dilation=dilations[1])
    feat5 = _conv(p, f"{pre}.conv5", x, dilation=dilations[2])
    out = jnp.concatenate([feat1, feat2, feat3, feat4, feat5], axis=-1)
    return _conv(p, f"{pre}.bottleneck.0", out, pad=0)  # Dropout2d: eval no-op


def _base_aspp_net(p, pre, x):
    h, e1 = _enc_v2(p, f"{pre}.enc1", x)
    h, e2 = _enc_v2(p, f"{pre}.enc2", h)
    h, e3 = _enc_v2(p, f"{pre}.enc3", h)
    h, e4 = _enc_v2(p, f"{pre}.enc4", h)
    h = _aspp_v2(p, f"{pre}.aspp", h)
    h = _dec_v2(p, f"{pre}.dec4", h, e4)
    h = _dec_v2(p, f"{pre}.dec3", h, e3)
    h = _dec_v2(p, f"{pre}.dec2", h, e2)
    h = _dec_v2(p, f"{pre}.dec1", h, e1)
    return h


def _out_conv(p, key, x):
    w = p[key]  # HWIO 1x1, bias-free
    return jax.lax.conv_general_dilated(x, w, (1, 1), [(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _replicate_pad_h(x: jnp.ndarray, out_h: int) -> jnp.ndarray:
    return jnp.concatenate([x, jnp.repeat(x[:, -1:], out_h - x.shape[1], axis=1)], axis=1)


def cascaded_aspp_net(p: dict, x_mag: jnp.ndarray, n_fft: int, aggressiveness=None) -> jnp.ndarray:
    """nets_61968KB.CascadedASPPNet inference forward.

    x_mag (B, 2, bins+1, T) magnitude -> masked magnitude (same shape).
    """
    max_bin = n_fft // 2
    output_bin = n_fft // 2 + 1
    mix = x_mag
    x = jnp.transpose(x_mag[:, :, :max_bin], (0, 2, 3, 1))  # NHWC (H=bins)

    bandw = x.shape[1] // 2
    aux1 = jnp.concatenate(
        [
            _base_aspp_net(p, "stg1_low_band_net", x[:, :bandw]),
            _base_aspp_net(p, "stg1_high_band_net", x[:, bandw:]),
        ],
        axis=1,
    )
    h = jnp.concatenate([x, aux1], axis=-1)
    aux2 = _base_aspp_net(p, "stg2_full_band_net", _conv(p, "stg2_bridge", h, pad=0))
    h = jnp.concatenate([x, aux1, aux2], axis=-1)
    h = _base_aspp_net(p, "stg3_full_band_net", _conv(p, "stg3_bridge", h, pad=0))

    mask = jax.nn.sigmoid(_out_conv(p, "out.weight", h))  # NHWC
    mask = _replicate_pad_h(mask, output_bin)
    mask = jnp.transpose(mask, (0, 3, 1, 2))  # (B, 2, bins+1, T)
    if aggressiveness is not None:
        split, value = aggressiveness
        lo = jnp.power(mask[:, :, :split], 1 + value / 3)
        hi = jnp.power(mask[:, :, split:], 1 + value)
        mask = jnp.concatenate([lo, hi], axis=2)
    return mask * mix


# --- new layers (lib/lib_v5/layers_new.py, nets_new.py) --------------------


def _enc_new(p, pre, x, stride=2):
    h = _conv(p, f"{pre}.conv1", x, stride=stride, act="lrelu")
    return _conv(p, f"{pre}.conv2", h, act="lrelu")


def _dec_new(p, pre, x, skip=None):
    x = _upsample_ac(x, x.shape[1] * 2, x.shape[2] * 2)
    if skip is not None:
        skip = _crop_center_w(skip, x.shape[2])
        x = jnp.concatenate([x, skip], axis=-1)
    return _conv(p, f"{pre}.conv1", x)


def _aspp_new(p, pre, x, dilations=((4, 2), (8, 4), (12, 6))):
    h, w = x.shape[1], x.shape[2]
    pooled = jnp.mean(x, axis=1, keepdims=True)
    feat1 = _upsample_ac(_conv(p, f"{pre}.conv1.1", pooled, pad=0), h, w)
    feat2 = _conv(p, f"{pre}.conv2", x, pad=0)
    feats = [feat1, feat2]
    for i, d in enumerate(dilations):
        dh, dw = d if isinstance(d, tuple) else (d, d)
        wgt = p[f"{pre}.conv{i + 3}.conv.w"]
        ph = dh * (wgt.shape[0] - 1) // 2
        pw = dw * (wgt.shape[1] - 1) // 2
        y = jax.lax.conv_general_dilated(
            x, wgt, (1, 1), [(ph, ph), (pw, pw)], rhs_dilation=(dh, dw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p[f"{pre}.conv{i + 3}.conv.b"]
        feats.append(jax.nn.relu(y))
    out = jnp.concatenate(feats, axis=-1)
    return _conv(p, f"{pre}.bottleneck", out, pad=0)


def _lstm_cell_scan(x_seq, w_ih, w_hh, b, hidden):
    """x_seq (T, B, F) -> outputs (T, B, hidden). torch LSTM gate order i,f,g,o."""

    def step(carry, xt):
        h, c = carry
        gates = xt @ w_ih.T + h @ w_hh.T + b
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    B = x_seq.shape[1]
    init = (jnp.zeros((B, hidden), x_seq.dtype), jnp.zeros((B, hidden), x_seq.dtype))
    _, ys = jax.lax.scan(step, init, x_seq)
    return ys


def _lstm_module(p, pre, x):
    """layers_new.LSTMModule: conv->1ch, BiLSTM over frames, dense+BN1d+ReLU."""
    N, nbins, nframes = x.shape[0], x.shape[1], x.shape[2]
    h = _conv(p, f"{pre}.conv", x, pad=0)[..., 0]  # (N, nbins, nframes)
    h = jnp.transpose(h, (2, 0, 1))  # (T, N, nbins)
    hidden = p[f"{pre}.lstm.weight_hh_l0"].shape[1]
    b_f = p[f"{pre}.lstm.bias_ih_l0"] + p[f"{pre}.lstm.bias_hh_l0"]
    b_r = p[f"{pre}.lstm.bias_ih_l0_reverse"] + p[f"{pre}.lstm.bias_hh_l0_reverse"]
    fwd = _lstm_cell_scan(h, p[f"{pre}.lstm.weight_ih_l0"], p[f"{pre}.lstm.weight_hh_l0"], b_f, hidden)
    bwd = _lstm_cell_scan(h[::-1], p[f"{pre}.lstm.weight_ih_l0_reverse"], p[f"{pre}.lstm.weight_hh_l0_reverse"], b_r, hidden)[::-1]
    h = jnp.concatenate([fwd, bwd], axis=-1)  # (T, N, 2*hidden)
    h = h @ p[f"{pre}.dense.0.weight"].T + p[f"{pre}.dense.0.bias"]
    # BatchNorm1d inference
    eps = 1e-5
    scale = p[f"{pre}.dense.1.weight"] / jnp.sqrt(p[f"{pre}.dense.1.running_var"] + eps)
    h = (h - p[f"{pre}.dense.1.running_mean"]) * scale + p[f"{pre}.dense.1.bias"]
    h = jax.nn.relu(h)  # (T, N, nbins)
    h = jnp.transpose(h, (1, 2, 0))[:, :, :, None]  # (N, nbins, T, 1)
    return h


def _base_net(p, pre, x):
    """nets_new.BaseNet. x NHWC -> NHWC."""
    e1 = _conv(p, f"{pre}.enc1", x)
    e2 = _enc_new(p, f"{pre}.enc2", e1)
    e3 = _enc_new(p, f"{pre}.enc3", e2)
    e4 = _enc_new(p, f"{pre}.enc4", e3)
    e5 = _enc_new(p, f"{pre}.enc5", e4)
    h = _aspp_new(p, f"{pre}.aspp", e5)
    h = _dec_new(p, f"{pre}.dec4", h, e4)
    h = _dec_new(p, f"{pre}.dec3", h, e3)
    h = _dec_new(p, f"{pre}.dec2", h, e2)
    lstm = _lstm_module(p, f"{pre}.lstm_dec2", h)  # NHWC in, (N, nbins, T, 1) out
    h = jnp.concatenate([h, lstm], axis=-1)
    h = _dec_new(p, f"{pre}.dec1", h, e1)
    return h


def cascaded_net(p: dict, x_mag: jnp.ndarray, n_fft: int, aggressiveness=None) -> jnp.ndarray:
    """nets_new.CascadedNet inference: x_mag (B,2,bins+1,T) -> masked mag."""
    max_bin = n_fft // 2
    output_bin = n_fft // 2 + 1
    mix = x_mag
    x = jnp.transpose(x_mag[:, :, :max_bin], (0, 2, 3, 1))

    bandw = x.shape[1] // 2
    l1_in, h1_in = x[:, :bandw], x[:, bandw:]
    l1 = _base_net(p, "stg1_low_band_net.0", l1_in)
    l1 = _conv(p, "stg1_low_band_net.1", l1, pad=0)
    h1 = _base_net(p, "stg1_high_band_net", h1_in)
    aux1 = jnp.concatenate([l1, h1], axis=1)

    l2_in = jnp.concatenate([l1_in, l1], axis=-1)
    h2_in = jnp.concatenate([h1_in, h1], axis=-1)
    l2 = _base_net(p, "stg2_low_band_net.0", l2_in)
    l2 = _conv(p, "stg2_low_band_net.1", l2, pad=0)
    h2 = _base_net(p, "stg2_high_band_net", h2_in)
    aux2 = jnp.concatenate([l2, h2], axis=1)

    f3_in = jnp.concatenate([x, aux1, aux2], axis=-1)
    f3 = _base_net(p, "stg3_full_band_net", f3_in)
    mask = jax.nn.sigmoid(_out_conv(p, "out.weight", f3))
    mask = _replicate_pad_h(mask, output_bin)
    mask = jnp.transpose(mask, (0, 3, 1, 2))
    if aggressiveness is not None:
        split, value = aggressiveness
        lo = jnp.power(mask[:, :, :split], 1 + value / 3)
        hi = jnp.power(mask[:, :, split:], 1 + value)
        mask = jnp.concatenate([lo, hi], axis=2)
    return mask * mix


# ---------------------------------------------------------------------------
# Spec pipeline (spec_utils.py) — host-side numpy around jitted STFT matmuls
# ---------------------------------------------------------------------------


def _stft_np(wave_lr: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """(2, L) -> (2, F, T) complex64, librosa/torch centered conventions."""
    return np.asarray(stft_center(jnp.asarray(wave_lr, jnp.float32), n_fft, hop))


def _istft_np(spec: np.ndarray, hop: int) -> np.ndarray:
    n_fft = 2 * (spec.shape[-2] - 1)
    return np.asarray(istft_center(jnp.asarray(spec), n_fft, hop))


def _resample(x: np.ndarray, orig: int, target: int) -> np.ndarray:
    from math import gcd

    from scipy.signal import resample_poly

    if orig == target:
        return x
    g = gcd(orig, target)
    return resample_poly(x, target // g, orig // g, axis=-1).astype(np.float32)


def combine_spectrograms(specs: dict, mp: dict) -> np.ndarray:
    """spec_utils.combine_spectrograms:85."""
    l = min(s.shape[2] for s in specs.values())
    bins = mp["bins"]
    out = np.zeros((2, bins + 1, l), np.complex64)
    ofs = 0
    bands_n = len(mp["band"])
    for d in range(1, bands_n + 1):
        bp = mp["band"][d]
        h = bp["crop_stop"] - bp["crop_start"]
        out[:, ofs : ofs + h] = specs[d][:, bp["crop_start"] : bp["crop_stop"], :l]
        ofs += h
    if mp["pre_filter_start"] > 0:
        gp = 1.0
        for b in range(mp["pre_filter_start"] + 1, mp["pre_filter_stop"]):
            g = 10 ** (-(b - mp["pre_filter_start"]) * (3.5 - gp) / 20.0)
            gp = g
            out[:, b] *= g
    return out


def fft_lp_filter(spec, start, stop):
    g = 1.0
    for b in range(start, stop):
        g -= 1 / (stop - start)
        spec[:, b] *= g
    spec[:, stop:] *= 0
    return spec


def fft_hp_filter(spec, start, stop):
    g = 1.0
    for b in range(start, stop, -1):
        g -= 1 / (start - stop)
        spec[:, b] *= g
    spec[:, : stop + 1] *= 0
    return spec


def wave_to_combined_spec(wav44: np.ndarray, mp: dict) -> tuple[np.ndarray, np.ndarray, int]:
    """(2, L)@44100 -> (combined spec, high-end input spec, high-end h)."""
    bands_n = len(mp["band"])
    specs, waves = {}, {}
    input_high_end = None
    input_high_end_h = 0
    for d in range(bands_n, 0, -1):
        bp = mp["band"][d]
        waves[d] = wav44 if d == bands_n else _resample(waves[d + 1], mp["band"][d + 1]["sr"], bp["sr"])
        specs[d] = _stft_np(waves[d], bp["n_fft"], bp["hl"])
        if d == bands_n:
            input_high_end_h = (bp["n_fft"] // 2 - bp["crop_stop"]) + (mp["pre_filter_stop"] - mp["pre_filter_start"])
            input_high_end = specs[d][:, bp["n_fft"] // 2 - input_high_end_h : bp["n_fft"] // 2, :]
    return combine_spectrograms(specs, mp), input_high_end, input_high_end_h


def mirroring(spec_m: np.ndarray, input_high_end: np.ndarray, mp: dict) -> np.ndarray:
    """spec_utils.mirroring:421 ('mirroring' mode)."""
    k = mp["pre_filter_start"] - 10
    mirror = np.flip(np.abs(spec_m[:, k - input_high_end.shape[1] : k, : input_high_end.shape[2]]), 1)
    mirror = mirror * np.exp(1.0j * np.angle(input_high_end))
    return np.where(np.abs(input_high_end) <= np.abs(mirror), input_high_end, mirror)


def combined_spec_to_wave(spec_m: np.ndarray, mp: dict, extra_h: int = 0, extra: np.ndarray | None = None) -> np.ndarray:
    """spec_utils.cmb_spectrogram_to_wave:327 -> (L, 2) float at mp['sr']."""
    bands_n = len(mp["band"])
    ofs = 0
    wave = None
    for d in range(1, bands_n + 1):
        bp = mp["band"][d]
        spec_s = np.zeros((2, bp["n_fft"] // 2 + 1, spec_m.shape[2]), np.complex64)
        h = bp["crop_stop"] - bp["crop_start"]
        spec_s[:, bp["crop_start"] : bp["crop_stop"]] = spec_m[:, ofs : ofs + h]
        ofs += h
        def add(a, b):  # guard against one-sample resampler drift
            n = min(a.shape[-1], b.shape[-1])
            return a[..., :n] + b[..., :n]

        if d == bands_n:
            if extra_h and extra is not None:
                max_bin = bp["n_fft"] // 2
                spec_s[:, max_bin - extra_h : max_bin] = extra[:, :extra_h, : spec_s.shape[2]]
            if bp.get("hpf_start", 0) > 0:
                spec_s = fft_hp_filter(spec_s, bp["hpf_start"], bp["hpf_stop"] - 1)
            wave = _istft_np(spec_s, bp["hl"]) if bands_n == 1 else add(wave, _istft_np(spec_s, bp["hl"]))
        elif d == 1:
            spec_s = fft_lp_filter(spec_s, bp["lpf_start"], bp["lpf_stop"])
            wave = _resample(_istft_np(spec_s, bp["hl"]), bp["sr"], mp["band"][2]["sr"])
        else:
            spec_s = fft_hp_filter(spec_s, bp["hpf_start"], bp["hpf_stop"] - 1)
            spec_s = fft_lp_filter(spec_s, bp["lpf_start"], bp["lpf_stop"])
            wave = _resample(add(wave, _istft_np(spec_s, bp["hl"])), bp["sr"], mp["band"][d + 1]["sr"])
    return wave.T


# ---------------------------------------------------------------------------
# Windowed inference (lib/utils.py:25) + top-level separate()
# ---------------------------------------------------------------------------


def _make_padding(width, cropsize, offset):
    left = offset
    roi = cropsize - 2 * left
    if roi == 0:
        roi = cropsize
    right = roi - (width % roi) + left
    return left, right, roi


def run_masking(model_fn, X_spec: np.ndarray, *, offset: int, window_size: int = 512, tta: bool = False, aggressiveness=None):
    """Windowed magnitude-mask inference. X_spec (2, bins+1, T) complex.

    Returns (pred magnitude, X_mag, X_phase-as-complex)."""
    X_mag = np.abs(X_spec)
    X_phase = np.angle(X_spec)
    coef = X_mag.max()
    X_pre = X_mag / max(coef, 1e-9)

    def execute(pad_l, pad_r, roi, n_window):
        Xp = np.pad(X_pre, ((0, 0), (0, 0), (pad_l, pad_r)), mode="constant")
        preds = []
        for i in range(n_window):
            s = i * roi
            win = Xp[None, :, :, s : s + window_size]
            pred = np.asarray(model_fn(jnp.asarray(win, jnp.float32)))[0]
            preds.append(pred[:, :, offset : -offset if offset else None])
        return np.concatenate(preds, axis=2)

    n_frame = X_pre.shape[2]
    pad_l, pad_r, roi = _make_padding(n_frame, window_size, offset)
    n_window = int(np.ceil(n_frame / roi))
    pred = execute(pad_l, pad_r, roi, n_window)[:, :, :n_frame]
    if tta:
        pad_l += roi // 2
        pad_r += roi // 2
        pred_tta = execute(pad_l, pad_r, roi, n_window + 1)[:, :, roi // 2 :][:, :, :n_frame]
        pred = (pred + pred_tta) * 0.5
    return pred * coef, X_mag, np.exp(1.0j * X_phase)


def load_vr_model(model_path: str):
    """-> (jitted model_fn builder, n_fft, kind). Detects family from keys."""
    from gpt_sovits_tpu.utils.checkpoint_compat import load_torch_checkpoint

    sd = load_torch_checkpoint(model_path)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    keys = set(sd.keys())
    is_new = any(k.startswith("stg2_low_band_net") for k in keys)
    p = fold_params(sd)
    mp = dict(MODEL_PARAMS_4BAND_V3 if is_new else MODEL_PARAMS_4BAND_V2)
    n_fft = mp["bins"] * 2
    kind = "deecho" if is_new else "hp"
    net = cascaded_net if is_new else cascaded_aspp_net
    offset = 64 if is_new else 128
    return p, net, n_fft, mp, kind, offset


def separate(
    wav: np.ndarray, sr: int, model_path: str, *, agg: int = 10, tta: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """(L,) or (S, L) input -> (vocals, accompaniment) at the input rate.

    HP-family nets predict the accompaniment magnitude (vocals = residual,
    vr.py:106-107); DeEcho-family nets predict the vocal (reference's
    outputs are name-swapped there, vr.py:219).
    """
    from gpt_sovits_tpu.dsp.audio_io import resample as rs

    p, net, n_fft, mp, kind, offset = load_vr_model(model_path)

    mono_in = wav.ndim == 1
    x = wav[None] if mono_in else np.asarray(wav, np.float32)
    if x.shape[0] == 1:
        x = np.repeat(x, 2, axis=0)
    if sr != mp["sr"]:
        x = np.stack([rs(c, sr, mp["sr"]) for c in x])

    X_spec, high_end, high_end_h = wave_to_combined_spec(x, mp)
    aggressiveness = (mp["band"][1]["crop_stop"], agg / 100.0)

    _fn = jax.jit(lambda pp, w: net(pp, w, n_fft, aggressiveness))
    fn = lambda w: _fn(p, w)
    pred, X_mag, X_phase = run_masking(fn, X_spec, offset=offset, tta=tta)

    y_spec = pred * X_phase  # what the net isolates
    v_spec = X_spec - y_spec

    def to_wave(spec):
        extra = mirroring(spec, high_end, mp)
        return combined_spec_to_wave(spec, mp, high_end_h, extra).T  # (2, L)

    y_wav, v_wav = to_wave(y_spec), to_wave(v_spec)
    vocals, other = (y_wav, v_wav) if kind == "deecho" else (v_wav, y_wav)

    if sr != mp["sr"]:
        vocals = np.stack([rs(c, mp["sr"], sr) for c in vocals])
        other = np.stack([rs(c, mp["sr"], sr) for c in other])

    def fit(a, n):
        return a[..., :n] if a.shape[-1] >= n else np.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, n - a.shape[-1])])

    n_in = wav.shape[-1]
    vocals, other = fit(vocals, n_in), fit(other, n_in)
    if mono_in:
        vocals, other = vocals.mean(axis=0), other.mean(axis=0)
    return vocals.astype(np.float32), other.astype(np.float32)
