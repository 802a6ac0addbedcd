"""FRCRN speech denoiser (corpus preparation).

The reference's denoise tool is the modelscope FRCRN pipeline
(tools/cmd-denoise.py:9-11, model `damo/speech_frcrn_ans_cirm_16k`) —
it downloads the model at runtime; no FRCRN code or weights ship with the
reference. This module is a JAX/flax implementation of that model family
(FRCRN, Zhao et al., ICASSP 2022: complex-valued U-Net with frequency
recurrence via FSMN, estimating a tanh-bounded complex ideal ratio mask,
two U-Nets cascaded) so the one-click data pipeline has a real neural
denoiser instead of only the spectral gate.

Checkpoint hyperparameters (the published `speech_frcrn_ans_cirm_16k`
config): 16 kHz, STFT win 640 / hop 320 / fft 640 with a sqrt-Hann
window, base complexity 45. `params_from_torch` imports a modelscope
`pytorch_model.bin` state dict by key mapping with strict shape checks;
modelscope itself is not required. The torch FRCRN implementation is not
present in this image, so import/parity against real weights cannot be
exercised here — the mapping is validated structurally
(tests/test_frcrn.py builds a synthetic state dict with the documented
names/shapes) and the model is validated behaviorally (a tiny instance
trains to >3 dB SI-SNR improvement on synthetic noise).

TPU notes: everything is static-shape and jit-friendly; convolutions are
NHWC `lax.conv_general_dilated` (complex pairs expressed as two real
convs, so the MXU sees plain f32/bf16 contractions); the FSMN frequency
recurrence is a depthwise conv along the frequency axis, not a scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# STFT / iSTFT (modelscope conv_stft.py math: rfft basis * sqrt-Hann window,
# implemented as framed rfft — identical result, no conv kernel needed)
# ---------------------------------------------------------------------------


def _sqrt_hann(n: int) -> np.ndarray:
    return np.sqrt(np.hanning(n + 1)[:-1]).astype(np.float32)


def frcrn_stft(wav: jnp.ndarray, win_len: int = 640, hop: int = 320, fft_len: int = 640):
    """(B, L) -> complex spec as (real, imag), each (B, F, T), F = fft//2+1.

    No centering (the modelscope ConvSTFT pads win_len//2 on both sides);
    we match that: reflect-free zero pad of win_len//2."""
    pad = win_len // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad)))
    n_frames = 1 + (x.shape[-1] - win_len) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(win_len)[None, :]
    frames = x[:, idx] * jnp.asarray(_sqrt_hann(win_len))
    z = jnp.fft.rfft(frames, n=fft_len, axis=-1)
    return jnp.swapaxes(z.real, 1, 2), jnp.swapaxes(z.imag, 1, 2)


def frcrn_istft(re: jnp.ndarray, im: jnp.ndarray, length: int, win_len: int = 640, hop: int = 320, fft_len: int = 640):
    """Inverse of frcrn_stft by windowed overlap-add with window-square
    normalization (the pinv of the forward basis equals this for a
    sqrt-Hann window at 50% hop)."""
    assert win_len == 2 * hop, "50% hop assumed (the checkpoint's 640/320)"
    z = jnp.swapaxes(re, 1, 2) + 1j * jnp.swapaxes(im, 1, 2)
    frames = jnp.fft.irfft(z, n=fft_len, axis=-1)[..., :win_len]
    win = jnp.asarray(_sqrt_hann(win_len))
    frames = frames * win
    b, n_frames, _ = frames.shape
    # 50%-hop overlap-add, scatter-free: slot i of the output is
    # first_half[i] + second_half[i-1]; window^2 = Hann satisfies COLA=1 on
    # the interior, and the win_len//2 edge slots are stripped by the pad
    # slice below, so no wsum normalization is needed
    a = jnp.concatenate([frames[:, :, :hop], jnp.zeros((b, 1, hop), frames.dtype)], axis=1)
    c = jnp.concatenate([jnp.zeros((b, 1, hop), frames.dtype), frames[:, :, hop:]], axis=1)
    out = (a + c).reshape(b, (n_frames + 1) * hop)
    pad = win_len // 2
    return out[:, pad : pad + length]


# ---------------------------------------------------------------------------
# Complex-valued building blocks (modelscope complex_nn.py semantics:
# a "complex" tensor is a trailing (..., 2) real/imag pair; ComplexConv2d
# is (Wr + iWi)(xr + ixi); BatchNorm/activations act per component)
# ---------------------------------------------------------------------------


class ComplexConv2d(nn.Module):
    features: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: tuple = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):  # (B, F, T, C, 2)
        conv_r = nn.Conv(self.features, self.kernel, self.strides, self.padding, name="real")
        conv_i = nn.Conv(self.features, self.kernel, self.strides, self.padding, name="imag")
        xr, xi = x[..., 0], x[..., 1]
        yr = conv_r(xr) - conv_i(xi)
        yi = conv_r(xi) + conv_i(xr)
        return jnp.stack([yr, yi], axis=-1)


class ComplexConvTranspose2d(nn.Module):
    features: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: tuple = ((0, 0), (0, 0))
    output_padding: tuple = (0, 0)

    @nn.compact
    def __call__(self, x):
        # torch ConvTranspose2d(padding=p, output_padding=op): out size
        # (i-1)s - 2p + k + op. lax.conv_transpose pads the dilated input
        # with (k-1-p) per side; output_padding adds to the high side.
        kh, kw = self.kernel
        ph, pw = self.padding
        oh, ow = self.output_padding
        pad = ((kh - 1 - ph[0], kh - 1 - ph[1] + oh), (kw - 1 - pw[0], kw - 1 - pw[1] + ow))
        ct_r = nn.ConvTranspose(self.features, self.kernel, self.strides, pad, transpose_kernel=True, name="real")
        ct_i = nn.ConvTranspose(self.features, self.kernel, self.strides, pad, transpose_kernel=True, name="imag")
        xr, xi = x[..., 0], x[..., 1]
        yr = ct_r(xr) - ct_i(xi)
        yi = ct_r(xi) + ct_i(xr)
        return jnp.stack([yr, yi], axis=-1)


class ComplexBatchNorm(nn.Module):
    """Per-component BatchNorm (modelscope ComplexBatchNorm: independent
    real/imag statistics). Inference-mode: uses stored moving stats."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn_r = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="real")
        bn_i = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="imag")
        return jnp.stack([bn_r(x[..., 0]), bn_i(x[..., 1])], axis=-1)


class ComplexFSMN(nn.Module):
    """Frequency-recurrent unit: a complex uni-directional deep FSMN
    (modelscope ComplexUniDeepFsmn) applied along the FREQUENCY axis —
    the paper's 'frequency recurrence' captured with a lookback memory of
    depthwise taps instead of an RNN scan (order `lorder`), which keeps
    the op a static-shape conv the compiler can fuse.

    in:  (B, F, T, C, 2)  treating F as the sequence axis
    """

    hidden: int
    out_dim: int
    lorder: int = 20

    @nn.compact
    def __call__(self, x):
        def fsmn(name):
            dense1 = nn.Dense(self.hidden, name=f"{name}_lin1")
            proj = nn.Dense(self.out_dim, use_bias=False, name=f"{name}_proj")
            mem = nn.Conv(
                self.out_dim, (self.lorder,), padding=((self.lorder - 1, 0),),
                feature_group_count=self.out_dim, use_bias=False, name=f"{name}_mem",
            )
            dense2 = nn.Dense(self.hidden, name=f"{name}_lin2")
            out = nn.Dense(self.out_dim, name=f"{name}_out")

            def apply(h):  # (B*T, F, C)
                p = proj(nn.relu(dense1(h)))
                p = p + mem(p)  # causal memory along F
                return out(nn.relu(dense2(p)))

            return apply

        f_r, f_i = fsmn("re"), fsmn("im")
        b, fdim, t, c, _ = x.shape
        xr = x[..., 0].transpose(0, 2, 1, 3).reshape(b * t, fdim, c)
        xi = x[..., 1].transpose(0, 2, 1, 3).reshape(b * t, fdim, c)
        yr = f_r(xr) - f_i(xi)
        yi = f_r(xi) + f_i(xr)
        yr = yr.reshape(b, t, fdim, -1).transpose(0, 2, 1, 3)
        yi = yi.reshape(b, t, fdim, -1).transpose(0, 2, 1, 3)
        return x + jnp.stack([yr, yi], axis=-1)  # residual (deep-FSMN skip)


# ---------------------------------------------------------------------------
# Complex U-Net (CRED): freq-downsampling encoders, FSMN bottleneck x2,
# skip-connected decoders
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FRCRNConfig:
    win_len: int = 640
    hop: int = 320
    fft_len: int = 640
    complexity: int = 45  # base channel count C of the published checkpoint
    # per-encoder (out_channels, kernel_fxt, stride_fxt); decoders mirror.
    # Frequency halves at every stage, time resolution is preserved.
    channels: tuple = (1, 2, 2, 2, 2, 2)  # multiples of `complexity`
    kernel: tuple = (5, 3)
    fsmn_hidden: int = 128
    fsmn_lorder: int = 20
    fsmn_layers: int = 2
    leak: float = 0.1


class ComplexUNet(nn.Module):
    cfg: FRCRNConfig = field(default_factory=FRCRNConfig)

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, F, T, 1, 2) -> same
        c = self.cfg
        kf, kt = c.kernel
        pad = ((kf // 2, kf // 2), (kt // 2, kt // 2))
        skips = []
        h = x
        for i, mult in enumerate(c.channels):
            h = ComplexConv2d(mult * c.complexity, c.kernel, (2, 1), pad, name=f"enc_{i}")(h)
            h = ComplexBatchNorm(name=f"enc_bn_{i}")(h, train)
            h = nn.leaky_relu(h, c.leak)
            skips.append(h)
        for i in range(c.fsmn_layers):
            h = ComplexFSMN(c.fsmn_hidden, c.channels[-1] * c.complexity, c.fsmn_lorder, name=f"fsmn_{i}")(h)
        for i, mult in reversed(list(enumerate(c.channels))):
            h = jnp.concatenate([h, skips[i]], axis=3)  # channel concat
            out_ch = c.channels[i - 1] * c.complexity if i > 0 else 1
            h = ComplexConvTranspose2d(
                out_ch, c.kernel, (2, 1), pad, output_padding=(1, 0), name=f"dec_{i}"
            )(h)
            if i > 0:
                h = ComplexBatchNorm(name=f"dec_bn_{i}")(h, train)
                h = nn.leaky_relu(h, c.leak)
        return h


class FRCRN(nn.Module):
    """Two cascaded complex U-Nets estimating a complex ratio mask
    (modelscope frcrn.py forward: mask = tanh(unet1) + tanh(unet2(unet1))),
    applied to the complex spectrogram by complex multiplication."""

    cfg: FRCRNConfig = field(default_factory=FRCRNConfig)

    def _pad_f(self, re, im):
        # F = fft//2+1 = 321 -> pad the frequency axis up to a multiple of
        # 2^depth so the encoder strides divide evenly; pads are stripped
        # before masking
        depth = len(self.cfg.channels)
        f = re.shape[1]
        f_pad = -f % (2**depth)
        if f_pad:
            re = jnp.pad(re, ((0, 0), (0, f_pad), (0, 0)))
            im = jnp.pad(im, ((0, 0), (0, f_pad), (0, 0)))
        return re, im, f

    @nn.compact
    def __call__(self, wav: jnp.ndarray, train: bool = False):
        """(B, L) noisy 16 kHz waveform -> (B, L) denoised waveform.

        Returns (wav_hat, (mask_re, mask_im)) so training can regularize
        the mask directly."""
        c = self.cfg
        length = wav.shape[-1]
        re, im, f0 = self._pad_f(*frcrn_stft(wav, c.win_len, c.hop, c.fft_len))
        spec = jnp.stack([re, im], axis=-1)[:, :, :, None, :]  # (B,F,T,1,2)
        u1 = ComplexUNet(c, name="unet")(spec, train)
        m1 = jnp.tanh(u1)
        u2 = ComplexUNet(c, name="unet2")(u1, train)
        m2 = jnp.tanh(u2) + m1
        mr, mi = m2[:, :f0, :, 0, 0], m2[:, :f0, :, 0, 1]
        sr_, si_ = re[:, :f0], im[:, :f0]
        est_r = sr_ * mr - si_ * mi
        est_i = sr_ * mi + si_ * mr
        wav_hat = frcrn_istft(est_r, est_i, length, c.win_len, c.hop, c.fft_len)
        return wav_hat, (mr, mi)


# ---------------------------------------------------------------------------
# Losses (the paper trains on SI-SNR + complex mask MSE)
# ---------------------------------------------------------------------------


def si_snr(est: jnp.ndarray, ref: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Scale-invariant SNR in dB, per batch row."""
    ref = ref - ref.mean(-1, keepdims=True)
    est = est - est.mean(-1, keepdims=True)
    proj = (jnp.sum(est * ref, -1, keepdims=True) / (jnp.sum(ref * ref, -1, keepdims=True) + eps)) * ref
    noise = est - proj
    return 10.0 * jnp.log10((jnp.sum(proj**2, -1) + eps) / (jnp.sum(noise**2, -1) + eps))


def frcrn_loss(wav_hat: jnp.ndarray, clean: jnp.ndarray) -> jnp.ndarray:
    return -jnp.mean(si_snr(wav_hat, clean))


# ---------------------------------------------------------------------------
# Checkpoint import (modelscope pytorch_model.bin). Key layout follows the
# modelscope `FRCRN` module tree: unet{,2}.enc_*/dec_* complex convs with
# .real/.imag submodules and per-component batchnorms, fsmn re/im branch
# linears. Shapes are checked strictly; any unmatched or missing key is a
# hard error listing the offenders (weights are not downloadable in this
# build environment, so this path is validated against a synthetic state
# dict with the documented names/shapes — tests/test_frcrn.py).
# ---------------------------------------------------------------------------


def params_from_torch(state_dict: dict, cfg: FRCRNConfig = FRCRNConfig()) -> dict:
    model = FRCRN(cfg)
    b, l = 1, cfg.win_len * 4
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((b, l), jnp.float32))
    )

    used = set()

    def take(key: str, shape, transpose_conv=False, conv1d=False):
        for cand in (key, f"model.{key}"):
            if cand in state_dict:
                used.add(cand)
                a = np.asarray(state_dict[cand], np.float32)
                if conv1d:  # torch (C_out, 1, K) depthwise -> flax (K, 1, C_out)
                    a = a.transpose(2, 1, 0)
                elif a.ndim == 4:  # torch (C_out, C_in, kf, kt) -> flax (kf, kt, C_in, C_out)
                    a = a.transpose(2, 3, 1, 0)
                elif a.ndim == 2:  # torch (out, in) -> flax (in, out)
                    a = a.T
                if tuple(a.shape) != tuple(shape):
                    raise ValueError(f"{cand}: checkpoint shape {a.shape} != model shape {tuple(shape)}")
                return jnp.asarray(a)
        raise KeyError(f"missing checkpoint key: {key}")

    def walk(tree, prefix):
        out = {}
        for k, v in tree.items():
            path = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                out[k] = walk(v, path)
            else:
                # flax leaf names -> torch attribute names: kernel->weight,
                # BatchNorm scale->weight; module paths are shared
                torch_key = path.replace(".kernel", ".weight").replace(".scale", ".weight")
                out[k] = take(torch_key, v.shape, conv1d="_mem" in path)
        return out

    params = {"params": walk(variables["params"], "")}
    if "batch_stats" in variables:
        def walk_bn(tree, prefix):
            out = {}
            for k, v in tree.items():
                path = f"{prefix}.{k}" if prefix else k
                if isinstance(v, dict):
                    out[k] = walk_bn(v, path)
                else:
                    tk = path.replace(".mean", ".running_mean").replace(".var", ".running_var")
                    out[k] = take(tk, v.shape)
            return out

        params["batch_stats"] = walk_bn(variables["batch_stats"], "")
    unused = [k for k in state_dict if k not in used and k.split(".")[-1] != "num_batches_tracked"]
    if unused:
        raise ValueError(f"unmapped checkpoint keys ({len(unused)}): {unused[:8]}...")
    return params


def load_frcrn(ckpt_path: str, cfg: FRCRNConfig = FRCRNConfig()):
    """Load a modelscope FRCRN checkpoint (pytorch_model.bin)."""
    import torch

    sd = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items()}
    return FRCRN(cfg), params_from_torch(sd, cfg)
