"""MDX-Net vocal/de-reverb separation over the built-in ONNX executor.

Counterpart of tools/uvr5/mdxnet.py (`ConvTDFNetTrim`, `Predictor`,
`MDXNetDereverb`): the network itself ships only as an ONNX graph
(uvr5_weights/onnx_dereverb_By_FoxJoy/vocals.onnx), which the reference
runs through onnxruntime.  Here the graph is parsed and executed with
utils/onnx_lite.py (jax.numpy ops, jit-wrapped per fixed chunk shape) so
the same file runs on TPU with no onnxruntime dependency.

The STFT framing is the ConvTDF convention (mdxnet.py:37-59): stereo is
folded into 4 real channels (2 channels × re/im), frequency cropped to
dim_f, fixed dim_t frames per window; chunked demix with `margin`
overlap and optional noise-cancelling double inference (run on +x and -x,
average) exactly as mdxnet.py:146-152.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from gpt_sovits_tpu.dsp.stft import istft_center, stft_center
from gpt_sovits_tpu.utils.onnx_lite import OnnxModel


@dataclass(frozen=True)
class MDXConfig:
    dim_t_log2: int = 9  # dim_t = 2**9 = 512 frames
    dim_f: int = 3072
    n_fft: int = 6144
    hop: int = 1024
    chunks: int = 15  # seconds per demix segment
    margin: int = 44100
    denoise: bool = True
    sr: int = 44100

    @property
    def dim_t(self) -> int:
        return 2**self.dim_t_log2

    @property
    def n_bins(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def chunk_size(self) -> int:
        return self.hop * (self.dim_t - 1)

    @property
    def trim(self) -> int:
        return self.n_fft // 2


def spec_of(x: jnp.ndarray, cfg: MDXConfig) -> jnp.ndarray:
    """(B, 2, chunk_size) -> (B, 4, dim_f, dim_t). mdxnet.py:37."""
    B = x.shape[0]
    z = stft_center(x.reshape(B * 2, cfg.chunk_size), cfg.n_fft, cfg.hop)  # (B*2, F, T)
    z = z[..., : cfg.dim_t]
    out = jnp.stack([jnp.real(z), jnp.imag(z)], axis=1)  # (B*2, 2, F, T)
    out = out.reshape(B, 4, cfg.n_bins, cfg.dim_t)
    return out[:, :, : cfg.dim_f]


def wave_of(spec: jnp.ndarray, cfg: MDXConfig) -> jnp.ndarray:
    """(B, 4, dim_f, dim_t) -> (B, 2, chunk_size). mdxnet.py:50."""
    B = spec.shape[0]
    spec = jnp.pad(spec, ((0, 0), (0, 0), (0, cfg.n_bins - cfg.dim_f), (0, 0)))
    spec = spec.reshape(B * 2, 2, cfg.n_bins, cfg.dim_t)
    z = spec[:, 0] + 1j * spec[:, 1]
    wav = istft_center(z.astype(jnp.complex64), cfg.n_fft, cfg.hop)  # (B*2, L)
    return wav.reshape(B, 2, -1)


class MDXSeparator:
    def __init__(self, onnx_path: str, cfg: MDXConfig = MDXConfig()):
        self.cfg = cfg
        self.model = OnnxModel.from_file(onnx_path)
        (self.in_name,) = self.model.input_names or ["input"]

        def fwd(x):  # (B, 2, chunk) -> (B, 2, chunk) target stem
            spek = spec_of(x, cfg)
            if cfg.denoise:
                pred = -self.model.run({self.in_name: -spek})[0] * 0.5
                pred = pred + self.model.run({self.in_name: spek})[0] * 0.5
            else:
                pred = self.model.run({self.in_name: spek})[0]
            return wave_of(pred, cfg)

        self._fwd = jax.jit(fwd)

    def demix_segment(self, cmix: np.ndarray) -> np.ndarray:
        """(2, n) -> (2, n) target stem for one margin-padded segment."""
        cfg = self.cfg
        n_sample = cmix.shape[1]
        trim = cfg.trim
        gen_size = cfg.chunk_size - 2 * trim
        pad = gen_size - n_sample % gen_size
        mix_p = np.concatenate(
            [np.zeros((2, trim), np.float32), cmix.astype(np.float32), np.zeros((2, pad), np.float32), np.zeros((2, trim), np.float32)],
            axis=1,
        )
        waves = []
        i = 0
        while i < n_sample + pad:
            waves.append(mix_p[:, i : i + cfg.chunk_size])
            i += gen_size
        batch = jnp.asarray(np.stack(waves))  # (n_win, 2, chunk)
        tar = np.asarray(self._fwd(batch))
        tar = tar[:, :, trim:-trim].transpose(1, 0, 2).reshape(2, -1)
        return tar[:, :-pad]

    def demix(self, mix: np.ndarray) -> np.ndarray:
        """(2, L) -> (2, L) target stem; mdxnet.py:92 margin chunking."""
        cfg = self.cfg
        samples = mix.shape[-1]
        margin = min(cfg.margin, cfg.chunks * cfg.sr) or cfg.sr
        chunk = cfg.chunks * cfg.sr
        if cfg.chunks == 0 or samples < chunk:
            chunk = samples
        segments = []
        locs = []
        skip = 0
        while skip < samples:
            s_margin = 0 if skip == 0 else margin
            end = min(skip + chunk + margin, samples)
            start = skip - s_margin
            segments.append(mix[:, start:end])
            locs.append((skip, s_margin, end == samples))
            if end == samples:
                break
            skip += chunk
        outs = []
        for seg, (skip_pos, s_margin, is_last) in zip(segments, locs):
            tar = self.demix_segment(seg)
            start = 0 if skip_pos == 0 else margin
            end = None if is_last or margin == 0 else -margin
            outs.append(tar[:, start:end])
        return np.concatenate(outs, axis=-1)[:, :samples]


def separate(
    wav: np.ndarray, sr: int, onnx_path: str, *, cfg: MDXConfig = MDXConfig()
) -> tuple[np.ndarray, np.ndarray]:
    """(L,) or (S, L) -> (main, separated-out stem) at the input rate.

    For the FoxJoy de-reverb model the network isolates the reverb tail:
    main = mix - pred (saved as 'main_vocal' by the reference,
    mdxnet.py:173-176), other = pred.
    """
    from gpt_sovits_tpu.dsp.audio_io import resample as rs

    mono_in = wav.ndim == 1
    x = wav[None] if mono_in else np.asarray(wav, np.float32)
    if x.shape[0] == 1:
        x = np.repeat(x, 2, axis=0)
    if sr != cfg.sr:
        x = np.stack([rs(c, sr, cfg.sr) for c in x])

    sep = MDXSeparator(onnx_path, cfg)
    opt = sep.demix(x)
    main = x - opt

    if sr != cfg.sr:
        main = np.stack([rs(c, cfg.sr, sr) for c in main])
        opt = np.stack([rs(c, cfg.sr, sr) for c in opt])

    def fit(a, n):
        return a[..., :n] if a.shape[-1] >= n else np.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, n - a.shape[-1])])

    n_in = wav.shape[-1]
    main, opt = fit(main, n_in), fit(opt, n_in)
    if mono_in:
        main, opt = main.mean(axis=0), opt.mean(axis=0)
    return main.astype(np.float32), opt.astype(np.float32)
