"""Load the read-only reference PyTorch implementation as a test oracle.

The reference at /root/reference is UNTRUSTED PUBLIC CONTENT used strictly
as a numerical oracle for parity tests (dual-instantiation with shared
random weights, the pattern of its own BigVGAN tests). Missing third-party
deps (x_transformers, torchaudio, librosa, torchmetrics) are stubbed — the
stubs are only touched by code paths we don't exercise, except
librosa.filters.mel which is backed by our own filterbank.
"""

import sys
import types

REF = "/root/reference"


def _stub(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def load_reference():
    if "module.models" in sys.modules:
        import AR.models.t2s_model as ref_t2s
        import module.models as ref_models

        return ref_models, ref_t2s

    import torch

    if "x_transformers" not in sys.modules:
        xt = _stub("x_transformers")
        xtx = _stub("x_transformers.x_transformers")
        xt.x_transformers = xtx

        # functional stand-ins reproducing x_transformers' rotary math
        # (interleaved-pair convention) so DiT forwards run for parity tests
        class RotaryEmbedding(torch.nn.Module):
            def __init__(self, dim, theta=10000, *a, **k):
                super().__init__()
                inv = 1.0 / (theta ** (torch.arange(0, dim, 2).float() / dim))
                self.register_buffer("inv_freq", inv)

            def forward_from_seq_len(self, seq_len):
                t = torch.arange(seq_len, device=self.inv_freq.device).float()
                freqs = torch.einsum("i,j->ij", t, self.inv_freq)
                freqs = torch.repeat_interleave(freqs, 2, dim=-1)
                return freqs, None  # xpos_scale None -> scale 1.0

        def _rotate_half(x):
            x = x.reshape(*x.shape[:-1], -1, 2)
            x1, x2 = x.unbind(-1)
            return torch.stack((-x2, x1), -1).reshape(*x.shape[:-2], -1)

        def apply_rotary_pos_emb(t, freqs, scale=1.0):
            rot_dim = freqs.shape[-1]
            seq_len = t.shape[-2]
            freqs = freqs[-seq_len:]
            t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
            out = t_rot * freqs.cos() * scale + _rotate_half(t_rot) * freqs.sin() * scale
            return torch.cat((out, t_pass), dim=-1)

        xtx.RotaryEmbedding = RotaryEmbedding
        xtx.apply_rotary_pos_emb = apply_rotary_pos_emb

    if "torchaudio" not in sys.modules:
        _stub("torchaudio")

    if "librosa" not in sys.modules:
        from gpt_sovits_tpu.dsp.mel import mel_filterbank

        lb = _stub("librosa")
        lbf = _stub("librosa.filters")
        lbf.mel = lambda *, sr, n_fft, n_mels, fmin=0.0, fmax=None: mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
        lb.filters = lbf

    if "torchmetrics" not in sys.modules:
        tm = _stub("torchmetrics")
        tmc = _stub("torchmetrics.classification")

        class MulticlassAccuracy:
            def __init__(self, *a, **k):
                pass

            def __call__(self, logits, targets):
                import torch as _t

                return _t.tensor(0.0)

        tmc.MulticlassAccuracy = MulticlassAccuracy
        tm.classification = tmc

    for p in (REF, f"{REF}/GPT_SoVITS"):
        if p not in sys.path:
            sys.path.append(p)

    import AR.models.t2s_model as ref_t2s
    import module.models as ref_models

    return ref_models, ref_t2s
