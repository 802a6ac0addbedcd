from gpt_sovits_tpu.dsp.mel import (
    hann_window,
    mel_filterbank,
    spectrogram,
    spec_to_mel,
    mel_spectrogram,
    norm_spec,
    denorm_spec,
)
from gpt_sovits_tpu.dsp.audio_io import load_wav, save_wav, resample

__all__ = [
    "hann_window",
    "mel_filterbank",
    "spectrogram",
    "spec_to_mel",
    "mel_spectrogram",
    "norm_spec",
    "denorm_spec",
    "load_wav",
    "save_wav",
    "resample",
]
