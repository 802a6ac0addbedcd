"""Pretrained model downloader.

Counterpart of GPT_SoVITS/download.py + install.sh model fetching: pulls
the reference's published checkpoints from Hugging Face so they can be
loaded through utils/checkpoint_compat. Pure stdlib; requires network
egress (disabled in some environments — all loaders also accept local
paths).
"""

from __future__ import annotations

import os
import urllib.request

HF_BASE = "https://huggingface.co/lj1995/GPT-SoVITS/resolve/main"

PRETRAINED = {
    "s1": "s1v3.ckpt",
    "s1_v1": "s1bert25hz-2kh-longer-epoch=68e-step=50232.ckpt",
    "s1_v2": "gsv-v2final-pretrained/s1bert25hz-5kh-longer-epoch=12-step=369668.ckpt",
    "s2g_v1": "s2G488k.pth",
    "s2d_v1": "s2D488k.pth",
    "s2g_v2": "gsv-v2final-pretrained/s2G2333k.pth",
    "s2d_v2": "gsv-v2final-pretrained/s2D2333k.pth",
    "s2d_v2pro": "v2Pro/s2Dv2Pro.pth",
    "s2d_v2proplus": "v2Pro/s2Dv2ProPlus.pth",
    "s2g_v2pro": "v2Pro/s2Gv2Pro.pth",
    "s2g_v2proplus": "v2Pro/s2Gv2ProPlus.pth",
    "s2g_v3": "s2Gv3.pth",
    "s2g_v4": "gsv-v4-pretrained/s2Gv4.pth",
    "vocoder_v4": "gsv-v4-pretrained/vocoder.pth",
    "hubert": "chinese-hubert-base/pytorch_model.bin",
    "hubert_config": "chinese-hubert-base/config.json",
    "bert": "chinese-roberta-wwm-ext-large/pytorch_model.bin",
    "bert_config": "chinese-roberta-wwm-ext-large/config.json",
    "bert_tokenizer": "chinese-roberta-wwm-ext-large/tokenizer.json",
    "sv": "sv/pretrained_eres2netv2w24s4ep4.ckpt",
}

BIGVGAN_BASE = "https://huggingface.co/nvidia/bigvgan_v2_24khz_100band_256x/resolve/main"


def download(name: str, dest_dir: str, *, progress: bool = True) -> str:
    """Download one named asset (see PRETRAINED) into dest_dir."""
    rel = PRETRAINED[name]
    url = f"{HF_BASE}/{rel}"
    dest = os.path.join(dest_dir, rel)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    if os.path.exists(dest):
        return dest

    def _hook(blocks, bs, total):
        if progress and total > 0 and blocks % 256 == 0:
            print(f"\r{name}: {blocks * bs / total:.0%}", end="", flush=True)

    urllib.request.urlretrieve(url, dest, reporthook=_hook)
    if progress:
        print(f"\r{name}: done -> {dest}")
    return dest


def download_all(dest_dir: str, names=None) -> dict[str, str]:
    out = {}
    for name in names or PRETRAINED:
        out[name] = download(name, dest_dir)
    return out
