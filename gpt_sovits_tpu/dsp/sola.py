"""SOLA crossfade stitching + chunked CFM driver utilities.

Counterpart of TTS.sola_algorithm (TTS_infer_pack/TTS.py:1611-1635): align
adjacent audio fragments by cross-correlation over an overlap window, then
hann-crossfade at the best lag. Used by the v3/v4 batched path where CFM
runs in chunks with a rolling reference window (TTS.py:1469-1487).
"""

from __future__ import annotations

import numpy as np


def sola_stitch(fragments: list[np.ndarray], overlap_len: int) -> np.ndarray:
    """Stitch 1-D float fragments with SOLA (ref TTS.py:1611)."""
    frags = [np.asarray(f, dtype=np.float32) for f in fragments]
    if len(frags) == 1:
        return frags[0]
    for i in range(len(frags) - 1):
        f1, f2 = frags[i], frags[i + 1]
        w1 = f1[-overlap_len:]
        w2 = f2[:overlap_len]
        # torch conv1d(w1, w2, padding=K//2) computes correlation of w1
        # against w2 at lags; argmax -> best alignment offset
        corr = np.correlate(
            np.pad(w1, (overlap_len // 2, overlap_len // 2)), w2, mode="valid"
        )[:-1]
        idx = int(np.argmax(corr))
        cut = overlap_len - idx  # idx < overlap_len, so cut >= 1
        frags[i] = f1[:-cut]
        f2_ = f2[idx:].copy()
        # periodic hann(2*cut): first half rises, second half falls
        n = np.arange(2 * cut)
        window = 0.5 - 0.5 * np.cos(2 * np.pi * n / (2 * cut))
        f2_[:cut] = window[:cut] * f2_[:cut] + window[cut:] * f1[-cut:]
        frags[i + 1] = f2_
    return np.concatenate(frags, axis=0)


def chunk_plan(total_len: int, t_ref: int, t_chunk: int) -> list[tuple[int, int]]:
    """(start, length) chunks of the conditioning features such that each
    CFM call sees [ref (t_ref) | todo (t_chunk - t_ref)] frames
    (ref TTS.py:1461-1487)."""
    chunk_len = t_chunk - t_ref
    out = []
    idx = 0
    while idx < total_len:
        ln = min(chunk_len, total_len - idx)
        out.append((idx, ln))
        idx += ln
    return out
