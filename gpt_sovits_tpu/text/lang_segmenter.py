"""Mixed-language segmentation.

Counterpart of reference text/LangSegmenter/langsegmenter.py:77
(fast_langdetect + split-lang). Those model files aren't available here, so
segmentation is unicode-range driven: CJK Unified -> zh, kana -> ja,
hangul -> ko, latin -> en. Digits/whitespace/punctuation attach to the
current run, matching the reference's per-char CJK merging behavior.
"""

from __future__ import annotations



def _char_lang(ch: str) -> str | None:
    o = ord(ch)
    if 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF or 0xF900 <= o <= 0xFAFF:
        return "zh"
    if 0x3040 <= o <= 0x30FF or 0x31F0 <= o <= 0x31FF:
        return "ja"
    if 0xAC00 <= o <= 0xD7AF or 0x1100 <= o <= 0x11FF or 0x3130 <= o <= 0x318F:
        return "ko"
    if ch.isascii() and ch.isalpha():
        return "en"
    return None  # neutral: digits, punctuation, space


def segment(text: str, default_lang: str = "zh") -> list[dict]:
    """-> [{"lang": ..., "text": ...}], contiguous same-language runs."""
    runs: list[dict] = []
    cur_lang: str | None = None
    cur: list[str] = []
    pending_neutral: list[str] = []
    for ch in text:
        lang = _char_lang(ch)
        if lang is None:
            (cur if cur_lang is not None else pending_neutral).append(ch)
            continue
        if lang == cur_lang:
            cur.extend(pending_neutral)
            pending_neutral = []
            cur.append(ch)
        else:
            if cur_lang is not None and cur:
                runs.append({"lang": cur_lang, "text": "".join(cur)})
            cur = pending_neutral + [ch]
            pending_neutral = []
            cur_lang = lang
    if cur_lang is not None and cur:
        runs.append({"lang": cur_lang, "text": "".join(cur)})
    elif pending_neutral:
        runs.append({"lang": default_lang, "text": "".join(pending_neutral)})
    return [r for r in runs if r["text"].strip()]
