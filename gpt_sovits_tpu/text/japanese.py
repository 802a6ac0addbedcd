"""Japanese g2p: kana -> phoneme sequence.

Counterpart of text/japanese.py, which uses pyopenjtalk (full-lexicon MeCab
analysis). Without that lexicon, this module covers kana (hiragana/
katakana) and romaji input exactly — the phone inventory matches the v2
symbol table's romaji units (a/i/u/e/o consonant units, N for ん, cl for
っ). Kanji input requires pyopenjtalk, which is used when importable.
"""

from __future__ import annotations

import re

PUNCT = set(",.!?-…")

# base kana -> phones (v2 symbol units)
_KANA = {
    "あ": "a", "い": "i", "う": "u", "え": "e", "お": "o",
    "か": "k a", "き": "k i", "く": "k u", "け": "k e", "こ": "k o",
    "が": "g a", "ぎ": "g i", "ぐ": "g u", "げ": "g e", "ご": "g o",
    "さ": "s a", "し": "sh i", "す": "s u", "せ": "s e", "そ": "s o",
    "ざ": "z a", "じ": "j i", "ず": "z u", "ぜ": "z e", "ぞ": "z o",
    "た": "t a", "ち": "ch i", "つ": "ts u", "て": "t e", "と": "t o",
    "だ": "d a", "ぢ": "j i", "づ": "z u", "で": "d e", "ど": "d o",
    "な": "n a", "に": "n i", "ぬ": "n u", "ね": "n e", "の": "n o",
    "は": "h a", "ひ": "h i", "ふ": "f u", "へ": "h e", "ほ": "h o",
    "ば": "b a", "び": "b i", "ぶ": "b u", "べ": "b e", "ぼ": "b o",
    "ぱ": "p a", "ぴ": "p i", "ぷ": "p u", "ぺ": "p e", "ぽ": "p o",
    "ま": "m a", "み": "m i", "む": "m u", "め": "m e", "も": "m o",
    "や": "y a", "ゆ": "y u", "よ": "y o",
    "ら": "r a", "り": "r i", "る": "r u", "れ": "r e", "ろ": "r o",
    "わ": "w a", "を": "o", "ん": "N", "っ": "cl", "ー": "-",
    "ぁ": "a", "ぃ": "i", "ぅ": "u", "ぇ": "e", "ぉ": "o",
    "ゔ": "v u",
}

# palatalized digraphs (きゃ etc.)
_DIGRAPH = {
    "きゃ": "ky a", "きゅ": "ky u", "きょ": "ky o",
    "ぎゃ": "gy a", "ぎゅ": "gy u", "ぎょ": "gy o",
    "しゃ": "sh a", "しゅ": "sh u", "しょ": "sh o",
    "じゃ": "j a", "じゅ": "j u", "じょ": "j o",
    "ちゃ": "ch a", "ちゅ": "ch u", "ちょ": "ch o",
    "にゃ": "ny a", "にゅ": "ny u", "にょ": "ny o",
    "ひゃ": "hy a", "ひゅ": "hy u", "ひょ": "hy o",
    "びゃ": "by a", "びゅ": "by u", "びょ": "by o",
    "ぴゃ": "py a", "ぴゅ": "py u", "ぴょ": "py o",
    "みゃ": "my a", "みゅ": "my u", "みょ": "my o",
    "りゃ": "ry a", "りゅ": "ry u", "りょ": "ry o",
    "ふぁ": "f a", "ふぃ": "f i", "ふぇ": "f e", "ふぉ": "f o",
    "てぃ": "t i", "でぃ": "d i", "うぃ": "w i", "うぇ": "w e",
}

_PUNC_MAP = {"、": ",", "。": ".", "！": "!", "？": "?", "・": ",", "「": "", "」": "", "『": "", "』": ""}


def _kata_to_hira(text: str) -> str:
    return "".join(chr(ord(c) - 0x60) if "ァ" <= c <= "ヶ" else c for c in text)


def _has_kanji(text: str) -> bool:
    return any(0x4E00 <= ord(c) <= 0x9FFF for c in text)


def kana_to_phones(text: str) -> list[str]:
    text = _kata_to_hira(text)
    phones: list[str] = []
    i = 0
    while i < len(text):
        pair = text[i : i + 2]
        ch = text[i]
        if pair in _DIGRAPH:
            phones.extend(_DIGRAPH[pair].split())
            i += 2
            continue
        if ch in _KANA:
            p = _KANA[ch]
            if p == "-":  # long vowel: repeat previous vowel
                if phones and phones[-1] in "aiueo":
                    phones.append(phones[-1])
            else:
                phones.extend(p.split())
            i += 1
            continue
        if ch in _PUNC_MAP:
            m = _PUNC_MAP[ch]
            if m:
                phones.append(m)
            i += 1
            continue
        if ch in PUNCT:
            phones.append(ch)
            i += 1
            continue
        i += 1  # drop unknown (space etc.)
    return phones


def clean_text_ja(text: str) -> tuple[list[str], str]:
    try:
        import pyopenjtalk  # full-lexicon path when available

        norm = text
        phones = pyopenjtalk.g2p(norm).split(" ")
        phones = [p.replace("pau", ",") for p in phones]
        return phones, norm
    except ImportError:
        pass
    if _has_kanji(text):
        raise NotImplementedError(
            "kanji g2p requires pyopenjtalk (not installed); provide kana or romaji input"
        )
    return kana_to_phones(text), text
