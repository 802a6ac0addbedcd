"""Korean g2p: hangul -> compatibility-jamo phones.

Counterpart of text/korean.py (g2pk2 + jamo). Hangul decomposition is pure
unicode arithmetic; the v2 symbol table holds compatibility jamo (ㄱㄴㄷ…).
Core pronunciation rules (liaison of final consonants onto vowel-initial
syllables, ㅇ-onset dropping) are applied; the full g2pk2 rule set is used
when that package is importable.
"""

from __future__ import annotations

PUNCT = set(",.!?-…")

_CHO = ["ㄱ", "ㄲ", "ㄴ", "ㄷ", "ㄸ", "ㄹ", "ㅁ", "ㅂ", "ㅃ", "ㅅ", "ㅆ", "ㅇ", "ㅈ", "ㅉ", "ㅊ", "ㅋ", "ㅌ", "ㅍ", "ㅎ"]
_JUNG = ["ㅏ", "ㅐ", "ㅑ", "ㅒ", "ㅓ", "ㅔ", "ㅕ", "ㅖ", "ㅗ", "ㅘ", "ㅙ", "ㅚ", "ㅛ", "ㅜ", "ㅝ", "ㅞ", "ㅟ", "ㅠ", "ㅡ", "ㅢ", "ㅣ"]
_JONG = ["", "ㄱ", "ㄲ", "ㄳ", "ㄴ", "ㄵ", "ㄶ", "ㄷ", "ㄹ", "ㄺ", "ㄻ", "ㄼ", "ㄽ", "ㄾ", "ㄿ", "ㅀ", "ㅁ", "ㅂ", "ㅄ", "ㅅ", "ㅆ", "ㅇ", "ㅈ", "ㅊ", "ㅋ", "ㅌ", "ㅍ", "ㅎ"]

_PUNC_MAP = {"，": ",", "。": ".", "！": "!", "？": "?", "、": ","}


def decompose(ch: str) -> tuple[str, str, str] | None:
    o = ord(ch)
    if not (0xAC00 <= o <= 0xD7A3):
        return None
    idx = o - 0xAC00
    cho = _CHO[idx // 588]
    jung = _JUNG[(idx % 588) // 28]
    jong = _JONG[idx % 28]
    return cho, jung, jong


def compose(cho: str, jung: str, jong: str = "") -> str:
    return chr(0xAC00 + _CHO.index(cho) * 588 + _JUNG.index(jung) * 28 + _JONG.index(jong))


def hangul_to_jamo_phones(text: str) -> list[str]:
    """Decompose with basic liaison: a final consonant moves onto a
    following ㅇ-onset syllable (연음)."""
    sylls = [decompose(c) if decompose(c) else c for c in text]
    # liaison pass
    out_sylls = []
    for i, s in enumerate(sylls):
        if not isinstance(s, tuple):
            out_sylls.append(s)
            continue
        cho, jung, jong = s
        nxt = sylls[i + 1] if i + 1 < len(sylls) else None
        if jong and isinstance(nxt, tuple) and nxt[0] == "ㅇ" and jong in _CHO:
            sylls[i + 1] = (jong, nxt[1], nxt[2])
            jong = ""
        out_sylls.append((cho, jung, jong))
    phones: list[str] = []
    for s in out_sylls:
        if isinstance(s, tuple):
            cho, jung, jong = s
            if cho != "ㅇ":
                phones.append(cho)
            phones.append(jung)
            if jong:
                phones.append(jong)
        elif s in _PUNC_MAP:
            phones.append(_PUNC_MAP[s])
        elif s in PUNCT:
            phones.append(s)
        # drop spaces/latin
    return phones


def clean_text_ko(text: str) -> tuple[list[str], str]:
    try:
        from g2pk2 import G2p

        text = G2p()(text)
    except ImportError:
        pass
    return hangul_to_jamo_phones(text), text
