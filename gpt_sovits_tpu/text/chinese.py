"""Chinese g2p: hanzi -> pinyin -> (initial, final+tone) phones.

Counterpart of reference text/chinese2.py (pypinyin + g2pW + tone sandhi).
The hanzi->pinyin step needs lexicon data: pypinyin is used when importable;
otherwise a built-in mini-lexicon covers frequent characters and anything
else raises a clear error. The pinyin->phoneme split (initial/final + tone
digit, v2 symbol convention) is self-contained and fully covered by tests.
"""

from __future__ import annotations

import re

PUNCT = set(",.!?-…")

_INITIALS = [
    "zh", "ch", "sh", "b", "p", "m", "f", "d", "t", "n", "l", "g", "k", "h",
    "j", "q", "x", "r", "z", "c", "s", "y", "w",
]

# pinyin finals as they appear in the v2 symbol table (tone appended 1-5)
_VALID_FINALS = {
    "a", "o", "e", "i", "u", "v", "ai", "ei", "ao", "ou", "an", "en", "ang",
    "eng", "er", "ia", "ie", "iao", "iou", "ian", "in", "iang", "ing",
    "iong", "ua", "uo", "uai", "uei", "uan", "uen", "uang", "ueng", "ong",
    "ve", "van", "vn", "ir", "E", "o2",
}

_PUNC_MAP = {
    "，": ",", "。": ".", "！": "!", "？": "?", "；": ".", "：": ",",
    "、": ",", "…": "…", "——": "-", "—": "-", "“": "", "”": "", "‘": "",
    "’": "", "（": "", "）": "", "《": "", "》": "", "【": "", "】": "",
    "·": ",", "～": "…", "~": "…",
}

_MINI_LEXICON = {
    "你": "ni3", "好": "hao3", "我": "wo3", "是": "shi4", "的": "de5",
    "不": "bu4", "了": "le5", "在": "zai4", "有": "you3", "人": "ren2",
    "这": "zhe4", "他": "ta1", "她": "ta1", "它": "ta1", "们": "men5",
    "中": "zhong1", "国": "guo2", "一": "yi1", "个": "ge4", "上": "shang4",
    "大": "da4", "为": "wei2", "来": "lai2", "时": "shi2", "和": "he2",
    "说": "shuo1", "地": "di4", "到": "dao4", "要": "yao4", "就": "jiu4",
    "出": "chu1", "会": "hui4", "可": "ke3", "也": "ye3", "对": "dui4",
    "生": "sheng1", "能": "neng2", "而": "er2", "子": "zi3", "那": "na4",
    "得": "de2", "于": "yu2", "着": "zhe5", "下": "xia4", "自": "zi4",
    "年": "nian2", "过": "guo4", "天": "tian1", "去": "qu4", "你们": "",
    "语": "yu3", "音": "yin1", "合": "he2", "成": "cheng2", "测": "ce4",
    "试": "shi4", "文": "wen2", "本": "ben3", "今": "jin1", "明": "ming2",
    "日": "ri4", "月": "yue4", "水": "shui3", "火": "huo3", "山": "shan1",
    "学": "xue2", "习": "xi2", "工": "gong1", "作": "zuo4", "家": "jia1",
    "电": "dian4", "话": "hua4", "声": "sheng1", "很": "hen3", "多": "duo1",
    "少": "shao3", "快": "kuai4", "慢": "man4", "高": "gao1", "兴": "xing4",
    "谢": "xie4", "再": "zai4", "见": "jian4", "请": "qing3", "问": "wen4",
    "什": "shen2", "么": "me5", "没": "mei2", "关": "guan1", "系": "xi4",
}


def split_pinyin(syllable: str) -> tuple[str, str]:
    """'zhong1' -> ('zh', 'ong1'); 'an4' -> ('', 'an4').

    Handles the standard orthographic adjustments: yu->v, ü->v, iu->iou,
    ui->uei, un->uen after initials; y/w re-spellings kept as y/w initials
    to match the v2 symbol convention (ref chinese2.py keeps y/w)."""
    m = re.fullmatch(r"([a-zvü]+)([1-5])?", syllable.lower())
    if not m:
        raise ValueError(f"bad pinyin syllable: {syllable!r}")
    body, tone = m.group(1), m.group(2) or "5"
    body = body.replace("ü", "v")
    initial = ""
    for ini in _INITIALS:
        if body.startswith(ini):
            initial = ini
            body = body[len(ini) :]
            break
    # orthographic restorations
    if initial in ("j", "q", "x", "y") and body.startswith("u"):
        body = "v" + body[1:]
    if initial and body == "iu":
        body = "iou"
    if initial and body == "ui":
        body = "uei"
    if initial and body == "un" and initial not in ("y",):
        body = "uen"
    if initial in ("zh", "ch", "sh", "r", "z", "c", "s") and body == "i":
        body = "ir"  # apical vowel, distinct symbol in v2 table
    if body not in _VALID_FINALS:
        # fall back: keep as-is (UNK mapping downstream)
        pass
    return initial, body + tone


def pinyin_to_phones(syllables: list[str]) -> tuple[list[str], list[int]]:
    """List of toned pinyin -> (phones, word2ph)."""
    phones: list[str] = []
    word2ph: list[int] = []
    for syl in syllables:
        if syl in PUNCT or syl in _PUNC_MAP.values():
            phones.append(syl if syl else ",")
            word2ph.append(1)
            continue
        ini, fin = split_pinyin(syl)
        if ini:
            phones.extend([ini, fin])
            word2ph.append(2)
        else:
            phones.append(fin)
            word2ph.append(1)
    return phones, word2ph


def _han_to_pinyin(text: str) -> list[str]:
    try:
        from pypinyin import Style, lazy_pinyin

        base = lazy_pinyin(text, style=Style.TONE3, neutral_tone_with_five=True)
        return _g2pw_overlay(text, base)
    except ImportError:
        out = []
        for ch in text:
            if ch in _MINI_LEXICON and _MINI_LEXICON[ch]:
                out.append(_MINI_LEXICON[ch])
            elif ch in _PUNC_MAP or ch in PUNCT:
                out.append(_PUNC_MAP.get(ch, ch))
            else:
                raise ImportError(
                    f"pypinyin not installed and {ch!r} not in the built-in mini-lexicon; "
                    "install pypinyin for full Chinese support"
                )
        return _g2pw_overlay(text, [o for o in out if o])


def _g2pw_overlay(text: str, base: list[str]) -> list[str]:
    """Polyphone fixes from g2pW when enabled (text/g2pw.py). Applies only
    when the base list is per-char aligned (pure-hanzi runs)."""
    from gpt_sovits_tpu.text import g2pw

    model = g2pw.active()
    if model is None or len(base) != len(text):
        return base
    return model.correct(text, base)


def normalize(text: str) -> str:
    from gpt_sovits_tpu.text.zh_norm import normalize_zh

    for k, v in _PUNC_MAP.items():
        text = text.replace(k, v)
    return normalize_zh(text)


def clean_text_zh(text: str) -> tuple[list[str], list[int], str]:
    from gpt_sovits_tpu.text.tone_sandhi import apply_tone_sandhi

    norm = normalize(text)
    sylls = _han_to_pinyin(norm)
    sylls = apply_tone_sandhi(norm, sylls)
    phones, word2ph = pinyin_to_phones(sylls)
    return phones, word2ph, norm
