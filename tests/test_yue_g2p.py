"""Cantonese g2p via the bundled jyutping lexicon (no ToJyutping).

The reference's cantonese.py needs the external ToJyutping package; these
tests cover the built-in fallback: longest-match word segmentation with
polyphone entries, char readings, traditional/simplified key coverage, and
the full clean_text path producing v2-symbol phones.
"""

import pytest

from gpt_sovits_tpu.text.cantonese import clean_text_yue, get_jyutping
from gpt_sovits_tpu.text.cleaner import clean_text


JYUTPING_CASES = {
    # Cantonese-specific function words
    "我哋": ["ngo5 dei6"],
    "唔該": ["m4 goi1"],
    "佢喺度": ["keoi5", "hai2", "dou6"],
    # polyphones resolved by word entries
    "銀行": ["ngan4 hong4"],
    "行路": ["haang4 lou6"],
    "音樂": ["jam1 ngok6"],
    "快樂": ["faai3 lok6"],
    "瞓覺": ["fan3 gaau3"],
    "覺得": ["gok3 dak1"],
    # changed tones
    "電話": ["din6 waa2"],
    "而家": ["ji4 gaa1"],
}


@pytest.mark.parametrize("text,want", JYUTPING_CASES.items(), ids=list(JYUTPING_CASES))
def test_builtin_jyutping_words(text, want):
    # word entries may land split or merged depending on segmentation;
    # compare the flattened syllable stream
    got = " ".join(get_jyutping(text)).split()
    assert got == " ".join(want).split(), (text, got)


def test_traditional_and_simplified_keys():
    trad = " ".join(get_jyutping("廣東話"))
    simp = " ".join(get_jyutping("广东话"))
    assert trad == simp == "gwong2 dung1 waa2"


def test_clean_text_yue_full_path():
    phones, word2ph, norm = clean_text_yue("我哋今日去飲茶。")
    assert phones[0] == "Yng" and phones[1] == "Yo5"
    assert phones[-1] == "."
    assert sum(word2ph) == len(phones)


def test_cleaner_routes_yue():
    from gpt_sovits_tpu.text import get_symbols

    phones, word2ph, norm = clean_text("你識唔識講廣東話？", "yue", "v2")
    symbols = set(get_symbols("v2"))
    assert all(p in symbols for p in phones), phones
    assert "UNK" not in phones


def test_numbers_via_zh_tn():
    # zh TN converts digits to hanzi numerals before jyutping lookup
    phones, word2ph, norm = clean_text_yue("我有3個朋友。")
    assert "三" in norm or "saam1" in " ".join(get_jyutping(norm))
    flat = " ".join(get_jyutping(norm))
    assert "saam1" in flat and "go3" in flat


def test_unknown_hanzi_degrades():
    phones, word2ph, norm = clean_text_yue("鸞嘅聲。")
    # 鸞 is out-of-lexicon: dropped, the rest survives
    assert "Yg" in phones and phones[-1] == "."
