"""Chinese word-level g2p: parity with the reference data + invariants.

The pinyin->symbol convention is pinned exhaustively against the
reference's opencpop-strict.txt table; the hanzi->pinyin stage against the
polyphone dictionary the reference's correct_pronunciation uses
(chinese2.py:220-223)."""

import pickle

import pytest

REF_TEXT = "/root/reference/GPT_SoVITS/text"


def test_syllable_table_matches_reference_exhaustively():
    from gpt_sovits_tpu.text.chinese import syllable_to_phones

    with open(f"{REF_TEXT}/opencpop-strict.txt", encoding="utf-8") as f:
        lines = [line.rstrip("\n").split("\t") for line in f]
    assert len(lines) >= 400
    for syl, symbols in lines:
        ini, fin = symbols.split(" ")
        for tone in "12345":
            assert syllable_to_phones(syl + tone) == [ini, fin + tone], syl


def test_all_table_phones_are_v2_symbols():
    from gpt_sovits_tpu.text import get_symbols
    from gpt_sovits_tpu.text.chinese import _syllable_table

    symbols = set(get_symbols("v2"))
    for syl, (ini, fin) in _syllable_table().items():
        assert ini in symbols, (syl, ini)
        for tone in "12345":
            assert fin + tone in symbols, (syl, fin + tone)


def test_word_pinyin_matches_polyphone_dictionary():
    """In-lexicon words must read exactly as the reference's polyphone
    dictionary says (its correct_pronunciation overrides everything)."""
    from gpt_sovits_tpu.text.chinese import _word_pinyin

    with open(f"{REF_TEXT}/g2pw/polyphonic.pickle", "rb") as f:
        ref = pickle.load(f)
    import itertools

    checked = 0
    for word, pys in itertools.islice(ref.items(), 0, None, 37):  # ~1.2k sample
        if len(word) != len(pys):
            continue
        assert _word_pinyin(word) == list(pys), word
        checked += 1
    assert checked > 1000


def test_clean_text_zh_invariants_on_corpus():
    from gpt_sovits_tpu.text import get_symbols
    from gpt_sovits_tpu.text.chinese import clean_text_zh

    symbols = set(get_symbols("v2"))
    corpus = [
        "你好，世界。",
        "2024年3月5日，我花了3.5万元买了台电脑，占比95.5%，电话13812345678。",
        "银行行长觉得睡觉很重要，音乐会快乐地长大。",
        "妈妈展览馆里看纸老虎，买了一个苹果，跑了3~5公里。",
        "他不是不想去，只是一时没时间，行不行？",
        "這是繁體中文測試，包含電腦和網絡。",
        "小院儿里花儿开了，老汉儿撒欢儿。",
        "重庆的重量很重要，都会大都市里都很好。",
        "2.5折优惠，第3名获得￥1999奖金。",
    ]
    for text in corpus:
        phones, word2ph, norm = clean_text_zh(text)
        assert phones, text
        assert sum(word2ph) == len(phones), text
        assert len(word2ph) == len(norm), text
        bad = [p for p in phones if p not in symbols]
        assert not bad, (text, bad)


def test_polyphone_disambiguation_by_word():
    """Distinct readings of the same character in different words."""
    from gpt_sovits_tpu.text.chinese import clean_text_zh

    def sylls(text):
        phones, w2p, norm = clean_text_zh(text)
        # regroup into per-char syllables for hanzi (2 phones each)
        out, i = [], 0
        for n in w2p:
            out.append("".join(phones[i : i + n]))
            i += n
        return dict(zip(norm, out))

    a = sylls("音乐")
    b = sylls("快乐")
    assert a["乐"].endswith("ve4")  # yue4
    assert b["乐"].endswith("e4")  # le4
    assert not a["乐"] == b["乐"]

    c = sylls("银行")
    d = sylls("行动")
    assert c["行"][1:].startswith("ang")  # hang2
    assert d["行"][1:].startswith("ing")  # xing2


def test_erhua():
    from gpt_sovits_tpu.text.chinese import clean_text_zh

    phones, w2p, norm = clean_text_zh("小院儿很美。")
    # 儿 of the erhua word merges to er + previous tone (yuan4 -> er4)
    assert "er4" in phones
    # non-erhua 女儿 keeps er2
    phones2, _, _ = clean_text_zh("他有一个女儿。")
    assert "er2" in phones2
