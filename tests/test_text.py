"""Text frontend tests: symbol tables, g2p, segmentation, cut methods."""

import pytest

from gpt_sovits_tpu.text import cleaned_text_to_sequence, get_symbols, symbol_to_id
from gpt_sovits_tpu.text.chinese import pinyin_to_phones, split_pinyin
from gpt_sovits_tpu.text.cleaner import clean_text
from gpt_sovits_tpu.text.english import g2p_word, normalize
from gpt_sovits_tpu.text.lang_segmenter import segment
from gpt_sovits_tpu.text.segmentation import get_method, split_big_text


def test_symbol_tables():
    assert len(get_symbols("v1")) == 322
    assert len(get_symbols("v2")) == 732
    table = symbol_to_id("v2")
    assert table["UNK"] >= 0 and table["AA1"] >= 0


def test_cleaned_text_to_sequence_unk():
    ids = cleaned_text_to_sequence(["AA1", "totally-bogus", "."], "v2")
    table = symbol_to_id("v2")
    assert ids[0] == table["AA1"]
    assert ids[1] == table["UNK"]
    assert ids[2] == table["."]


def test_english_normalize_numbers():
    assert "one hundred twenty three" in normalize("123 cats")
    assert "three point one four" in normalize("3.14")
    assert "five dollars" in normalize("$5")
    assert "mister" in normalize("Mr. Smith")


def test_english_g2p_lexicon_and_rules():
    assert g2p_word("hello") == ["HH", "AH0", "L", "OW1"]
    assert g2p_word("the") == ["DH", "AH0"]
    # rule-based: all outputs must be valid v2 symbols
    symbols = set(get_symbols("v2"))
    for w in ["quake", "shipping", "lantern", "voice", "jumble", "python"]:
        phones = g2p_word(w)
        assert phones, w
        assert all(p in symbols for p in phones), (w, phones)


def test_english_clean_text_all_valid():
    phones, word2ph, norm = clean_text("Hello world, 42 tests!", "en")
    symbols = set(get_symbols("v2"))
    assert all(p in symbols for p in phones)
    assert word2ph is None
    assert "forty two" in norm


def test_pinyin_split():
    assert split_pinyin("zhong1") == ("zh", "ong1")
    assert split_pinyin("an4") == ("", "an4")
    assert split_pinyin("xu2") == ("x", "v2")
    assert split_pinyin("liu2") == ("l", "iou2")
    assert split_pinyin("shui3") == ("sh", "uei3")
    assert split_pinyin("shi4") == ("sh", "ir4")
    assert split_pinyin("lün4") == ("l", "vn4")


def test_pinyin_to_phones_symbols_valid():
    phones, word2ph = pinyin_to_phones(["ni3", "hao3", ","])
    assert phones == ["n", "i3", "h", "ao3", ","]
    assert word2ph == [2, 2, 1]
    symbols = set(get_symbols("v2"))
    assert all(p in symbols for p in phones)


def test_clean_text_zh_minilexicon():
    phones, word2ph, norm = clean_text("你好。", "zh")
    symbols = set(get_symbols("v2"))
    assert all(p in symbols for p in phones)
    assert sum(word2ph) == len(phones)


def test_lang_segmentation():
    runs = segment("你好hello world今天")
    assert [r["lang"] for r in runs] == ["zh", "en", "zh"]
    assert runs[1]["text"].strip() == "hello world"
    assert segment("pure english text") == [{"lang": "en", "text": "pure english text"}]


@pytest.mark.parametrize("method", ["cut0", "cut1", "cut2", "cut3", "cut4", "cut5"])
def test_cut_methods(method):
    text = "第一句。第二句！第三句？Fourth sentence. Fifth one!"
    parts = get_method(method)(text)
    assert parts
    assert all(p.strip() for p in parts)
    # no content lost (ignoring delimiters)
    joined = "".join(parts)
    for ch in "第一句第二句第三句":
        assert ch in joined


def test_split_big_text():
    text = "短句。" * 400
    parts = split_big_text(text, max_len=510)
    assert all(len(p) <= 510 for p in parts)
    assert sum(len(p) for p in parts) == len(text)
