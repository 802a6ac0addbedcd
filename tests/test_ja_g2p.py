"""Japanese kanji g2p via the bundled reading lexicon (no pyopenjtalk).

The reference delegates all Japanese analysis to pyopenjtalk
(GPT_SoVITS/text/japanese.py); these tests cover the built-in fallback:
longest-match word readings (rendaku/sokuon/jukujikun), per-character
fallback, sino-Japanese numbers with counter sound changes, and particle
pronunciation (は/へ as わ/え at word boundaries).
"""

import pytest

from gpt_sovits_tpu.text.cleaner import clean_text
from gpt_sovits_tpu.text.japanese import (
    _read_counted,
    clean_text_ja,
    number_to_kana,
)


KANA_CASES = {
    # jukujikun / irregular words
    "今日": "きょう",
    "大人と子供": "おとなとこども",
    "一人と二人": "ひとりとふたり",
    # rendaku / sokuon compounds
    "学校で勉強します": "がっこうでべんきょうします",
    "切手と切符": "きってときっぷ",
    "出発は明日です": "しゅっぱつわあしたです",
    # particle は/へ after word boundaries
    "今日はいい天気ですね": "きょうわいいてんきですね",
    "東京へ行った": "とうきょうえいった",
    "こんにちは": "こんにちわ",
    # okurigana verb/adjective forms
    "新しい本を読んだ": "あたらしいほんをよんだ",
    "美しい声で歌った": "うつくしいこえでうたった",
    "間に合わなかった": "まにあわなかった",
    # kanji numerals
    "二十三歳": "にじゅうさんさい",
    "三百円": "さんびゃくえん",
}


@pytest.mark.parametrize("text,want", KANA_CASES.items(), ids=list(KANA_CASES))
def test_kanji_to_kana(text, want):
    _, norm = clean_text_ja(text)
    assert norm == want


NUMBER_CASES = {
    0: "ゼロ",
    11: "じゅういち",
    300: "さんびゃく",
    600: "ろっぴゃく",
    800: "はっぴゃく",
    3000: "さんぜん",
    8000: "はっせん",
    2024: "にせんにじゅうよん",
    10000: "いちまん",
    10**8: "いちおく",
    10**12: "いっちょう",
}


@pytest.mark.parametrize("n,want", NUMBER_CASES.items(), ids=[str(k) for k in NUMBER_CASES])
def test_number_to_kana(n, want):
    assert number_to_kana(n) == want


COUNTER_CASES = [
    (1, "本", "いっぽん"),
    (3, "本", "さんぼん"),
    (6, "本", "ろっぽん"),
    (10, "本", "じゅっぽん"),
    (21, "本", "にじゅういっぽん"),
    (30, "分", "さんじゅっぷん"),
    (3, "分", "さんぷん"),
    (1, "人", "ひとり"),
    (2, "人", "ふたり"),
    (11, "人", "じゅういちにん"),
    (4, "人", "よにん"),
    (1, "日", "ついたち"),
    (14, "日", "じゅうよっか"),
    (20, "日", "はつか"),
    (20, "歳", "はたち"),
    (4, "時", "よじ"),
    (7, "時", "しちじ"),
    (9, "時", "くじ"),
    (2, "時間", "にじかん"),
    (3, "か月", "さんかげつ"),
    (1, "匹", "いっぴき"),
    (3, "杯", "さんばい"),
]


@pytest.mark.parametrize("n,counter,want", COUNTER_CASES)
def test_counters(n, counter, want):
    assert _read_counted(n, counter) == want


def test_arabic_numbers_in_text():
    _, norm = clean_text_ja("7時30分に起きた。")
    assert norm == "しちじさんじゅっぷんにおきた。"
    _, norm = clean_text_ja("この本は1000円でした。")
    assert norm == "このほんわせんえんでした。"
    _, norm = clean_text_ja("2週間後に会いましょう。")
    assert norm == "にしゅうかんごにあいましょう。"


def test_unknown_kanji_degrade():
    # an out-of-lexicon kanji drops instead of raising; the rest survives
    phones, norm = clean_text_ja("鸞の声")
    assert "こえ" in norm


def test_cleaner_routes_ja_kanji():
    phones, word2ph, norm = clean_text("今日は良い天気です。", "ja", "v2")
    assert norm.startswith("きょうわ")
    assert "UNK" not in phones
    assert phones[-1] == "."


def test_phones_in_symbol_table():
    from gpt_sovits_tpu.text import get_symbols

    symbols = set(get_symbols("v2"))
    for text in KANA_CASES:
        phones, _, _ = clean_text(text, "ja", "v2")
        assert all(p in symbols for p in phones), (text, phones)


@pytest.mark.parametrize(
    "s,want",
    [
        ("一億二千万", 120_000_000),  # multiple big units must not compound
        ("三兆五億", 3_000_500_000_000),
        ("一億二千三百四十五万六千七百八十九", 123_456_789),
        ("千二百", 1200),
        ("二〇二四", 2024),
        ("万", 10_000),
    ],
)
def test_kanji_num_value_big_units(s, want):
    from gpt_sovits_tpu.text.japanese import _kanji_num_value

    assert _kanji_num_value(s) == want
