"""Mixed-language mode semantics.

Two layers of coverage:

1. Golden parity of `lang_segmenter.getTexts` against the reference's
   LIVE `LangSegmenter.getTexts` post-processing
   (text/LangSegmenter/langsegmenter.py:90-213). The reference's
   first-stage model splitter (split_lang + fast_langdetect) is not
   installed, so both sides are driven from the same injected
   deterministic splitter — the golden therefore covers everything the
   reference does *after* the model: full-English promotion,
   default-lang coercion, digit-run neighbor rules, unknown-language
   ("x") filtering, and run merging.

2. Mode routing per reference get_phones_and_bert
   (TTS_infer_pack/TextPreprocessor.py:122-170): named CJK modes mean
   "mixed with English", all_* modes still peel latin, en routes whole
   text to English g2p — including the end-to-end phone sequence through
   the pipeline's _g2p_segment.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

from gpt_sovits_tpu.text.cleaner import clean_text
from gpt_sovits_tpu.text import cleaned_text_to_sequence
from gpt_sovits_tpu.text.lang_segmenter import base_split, getTexts, runs_for_language

REF_LS = "/root/reference/GPT_SoVITS/text/LangSegmenter/langsegmenter.py"

# shared mutable holder so the stubbed split_lang.LangSplitter delegates to
# whatever splitter the current test injects
_SPLITTER = {"fn": base_split}


def _load_ref_langsegmenter():
    if "ref_langsegmenter" in sys.modules:
        return sys.modules["ref_langsegmenter"]

    if "fast_langdetect" not in sys.modules:
        fl = types.ModuleType("fast_langdetect")
        fl_infer = types.ModuleType("fast_langdetect.infer")

        class LangDetectConfig:
            def __init__(self, *a, **k):
                pass

        class LangDetector:
            def __init__(self, *a, **k):
                pass

        fl_infer.LangDetectConfig = LangDetectConfig
        fl_infer.LangDetector = LangDetector
        fl_infer._default_detector = None
        fl.infer = fl_infer
        sys.modules["fast_langdetect"] = fl
        sys.modules["fast_langdetect.infer"] = fl_infer

    if "split_lang" not in sys.modules:
        sl = types.ModuleType("split_lang")

        class _Item:
            def __init__(self, lang, text):
                self.lang = lang
                self.text = text

        class LangSplitter:
            def __init__(self, lang_map=None):
                self.merge_across_digit = True

            def split_by_lang(self, text):
                return [_Item(r["lang"], r["text"]) for r in _SPLITTER["fn"](text)]

        sl.LangSplitter = LangSplitter
        sys.modules["split_lang"] = sl

    spec = importlib.util.spec_from_file_location("ref_langsegmenter", REF_LS)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_langsegmenter"] = mod
    spec.loader.exec_module(mod)
    return mod


CORPUS = [
    "我在用iPhone和MacBook",
    "当时ThinkPad T60刚刚发布，一同推出的还有一款名为Advanced Dock的扩展坞配件。",
    "价格是100美元，挺贵的",
    "100美元",
    "他说：hello world！然后走了",
    "GPT-4 is great, 对吧?",
    "ねえ、知ってる？最近、僕は天文学を勉強してるんだ。",
    "MyGO?,你也喜欢まいご吗？",
    "안녕하세요 hello 세계",
    "2024年1月1日，我们出发。",
    "Pi is 3.14159, 对不对？",
    "全是中文的句子没有任何外语。",
    "pure english text only.",
    "12345",
    "混合mixed混合123mixed456",
    "日本語テキストとEnglish wordsの混在。",
]


@pytest.mark.parametrize("default_lang", ["", "zh", "ja", "ko"])
def test_getTexts_golden_vs_reference(default_lang):
    ref = _load_ref_langsegmenter()
    _SPLITTER["fn"] = base_split
    for text in CORPUS:
        got = getTexts(text, default_lang)
        want = ref.LangSegmenter.getTexts(text, default_lang)
        assert got == want, f"{text!r} default={default_lang!r}:\n mine={got}\n ref ={want}"


def test_getTexts_golden_x_and_digit_paths():
    """Exercise the 'x'-filter (langsegmenter.py:199-211) and digit neighbor
    rules (:168-196) with synthetic splitter outputs the unicode splitter
    never produces."""
    ref = _load_ref_langsegmenter()

    cases = [
        [{"lang": "x", "text": "流"}, {"lang": "zh", "text": "你好"}],
        [{"lang": "zh", "text": "你好"}, {"lang": "x", "text": "流"}],
        [{"lang": "x", "text": "→→"}],
        [{"lang": "x", "text": "流"}],
        [{"lang": "digit", "text": "42"}],
        [{"lang": "zh", "text": "你好，"}, {"lang": "digit", "text": "42"}, {"lang": "en", "text": "dollars"}],
        [{"lang": "zh", "text": "你好"}, {"lang": "digit", "text": "42"}, {"lang": "en", "text": ", ok"}],
        [{"lang": "zh", "text": "很长的一个中文前缀"}, {"lang": "digit", "text": "42"}, {"lang": "en", "text": "ok"}],
        [{"lang": "digit", "text": "42"}, {"lang": "en", "text": "dollars"}],
        [{"lang": "zh", "text": "总共"}, {"lang": "digit", "text": "42."}],
    ]
    for runs in cases:
        def fake_split(text, _runs=runs):
            return [dict(r) for r in _runs]

        _SPLITTER["fn"] = fake_split
        try:
            for d in ("", "zh"):
                got = getTexts("x", d, _split=fake_split)
                want = ref.LangSegmenter.getTexts("x", d)
                assert got == want, f"runs={runs} default={d!r}:\n mine={got}\n ref ={want}"
        finally:
            _SPLITTER["fn"] = base_split


# ---------------------------------------------------------------------------
# mode routing (TextPreprocessor.py:122-170)
# ---------------------------------------------------------------------------


def test_named_zh_mode_peels_english():
    runs = runs_for_language("我在用iPhone和MacBook", "zh")
    assert [r["lang"] for r in runs] == ["zh", "en", "zh", "en"]
    assert runs[1]["text"] == "iPhone" and runs[3]["text"] == "MacBook"


def test_named_mode_merges_adjacent_classes():
    # ja-kana inside text_lang=zh: detected non-en runs merge and take the
    # declared language (reference else-branch, TextPreprocessor.py:158-169)
    runs = runs_for_language("你好すしhello", "zh")
    assert [r["lang"] for r in runs] == ["zh", "en"]
    assert runs[0]["text"] == "你好すし"


def test_named_ja_ko_yue_modes():
    for lang in ("ja", "ko", "yue"):
        runs = runs_for_language("文本text文本", lang)
        assert [r["lang"] for r in runs] == [lang, "en", lang]


def test_all_modes_still_peel_latin():
    runs = runs_for_language("我在用iPhone工作", "all_zh")
    assert [r["lang"] for r in runs] == ["zh", "en", "zh"]
    runs = runs_for_language("知ってるiPhoneです", "all_ja")
    assert [r["lang"] for r in runs] == ["ja", "en", "ja"]
    runs = runs_for_language("안녕iPhone세계", "all_ko")
    assert [r["lang"] for r in runs] == ["ko", "en", "ko"]


def test_all_yue_and_auto_yue_map_zh_to_yue():
    runs = runs_for_language("我在用iPhone工作", "all_yue")
    assert [r["lang"] for r in runs] == ["yue", "en", "yue"]
    runs = runs_for_language("我在用iPhone工作", "auto_yue")
    assert "yue" in [r["lang"] for r in runs]
    assert "zh" not in [r["lang"] for r in runs]


def test_en_mode_whole_text():
    assert runs_for_language("Hello 世界 world", "en") == [
        {"lang": "en", "text": "Hello 世界 world"}
    ]


def test_auto_mode_kanji_with_kana_is_japanese():
    # a kanji run inside kana context must be g2p'd as Japanese in auto mode
    runs = runs_for_language("東京タワーに行きました。", "auto")
    assert [r["lang"] for r in runs] == ["ja"]


def test_all_zh_forces_kana_to_zh():
    # with default set, every non-latin run is coerced to the default —
    # reference getTexts(text, "zh") behavior (langsegmenter.py:116-119)
    runs = runs_for_language("你好すし世界", "all_zh")
    assert [r["lang"] for r in runs] == ["zh"]


# ---------------------------------------------------------------------------
# end-to-end phones through the pipeline's _g2p_segment
# ---------------------------------------------------------------------------


def _bare_pipeline():
    from gpt_sovits_tpu.infer.pipeline import TTSPipeline

    p = TTSPipeline.__new__(TTSPipeline)
    p.version = "v2"
    p.bert = None
    p.bert_tokenizer = None
    return p


def _expected_phones(parts):
    ids = []
    for text, lang in parts:
        phones, _, _ = clean_text(text, lang, "v2")
        ids.extend(cleaned_text_to_sequence(phones, "v2"))
    return ids


def test_g2p_segment_zh_mode_routes_english_runs():
    p = _bare_pipeline()
    phones, bert, norm = p._g2p_segment("我在用iPhone和MacBook", "zh")
    want = _expected_phones(
        [("我在用", "zh"), ("iPhone", "en"), ("和", "zh"), ("MacBook", "en")]
    )
    assert phones == want
    assert bert.shape == (len(phones), 1024)
    # named-language whole-text routing (the round-3 behavior) must differ:
    # raw latin through the zh frontend produces a different sequence
    wrong, _, _ = clean_text("我在用iPhone和MacBook", "zh", "v2")
    assert phones != cleaned_text_to_sequence(wrong, "v2")


def test_g2p_segment_ja_mode_routes_english_runs():
    p = _bare_pipeline()
    phones, _, _ = p._g2p_segment("知ってるiPhoneです", "ja")
    want = _expected_phones([("知ってる", "ja"), ("iPhone", "en"), ("です", "ja")])
    assert phones == want


def test_g2p_segment_collapses_double_spaces():
    p = _bare_pipeline()
    a, _, _ = p._g2p_segment("hello    world", "en")
    b, _, _ = p._g2p_segment("hello world", "en")
    assert a == b


class TestKanjiOnlyLangID:
    """auto-mode han-run disambiguation via the bundled statistical table
    (scripts/build_langid_table.py) — kanji-only Japanese, which the
    reference catches with fast_langdetect, must route to ja g2p."""

    def test_kanji_only_japanese_routes_ja(self):
        from gpt_sovits_tpu.text.lang_segmenter import getTexts

        for text in ("東京駅前広場集合。", "今日天気。", "日本語能力試験。", "読書感想文提出。"):
            runs = getTexts(text)
            assert runs and all(r["lang"] == "ja" for r in runs), (text, runs)

    def test_chinese_stays_zh(self):
        from gpt_sovits_tpu.text.lang_segmenter import getTexts

        for text in ("我们今天去北京。", "中华人民共和国。", "请把这个文件发给我。", "明天的会议改到下午三点。"):
            runs = getTexts(text)
            assert runs and all(r["lang"] == "zh" for r in runs), (text, runs)

    def test_mixed_sentences_split_correctly(self):
        from gpt_sovits_tpu.text.lang_segmenter import getTexts

        # zh sentence then kanji-only ja sentence: per-sentence decisions
        runs = getTexts("我们今天去北京。東京駅前広場集合。")
        langs = [r["lang"] for r in runs]
        assert "zh" in langs and "ja" in langs, runs

    def test_named_modes_unaffected(self):
        from gpt_sovits_tpu.text.lang_segmenter import getTexts

        # all_zh-style coercion (default_lang) overrides the classifier
        runs = getTexts("東京駅前広場集合。", default_lang="zh")
        assert all(r["lang"] == "zh" for r in runs), runs
