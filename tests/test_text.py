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


def test_zh_number_readings():
    from gpt_sovits_tpu.text.zh_norm import decimal_to_hanzi, digits_to_hanzi, num_to_hanzi

    assert num_to_hanzi(0) == "零"
    assert num_to_hanzi(10) == "十"
    assert num_to_hanzi(14) == "十四"
    assert num_to_hanzi(105) == "一百零五"
    assert num_to_hanzi(1234) == "一千二百三十四"
    assert num_to_hanzi(10005) == "一万零五"
    assert num_to_hanzi(120000000) == "一亿二千万"
    assert decimal_to_hanzi("3.14") == "三点一四"
    assert digits_to_hanzi("2024") == "二零二四"


def test_zh_normalize_patterns():
    from gpt_sovits_tpu.text.zh_norm import normalize_zh

    assert normalize_zh("25%") == "百分之二十五"
    assert normalize_zh("3/4") == "四分之三"
    assert "二零二四年三月五日" in normalize_zh("2024年3月5日")
    assert normalize_zh("3:30") == "三点半"  # minute 30 reads 半 (ref chronology.py:70-72)
    assert normalize_zh("13800138000") == "幺三八零零幺三八零零零"


def test_zh_tone_sandhi():
    from gpt_sovits_tpu.text.zh_norm import apply_tone_sandhi

    # 不 + tone4 -> bu2
    assert apply_tone_sandhi("不对", ["bu4", "dui4"]) == ["bu2", "dui4"]
    # 一 + tone4 -> yi2 ; 一 + tone1 -> yi4
    assert apply_tone_sandhi("一样", ["yi1", "yang4"]) == ["yi2", "yang4"]
    assert apply_tone_sandhi("一天", ["yi1", "tian1"]) == ["yi4", "tian1"]
    # 3-3 -> 2-3, chains resolve right-to-left
    assert apply_tone_sandhi("你好", ["ni3", "hao3"]) == ["ni2", "hao3"]
    assert apply_tone_sandhi("展览馆", ["zhan3", "lan3", "guan3"]) == ["zhan2", "lan2", "guan3"]


def test_en_ordinals_and_time():
    from gpt_sovits_tpu.text.english import normalize

    assert "first" in normalize("1st place")
    assert "twenty first" in normalize("21st")
    assert "third" in normalize("3rd")
    assert "three thirty" in normalize("at 3:30")
    assert "o'clock" in normalize("at 5:00")


def test_japanese_kana_g2p():
    from gpt_sovits_tpu.text.japanese import kana_to_phones

    # NB: particle-は -> "wa" needs lexical analysis (pyopenjtalk path);
    # the kana-table path reads it as written
    assert kana_to_phones("こんにちは") == ["k", "o", "N", "n", "i", "ch", "i", "h", "a"]
    assert kana_to_phones("きょう") == ["ky", "o", "u"]
    assert kana_to_phones("がっこう") == ["g", "a", "cl", "k", "o", "u"]
    assert kana_to_phones("コーヒー") == ["k", "o", "o", "h", "i", "i"]
    symbols = set(get_symbols("v2"))
    phones, _, _ = clean_text("すごいですね！", "ja")
    assert all(p in symbols for p in phones)


def test_korean_jamo_g2p():
    from gpt_sovits_tpu.text.korean import compose, decompose, hangul_to_jamo_phones

    assert decompose("한") == ("ㅎ", "ㅏ", "ㄴ")
    assert compose("ㅎ", "ㅏ", "ㄴ") == "한"
    # liaison: 음악 -> 으막 (final ㅁ moves onto the ㅇ-onset syllable)
    assert hangul_to_jamo_phones("음악") == ["ㅡ", "ㅁ", "ㅏ", "ㄱ"]
    symbols = set(get_symbols("v2"))
    phones, _, _ = clean_text("안녕하세요?", "ko")
    assert phones and all(p in symbols for p in phones), phones


# ---------------------------------------------------------------------------
# Cantonese (yue) — reference text/cantonese.py
# ---------------------------------------------------------------------------


def test_yue_jyutping_to_phones():
    from gpt_sovits_tpu.text.cantonese import jyutping_to_phones

    # 佢個鋤頭太短啦。 -> keoi5 go3 co4 tau4 taai3 dyun2 laa1 + "."
    syl = ["keoi5", "go3", "co4 tau4", "taai3", "dyun2", "laa1", "."]
    phones, word2ph = jyutping_to_phones(syl)
    assert phones == [
        "Yk", "Yeoi5", "Yg", "Yo3", "Yc", "Yo4", "Yt", "Yau4",
        "Yt", "Yaai3", "Yd", "Yyun2", "Yl", "Yaa1", ".",
    ]
    assert word2ph == [2, 2, 2, 2, 2, 2, 2, 1]

    # vowel-onset syllable: "aa" onset matches first in reference order
    phones2, w2 = jyutping_to_phones(["aap3"])
    assert phones2 == ["Yaa", "Yp3"] and w2 == [2]
    # nga special-case split
    phones3, _ = jyutping_to_phones(["ngaa4"])
    assert phones3 == ["Yng", "Yaa4"]


def test_yue_phones_in_v2_symbols():
    from gpt_sovits_tpu.text import get_symbols
    from gpt_sovits_tpu.text.cantonese import jyutping_to_phones

    syms = set(get_symbols("v2"))
    phones, _ = jyutping_to_phones(["keoi5", "go3", "co4", "tau4", "taai3", "dyun2", "laa1"])
    missing = [p for p in phones if p not in syms]
    assert not missing, missing


def test_yue_clean_text_with_stub_lexicon(tmp_path, monkeypatch):
    import importlib

    lex = tmp_path / "jyut.tsv"
    lex.write_text("佢\tkeoi5\n個\tgo3\n", encoding="utf-8")
    monkeypatch.setenv("GPT_SOVITS_JYUTPING_LEXICON", str(lex))
    import gpt_sovits_tpu.text.cantonese as yue

    yue._LEXICON = None  # reset cache
    from gpt_sovits_tpu.text.cleaner import clean_text

    phones, word2ph, norm = clean_text("佢個。", "yue")
    assert phones == ["Yk", "Yeoi5", "Yg", "Yo3", "."]
    assert word2ph == [2, 2, 1]
    yue._LEXICON = None


def test_tone_sandhi_word_level():
    """Word-level Mandarin sandhi (ref text/tone_sandhi.py rule families)."""
    from gpt_sovits_tpu.text.tone_sandhi import apply_tone_sandhi

    cases = [
        # third tone: pairwise, 2+1 vs 1+2 split, cross-word chain
        ("你好", ["ni3", "hao3"], ["ni2", "hao3"]),
        ("展览馆", ["zhan3", "lan3", "guan3"], ["zhan2", "lan2", "guan3"]),
        ("纸老虎", ["zhi3", "lao3", "hu3"], ["zhi3", "lao2", "hu3"]),
        # 不 sandhi
        ("不是", ["bu4", "shi4"], ["bu2", "shi4"]),
        ("不好", ["bu4", "hao3"], ["bu4", "hao3"]),
        # neutral 不 blocks the 3-3 chain
        ("好不好", ["hao3", "bu4", "hao3"], ["hao3", "bu5", "hao3"]),
        # 一 sandhi
        ("一定", ["yi1", "ding4"], ["yi2", "ding4"]),
        ("一天", ["yi1", "tian1"], ["yi4", "tian1"]),
        ("看一看", ["kan4", "yi1", "kan4"], ["kan4", "yi5", "kan4"]),
        ("第一", ["di4", "yi1"], ["di4", "yi1"]),
        ("一二三", ["yi1", "er4", "san1"], ["yi1", "er4", "san1"]),
        # neutral tone
        ("桌子", ["zhuo1", "zi3"], ["zhuo1", "zi5"]),
        ("我们", ["wo3", "men2"], ["wo3", "men5"]),
        ("石头", ["shi2", "tou2"], ["shi2", "tou5"]),
        ("喜欢", ["xi3", "huan1"], ["xi3", "huan5"]),
        ("妈妈", ["ma1", "ma1"], ["ma1", "ma5"]),
        ("原子", ["yuan2", "zi3"], ["yuan2", "zi3"]),  # must-NOT neutral
        ("三个", ["san1", "ge4"], ["san1", "ge5"]),
    ]
    for chars, sylls, want in cases:
        got = apply_tone_sandhi(chars, sylls)
        assert got == want, (chars, got, want)


def test_zh_norm_extended():
    from gpt_sovits_tpu.text.zh_norm import normalize_zh

    assert normalize_zh("现在是3:30:15") == "现在是三点半十五秒"
    assert normalize_zh("气温-3℃到25°C") == "气温零下三度到二十五度"
    assert normalize_zh("大概3~5天") == "大概三到五天"
    assert normalize_zh("电话138-1234-5678") == "电话幺三八减幺二三四减五六七八"
    assert normalize_zh("-42分") == "负四十二分"


def test_korean_phonological_rules():
    """g2pk2's main rule families, built in (VERDICT r1 #6): standard
    textbook examples per family."""
    from gpt_sovits_tpu.text.korean import pronounce

    cases = {
        "국물": "궁물", "먹는": "멍는", "앞문": "암문",   # nasalization
        "심리": "심니", "협력": "혐녁",                   # ㄹ nasalization
        "신라": "실라", "설날": "설랄",                   # lateralization
        "학교": "학꾜", "국밥": "국빱", "없다": "업따",   # tensification
        "좋다": "조타", "않던": "안턴",                   # aspiration
        "놓아": "노아", "많아": "마나", "좋은": "조은",   # ㅎ deletion
        "같이": "가치", "맏이": "마지",                   # palatalization
        "밥이": "바비", "읽어": "일거", "앉아": "안자",   # liaison
        "값이": "갑씨", "닭이": "달기",                   # cluster liaison
        "읽다": "익따", "옷": "옫",                       # coda reduction
    }
    bad = {k: (pronounce(k), w) for k, w in cases.items() if pronounce(k) != w}
    assert not bad, bad


def test_korean_clean_text_symbols_valid():
    from gpt_sovits_tpu.text import get_symbols
    from gpt_sovits_tpu.text.cleaner import clean_text

    phones, word2ph, norm = clean_text("안녕하세요, 감사합니다!", "ko")
    symbols = set(get_symbols("v2"))
    assert phones and all(p in symbols for p in phones)


def test_special_silence_symbols():
    """￥ -> SP2 and ^ -> SP3 pause phones in zh (ref cleaner.py:13-17,
    clean_special:58-83)."""
    from gpt_sovits_tpu.text.cleaner import clean_text

    phones, word2ph, norm = clean_text("你好￥世界。", "zh")
    assert "SP2" in phones
    assert sum(word2ph) == len(phones) and len(word2ph) == len(norm)
    phones2, _, _ = clean_text("前^后。", "zh")
    assert "SP3" in phones2
