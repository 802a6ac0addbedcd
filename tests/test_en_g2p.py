"""English g2p: golden parity with the reference's CMU-derived dictionary
(VERDICT r1 #5 — >=98% phone match on in-lexicon words, no external files)."""

import itertools

from gpt_sovits_tpu.text import get_symbols
from gpt_sovits_tpu.text.english import clean_text_en, g2p_word

REF_TEXT = "/root/reference/GPT_SoVITS/text"


def _ref_dict():
    """Replicates the reference get_dict() precedence: cmudict base, fast
    additions, hot overrides, en_G2p deletions (english.py:155-260)."""
    table = {}
    with open(f"{REF_TEXT}/cmudict.rep", errors="ignore") as f:
        for i, line in enumerate(f, 1):
            if i < 57:
                continue
            parts = line.strip().split("  ")
            if len(parts) == 2 and "(" not in parts[0]:
                table[parts[0].lower()] = parts[1].split(" ")
    with open(f"{REF_TEXT}/cmudict-fast.rep", errors="ignore") as f:
        for line in f:
            parts = line.strip().split(" ")
            if len(parts) >= 2 and parts[0].lower() not in table:
                table[parts[0].lower()] = parts[1:]
    with open(f"{REF_TEXT}/engdict-hot.rep", errors="ignore") as f:
        for line in f:
            parts = line.strip().split(" ")
            if len(parts) >= 2:
                table[parts[0].lower()] = parts[1:]
    for w in ("ae", "ai", "ar", "ios", "hud", "os"):
        table.pop(w, None)
    return table


def test_in_lexicon_words_match_reference():
    ref = _ref_dict()
    sample = list(itertools.islice(ref.items(), 0, None, 61))  # ~2.2k words
    assert len(sample) > 1500
    mismatch = 0
    for word, want in sample:
        if not word.isalpha() or len(word) <= 1:
            continue
        got = g2p_word(word)
        if got != want:
            mismatch += 1
    assert mismatch / len(sample) < 0.02, f"{mismatch}/{len(sample)} mismatches"


def test_hot_words_and_names():
    assert g2p_word("chatgpt") == ["CH", "AE1", "T", "JH", "IY1", "P", "IY1", "T", "IY1"]
    assert g2p_word("json") == ["JH", "EY1", "S", "AH0", "N"]
    # deleted abbreviations spell out letter-by-letter
    assert g2p_word("AI") == ["EY1", "AY1"]
    # Title-case name falls to the name dictionary
    assert g2p_word("Aakash"), "namedict lookup"


def test_possessive_voicing():
    from gpt_sovits_tpu.text.english import _possessive

    assert g2p_word("dog's")[-1] == "Z"
    assert g2p_word("kate's")[-1] == "S"
    # voicing classes on the suffix rule itself (dictionary entries like
    # "rose's" take precedence over the rule, as in the reference)
    assert _possessive(["R", "OW1", "Z"])[-2:] == ["AH0", "Z"]
    assert _possessive(["K", "AE1", "T"])[-1] == "S"
    assert _possessive(["D", "AO1", "G"])[-1] == "Z"


def test_clean_text_en_symbols_valid():
    symbols = set(get_symbols("v2"))
    phones, norm = clean_text_en("The quick brown fox; ChatGPT & NASA's rockets, 3rd time!")
    assert phones
    bad = [p for p in phones if p not in symbols and p not in "&;"]
    assert not bad, bad


def test_en_normalize_money_fractions_years():
    """expend.py-parity behaviors: money with sub-units, fraction readings,
    year pairs, measurement suffixes (ref en_normalization/expend.py)."""
    from gpt_sovits_tpu.text.english import normalize

    cases = {
        "$6.24": "six dollars and twenty four cents",
        "$1.01": "one dollar and one cent",
        "£5": "five pounds",
        "32.3$": "thirty two dollars and thirty cents",
        "3/4 cup": "three fourths cup",
        "1/2 done": "one half done",
        "3/2": "three halves",
        "born in 1997": "born in nineteen ninety seven",
        "year 2005": "year two thousand five",
        "in 1900": "in nineteen hundred",
        "5km run at 20km/h": "five kilometers run at twenty kilometers per hour",
        "25°C out": "twenty five degrees celsius out",
        "-5 degrees": "minus five degrees",
        "3:05 pm": "three oh five pm",
    }
    bad = {k: (normalize(k), w) for k, w in cases.items() if normalize(k) != w}
    assert not bad, bad
