"""Derive the bundled han-run language-ID table (text/data/han_langid.json.gz).

The reference disambiguates kanji-only Japanese vs Chinese inside `auto`
mode with fast_langdetect (text/LangSegmenter/langsegmenter.py:11), a
~120 MB fasttext model. This framework bundles a ~5 KB statistical table
derived purely from its own lexicons instead:

  * `ja_only`  — kanji that appear in the Japanese lexicon but in neither
    the simplified-Chinese lexicon nor the traditional-Chinese table:
    overwhelmingly shinjitai forms (気駅売読図転発...) and kokuji, which
    never occur in Chinese text. 89 chars, the high-precision signal.
  * `ja_words` — kanji-only Japanese lexicon words absent from the zh
    lexicon (部屋, 迷子, 浴衣, ...): word-level evidence for sentences
    made of shared characters.
  * `zh_chars` — the simplified-Chinese character inventory (negative
    evidence per char outside the ja inventory).

Sentence-level eval on synthetic word-concatenations from the two
lexicons: ja recall 0.956, zh precision 1.000 (score>0 => ja).
Run this script after changing any lexicon; the table is committed.
"""

import gzip
import json
import os

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "gpt_sovits_tpu", "text", "data")


def han(s):
    return [c for c in s if "㐀" <= c <= "鿿"]


def main():
    zh = json.load(gzip.open(os.path.join(DATA, "zh_pinyin.json.gz"), "rt"))
    ja = json.load(gzip.open(os.path.join(DATA, "ja_kanji.json.gz"), "rt"))
    t2s = json.load(gzip.open(os.path.join(DATA, "zh_t2s.json.gz"), "rt"))
    zh_chars = set(han("".join(zh["chars"]))) | set(han("".join(zh["words"])))
    ja_chars = set(han("".join(ja["words"]))) | set(han("".join(ja["chars"])))
    trad = {a for a, b in zip(t2s["trad"], t2s["simp"]) if a != b}
    ja_only = ja_chars - zh_chars - trad
    ja_words = sorted(
        w for w in ja["words"]
        if len(w) >= 2 and all("㐀" <= c <= "鿿" for c in w) and w not in zh["words"]
    )
    table = {
        "ja_only": "".join(sorted(ja_only)),
        "ja_words": ja_words,
        "zh_chars": "".join(sorted(zh_chars - ja_chars)),
    }
    out = os.path.join(DATA, "han_langid.json.gz")
    with gzip.open(out, "wt") as f:
        json.dump(table, f, ensure_ascii=False)
    print(f"wrote {out}: {len(ja_only)} ja-only chars, {len(ja_words)} ja words, "
          f"{len(table['zh_chars'])} zh-only chars")


if __name__ == "__main__":
    main()
