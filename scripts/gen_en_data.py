"""Generate the built-in English pronunciation data files.

Sources (pronunciation data, not code):
  * CMU pronouncing dictionary as shipped by the reference
    (text/cmudict.rep, public-domain CMUdict 0.7b) merged with the
    reference's cmudict-fast.rep additions and engdict-hot.rep overrides,
    following the same precedence as english.py get_dict():
    base -> fast (only new words) -> hot (overrides)
  * first-name pronunciations from text/namedict_cache.pickle

Outputs (committed):
  gpt_sovits_tpu/text/data/en_cmudict.json.gz   {word: [phones...]}
  gpt_sovits_tpu/text/data/en_names.json.gz     {name: [phones...]}

Run:  python scripts/gen_en_data.py
"""

from __future__ import annotations

import gzip
import json
import os
import pickle
import sys

REF = "/root/reference/GPT_SoVITS/text"
OUT = os.path.join(os.path.dirname(__file__), "..", "gpt_sovits_tpu", "text", "data")

# abbreviations whose dictionary readings are wrong for TTS (the reference
# deletes these in en_G2p.__init__, english.py:258-260)
DROP = {"ae", "ai", "ar", "ios", "hud", "os"}


def main():
    os.makedirs(OUT, exist_ok=True)
    table: dict[str, list[str]] = {}

    with open(os.path.join(REF, "cmudict.rep"), errors="ignore") as f:
        for i, line in enumerate(f, 1):
            if i < 57:
                continue
            parts = line.strip().split("  ")
            if len(parts) != 2:
                continue
            word = parts[0].lower()
            if "(" in word:  # alternate pronunciations: keep the first only
                continue
            table[word] = parts[1].split(" ")

    with open(os.path.join(REF, "cmudict-fast.rep"), errors="ignore") as f:
        for line in f:
            parts = line.strip().split(" ")
            if len(parts) < 2:
                continue
            word = parts[0].lower()
            if word not in table:
                table[word] = parts[1:]

    with open(os.path.join(REF, "engdict-hot.rep"), errors="ignore") as f:
        for line in f:
            parts = line.strip().split(" ")
            if len(parts) >= 2:
                table[parts[0].lower()] = parts[1:]

    for w in DROP:
        table.pop(w, None)

    print(f"cmu entries: {len(table)}")
    with gzip.open(os.path.join(OUT, "en_cmudict.json.gz"), "wt", encoding="utf-8") as f:
        json.dump(table, f, separators=(",", ":"))

    with open(os.path.join(REF, "namedict_cache.pickle"), "rb") as f:
        raw = pickle.load(f)
    names = {k: v[0] for k, v in raw.items() if v}
    print(f"name entries: {len(names)}")
    with gzip.open(os.path.join(OUT, "en_names.json.gz"), "wt", encoding="utf-8") as f:
        json.dump(names, f, separators=(",", ":"))


if __name__ == "__main__":
    sys.exit(main())
