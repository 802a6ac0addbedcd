"""Chinese text normalization.

Counterpart of text/zh_normalization/ (dates, phone numbers, quantifiers,
percentages, fractions, number readings — ~1100 LoC across 9 files in the
reference). Self-contained rules covering the high-frequency patterns.
"""

from __future__ import annotations

import re

_DIGITS = "零一二三四五六七八九"
_UNITS4 = ["", "十", "百", "千"]
_GROUPS = ["", "万", "亿", "万亿"]


def num_to_hanzi(n: int) -> str:
    """Proper cardinal reading with 十/百/千/万/亿 and zero elision."""
    if n < 0:
        return "负" + num_to_hanzi(-n)
    if n == 0:
        return "零"
    groups = []
    while n > 0:
        groups.append(n % 10000)
        n //= 10000
    parts: list[str] = []
    for gi in range(len(groups) - 1, -1, -1):
        g = groups[gi]
        if g == 0:
            if parts and not parts[-1].endswith("零"):
                parts.append("零")
            continue
        s = ""
        zero_pending = False
        for pos in range(3, -1, -1):
            d = (g // 10**pos) % 10
            if d == 0:
                if s:
                    zero_pending = True
                continue
            if zero_pending:
                s += "零"
                zero_pending = False
            s += _DIGITS[d] + _UNITS4[pos]
        # leading 一十 -> 十 (only for the most significant group)
        if gi == len(groups) - 1 and s.startswith("一十"):
            s = s[1:]
        # inter-group zero: e.g. 10005 -> 一万零五
        if parts and groups[gi + 1 :] and g < 1000 and not (parts and parts[-1].endswith("零")):
            s = "零" + s
        parts.append(s + _GROUPS[gi])
    out = "".join(parts)
    return out.rstrip("零") or "零"


def digits_to_hanzi(s: str) -> str:
    """Digit-by-digit reading (phone numbers, years); 1 -> 幺 omitted for
    simplicity, 一 used."""
    return "".join(_DIGITS[int(c)] for c in s if c.isdigit())


def decimal_to_hanzi(s: str) -> str:
    if "." in s:
        int_part, frac = s.split(".", 1)
        return num_to_hanzi(int(int_part or 0)) + "点" + digits_to_hanzi(frac)
    return num_to_hanzi(int(s))


def normalize_zh(text: str) -> str:
    # dates: 2024年3月5日 / 2024-03-05
    def _date(m):
        y, mo, d = m.group(1), int(m.group(2)), int(m.group(3))
        return f"{digits_to_hanzi(y)}年{num_to_hanzi(mo)}月{num_to_hanzi(d)}日"

    text = re.sub(r"(\d{4})[年\-/](\d{1,2})[月\-/](\d{1,2})日?", _date, text)
    # time: 3:30 -> 三点三十分
    text = re.sub(
        r"(\d{1,2}):(\d{2})",
        lambda m: num_to_hanzi(int(m.group(1))) + "点" + (num_to_hanzi(int(m.group(2))) + "分" if m.group(2) != "00" else ""),
        text,
    )
    # percent: 25% -> 百分之二十五
    text = re.sub(r"(\d+(?:\.\d+)?)%", lambda m: "百分之" + decimal_to_hanzi(m.group(1)), text)
    # fraction: 3/4 -> 四分之三
    text = re.sub(
        r"(\d+)/(\d+)", lambda m: num_to_hanzi(int(m.group(2))) + "分之" + num_to_hanzi(int(m.group(1))), text
    )
    # currency: ¥12 / 12元
    text = re.sub(r"[￥¥](\d+(?:\.\d+)?)", lambda m: decimal_to_hanzi(m.group(1)) + "元", text)
    # long digit strings (phone numbers, ids): digit-by-digit
    text = re.sub(r"\d{7,}", lambda m: digits_to_hanzi(m.group(0)), text)
    # remaining numbers: cardinal (with decimals)
    text = re.sub(r"\d+(?:\.\d+)?", lambda m: decimal_to_hanzi(m.group(0)), text)
    return text


# ---------------------------------------------------------------------------
# tone sandhi (core rules of text/tone_sandhi.py)
# ---------------------------------------------------------------------------


def apply_tone_sandhi(chars: str, sylls: list[str]) -> list[str]:
    """Apply 不/一 sandhi and third-tone sandhi to toned pinyin.

    chars: the hanzi string aligned 1:1 with sylls (non-hanzi entries allowed
    as placeholders)."""

    def tone(s):
        return int(s[-1]) if s and s[-1].isdigit() else 0

    def set_tone(s, t):
        return s[:-1] + str(t) if s and s[-1].isdigit() else s

    out = list(sylls)
    n = len(out)
    for i, ch in enumerate(chars[:n]):
        nxt = tone(out[i + 1]) if i + 1 < n else 0
        if ch == "不" and nxt == 4:
            out[i] = set_tone(out[i], 2)  # 不 + tone4 -> bu2
        elif ch == "一" and i + 1 < n:
            if nxt == 4:
                out[i] = set_tone(out[i], 2)  # 一 + tone4 -> yi2
            elif nxt in (1, 2, 3):
                out[i] = set_tone(out[i], 4)  # 一 + tone1/2/3 -> yi4
    # third-tone sandhi: 3 3 -> 2 3; compare against ORIGINAL tones so a
    # chain like 3-3-3 becomes 2-2-3 (展览馆 zhan2 lan2 guan3)
    orig = [tone(s) for s in out]
    for i in range(n - 1):
        if orig[i] == 3 and orig[i + 1] == 3:
            out[i] = set_tone(out[i], 2)
    return out
