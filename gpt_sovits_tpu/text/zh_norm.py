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
    # mobile/phone numbers with separators: 138-1234-5678 -> digit reading
    text = re.sub(
        r"\d{3,4}([\- ])\d{3,4}\1?\d{3,4}",
        lambda m: digits_to_hanzi(re.sub(r"\D", "", m.group(0))),
        text,
    )
    # time: 3:30:15 -> 三点三十分十五秒; 3:30 -> 三点三十分
    text = re.sub(
        r"(\d{1,2}):(\d{2}):(\d{2})",
        lambda m: num_to_hanzi(int(m.group(1))) + "点" + num_to_hanzi(int(m.group(2))) + "分"
        + num_to_hanzi(int(m.group(3))) + "秒",
        text,
    )
    text = re.sub(
        r"(\d{1,2}):(\d{2})",
        lambda m: num_to_hanzi(int(m.group(1))) + "点" + (num_to_hanzi(int(m.group(2))) + "分" if m.group(2) != "00" else ""),
        text,
    )
    # temperature: 25°C / 25℃ -> 二十五摄氏度; -3℃ -> 零下三摄氏度
    text = re.sub(
        r"(-?)(\d+(?:\.\d+)?)\s*(?:°C|℃)",
        lambda m: ("零下" if m.group(1) else "") + decimal_to_hanzi(m.group(2)) + "摄氏度",
        text,
    )
    # ranges: 3~5 / 3-5 -> 三到五 (after dates/phones so hyphens there win)
    text = re.sub(
        r"(\d+(?:\.\d+)?)\s*[~～\-]\s*(\d+(?:\.\d+)?)",
        lambda m: decimal_to_hanzi(m.group(1)) + "到" + decimal_to_hanzi(m.group(2)),
        text,
    )
    # negative numbers: -3 -> 负三
    text = re.sub(r"(?<![\w])-(\d+(?:\.\d+)?)", lambda m: "负" + decimal_to_hanzi(m.group(1)), text)
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


# tone sandhi moved to text/tone_sandhi.py (word-level rule set); this
# re-export keeps older imports working
from gpt_sovits_tpu.text.tone_sandhi import apply_tone_sandhi  # noqa: E402,F401
