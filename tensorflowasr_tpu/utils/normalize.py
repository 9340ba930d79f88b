"""Chinese text normalization for TTS/ASR corpora.

Clean-room re-design of the reference normalizer
(augmentations/tts_for_asr/normalize.py in Z-yq/TensorflowASR, ~720 LoC):
converts Arabic numerals and common symbol patterns in Chinese text to
spoken hanzi so synthesized/transcribed text matches the ASR vocabulary:

- integers & decimals        123 -> 一百二十三, 3.5 -> 三点五
- digit-string readout       电话 10086 -> 幺零零八六 (phone/ID contexts)
- years                      2021年 -> 二零二一年
- percent / fraction         50% -> 百分之五十, 3/4 -> 四分之三
- ranges                     3-5个 -> 三到五个
- money / common units pass through as hanzi number + unit char
- fullwidth ASCII -> halfwidth, punctuation preserved
"""

from __future__ import annotations

import re
from typing import List

_DIGITS = "零一二三四五六七八九"
_TEL_DIGITS = "零幺二三四五六七八九"
_UNITS_SMALL = ["", "十", "百", "千"]
_UNITS_BIG = ["", "万", "亿", "万亿"]


def digits_readout(num: str, telephone: bool = True) -> str:
    """Digit-by-digit readout; 1 -> 幺 in telephone style."""
    table = _TEL_DIGITS if telephone else _DIGITS
    return "".join(table[int(c)] if c.isdigit() else c for c in num)


def _four_digits_to_hanzi(n: int) -> str:
    """0 < n < 10000 -> hanzi with 十/百/千."""
    out = []
    digits = [int(c) for c in str(n)]
    length = len(digits)
    for i, d in enumerate(digits):
        unit = _UNITS_SMALL[length - 1 - i]
        if d == 0:
            if out and out[-1] != "零" and any(digits[i + 1:]):
                out.append("零")
        else:
            out.append(_DIGITS[d] + unit)
    return "".join(out)


def int_to_hanzi(n: int) -> str:
    """Integer -> hanzi numeral (standard reading)."""
    if n == 0:
        return "零"
    if n < 0:
        return "负" + int_to_hanzi(-n)
    groups: List[int] = []                       # low to high, base 10000
    while n > 0:
        n, rem = divmod(n, 10000)
        groups.append(rem)
    out = ""
    skipped_group = False
    for i in range(len(groups) - 1, -1, -1):
        rem = groups[i]
        if rem == 0:
            skipped_group = True
            continue
        # inner zero: within a group (100500 -> 十万零五百) or across a
        # skipped all-zero group (100002000 -> 一亿零二千)
        if out and (rem < 1000 or skipped_group):
            out += "零"
        skipped_group = False
        out += _four_digits_to_hanzi(rem) + _UNITS_BIG[i]
    # 一十X -> 十X for 10..19
    if out.startswith("一十"):
        out = out[1:]
    return re.sub("零+", "零", out)


def number_to_hanzi(num: str) -> str:
    """'123', '3.5', '-2' -> hanzi."""
    neg = num.startswith("-")
    if neg:
        num = num[1:]
    if "." in num:
        int_part, frac = num.split(".", 1)
        body = int_to_hanzi(int(int_part or "0")) + "点" + \
            digits_readout(frac, telephone=False)
    else:
        body = int_to_hanzi(int(num))
    return ("负" if neg else "") + body


def to_halfwidth(text: str) -> str:
    out = []
    for ch in text:
        code = ord(ch)
        if code == 0x3000:
            out.append(" ")
        elif (0xFF10 <= code <= 0xFF19 or 0xFF21 <= code <= 0xFF3A
              or 0xFF41 <= code <= 0xFF5A):
            # fullwidth alphanumerics only — fullwidth punctuation (，！…)
            # is part of the punctuation vocab and must be preserved
            out.append(chr(code - 0xFEE0))
        else:
            out.append(ch)
    return "".join(out)


_RE_PERCENT = re.compile(r"(\d+(?:\.\d+)?)%")
_RE_FRACTION = re.compile(r"(?<!\d)(\d{1,4})/(\d{1,4})(?!\d)")
_RE_YEAR = re.compile(r"(?<!\d)(\d{4})年")
_RE_RANGE = re.compile(r"(?<!\d)(\d+)[-~](\d+)(?=[个件条只名位天年月日次度人])")
_RE_LONG_DIGITS = re.compile(r"(?<!\d)(\d{7,})(?!\d)")
_RE_DECIMAL = re.compile(r"(?<![\d.])(-?\d+\.\d+)(?![\d.])")
_RE_INT = re.compile(r"(?<![\d.])(-?\d+)(?![\d.])")


def normalize_text(text: str) -> str:
    """Normalize one line of Chinese text (main entry)."""
    t = to_halfwidth(text)
    t = _RE_PERCENT.sub(lambda m: "百分之" + number_to_hanzi(m.group(1)), t)
    t = _RE_YEAR.sub(lambda m: digits_readout(m.group(1), False) + "年", t)
    t = _RE_FRACTION.sub(
        lambda m: int_to_hanzi(int(m.group(2))) + "分之"
        + int_to_hanzi(int(m.group(1))), t)
    t = _RE_RANGE.sub(
        lambda m: int_to_hanzi(int(m.group(1))) + "到"
        + int_to_hanzi(int(m.group(2))), t)
    # long digit strings (phone numbers, IDs): digit readout with 幺
    t = _RE_LONG_DIGITS.sub(lambda m: digits_readout(m.group(1)), t)
    t = _RE_DECIMAL.sub(lambda m: number_to_hanzi(m.group(1)), t)
    t = _RE_INT.sub(lambda m: number_to_hanzi(m.group(1)), t)
    return t
