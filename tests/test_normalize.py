"""Chinese text normalization golden tests."""

import pytest

from tensorflowasr_tpu.utils.normalize import (
    digits_readout,
    int_to_hanzi,
    normalize_text,
    number_to_hanzi,
    to_halfwidth,
)


@pytest.mark.parametrize("n,want", [
    (0, "零"), (5, "五"), (10, "十"), (15, "十五"), (23, "二十三"),
    (100, "一百"), (105, "一百零五"), (110, "一百一十"),
    (1000, "一千"), (1001, "一千零一"), (9999, "九千九百九十九"),
    (10000, "一万"), (10005, "一万零五"), (100500, "十万零五百"),
    (20000000, "二千万"),
    (123456789, "一亿二千三百四十五万六千七百八十九"),
])
def test_int_to_hanzi(n, want):
    assert int_to_hanzi(n) == want


def test_number_and_digits():
    assert number_to_hanzi("3.5") == "三点五"
    assert number_to_hanzi("-2") == "负二"
    assert number_to_hanzi("0.05") == "零点零五"
    assert digits_readout("10086") == "幺零零八六"
    assert digits_readout("2021", telephone=False) == "二零二一"


def test_to_halfwidth():
    assert to_halfwidth("ＡＢＣ１２３") == "ABC123"
    assert to_halfwidth("，。") == "，。"   # CJK punctuation untouched


@pytest.mark.parametrize("text,want", [
    ("我有123个苹果", "我有一百二十三个苹果"),
    ("温度是3.5度", "温度是三点五度"),
    ("涨了50%", "涨了百分之五十"),
    ("2021年成立", "二零二一年成立"),
    ("占3/4", "占四分之三"),
    ("买3-5个", "买三到五个"),
    ("电话10086000", "电话幺零零八六零零零"),
])
def test_normalize_text(text, want):
    assert normalize_text(text) == want
