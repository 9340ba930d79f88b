"""Pinyin -> phone-unit split rules and the make_pinyin_map CLI.

Golden cases mirror the reference's pinyin2phone.map semantics
(asr/configs/dict/pinyin2phone.map): pseudo-initials aa/ee/oo/ii/uu/vv,
apical ix/iy, y/w surface folding, j/q/x + u -> v.
"""

import pytest

from tensorflowasr_tpu.utils.phones import (
    build_pinyin2phone,
    full_syllable_table,
    phone_inventory,
    split_pinyin,
)

GOLDEN = {
    # zero-initial pseudo rows
    "a1": "aa a1", "e4": "ee e4", "ou3": "oo ou3", "er2": "ee er2",
    "an4": "aa an4", "n4": "ee en4",
    # y-/w- folding
    "yi1": "ii i1", "ya3": "ii ia3", "ye4": "ii ie4", "you2": "ii iu2",
    "yan2": "ii ian2", "ying1": "ii ing1", "yong4": "ii iong4",
    "yu3": "vv v3", "yue4": "vv ve4", "yuan2": "vv van2", "yun4": "vv vn4",
    "wu2": "uu u2", "wei4": "uu ui4", "wen2": "uu un2", "wo3": "uu uo3",
    "wang2": "uu uang2", "weng1": "uu ueng1",
    # apical vowels
    "zhi1": "zh ix1", "chi2": "ch ix2", "shi4": "sh ix4", "ri4": "r ix4",
    "zi5": "z iy5", "ci2": "c iy2", "si1": "s iy1",
    # j/q/x + u -> v
    "ju4": "j v4", "jun1": "j vn1", "juan3": "j van3", "jue2": "j ve2",
    "qu1": "q v1", "xue2": "x ve2", "xu5": "x v5",
    # v-spellings and variants
    "lv4": "l v4", "nve4": "n ve4", "nue4": "n ve4", "lue4": "l ve4",
    # plain initials keep iu/ui/un surface finals
    "liu2": "l iu2", "dui4": "d ui4", "lun2": "l un2",
    "zhong1": "zh ong1", "chuang2": "ch uang2", "ping2": "p ing2",
    # toneless input -> neutral tone
    "ma": "m a5",
}


def test_split_golden_cases():
    for k, want in GOLDEN.items():
        assert " ".join(split_pinyin(k)) == want, k


def test_split_rejects_non_pinyin():
    for bad in ["", "q9", "xyz1", "zh", "abc", "ni3hao3", "好"]:
        with pytest.raises(ValueError):
            split_pinyin(bad)


def test_full_table_splits_everywhere():
    m = build_pinyin2phone()
    assert len(m) == len(full_syllable_table()) * 5
    inv = phone_inventory(m)
    # reference inventory: 23 real + 6 pseudo initials, ~190 toned finals
    assert 26 <= sum(1 for p in inv if not p[-1].isdigit()) <= 30
    assert len(inv) > 180
    # every phone either a known initial or a toned final
    for ph in inv:
        assert ph[-1].isdigit() or ph.isalpha()


def test_make_pinyin_map_cli(tmp_path):
    from tensorflowasr_tpu.cli.make_pinyin_map import main
    from tensorflowasr_tpu.utils.text import (
        TextFeaturizer, load_pinyin2phone, tokens_to_phones)

    lst = tmp_path / "train.list"
    lst.write_text("a.wav\tni3 hao3 shi4 jie4\nb.wav\tzhong1 guo2\n",
                   encoding="utf-8")
    map_out = tmp_path / "p2p.map"
    phone_out = tmp_path / "phone.txt"
    rc = main(["--map_out", str(map_out), "--phone_out", str(phone_out),
               "--lists", str(lst), "--transcripts_are_pinyin"])
    assert rc == 0
    p2p = load_pinyin2phone(str(map_out))
    assert p2p["zhong1"] == ["zh", "ong1"]
    feat = TextFeaturizer({"vocabulary": str(phone_out),
                           "blank_at_zero": False})
    phones = tokens_to_phones(["ni3", "hao3", "zhong1", "guo2"], p2p, feat)
    assert phones == ["n", "i3", "h", "ao3", "zh", "ong1", "g", "uo2"]
    ids = feat.extract(phones)
    assert all(i < feat.num_classes for i in ids)
    # full-table mode
    rc = main(["--map_out", str(map_out), "--phone_out", str(phone_out)])
    assert rc == 0
    p2p = load_pinyin2phone(str(map_out))
    assert len(p2p) > 1500  # superset of the reference's 1545 entries
