"""build_vocab CLI test."""

from tensorflowasr_tpu.cli.build_vocab import main


def test_build_vocab_pinyin(tmp_path, capsys):
    lst = tmp_path / "train.list"
    lst.write_text("a.wav\tni3 hao3\nb.wav\tshi4 jie4\nc.wav\tni3 shi4\n",
                   encoding="utf-8")
    p2p = tmp_path / "p2p.map"
    p2p.write_text("ni3\tn i3\nhao3\th ao3\nshi4\tsh i4\njie4\tj ie4\n",
                   encoding="utf-8")
    phone_out = tmp_path / "phones.txt"
    char_out = tmp_path / "chars.txt"
    rc = main(["--lists", str(lst), "--phone_out", str(phone_out),
               "--char_out", str(char_out), "--pinyin_map", str(p2p),
               "--transcripts_are_pinyin"])
    assert rc == 0
    phones = phone_out.read_text(encoding="utf-8").split()
    chars = char_out.read_text(encoding="utf-8").split()
    assert set(phones) == {"n", "i3", "h", "ao3", "sh", "i4", "j", "ie4"}
    assert chars[:2] == ["<S>", "</S>"]
    assert set(chars[2:]) == {"ni3", "hao3", "shi4", "jie4"}
