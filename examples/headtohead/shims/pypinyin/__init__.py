"""pypinyin shim for running the REFERENCE framework on the synthetic
corpus (examples/headtohead): hanzi -> phone units via the corpus's own
lexicon instead of a real pinyin dictionary.

The reference's text pipeline (asr/dataloaders/am_dataloader.py:69-80)
calls ``pypinyin.pinyin(txt)`` and keeps each returned syllable that is
in the phone vocabulary as one unit. This shim returns one entry per
PHONE (initial/final split via the pinyin2phone map), so the reference
trains on exactly the same phone token sequences as our framework —
the head-to-head compares modeling, not lexicons.

Configuration (env vars, set by run_reference.py):
  HEADTOHEAD_LEXICON     char<TAB>pinyin TSV (the corpus lexicon.tsv)
  HEADTOHEAD_PINYIN_MAP  pinyin<TAB>ph1 ph2... (the recipe's
                         pinyin2phone.map)
"""

import os

_lexicon = None
_p2p = None


def _load():
    global _lexicon, _p2p
    if _lexicon is not None:
        return
    lex_path = os.environ["HEADTOHEAD_LEXICON"]
    map_path = os.environ["HEADTOHEAD_PINYIN_MAP"]
    _lexicon = {}
    with open(lex_path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) == 2:
                _lexicon[parts[0]] = parts[1]
    _p2p = {}
    with open(map_path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 2:
                _p2p[parts[0]] = parts[1].split()


def load_phrases_dict(d):  # reference calls this with real-Mandarin fixes
    pass


def pinyin(txt, *args, **kwargs):
    """One [unit] per PHONE of each char (not per char): the caller
    flattens with ``[i[0] for i in pins]`` and keeps in-vocab units."""
    _load()
    out = []
    for ch in txt:
        py = _lexicon.get(ch)
        if py is None:
            out.append([ch])  # passes through; caller's OOV filter drops it
            continue
        for ph in _p2p.get(py, [py]):
            out.append([ph])
    return out


def lazy_pinyin(txt, *args, **kwargs):
    return [i[0] for i in pinyin(txt)]
