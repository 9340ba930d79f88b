"""Generate a synthetic Mandarin corpus in the AISHELL-1 layout.

Real AISHELL-1 audio cannot ship with this repo, so this script creates
the closest offline proxy for end-to-end CER evidence at REAL phone-
inventory scale: hanzi transcripts over hundreds of characters whose
pinyin covers the full initial/final phone inventory (the same
pinyin2phone rule table the recipe generates; reference dict:
asr/configs/dict/pinyin2phone.map, 226 phones), rendered to audio by a
deterministic phone synthesizer (each phone = a unique two-tone chord
with a tone-contour on finals). Then the STANDARD recipe runs unchanged:

  python examples/synthetic_mandarin/generate.py --out_dir /tmp/synth
  python examples/aishell1/prepare.py --data_dir /tmp/synth \\
      --out_dir /tmp/synth_work --train_time_lexicon /tmp/synth/lexicon.tsv
  python train_asr.py --data_config /tmp/synth_work/am_data.yml \\
      --model_config configs/conformerS.yml --total_steps 3000
  python eval_am.py   --data_config /tmp/synth_work/am_data.yml \\
      --model_config configs/conformerS.yml

Text has bigram structure (a seeded Markov chain over characters), so
`eval_am --lm` shallow fusion is demonstrable on this corpus too.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from tensorflowasr_tpu.utils.phones import build_pinyin2phone
from tensorflowasr_tpu.utils.audio import write_wav

SR = 16000
PHONE_SECONDS = 0.09


def phone_bank(phones):
    """phone -> [n] float32 waveform; unique two-tone chord per phone."""
    n = int(SR * PHONE_SECONDS)
    t = np.arange(n) / SR
    env = np.hanning(2 * n)[:n]          # attack-only half window
    bank = {}
    for i, ph in enumerate(sorted(phones)):
        f1 = 220.0 + 31.0 * (i % 40)
        f2 = 1480.0 + 53.0 * (i // 40)
        tone = ph[-1] if ph[-1].isdigit() else None
        # finals carry the tone as a pitch contour on f1
        if tone == "2":
            f1_t = f1 * (1.0 + 0.12 * t / PHONE_SECONDS)
        elif tone == "3":
            f1_t = f1 * (1.0 - 0.12 * np.sin(np.pi * t / PHONE_SECONDS))
        elif tone == "4":
            f1_t = f1 * (1.0 - 0.12 * t / PHONE_SECONDS)
        else:
            f1_t = np.full_like(t, f1)
        phase = 2 * np.pi * np.cumsum(f1_t) / SR
        wav = 0.55 * np.sin(phase) + 0.3 * np.sin(2 * np.pi * f2 * t)
        bank[ph] = (wav * env).astype(np.float32)
    return bank


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--n_chars", type=int, default=250)
    p.add_argument("--n_train", type=int, default=1500)
    p.add_argument("--n_dev", type=int, default=150)
    p.add_argument("--n_test", type=int, default=100)
    p.add_argument("--min_len", type=int, default=4)
    p.add_argument("--max_len", type=int, default=12)
    p.add_argument("--noise", type=float, default=0.02)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    p2p = build_pinyin2phone()                    # full rule table
    pinyins = sorted(p2p)
    rng.shuffle(pinyins)
    chars = [chr(0x4E00 + i) for i in range(args.n_chars)]
    lexicon = {c: pinyins[i % len(pinyins)] for i, c in enumerate(chars)}
    phones = sorted({ph for c in chars for ph in p2p[lexicon[c]]})
    bank = phone_bank({ph for py in p2p for ph in p2p[py]})
    print(f"{len(chars)} chars, {len(phones)} distinct phones in corpus")

    # bigram language: each char prefers a few successors (so an n-gram
    # LM genuinely helps decoding)
    succ = {c: rng.choice(chars, size=4, replace=False) for c in chars}

    def sample_text():
        length = int(rng.integers(args.min_len, args.max_len + 1))
        out = [chars[int(rng.integers(len(chars)))]]
        for _ in range(length - 1):
            if rng.random() < 0.8:
                out.append(str(rng.choice(succ[out[-1]])))
            else:
                out.append(chars[int(rng.integers(len(chars)))])
        return "".join(out)

    def render(text):
        segs = [np.zeros(int(SR * rng.uniform(0.05, 0.15)), np.float32)]
        for ch in text:
            for ph in p2p[lexicon[ch]]:
                segs.append(bank[ph])
            segs.append(np.zeros(int(SR * 0.02), np.float32))
        segs.append(np.zeros(int(SR * rng.uniform(0.05, 0.1)), np.float32))
        wav = np.concatenate(segs)
        wav = wav * rng.uniform(0.5, 0.95)
        wav += args.noise * rng.standard_normal(len(wav)).astype(np.float32)
        return wav.astype(np.float32)

    os.makedirs(os.path.join(args.out_dir, "transcript"), exist_ok=True)
    trans = []
    counts = {"train": args.n_train, "dev": args.n_dev, "test": args.n_test}
    for split, n in counts.items():
        for i in range(n):
            spk = f"S{hash(split) % 7 + i % 20:04d}"
            utt = f"BAC{split[:2].upper()}{i:06d}W"
            d = os.path.join(args.out_dir, "wav", split, spk)
            os.makedirs(d, exist_ok=True)
            text = sample_text()
            write_wav(os.path.join(d, utt + ".wav"), render(text), SR)
            trans.append(f"{utt} {' '.join(text)}")
        print(f"{split}: {n} utts")
    with open(os.path.join(args.out_dir, "transcript",
                           "aishell_transcript_v0.8.txt"), "w",
              encoding="utf-8") as f:
        f.write("\n".join(trans) + "\n")
    with open(os.path.join(args.out_dir, "lexicon.tsv"), "w",
              encoding="utf-8") as f:
        for c in chars:
            f.write(f"{c}\t{lexicon[c]}\n")
    print(f"corpus -> {args.out_dir} (lexicon.tsv for "
          f"prepare.py --train_time_lexicon)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
