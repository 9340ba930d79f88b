"""Precompute BERT-teacher features for punctuation distillation.

The reference runs a keras-bert teacher ONLINE inside its punc dataloader
(punc_recover/dataloaders/punc_dataloader.py:78-83, 157-168: tokenizer ->
bert.predict -> -10.0 padding). A live TF1-style teacher inside the input
pipeline would stall a TPU training loop, so here the teacher runs ONCE,
offline, through HuggingFace transformers (torch CPU — a gated optional
dep, like onnxruntime in data/tts_augment.py), and writes one
``<sha1(line)[:16]>.npy`` per corpus line — exactly the files
``data/punc_dataloader.py:108-112`` loads back during training.

Feature contract (matches the reference's bert_decode/get_bert_feature):
- chars = the de-punctuated text of the line (PuncDataLoader.get_target);
- the teacher sees [CLS] c1 .. cn [SEP], each char one token (OOV chars
  become [UNK] so alignment with the student's <S> c1..cn </S> holds);
- saved array: float32 [n + 2, hidden], full length (the dataloader
  truncates/-10-pads to its max_len).

    python -m tensorflowasr_tpu.cli.make_bert_features \
        --data_config punc_data.yml --model_config punc_settings.yml \
        --bert_model /path/to/chinese-bert --output_dir bert_feats/
"""

from __future__ import annotations

import os
import sys

from tensorflowasr_tpu.cli.common import build_punc_model, config_parser, \
    load_config


def main(argv=None) -> int:
    p = config_parser(__doc__)
    p.add_argument("--bert_model", required=True,
                   help="local HuggingFace model dir (AutoModel + "
                        "AutoTokenizer loadable; e.g. bert-base-chinese)")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lists", nargs="+", default=None,
                   help="override: text lists to featurize (default: the "
                        "config's train_list + eval_list)")
    args = p.parse_args(argv)
    config = load_config(args)

    try:
        import torch
        from transformers import AutoModel, AutoTokenizer
    except Exception as e:  # pragma: no cover - gated dep
        print(f"transformers/torch unavailable: {e}", file=sys.stderr)
        return 2

    _, dl, _, _ = build_punc_model(config)
    dl.bert_feature_dir = args.output_dir

    lines = []
    if args.lists:
        for path in args.lists:
            with open(path, encoding="utf-8") as f:
                lines.extend(l.strip() for l in f if l.strip())
    else:
        lines = list(dl.train_list) + list(dl.test_list)
    if not lines:
        print("no input lines", file=sys.stderr)
        return 2

    tok = AutoTokenizer.from_pretrained(args.bert_model,
                                        local_files_only=True)
    model = AutoModel.from_pretrained(args.bert_model,
                                      local_files_only=True)
    model.eval()
    cls_id = tok.cls_token_id
    sep_id = tok.sep_token_id
    pad_id = tok.pad_token_id or 0

    os.makedirs(args.output_dir, exist_ok=True)
    written = skipped = 0
    batch_lines, batch_ids = [], []

    def flush():
        nonlocal written
        if not batch_lines:
            return
        import numpy as np

        max_t = max(len(i) for i in batch_ids)
        ids = torch.full((len(batch_ids), max_t), pad_id, dtype=torch.long)
        mask = torch.zeros((len(batch_ids), max_t), dtype=torch.long)
        for i, seq in enumerate(batch_ids):
            ids[i, :len(seq)] = torch.tensor(seq)
            mask[i, :len(seq)] = 1
        with torch.no_grad():
            out = model(input_ids=ids, attention_mask=mask)
        hidden = out.last_hidden_state.numpy().astype(np.float32)
        for i, line in enumerate(batch_lines):
            n = len(batch_ids[i])
            np.save(dl._bert_path(line), hidden[i, :n])
            written += 1
        batch_lines.clear()
        batch_ids.clear()

    for line in lines:
        path = dl._bert_path(line)
        if os.path.exists(path):
            skipped += 1
            continue
        chars, _ = dl.get_target(line)
        if not chars:
            skipped += 1
            continue
        # one token per char: keeps teacher rows aligned with the
        # student's <S> c1..cn </S> positions
        char_ids = tok.convert_tokens_to_ids(chars)
        batch_lines.append(line)
        batch_ids.append([cls_id] + list(char_ids) + [sep_id])
        if len(batch_lines) >= args.batch_size:
            flush()
    flush()
    print(f"wrote {written} teacher features to {args.output_dir} "
          f"({skipped} skipped), hidden={model.config.hidden_size}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
