"""AM evaluation CLI — parity with the reference eval_am.py:9-44: runs the
full pipeline over the eval list and reports phone/char SER/CER with S/I/D
counts."""

from __future__ import annotations

import json
import sys

from tensorflowasr_tpu.cli.common import (
    build_featurizers,
    config_parser,
    load_config,
)


def _one_pass(args, dl) -> int:
    """--max_batches default = ONE pass over the eval list (the generator
    cycles endlessly; the reference tester stops after its eval dataset)."""
    if args.max_batches is not None:
        return args.max_batches
    n = len(dl.test_list)
    if not n:
        raise RuntimeError("speech_config.eval_list is empty")
    return max(1, -(-n // dl.batch))


def main(argv=None) -> int:
    parser = config_parser(__doc__)
    parser.add_argument("--max_batches", type=int, default=None)
    parser.add_argument("--lm", default=None,
                        help="n-gram LM: .npz (cli/train_lm) or .arpa "
                             "(KenLM text, tokens = phone vocab) -> decode "
                             "with on-chip beam search + shallow fusion "
                             "instead of greedy (offline model only)")
    parser.add_argument("--word_lm", default=None,
                        help="WORD-level .arpa whose tokens are pinyin "
                             "syllables: normalized into a phone-level LM "
                             "via the pinyin map (the word-trie role of "
                             "the reference's KenLM scorer) and fused "
                             "on-chip like --lm")
    parser.add_argument("--word_lm_order", type=int, default=3)
    parser.add_argument("--lm_weight", type=float, default=0.3)
    parser.add_argument("--beam_width", type=int, default=8)
    args = parser.parse_args(argv)
    config = load_config(args)
    phone_f, char_f, p2p, pin, pinyin_txt = build_featurizers(config)
    name = config.section("model_config")["name"] or "OfflineConformerCTC"

    if name == "ChunkConformer":
        from tensorflowasr_tpu.data.chunk_dataloader import ChunkDataLoader
        from tensorflowasr_tpu.eval.testers import ChunkTester
        from tensorflowasr_tpu.train.chunk_trainer import ChunkTrainer

        chunk_num = ((config["model_config"] or {})
                     .get("ChunkConformerFront") or {}).get("chunk_num", 16)
        dl = ChunkDataLoader(config, phone_f, char_f, chunk_num=chunk_num,
                             pinyin2phone=p2p, pinyin=pin,
                             transcripts_are_pinyin=pinyin_txt)
        trainer = ChunkTrainer(config, phone_f.num_classes,
                               char_f.num_classes)
        trainer.init_state(dl.generate(train=False))
        if not trainer.restore():
            print("warning: no checkpoint found; evaluating random init",
                  file=sys.stderr)
        tester = ChunkTester(trainer.predict_step, trainer.state)
        result = tester.run(dl.generator(train=False),
                            max_batches=_one_pass(args, dl))
    else:
        from tensorflowasr_tpu.data.am_dataloader import AMDataLoader
        from tensorflowasr_tpu.eval.testers import AMTester
        from tensorflowasr_tpu.train.asr_trainer import CTCTrainer

        dl = AMDataLoader(config, phone_f, char_f, pinyin2phone=p2p,
                          pinyin=pin, transcripts_are_pinyin=pinyin_txt)
        trainer = CTCTrainer(config, phone_f.num_classes, char_f.num_classes,
                             blank_id=phone_f.blank)
        trainer.init_state(dl.generate(train=False))
        if not trainer.restore():
            print("warning: no checkpoint found; evaluating random init",
                  file=sys.stderr)
        if args.lm or args.word_lm:
            from tensorflowasr_tpu.train.asr_trainer import (
                make_beam_predict_step)
            from tensorflowasr_tpu.utils.ngram_lm import (
                NGramLM, lm_pack, unit_lm_from_word_arpa)
            from tensorflowasr_tpu.utils.text import tokens_to_phones

            if args.word_lm:
                # pinyin-syllable words -> phone-id units via the map
                def to_units(word):
                    phs = (p2p or {}).get(word)
                    if phs is None:
                        return None
                    try:
                        return phone_f.extract(
                            tokens_to_phones([word], p2p, phone_f))
                    except KeyError:
                        return None

                host_lm = unit_lm_from_word_arpa(
                    args.word_lm, to_units, phone_f.num_classes,
                    order=args.word_lm_order)
            elif args.lm.endswith(".arpa"):
                host_lm = NGramLM.from_arpa(args.lm, phone_f.token_to_index,
                                            phone_f.num_classes)
            else:
                host_lm = NGramLM.load(args.lm)
            trainer.predict_step = make_beam_predict_step(
                trainer.model, blank_id=phone_f.blank,
                beam_width=args.beam_width, ngram_lm=lm_pack(host_lm),
                lm_weight=args.lm_weight)
        tester = AMTester(trainer, char_end_id=char_f.endid())
        result = tester.run(dl.generator(train=False),
                            max_batches=_one_pass(args, dl))
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
