"""ASR training CLI — parity with the reference train_asr.py:140-149.

Dispatches on ``model_config.name``: ``ChunkConformer`` -> chunk trainer
(the reference's Keras-fit mode 0, train_asr.py:41-44); anything else ->
offline/block-streaming CTC trainer (mode 1).
"""

from __future__ import annotations

import sys

from tensorflowasr_tpu.cli.common import (
    am_batch_stream,
    build_featurizers,
    chunk_batch_stream,
    config_parser,
    load_config,
    make_train_iter,
)


def main(argv=None) -> int:
    args = config_parser(__doc__).parse_args(argv)
    config = load_config(args)
    phone_f, char_f, p2p, pin, pinyin_txt = build_featurizers(config)
    name = config.section("model_config")["name"] or "OfflineConformerCTC"

    if name == "ChunkConformer":
        from tensorflowasr_tpu.data.chunk_dataloader import ChunkDataLoader
        from tensorflowasr_tpu.train.chunk_trainer import ChunkTrainer

        chunk_num = ((config["model_config"] or {})
                     .get("ChunkConformerFront") or {}).get("chunk_num", 16)
        dl = ChunkDataLoader(config, phone_f, char_f, chunk_num=chunk_num,
                             pinyin2phone=p2p, pinyin=pin,
                             transcripts_are_pinyin=pinyin_txt)
        trainer = ChunkTrainer(config, phone_f.num_classes,
                               char_f.num_classes,
                               compute_dtype=args.compute_dtype)
        batch = dl.generate(train=True)
        trainer.init_state(batch)
        trainer.restore()
        train_iter = make_train_iter(
            args,
            lambda: dl.generator(train=True, num_workers=args.data_workers,
                                 prefetch_depth=2 if args.data_workers
                                 else 0),
            chunk_batch_stream)
        trainer.fit(train_iter,
                    eval_iter=dl.generator(train=False),
                    total_steps=args.total_steps)
    else:
        from tensorflowasr_tpu.data.am_dataloader import AMDataLoader
        from tensorflowasr_tpu.train.asr_trainer import CTCTrainer

        dl = AMDataLoader(config, phone_f, char_f, pinyin2phone=p2p,
                          pinyin=pin, transcripts_are_pinyin=pinyin_txt)
        trainer = CTCTrainer(config, phone_f.num_classes, char_f.num_classes,
                             blank_id=phone_f.blank,
                             compute_dtype=args.compute_dtype)
        batch = dl.generate(train=True)
        trainer.init_state(batch)
        trainer.restore()
        train_iter = make_train_iter(
            args,
            lambda: dl.generator(train=True, num_workers=args.data_workers,
                                 prefetch_depth=2 if args.data_workers
                                 else 0),
            am_batch_stream)
        trainer.fit(train_iter,
                    eval_iter=dl.generator(train=False),
                    total_steps=args.total_steps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
