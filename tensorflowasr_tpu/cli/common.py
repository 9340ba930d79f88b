"""Shared CLI plumbing: config loading + featurizer/dataloader wiring."""

from __future__ import annotations

import argparse
import logging
from typing import Optional, Tuple

from tensorflowasr_tpu.utils.config import UserConfig
from tensorflowasr_tpu.utils.text import (
    PinyinConverter,
    TextFeaturizer,
    load_pinyin2phone,
)


def config_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--data_config", required=True,
                   help="data YAML (speech/augments/running config)")
    p.add_argument("--model_config", required=True,
                   help="model YAML (model_config section)")
    p.add_argument("--total_steps", type=int, default=10000)
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--log_level", default="INFO")
    return p


def load_config(args) -> UserConfig:
    logging.basicConfig(
        level=getattr(logging, args.log_level.upper(), logging.INFO),
        format="%(asctime)s %(name)s %(levelname)s %(message)s")
    return UserConfig(args.data_config, args.model_config)


def build_featurizers(config: UserConfig
                      ) -> Tuple[TextFeaturizer, TextFeaturizer, dict,
                                 Optional[PinyinConverter], bool]:
    """-> (phone featurizer, char featurizer, pinyin2phone map,
    pinyin converter, transcripts_are_pinyin)."""
    inp = dict((config["inp_config"] or {}).items()) \
        if config["inp_config"] else {}
    tar = dict((config["tar_config"] or {}).items()) \
        if config["tar_config"] else {}
    phone_f = TextFeaturizer(inp)
    char_f = TextFeaturizer(tar)
    sc = config["speech_config"] or {}
    p2p_path = sc["pinyin_map"]
    p2p = load_pinyin2phone(p2p_path) if p2p_path else {}
    transcripts_are_pinyin = bool(sc["transcripts_are_pinyin"])
    pin = None
    if not transcripts_are_pinyin:
        pin = PinyinConverter(lexicon_path=sc["pinyin_lexicon"])
        if not pin.available:
            logging.warning(
                "no hanzi->pinyin backend (install pypinyin or set "
                "speech_config.pinyin_lexicon); assuming transcripts are "
                "already space-separated pinyin")
            transcripts_are_pinyin = True
            pin = None
    return phone_f, char_f, p2p, pin, transcripts_are_pinyin
