#!/usr/bin/env python
"""Root entry script (reference UX: python test_chunk_asr.py --data_config X.yml --model_config Y.yml)."""
import sys

from tensorflowasr_tpu.cli.test_chunk_asr import main

if __name__ == "__main__":
    sys.exit(main())
