#!/usr/bin/env python
"""Root entry script (reference UX: python eval_punc.py --data_config X.yml --model_config Y.yml)."""
import sys

from tensorflowasr_tpu.cli.eval_punc import main

if __name__ == "__main__":
    sys.exit(main())
