#!/usr/bin/env python
"""Root entry script (reference UX: python test_punc.py --data_config X.yml --model_config Y.yml --text ...)."""
import sys

from tensorflowasr_tpu.cli.test_punc import main

if __name__ == "__main__":
    sys.exit(main())
