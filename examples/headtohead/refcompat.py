"""Compatibility preamble for running the REFERENCE framework (written
against TF 2.2-2.6 era Keras) on this environment's TF 2.21 + tf_keras.

Import this BEFORE any reference module. It does not modify the
read-only reference checkout — it maps removed module paths / symbols in
sys.modules so the reference's imports resolve. Call ``setup()`` first.
"""

import os
import sys


def setup(shims_dir: str, reference_dir: str = "/root/reference") -> None:
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    # shims (pypinyin/librosa/soundfile/rir_generator) shadow absent deps
    if shims_dir not in sys.path:
        sys.path.insert(0, shims_dir)
    if reference_dir not in sys.path:
        sys.path.insert(0, reference_dir)
    # the librosa shim reuses our Slaney mel builder
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if repo not in sys.path:
        sys.path.insert(0, repo)

    import tensorflow as tf

    # tf.keras.mixed_precision.experimental was removed in TF 2.6; the
    # reference imports it unconditionally (ctc_runners.py:4) but only
    # CALLS it when running_config enables mixed precision (off here).
    # tf.keras aliases tf_keras, so both the attribute on the real parent
    # module and its sys.modules entries must exist.
    mp = tf.keras.mixed_precision
    if not hasattr(mp, "experimental"):
        mp.experimental = mp
    sys.modules.setdefault("tensorflow.keras.mixed_precision.experimental",
                           mp)
    sys.modules.setdefault(mp.__name__ + ".experimental", mp)
