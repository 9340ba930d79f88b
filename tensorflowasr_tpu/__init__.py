"""tensorflowasr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) Chinese ASR framework.

A from-scratch re-design of the capabilities of Z-yq/TensorflowASR for TPU:

- ``ops``      : audio frontends (log-mel / spectrogram / LEAF), CTC loss,
                 greedy + prefix-beam decoding — all XLA/Pallas-first.
- ``models``   : Conformer-CTC model family (offline, block-streaming,
                 chunk-streaming SMLTA2-style), VAD, punctuation transformer.
- ``parallel`` : device mesh + sharding utilities (pjit data parallelism,
                 ICI/DCN-aware collectives).
- ``train``    : functional train loops (donated state, psum-mean grads),
                 orbax checkpointing, schedules.
- ``data``     : host-side dataloaders, length bucketing, augmentation.
- ``serve``    : streaming/offline serving sessions (VAD state machine +
                 ASR + punctuation) and export helpers.
- ``utils``    : config, text/speech featurizers, metrics.
"""

__version__ = "0.1.0"
