"""tensorflow_addons shim (examples/headtohead): imported by the
reference's vendored leaf_audio/frontend.py; only instantiated when
mel_layer_type == 'leaf' (the head-to-head uses Melspectrogram)."""

from . import layers  # noqa: F401
