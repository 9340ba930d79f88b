"""soundfile shim (examples/headtohead): the reference imports it for
bytes input (utils/speech_featurizers.py:14), unused with file paths."""


def read(*args, **kwargs):
    raise NotImplementedError("soundfile shim: bytes wav input unused in "
                              "the head-to-head run")
