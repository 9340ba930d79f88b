class InstanceNormalization:  # leaf_audio/frontend.py:154 (unused here)
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "tfa shim: LEAF frontend not supported in the head-to-head")
