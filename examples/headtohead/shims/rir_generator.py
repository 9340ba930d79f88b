"""rir_generator shim (examples/headtohead): imported unconditionally by
the reference's augmentations/augments.py; the RIR augmenter stays
inactive in the head-to-head config."""


def generate(*args, **kwargs):
    raise NotImplementedError("rir shim: RIR augmentation must be off")
