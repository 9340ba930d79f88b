"""Host-side data pipeline: dataloaders with length bucketing (static
shapes for XLA) and numpy/scipy waveform augmentation."""

from tensorflowasr_tpu.data.am_dataloader import AMDataLoader, BucketSpec
from tensorflowasr_tpu.data.augment import AUGMENTATIONS, Augmentation
from tensorflowasr_tpu.data.chunk_dataloader import ChunkDataLoader
from tensorflowasr_tpu.data.punc_dataloader import PuncDataLoader
from tensorflowasr_tpu.data.vad_dataloader import VADDataLoader, effects_split

__all__ = [
    "AMDataLoader", "BucketSpec", "Augmentation", "AUGMENTATIONS",
    "ChunkDataLoader", "PuncDataLoader", "VADDataLoader", "effects_split",
]
