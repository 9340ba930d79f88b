from tensorflowasr_tpu.eval.testers import (
    AMTester,
    ChunkTester,
    PuncTester,
    VADTester,
)

__all__ = ["AMTester", "ChunkTester", "VADTester", "PuncTester"]
