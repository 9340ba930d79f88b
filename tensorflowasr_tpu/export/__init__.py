from tensorflowasr_tpu.export.exporter import (
    export_chunk_streaming,
    export_offline_asr,
    load_exported,
    save_exported,
)

__all__ = ["export_offline_asr", "export_chunk_streaming", "save_exported",
           "load_exported"]
