from tdoa_tpu.pipeline.processor import (
    ProcessorConfig,
    TDOAProcessor,
    TDOAResult,
    process_blocks,
)

__all__ = ["ProcessorConfig", "TDOAProcessor", "TDOAResult", "process_blocks"]
