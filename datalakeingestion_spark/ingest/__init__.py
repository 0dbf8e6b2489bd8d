from .pipeline import IncrementalIngestJob, IngestResult
from .watermark import ExecutionLog, resolve_watermark

__all__ = [
    "ExecutionLog",
    "IncrementalIngestJob",
    "IngestResult",
    "resolve_watermark",
]
