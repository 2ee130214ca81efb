from .stream import (
    StreamingFrame,
    scan_stream_parquet,
    scan_stream_csv,
    scan_stream_rate,
    streaming_jdbc_sink,
)

__all__ = [
    "StreamingFrame",
    "scan_stream_parquet",
    "scan_stream_csv",
    "scan_stream_rate",
    "streaming_jdbc_sink",
]
