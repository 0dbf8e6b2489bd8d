from .buckets import clamp_timestamp, date_bucket, int_bucket
from .hashing import portable_hash32, portable_hash60

__all__ = [
    "clamp_timestamp",
    "date_bucket",
    "int_bucket",
    "portable_hash32",
    "portable_hash60",
]
