from .incremental import stream_ingest_available_now, windowed_event_counts

__all__ = ["stream_ingest_available_now", "windowed_event_counts"]
