from .ingest import tumbling_event_counts, incremental_toppop, stream_events

__all__ = ["tumbling_event_counts", "incremental_toppop", "stream_events"]
