from .metrics import stream_events, windowed_event_counts  # noqa: F401
