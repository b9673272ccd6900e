from .jobs import (
    run_streaming_hourly_traffic,
    run_streaming_session_windows,
    streaming_events,
)

__all__ = [
    "run_streaming_hourly_traffic",
    "run_streaming_session_windows",
    "streaming_events",
]
