from .stream import (deduped_stream, read_event_stream,
                     run_available_now, sessionized_stream,
                     windowed_agg_stream)

__all__ = ["read_event_stream", "windowed_agg_stream",
           "sessionized_stream", "deduped_stream",
           "run_available_now"]
