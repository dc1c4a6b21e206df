from vaero_ray.sources.transcripts import make_transcripts, write_transcripts
from vaero_ray.sources.fixtures import make_log_events, make_nested_events

__all__ = [
    "make_transcripts",
    "write_transcripts",
    "make_log_events",
    "make_nested_events",
]
