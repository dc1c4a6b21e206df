from vaero_ray.sources.transcripts import make_transcripts, write_transcripts
from vaero_ray.sources.fixtures import make_log_events, make_nested_events
from vaero_ray.sources.textlines import jsonlines_to_columns, read_jsonl_events, read_text_events

__all__ = [
    "make_transcripts",
    "write_transcripts",
    "make_log_events",
    "make_nested_events",
    "jsonlines_to_columns",
    "read_jsonl_events",
    "read_text_events",
]
