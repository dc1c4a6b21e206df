from vaero_ray.stages.windows import (
    assign_tumbling,
    assign_sliding,
    sessionize,
    windowed_aggregate,
)
from vaero_ray.stages.stitch import assign_exchanges, stitch_conversations

__all__ = [
    "assign_tumbling",
    "assign_sliding",
    "sessionize",
    "windowed_aggregate",
    "assign_exchanges",
    "stitch_conversations",
]
