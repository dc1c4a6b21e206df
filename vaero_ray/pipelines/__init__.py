from vaero_ray.pipelines.derived import derive_transcripts, TRANSCRIPTS_CTE

__all__ = ["derive_transcripts", "TRANSCRIPTS_CTE"]
