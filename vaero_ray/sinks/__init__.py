from vaero_ray.sinks.parquet_sink import derive_prefix, write_partitioned

__all__ = ["derive_prefix", "write_partitioned"]
