from dsm2dtm_spark.sources.manifest import SnapshotTable

__all__ = ["SnapshotTable"]
