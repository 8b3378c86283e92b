"""ordinarydumpdeduplicator_spark — PySpark-native near-duplicate engine.

A from-scratch, Spark-first reimplementation of the query/data-processing
capabilities of the reference ``pavel-akhrameev/OrdinaryDumpDeduplicator``
(C# library, read-only at /root/reference), generalized from exact-content
file deduplication to near-duplicate detection + clustering over an
image+caption corpus:

- exact dedup: content key = (size, sha256) — mirrors ``BlobInfo`` equality
  (Common/BlobInfo.cs:143-164)
- near dedup: MinHash over caption shingles + LSH banding; SimHash/phash
  Hamming bands for images; verified candidate pairs -> distributed
  connected components -> cluster assignments
- versioned state: append-only runs/states tables with latest-run window
  filters and New/Unchanged/Modified/Removed/Moved derivation — mirrors
  ``Inspection``/``FileState`` (Common/Inspection.cs:7-29,
  Common/FileState.cs:7-28)
- reports: per-cluster flag truth table, reclaimable-size metrics, sort
  orders and hierarchy rollups — mirrors ``SameContentFilesInfo`` /
  ``DuplicateReport`` (OrdinaryDumpDeduplicator/SameContentFilesInfo.cs:209-248,
  DuplicateReport.cs:74-142)

All heavy computation is DataFrame/SQL (Catalyst-optimized); Python appears
only in vectorized Arrow/pandas UDFs (MinHash signatures, image decode).
"""

__version__ = "0.1.0"
