"""Optional Structured-Streaming ingest mode.

The reference is strictly batch (SURVEY §2.9: no watermarks, no
streaming state; its incremental behavior is restart-based resume).
The engine's contract is likewise batch + lineage resume. This module
adds a continuous-ingest variant for deployments where transcript
partitions land continuously: the SAME extraction transform applied
via readStream + foreachBatch, reusing the batch commit protocol per
micro-batch (so resume/lineage semantics are identical).
"""
