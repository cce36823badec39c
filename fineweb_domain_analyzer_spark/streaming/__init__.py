"""Streaming — deliberately ABSENT (SURVEY.md §2.8).

The reference is batch-only: its README's "streaming" means
constant-memory file iteration, not Structured Streaming, and the
north rule specifies a resumable spark-submit BATCH job (resume =
snapshot checkpointing, see plans/checkpoint.py — not streaming
state).

If a future requirement adds continuous ingest, the pipeline stages in
plans/pipeline.py are already expressed as pure DataFrame→DataFrame
transforms, so they lift onto ``spark.readStream`` unchanged; only the
sink (writeStream + checkpointLocation) and the policy-dimension
refresh (a slowly-changing broadcast, via stream-static join) would be
new code.
"""
