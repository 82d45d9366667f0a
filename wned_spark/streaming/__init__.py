"""Streaming — intentionally absent, with the receipts.

The reference is strictly batch: one JVM, one pass over the target
file (``SemanticSignatureEL.java:1147-1154``). It has no watermarks,
no event-time windows, no stateful operators; the only time in the
system is wall-clock profiling (SURVEY.md §2.10). The ``ts`` column of
the transcripts table is payload, not a processing-time dimension.

The north rule's resumability requirement ("resumes from the last
committed checkpoint snapshot") is therefore met with BATCH snapshot
commits per stage + a driver that skips completed stages
(``wned_spark/plans/catalog.py``), not with streaming state stores.

If an incremental-ingest variant is ever needed, the natural seams are:
- bronze append: ``readStream`` on the transcripts source →
  ``foreachBatch`` committing through the same Catalog;
- incremental blocking: new surfaces join the existing dictionary
  (block keys are deterministic expressions, so old keys never move);
- incremental clustering: union new match edges with the prior
  surface-cluster edge list and re-run connected components from the
  previous fixpoint (large-star/small-star converges in O(1) rounds
  when only a few edges are new).
"""
