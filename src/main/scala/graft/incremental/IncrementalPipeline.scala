package graft.incremental

import graft.Pipeline
import graft.core.SourceFileHashed
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Incremental snapshot processing: extract ONLY the files whose
  * content changed between two corpus snapshots, and splice their
  * triples into the previous result.
  *
  * At 10^12-file scale the dominant cost of a re-run is re-scoring
  * files that did not change; the per-row sha256 the input contract
  * carries (BASELINE.json input_hint) is exactly the change detector.
  * Correctness rests on the pipeline being doc-local end-to-end:
  * extraction, linking, and triple emission are pure functions of one
  * file's content (the canonical map is a static dimension), so
  * replacing a stale doc's triples with its re-extraction is EXACTLY
  * a full recompute of the new snapshot — asserted, including
  * modified and removed files, in IncrementalSpec.
  *
  * Under a MINED (dynamic) canon map a delta is NOT doc-local — one
  * new alias can relabel entities mentioned by unchanged docs. That
  * path is served by [[graft.streaming.StreamingPipeline
  * .publishSnapshotDynamicIncremental]]: deltas flow through the
  * batchId-partitioned accumulation layout (batch users write one
  * batch per snapshot — Bench's publish section does exactly that),
  * the pair-refcount canon state bounds each publish to the delta
  * plus the relabeled docs, and alias RETRACTION falls back to the
  * full recompute.
  *
  * Scale shape: change detection is one left_anti equi-join of
  * compact (repo, path, sha256) rows per side — no content ever
  * shuffles; extraction then runs only on the changed slice, and the
  * splice is a second left_anti join keyed on docId.
  */
object IncrementalPipeline {

  private val key = Seq("repo", "path", "sha256")

  /** Compact (repo, path, sha256) keys of `cur` rows that are NEW or
    * CONTENT-CHANGED vs `prev` — the change-detection anti-join runs
    * on KEY PROJECTIONS of both sides, so no content column ever
    * enters this shuffle. */
  def changedKeys(cur: Dataset[SourceFileHashed],
      prev: Dataset[SourceFileHashed]): org.apache.spark.sql.DataFrame =
    cur.toDF().select(key.map(col): _*)
      .join(prev.toDF().select(key.map(col): _*), key, "left_anti")

  /** Files of `cur` that are NEW or CONTENT-CHANGED vs `prev`.
    * Two-step shape so the wide content rows stay put in the common
    * case: the anti-join above shuffles only compact keys; the
    * semi-join back against `cur` carries no broadcast hint, so AQE
    * broadcasts the (typically tiny) changed-key delta and `cur`'s
    * content never shuffles. When the delta IS corpus-sized (a full
    * re-ingest) the semi-join falls back to a shuffle — bounded by the
    * re-extraction work that run must do anyway. A single direct
    * anti-join of `cur` against prev's keys would instead sort-merge
    * against a corpus-sized right side EVERY run, shuffling the whole
    * snapshot's content even when nothing changed. */
  def changedFiles(cur: Dataset[SourceFileHashed],
      prev: Dataset[SourceFileHashed]): Dataset[SourceFileHashed] = {
    import cur.sparkSession.implicits._
    cur.join(changedKeys(cur, prev), key, "left_semi")
      .as[SourceFileHashed]
  }

  /** docIds whose `prev` version is no longer current (modified OR
    * removed) — their old triples must be dropped. Key projections on
    * both sides, same as [[changedKeys]]. */
  def staleDocIds(cur: Dataset[SourceFileHashed],
      prev: Dataset[SourceFileHashed]): DataFrame =
    prev.toDF().select(key.map(col): _*)
      .join(cur.toDF().select(key.map(col): _*), key, "left_anti")
      .select(graft.core.DocId.column.as("docId"))
      .distinct()

  /** Triples of the `cur` snapshot, computed incrementally from the
    * `prev` snapshot's triples: keep prev triples of unchanged docs,
    * re-extract only the changed slice. Equals the full recompute of
    * `cur` exactly (IncrementalSpec). */
  def incrementalTriples(prevTriples: DataFrame,
      prev: Dataset[SourceFileHashed],
      cur: Dataset[SourceFileHashed]): DataFrame = {
    // a using-column join surfaces the key column first — restore the
    // caller's column order so positional consumers (exceptAll,
    // parquet appends) see the same schema as a full recompute
    val kept = prevTriples.join(staleDocIds(cur, prev), Seq("docId"),
      "left_anti")
    kept.unionByName(Pipeline.triplesFor(changedFiles(cur, prev)))
      .select(prevTriples.columns.map(col): _*)
  }
}
