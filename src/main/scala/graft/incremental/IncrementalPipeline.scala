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
  * Scale shape: change detection is one left_anti equi-join of
  * compact (repo, path, sha256) rows per side — no content ever
  * shuffles; extraction then runs only on the changed slice, and the
  * splice is a second left_anti join keyed on docId.
  */
object IncrementalPipeline {

  private val key = Seq("repo", "path", "sha256")

  /** Files of `cur` that are NEW or CONTENT-CHANGED vs `prev`:
    * left_anti on (repo, path, sha256). */
  def changedFiles(cur: Dataset[SourceFileHashed],
      prev: Dataset[SourceFileHashed]): Dataset[SourceFileHashed] = {
    import cur.sparkSession.implicits._
    cur.join(prev.toDF().select(key.map(col): _*), key, "left_anti")
      .as[SourceFileHashed]
  }

  /** docIds whose `prev` version is no longer current (modified OR
    * removed) — their old triples must be dropped. */
  def staleDocIds(cur: Dataset[SourceFileHashed],
      prev: Dataset[SourceFileHashed]): DataFrame =
    prev.toDF().join(cur.toDF().select(key.map(col): _*), key, "left_anti")
      .select(concat(col("repo"), lit("/"), col("path")).as("docId"))
      .distinct()

  /** Triples of the `cur` snapshot, computed incrementally from the
    * `prev` snapshot's triples: keep prev triples of unchanged docs,
    * re-extract only the changed slice. Equals the full recompute of
    * `cur` exactly (IncrementalSpec). */
  def incrementalTriples(prevTriples: DataFrame,
      prev: Dataset[SourceFileHashed],
      cur: Dataset[SourceFileHashed]): DataFrame = {
    // the join key moves docId to the front — restore the caller's
    // column order so positional consumers (unions, parquet appends)
    // see the same schema as a full recompute
    val kept = prevTriples.join(staleDocIds(cur, prev), Seq("docId"),
      "left_anti")
    val fresh = Pipeline.triplesFor(changedFiles(cur, prev))
    kept.unionByName(fresh.select(kept.columns.map(col): _*))
      .select(prevTriples.columns.map(col): _*)
  }
}
