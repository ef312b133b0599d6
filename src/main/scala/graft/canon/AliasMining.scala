package graft.canon

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mention-derived alias edges: canonicalization over what the corpus
  * actually SAYS, not just the static dictionary.
  *
  * Two linked entities whose observed surface forms normalize to the
  * same key (snake_case / camelCase / case variants collapse to one
  * lowercase-alnum string) are alias candidates — an edge into the
  * connected-components stage alongside the dictionary's shared-alias
  * edges. This is the data-scale half of canonicalization: the edge set
  * is mined from the full mention table (one distinct + one groupBy),
  * while staying LINEAR in the observed vocabulary because surfaces are
  * deduplicated before any grouping.
  *
  * Scale shape: distinct (normKey, entity) pairs are bounded by the
  * corpus vocabulary (heavy-tailed, millions — not the 10^12 mention
  * count); the star construction per key keeps edges linear in that
  * vocabulary. The groupBy partial-aggregates map-side, so one hot
  * normalized key (a ubiquitous identifier) does not skew the shuffle.
  */
object AliasMining {

  /** Normalized surface key: lowercase with underscores stripped —
    * collapses camelCase / snake_case / SCREAMING_CASE variants. */
  def normKey(c: Column): Column =
    regexp_replace(lower(c), "_", "")

  /** (src, dst) entity edges from linked identifier mentions whose
    * surfaces share a normalized key. Star per key (min entity as hub)
    * keeps the edge count linear. The hub is a window min over the key
    * — rows stay NARROW and the window buffer spills to disk on a hot
    * key, where a collect_set of a hot key's entities would buffer
    * millions of entities in ONE in-memory array on one reducer. */
  def mentionAliasEdges(linked: DataFrame): DataFrame =
    linked.filter(col("entType") === "identifier")
      .select(normKey(col("surface")).as("k"), col("entity"))
      .distinct()
      .withColumn("src",
        min(col("entity")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("k"))))
      .filter(col("src") =!= col("entity"))
      .select(col("src"), col("entity").as("dst"))
      // materialize: the edge table is vocabulary-sized and re-read
      // every CC round. (Nullability normalization happens at the
      // union site in ConnectedComponents.canonicalMap — both children
      // get the same provably-non-null shape there; the round-2 RDD
      // round-trip that re-serialized this table is gone.)
      .localCheckpoint()
}
