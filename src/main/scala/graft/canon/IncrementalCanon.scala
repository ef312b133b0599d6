package graft.canon

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DELTA-AWARE dynamic canonicalization — the mined-canon path made
  * incremental (round-4 "what's missing" #1).
  *
  * The full dynamic pipeline re-mines alias edges and re-runs
  * connected components over the ENTIRE accumulated mention table on
  * every snapshot publish, so publish cost grows with total corpus,
  * not with the delta. This module maintains instead:
  *
  *  - a PAIR-REFCOUNT table `(k, entity, ndocs)`: how many CURRENT
  *    docs carry the distinct alias pair (normKey(surface), entity) —
  *    exactly the pairs [[AliasMining.mentionAliasEdges]] mines edges
  *    from, counted per doc so retraction is detectable;
  *  - the prior snapshot's canon map, which IS a star forest (every
  *    entity points at its component minimum).
  *
  * An ingest delta then updates canonicalization by seeding CC with
  * the prior forest plus one connecting edge per ADDED pair
  * ([[seededCanonMap]]) — a mostly-converged input that fixpoints in
  * ~2 rounds (or the driver union-find under the size gate) — and the
  * publish re-emits only docs whose mentions touch entities whose
  * label CHANGED ([[changedEntities]]).
  *
  * Soundness: under pure alias ADDS the seeded graph has exactly the
  * full graph's components — the forest preserves every prior
  * connection (prior edges are a subset of current evidence when
  * nothing was retracted, dictionary edges are static and inside the
  * forest's components), and each added pair's entity is connected to
  * its key's hub (the prior min entity of the key, or the added min
  * for a novel key), which the prior forest already connects to every
  * other entity of that key. When any pair's refcount hits ZERO
  * (alias evidence RETRACTED — an edge removal can split a component,
  * which no seed-and-merge can express), the caller must fall back to
  * the full recompute; [[mergePairs]] surfaces that as
  * `removedCount`. Retraction requires a re-ingest that drops a
  * surface form's last occurrence — rare at corpus scale, and the
  * fallback is exactly the cost the non-incremental path paid on
  * EVERY publish.
  */
object IncrementalCanon {

  /** Per-doc distinct alias pairs (k, entity, docId) of a linked
    * mention table — the unit the refcounts count. Must match
    * [[AliasMining.mentionAliasEdges]]'s pair definition exactly
    * (identifier mentions, normalized surface key), or the
    * incremental edge set drifts from the mined one. */
  def docPairs(linked: DataFrame): DataFrame =
    linked.filter(col("entType") === "identifier")
      .select(AliasMining.normKey(col("surface")).as("k"), col("entity"),
        col("docId"))
      .distinct()

  /** Refcounts (k, entity, ndocs) over per-doc pairs. */
  def pairCounts(pairs: DataFrame): DataFrame =
    pairs.groupBy(col("k"), col("entity"))
      .agg(count(lit(1)).as("ndocs"))

  final case class PairDelta(
      merged: DataFrame,  // (k, entity, ndocs) — the new state, ndocs > 0
      added: DataFrame,   // (k, entity) — pairs absent before, present now
      changed: DataFrame, // (k, entity, ndocs) — rows whose count CHANGED
                          // (new or re-counted): merged == prior overridden
                          // by changed, which is what lets the caller write
                          // a delta-sized state instead of `merged`
      removedCount: Long) // pairs whose evidence vanished (>0 => fallback)

  /** Merge prior refcounts with increments (per-doc pairs of newly
    * ingested doc VERSIONS) and decrements (per-doc pairs of the
    * superseded OLD versions of re-ingested docs). A net count below
    * zero means the caller decremented something never counted —
    * corrupted state — and fails loudly. */
  def mergePairs(prior: DataFrame, incPairs: DataFrame,
      decPairs: DataFrame): PairDelta = {
    val i = pairCounts(incPairs).withColumnRenamed("ndocs", "inc")
    val d = pairCounts(decPairs).withColumnRenamed("ndocs", "dec")
    val key = Seq("k", "entity")
    // materialize once: read for the corruption check, the removed
    // count, the added set, and the new state
    val merged0 = prior.withColumnRenamed("ndocs", "prior_n")
      .join(i, key, "full_outer")
      .join(d, key, "full_outer")
      .select(col("k"), col("entity"),
        coalesce(col("prior_n"), lit(0L)).as("prior_n"),
        (coalesce(col("prior_n"), lit(0L)) + coalesce(col("inc"), lit(0L))
          - coalesce(col("dec"), lit(0L))).as("ndocs"))
      .localCheckpoint()
    val r = merged0.agg(
      sum(when(col("ndocs") < 0, 1L).otherwise(0L)),
      sum(when(col("prior_n") > 0 && col("ndocs") <= 0, 1L).otherwise(0L)))
      .head()
    val negative = if (r.isNullAt(0)) 0L else r.getLong(0)
    require(negative == 0L,
      s"pair-refcount state corrupted: $negative pairs went negative " +
        "(a decrement was never counted — state and accumulation diverged)")
    PairDelta(
      merged = merged0.filter(col("ndocs") > 0)
        .select(col("k"), col("entity"), col("ndocs")),
      added = merged0.filter(col("prior_n") === 0 && col("ndocs") > 0)
        .select(col("k"), col("entity")),
      changed = merged0
        .filter(col("ndocs") > 0 && col("ndocs") =!= col("prior_n"))
        .select(col("k"), col("entity"), col("ndocs")),
      removedCount = if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** New canon map from the prior snapshot's map (a star forest) plus
    * connecting edges for the ADDED pairs — valid ONLY when
    * [[mergePairs]] reported zero removals. Each added pair's entity
    * gets one edge to its key's hub: the key's prior minimum entity
    * (already inside that key's prior component) or, for a novel key,
    * the minimum ADDED entity of the key. CC over forest+edges then
    * relabels; entities of neither table keep themselves (the same
    * singles fallback as [[ConnectedComponents.canonicalMap]]). */
  def seededCanonMap(priorCanon: DataFrame, priorPairs: DataFrame,
      added: DataFrame): DataFrame = {
    // uniform provably-non-null union children (the Catalyst 4.1
    // constraint-rewrite bug — see ConnectedComponents.canonicalMap)
    def nn(df: DataFrame): DataFrame = df.select(
      coalesce(col("src"), lit("")).as("src"),
      coalesce(col("dst"), lit("")).as("dst"))
    val forest = priorCanon.filter(col("entity") =!= col("canonical"))
      .select(col("canonical").as("src"), col("entity").as("dst"))
    val hubs = priorPairs.groupBy(col("k")).agg(min(col("entity")).as("hub"))
    val newHubs = added.groupBy(col("k")).agg(min(col("entity")).as("nhub"))
    val edges = added
      .join(hubs, Seq("k"), "left")
      .join(newHubs, Seq("k"), "left")
      .select(coalesce(col("hub"), col("nhub")).as("src"),
        col("entity").as("dst"))
      .filter(col("src") =!= col("dst"))
      // read by the node-set union below AND the CC loop
      .localCheckpoint()
    // node set: prior map entities, added entities, AND the edge
    // endpoints — a hub can be a pair entity that was a SINGLETON for
    // its key before (never an edge endpoint, so absent from the prior
    // map); dropping it from the nodes would leave it self-canonical
    // while its new neighbors relabel to the component minimum
    val nodes = priorCanon.select(col("entity").as("node"))
      .union(added.select(col("entity").as("node")))
      .union(edges.select(col("src").as("node")))
      .union(edges.select(col("dst").as("node")))
      .distinct()
    val cc = ConnectedComponents.run(nn(forest).union(nn(edges)))
    nodes.join(cc, Seq("node"), "left")
      .select(col("node").as("entity"),
        coalesce(col("component"), col("node")).as("canonical"))
  }

  /** Entities whose canonical label differs between two maps (an
    * entity absent from a map is self-canonical there — the same
    * fallback rule [[graft.Pipeline.canonicalize]] applies). Only
    * docs mentioning these entities can have changed triples. */
  def changedEntities(newMap: DataFrame, oldMap: DataFrame): DataFrame =
    newMap
      .join(oldMap.withColumnRenamed("canonical", "old_canonical"),
        Seq("entity"), "full_outer")
      .filter(coalesce(col("canonical"), col("entity")) =!=
        coalesce(col("old_canonical"), col("entity")))
      .select(col("entity"))
}
