package graft.canon

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge table via iterative
  * min-label propagation with DataFrame joins — the canonicalization
  * stage (north-star: "connected-components over an alias similarity
  * graph ... iterative DataFrame joins with salted keys").
  *
  * Algorithm: every node starts labeled with itself; each round a node
  * takes the min of its own label and its neighbors' labels; stop when
  * no label changes (or maxIter). Converges in graph-diameter rounds —
  * alias chains here have diameter <= 4; at web scale one would switch
  * the inner step to large-star/small-star (same join shapes, O(log n)
  * rounds) which this loop structure accommodates.
  *
  * Scale notes:
  *  - edges are symmetrized once, then reused each round (cache);
  *  - the join is label(node) ⋈ edges(src) — both sides hash-partition
  *    on the node key, so successive rounds reuse the same shuffle
  *    partitioning;
  *  - `localCheckpoint` cuts the lineage each round (an iterative-join
  *    loop otherwise builds an exponentially deep plan);
  *  - skew (one high-degree alias hub) is handled by AQE skew-join;
  *    labels-per-round is tiny relative to mentions so this never
  *    dominates.
  */
object ConnectedComponents {

  /** edges: DataFrame with string columns (src, dst). Returns
    * (node, component) where component = min node id in the component. */
  def run(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .cache()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint()
    var iter = 0
    var changed = 1L
    while (iter < maxIter && changed > 0) {
      val neighborMin = sym
        .join(labels, sym("dst") === labels("node"))
        .groupBy(sym("src").as("node"))
        .agg(min(col("component")).as("nmin"))
      val next = labels.as("l")
        .join(neighborMin.as("n"), Seq("node"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("nmin"), col("component")))
            .as("component"),
          (col("nmin").isNotNull && col("nmin") < col("component"))
            .cast("long").as("chg"))
        .localCheckpoint()
      // coalesce: sum over zero rows is null (empty edge table)
      changed = next.agg(coalesce(sum(col("chg")), lit(0L)))
        .head().getLong(0)
      labels = next.drop("chg")
      iter += 1
    }
    sym.unpersist()
    labels
  }

  /** Canonical map for the alias graph: entity -> canonical (min entity
    * in its shared-alias component). Input: (alias, entity) rows. */
  def canonicalMap(aliasDf: DataFrame): DataFrame = {
    // entities sharing an alias are connected: edge = (min entity of the
    // alias group, each other entity) — star construction keeps the
    // edge count linear in dictionary size.
    val star = aliasDf.groupBy("alias")
      .agg(min(col("entity")).as("src"), collect_set(col("entity")).as("all"))
      .select(col("src"), explode(col("all")).as("dst"))
      .filter(col("src") =!= col("dst"))
    val singles = aliasDf.select(col("entity").as("node")).distinct()
    val cc = run(star)
    // entities with no edges keep themselves as canonical
    singles.join(cc, Seq("node"), "left")
      .select(col("node").as("entity"),
        coalesce(col("component"), col("node")).as("canonical"))
  }
}
