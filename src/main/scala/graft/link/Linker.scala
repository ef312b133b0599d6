package graft.link

import graft.core.{LinkedMention, Mention, Vocab}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Entity linking: candidate generation via a broadcast alias-dictionary
  * hash join + deterministic link scoring (north-star: "candidate
  * generation via broadcast dictionary hash join, then batched
  * link-scoring"; reference analog: the word->id dictionary lookup with
  * UNK fallback, /root/reference/data_util.py:298-321).
  *
  * Scale design: the candidate argmax collapses to the DICTIONARY side —
  * our link key matches aliases exactly, so "best candidate for this
  * mention" is a pure function of the alias. The per-alias best entity
  * (Dice-scored) is precomputed once on the tiny dimension table and
  * broadcast; linking the mention table is then a single map-side hash
  * join with NO shuffle and NO per-mention window. (A fuzzy linker —
  * edit-distance candidates — would reintroduce per-mention scoring;
  * the `linkScore` column and the Dice function keep that seam open.)
  */
object Linker {

  /** Link key per mention: api_symbol -> last path token; signature ->
    * the function name (first token); everything else -> the surface. */
  def linkKeyCol: org.apache.spark.sql.Column =
    when(col("entType") === "api_symbol",
      element_at(split(col("surface"), " "), -1))
      .when(col("entType") === "signature",
        element_at(split(col("surface"), " "), 1))
      .otherwise(col("surface"))

  /** Dice coefficient over char bigram sets (lowercased). */
  def dice(a: String, b: String): Double = {
    def grams(s: String): Set[String] = {
      val t = s.toLowerCase
      if (t.length < 2) Set(t) else t.sliding(2).toSet
    }
    val (ga, gb) = (grams(a), grams(b))
    2.0 * (ga & gb).size / (ga.size + gb.size)
  }

  /** Alias dictionary as a DataFrame (alias, entity) — all candidates. */
  def aliasDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Vocab.aliasRows.toDF("alias", "entity")
  }

  /** Per-alias best candidate (max Dice, tie -> lexicographic min). */
  lazy val aliasBest: Vector[(String, String, Double)] =
    Vocab.aliasToEntities.map { case (a, ents) =>
      val (e, s) = ents.map(e => (e, dice(a, e)))
        .minBy { case (e, s) => (-s, e) }
      (a, e, s)
    }.toVector.sortBy(_._1)

  def aliasBestDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    aliasBest.toDF("alias", "entity", "aliasScore")
  }

  /** Mentions -> linked mentions: one broadcast hash join, map-side. */
  def link(mentions: Dataset[Mention]): Dataset[LinkedMention] = {
    val spark = mentions.sparkSession
    import spark.implicits._
    val withKey = mentions.withColumn("linkKey", linkKeyCol)
    withKey.join(broadcast(aliasBestDf(spark)),
      withKey("linkKey") === col("alias"), "left")
      .select(col("docId"), col("sentId"), col("start"), col("end"),
        col("entType"), col("surface"),
        coalesce(col("entity"), col("linkKey")).as("entity"),
        coalesce(col("aliasScore"), lit(0.0)).as("linkScore"),
        col("nextTok"))
      .as[LinkedMention]
  }
}
