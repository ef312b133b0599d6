package graft.link

import graft.core.{LinkedMention, Mention, Vocab}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Entity linking: candidate generation via a broadcast alias-dictionary
  * hash join, then deterministic link scoring and per-mention argmax
  * (north-star: "candidate generation via broadcast dictionary hash
  * join, then batched link-scoring"; reference analog: the word->id
  * dictionary lookup with UNK fallback, /root/reference/data_util.py:298-321).
  *
  * Scale notes: the dictionary is a small dimension table — broadcast,
  * never shuffled. The mention side stays partitioned as produced by
  * the extract stage; the join is map-side. The per-mention argmax is a
  * window over the mention key, which AQE handles without a full
  * repartition because candidates-per-mention is tiny (<= 8).
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

  /** Alias dictionary as a DataFrame (alias, entity). */
  def aliasDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Vocab.aliasRows.toDF("alias", "entity")
  }

  /** Char-bigram set of a string column — pure column math, no UDF
    * (SURVEY §2.7 preference). */
  private def grams(c: org.apache.spark.sql.Column) =
    array_distinct(transform(
      sequence(lit(1), greatest(length(c) - 1, lit(1))),
      i => c.substr(i, lit(2))))

  def link(mentions: Dataset[Mention]): Dataset[LinkedMention] = {
    val spark = mentions.sparkSession
    import spark.implicits._
    val withKey = mentions.withColumn("linkKey", linkKeyCol)
    val cands = withKey.join(
      broadcast(aliasDf(spark)),
      withKey("linkKey") === col("alias"), "left")
    // link score: Dice coefficient over char bigram sets of key vs entity
    val lk = lower(col("linkKey"))
    val le = lower(col("entity"))
    val scored = cands.withColumn("linkScore",
      when(col("entity").isNull, lit(0.0)).otherwise(
        lit(2.0) * size(array_intersect(grams(lk), grams(le))) /
          (size(grams(lk)) + size(grams(le)))))
    // per-mention argmax, deterministic tie-break on entity name
    val w = Window
      .partitionBy("docId", "sentId", "start", "end", "entType")
      .orderBy(desc("linkScore"), asc("entity"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("docId"), col("sentId"), col("start"), col("end"),
        col("entType"), col("surface"),
        coalesce(col("entity"), col("linkKey")).as("entity"),
        col("linkScore"))
      .as[LinkedMention]
  }
}
