package graft

import graft.canon.ConnectedComponents
import graft.core._
import graft.extract.Extract
import graft.link.Linker
import graft.triples.TripleEmit
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end KG-construction pipeline (the flagship query,
  * SURVEY §3.2): source table -> sentences -> triaffine extract ->
  * link -> canonicalize -> triples. */
object Pipeline {

  final case class Stages(
      files: Dataset[SourceFileHashed],
      sentences: Dataset[Sentence],
      mentions: Dataset[Mention],
      canonMentions: DataFrame,
      triples: DataFrame)

  def run(spark: SparkSession, nFiles: Long,
      verifySha: Boolean = false): Stages = {
    import spark.implicits._
    val files = Extract.corpus(spark, nFiles)
    if (verifySha) Extract.verifyIntegrity(files)
    val sents = Extract.sentences(files).cache()
    val ments = Extract.mentions(sents)
      .dropDuplicates("docId", "sentId", "start", "end", "entType")
      .as[Mention]
    val linked = Linker.link(ments)
    // canonical map is a small dimension table -> broadcast join
    val canonMap = ConnectedComponents.canonicalMap(
      Linker.aliasDf(spark))
    val canon = linked.join(broadcast(canonMap),
      linked("entity") === canonMap("entity"), "left")
      .select(linked("*"),
        coalesce(col("canonical"), linked("entity")).as("canonical"))
    val triples = TripleEmit.emit(canon, sents)
    Stages(files, sents, ments, canon, triples)
  }

  /** Gold triples for the same corpus slice (closed-form). */
  def goldTriples(spark: SparkSession, nFiles: Long): DataFrame = {
    import spark.implicits._
    spark.range(nFiles).flatMap(id => CorpusGen.file(id).triples)
      .toDF().dropDuplicates("subj", "pred", "obj", "docId")
  }

  /** Gold mentions for the same corpus slice (closed-form). */
  def goldMentions(spark: SparkSession, nFiles: Long): DataFrame = {
    import spark.implicits._
    spark.range(nFiles).flatMap(id => CorpusGen.file(id).mentions)
      .toDF().withColumnRenamed("entType", "entType")
  }
}
