package graft.queries

import graft.Pipeline
import graft.canon.ConnectedComponents
import graft.evalm.StrictMetric
import graft.extract.Extract
import graft.link.Linker
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** KG-pipeline entries (no SQL oracle — the triaffine kernel is not
  * SQL-expressible; the driver records rows-only checks and the
  * ScalaTest parity suites carry correctness: pipeline == sequential
  * twin == closed-form gold). Corpus size scales with the sf dir. */
object KgQueries {

  def nFilesFor(sfDir: String): Long =
    if (sfDir.contains("0.1")) 15000L
    else if (sfDir.contains("0.01")) 1500L
    else 150L

  type Q = (SparkSession, String) => DataFrame

  val all: Map[String, Q] = Map(
    "kg_corpus" -> ((s, d) =>
      Extract.corpus(s, nFilesFor(d)).toDF()
        .select(col("repo"), col("path"), col("commit"), col("lang"),
          col("sha256"))
        .orderBy(col("repo"), col("path"))),
    "kg_mentions" -> ((s, d) =>
      Extract.run(s, nFilesFor(d)).toDF()
        .select(col("docId"), col("sentId"), col("start"), col("end"),
          col("entType"), col("surface"))
        .orderBy(col("docId"), col("sentId"), col("start"), col("end"),
          col("entType"))),
    "kg_triples" -> ((s, d) =>
      Pipeline.run(s, nFilesFor(d)).triples
        .select(col("subj"), col("pred"), col("obj"), col("docId"))
        .orderBy(col("subj"), col("pred"), col("obj"), col("docId"))),
    "kg_canon" -> ((s, _) =>
      ConnectedComponents.canonicalMap(Linker.aliasDf(s))
        .orderBy(col("entity"))),
    "kg_eval" -> ((s, d) => {
      val n = nFilesFor(d)
      val st = Pipeline.run(s, n)
      val mT = StrictMetric.triplePrf(st.triples, Pipeline.goldTriples(s, n))
      val mM = StrictMetric.prf(st.mentions.toDF(), Pipeline.goldMentions(s, n))
      import s.implicits._
      Seq(
        ("triples", mT.correct, mT.npred, mT.ngold, mT.p, mT.r, mT.f1),
        ("mentions", mM.correct, mM.npred, mM.ngold, mM.p, mM.r, mM.f1))
        .toDF("level", "correct", "npred", "ngold", "p", "r", "f1")
        .orderBy(col("level"))
    }))
}
