package graft

import graft.extract.Extract
import graft.link.Linker
import graft.triples.TripleEmit
import org.apache.spark.sql.functions._

/** Round-6 optimization guards: the partition-local fused emitter and
  * the driver-gated dynamic canon map must be VALUE-IDENTICAL to the
  * shuffled / distributed paths they replace on the pipeline inputs
  * that use them. */
class EmitLocalSpec extends SparkSpec {

  private def canonOf(nFiles: Long) = {
    import spark.implicits._
    val linked = Linker.link(Extract.run(spark, nFiles)).toDF()
    Pipeline.canonicalize(linked, Pipeline.staticCanonMap(spark))
      .as[TripleEmit.CanonMention]
  }

  test("emitFusedLocal == emitFused == relational emit on the pipeline") {
    val canon = canonOf(120)
    val local = TripleEmit.emitFusedLocal(canon).collect().toSet
    val fused = TripleEmit.emitFused(canon).collect().toSet
    assert(local == fused)
    assert(local.nonEmpty)
    // and against the 5-branch relational emitter
    val rel = TripleEmit.emit(canon.toDF()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getDouble(4))).toSet
    assert(local.map(t => (t.subj, t.pred, t.obj, t.docId, t.score)) == rel)
  }

  test("emitFusedLocal rejects non-contiguous (shuffled-by-entity) input") {
    import spark.implicits._
    val canon = canonOf(60)
    // order by a non-doc key inside one partition: docId runs
    // interleave — the invariant is violated and must fail loudly,
    // not emit duplicate triples
    val scrambled = canon.toDF()
      .repartition(1)
      .sortWithinPartitions(col("canonical"), col("sentId"))
      .as[TripleEmit.CanonMention]
    val ex = intercept[org.apache.spark.SparkException] {
      TripleEmit.emitFusedLocal(scrambled).collect()
    }
    assert(ex.getMessage.contains("emitFusedLocal") ||
      Option(ex.getCause).exists(_.getMessage.contains("emitFusedLocal")))
  }

  test("dynamicCanonMapGated driver path == distributed dynamicCanonMap") {
    val linked = Linker.link(Extract.run(spark, 150)).toDF().persist()
    try {
      val (fast, n) = Pipeline.dynamicCanonMapGated(spark, linked)
      val fastRows = fast.collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(n == fastRows.size)
      val slow = Pipeline.dynamicCanonMap(spark, linked).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(fastRows == slow)
      assert(fastRows.nonEmpty)
    } finally { linked.unpersist(); () }
  }

  test("dynamic pipeline triples unchanged by the round-6 fast paths") {
    // end-to-end: dynamic-canon pipeline (gated canon + local emit)
    // still equals the static-canon pipeline's triples on this corpus
    // (the round-5 property PipelineSpec pins for the old chain)
    val dyn = Pipeline.runDynamicCanon(spark, 100).triples.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    val static0 = Pipeline.run(spark, 100).triples.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(dyn == static0)
    assert(dyn.nonEmpty)
  }
}
