package graft

import graft.core.CorpusGen
import graft.queries.KgQueries

/** K12 negative sampling (reference span_utils.py:4-40): the whole
  * expected output — positives, dilated hard negatives, and the exact
  * integer keep rule over easy negatives — recomputed locally from the
  * closed-form gold, then set-compared against the distributed query.
  * Value-exactness vs DuckDB is additionally the driver row's job;
  * this suite is the independent JVM-side recompute. */
class NegSampleSpec extends SparkSpec {

  private val sfTag = "sf0.001-local"
  private val nFiles = KgQueries.negSampleFiles(sfTag)

  private def md5h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d.take(15), 16)
  }

  /** The full sampler, driver-side, straight from the gold tables. */
  private def expectedRows(): Set[(String, Int, Int, Int, String)] = {
    val files = (0L until nFiles).map(CorpusGen.file)
    val posBySent = files.flatMap(_.mentions)
      .groupBy(m => (m.docId, m.sentId))
      .map { case (k, ms) => k -> ms.map(m => (m.start, m.end)).toSet }
    val out = Set.newBuilder[(String, Int, Int, Int, String)]
    files.foreach(_.sents.foreach { s =>
      val ps = posBySent.getOrElse((s.docId, s.sentId), Set.empty)
      val univ = for {
        st <- 0 until s.n
        e <- (st + 1) to math.min(s.n, st + 16)
      } yield (st, e)
      val roled = univ.map { case (st, e) =>
        val isPos = ps.contains((st, e))
        val near = ps.exists { case (gs, ge) =>
          (st - gs).abs + (e - ge).abs <= KgQueries.HardNegDist }
        (st, e,
          if (isPos) "pos" else if (near) "hard_neg" else "easy_neg")
      }
      val posCnt = roled.count(_._3 == "pos").toLong
      val easyCnt = roled.count(_._3 == "easy_neg").toLong
      roled.foreach { case (st, e, role) =>
        val u = md5h60(
          s"${s.docId}#${s.sentId}#$st#$e#42") % 1000000L
        // keep iff u <= pos/(1e-6+easy), multiplied through by 1e12
        if (role != "easy_neg" ||
            u * (easyCnt * 1000000L + 1L) <= posCnt * 1000000000000L)
          out += ((s.docId, s.sentId, st, e, role))
      }
    })
    out.result()
  }

  test("distributed sampler == local closed-form recompute, exactly") {
    val actual = KgQueries.all("neg_sample")(spark, sfTag)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4)))
      .toSet
    val expected = expectedRows()
    val missing = expected -- actual
    val extra = actual -- expected
    assert(missing.isEmpty && extra.isEmpty,
      s"missing=${missing.take(5)} extra=${extra.take(5)} " +
        s"(|expected|=${expected.size}, |actual|=${actual.size})")
    // the sampler must be non-trivial on this corpus: all three roles
    // present AND at least one easy negative actually dropped
    val roles = actual.groupBy(_._5).view.mapValues(_.size).toMap
    assert(roles.keySet == Set("pos", "hard_neg", "easy_neg"), roles.toString)
    val univTotal = (0L until nFiles).map(CorpusGen.file)
      .flatMap(_.sents).map { s =>
        (0 until s.n).map(st => math.min(s.n, st + 16) - st).sum }.sum
    assert(actual.size < univTotal,
      "no easy negative was dropped — the sampling predicate is inert")
    // direction guard: the easy pool is DOWNSAMPLED to roughly the
    // positive count (reference keeps an easy cell with probability
    // ~pos/easy) — the kept easy set must be a small fraction of the
    // grid, not its complement (the round-4 inversion kept ~all of it)
    assert(roles("easy_neg") * 10 < univTotal,
      s"easy negatives not downsampled: kept=${roles("easy_neg")} " +
        s"of universe $univTotal")
  }

  test("sampler is deterministic across runs (partition-stable hash uniform)") {
    val a = KgQueries.all("neg_sample")(spark, sfTag).collect().toSeq
    val b = KgQueries.all("neg_sample")(spark, sfTag).collect().toSeq
    assert(a == b)
  }
}
