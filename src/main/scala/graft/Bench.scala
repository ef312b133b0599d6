package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Benchmark harness (driver-run per round -> BENCH_r{N}.json).
  *
  * Four sections, one JSON line out:
  *  1. headline operator queries at SPARK_GRAFT_CPUS on the sf dir;
  *  2. KG-pipeline throughput (triples/sec) at SPARK_GRAFT_CPUS,
  *     reading a MATERIALIZED parquet source table (the north-star
  *     pipeline reads the Iceberg source-code table; deterministic
  *     synthesis is data prep and is excluded from the timed job) —
  *     DYNAMIC canon, so the mined-canonicalization stage is inside
  *     the measurement; 2b. frozen-encoder cache re-run (S3) — warm
  *     re-score from the encoding cache vs a cold run over the same
  *     slice;
  *  3. two-cluster-size scaling evidence. BASELINE.md: a real
  *     multi-executor cluster is unavailable in this sandbox, so the
  *     north rule's N-vs-4N-executor criterion is evidenced at two
  *     parallelism levels on the same input — local[1] vs local[4] by
  *     default (SPARK_GRAFT_SCALE_N). On a real cluster the 4N
  *     executors are independent JVMs with independent heaps; in
  *     local mode all threads share ONE heap, so the measurement must
  *     stay in the host's linear region or it reads single-JVM
  *     allocator/GC contention instead of the pipeline's parallel
  *     structure. Round 1/2 used local[2] vs local[8] with that caveat
  *     documented; round 3's dynamic-canon pipeline allocates more
  *     per row (columnar cache build + mining), and at 8 shared-heap
  *     threads the measured excess over a 2-thread extrapolation
  *     reached 8-10s (same code, static pipeline swung 19-30s at
  *     local[8] across adjacent trials) — the 2->8 ratio was
  *     measuring the heap, not the plan. local[1] vs local[4] sits
  *     well inside the linear region (measured dynamic eff 0.85 vs
  *     0.65-0.80 at 2->8 on identical code). eff = (tps_4N / tps_N)
  *     / 4, best-of-trials per configuration after a JIT warm-up
  *     (bursty CPU steal on the shared host otherwise corrupts
  *     single-shot measurements); the scaling section uses
  *     max(3, trials/2) trials per configuration (override:
  *     SPARK_GRAFT_SCALE_TRIALS) — the local[1] leg is long and
  *     averages over interference windows naturally, but the short
  *     leg needs at least 3 interleaved trials to ride out one
  *     sustained steal window.
  */
object Bench {

  private[graft] def session(cores: Int, app: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(app)
      .config("spark.sql.shuffle.partitions", cores * 2)
      .config("spark.sql.adaptive.enabled", "true")
      // split parquet scans finer than the 128m default: the corpus
      // and encoding-cache tables are a few hundred MB here, and the
      // default packs them into ~6 splits — every NARROW stage
      // downstream of a scan (kernel, cache re-score) then runs
      // 6-wide on a 32-core box. 16m keeps scan-rooted stages at
      // full parallelism at this data size; on a real cluster the
      // same knob is sized to executor memory (see README scale
      // notes).
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Refresh a data dir's staleness lease. The /tmp sweep deletes
    * COMPLETE corpus/cache dirs of other versions once their mtime is
    * older than 2h; a concurrent bench still mid-read on such a dir
    * would lose parquet files under its scans, so EVERY section that
    * reads a dir touches it at its start, and every pipeline/scaling
    * trial re-touches (one slow leg alone can approach the staleness
    * age at large SCALE_FILES). One greppable call site per read. */
  private def touchLease(path: String): Unit = {
    new java.io.File(path).setLastModified(System.currentTimeMillis())
    ()
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  // -- host-pressure capture (round-4 VERDICT: a contended trial must
  // -- carry its CAUSE in the artifact, not just the symptom) --------

  private def procStat(): Option[Array[Long]] =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try Some(src.getLines().next().trim.split("\\s+").drop(1)
        .map(_.toLong))
      finally src.close()
    } catch { case _: Throwable => None }

  private def loadavg1(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.split(" ")(0).toDouble finally src.close()
    } catch { case _: Throwable => -1.0 }

  /** CPU-steal share (%) between two /proc/stat snapshots — the
    * firecracker host's interference signal. -1 when unreadable. */
  private def stealPct(a: Option[Array[Long]], b: Option[Array[Long]])
      : Double = (a, b) match {
    case (Some(x), Some(y)) if x.length >= 8 && y.length >= 8 =>
      val n = math.min(x.length, y.length)
      val tot = (0 until n).map(i => y(i) - x(i)).sum
      if (tot <= 0) -1.0 else 100.0 * (y(7) - x(7)) / tot
    case _ => -1.0
  }

  /** Timed trial with host pressure: (result, sec, stealPct, load1). */
  private[graft] def timedP[A](f: => A): (A, Double, Double, Double) = {
    val ld = loadavg1()
    val s0 = procStat()
    val (a, sec) = time(f)
    (a, sec, stealPct(s0, procStat()), ld)
  }

  private[graft] def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) -1.0
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  private[graft] def jArr(xs: Seq[Double]): String = xs.mkString("[", ",", "]")

  /** One N-vs-4N scaling row: per-config warm-up, then `nTrials`
    * INTERLEAVED trials (N, 4N, N, 4N, …) so a sustained CPU-steal
    * window degrades both sides of the ratio instead of silently
    * halving one. Returns (per-config (n, triples, trial secs),
    * best-of efficiency, median efficiency) — the artifact carries the
    * full trial lists, so an interference window is VISIBLE in the
    * JSON instead of masquerading as a scaling regression. */
  private final case class ScRow(n: Int, triples: Long, secs: Seq[Double],
      steals: Seq[Double], loads: Seq[Double])

  private def scalingRow(corpusPath: String, baseN: Int, nTrials: Int)
      : (Seq[ScRow], Double, Double) = {
    val configs = Seq(baseN, 4 * baseN)
    configs.foreach { n =>
      // the warm-up legs read the whole corpus too — refresh the lease
      // here as well, or the untouched window (last prior trial + both
      // warm-ups) can cross the 2h sweep age at large SCALE_FILES
      touchLease(corpusPath)
      val s = session(n, s"graft-scale-warm-$n")
      Pipeline.runFromTableDynamic(s, corpusPath).triples.count()
      s.stop()
    }
    val timed = (1 to nTrials).flatMap { _ =>
      configs.map { n =>
        // refresh the corpus lease per trial: the slow leg alone can
        // approach the 2h sweep age at large SCALE_FILES
        touchLease(corpusPath)
        val s = session(n, s"graft-scale-$n")
        val r = timedP(
          Pipeline.runFromTableDynamic(s, corpusPath).triples.count())
        s.stop()
        (n, r._1, r._2, r._3, r._4)
      }
    }
    val rows = configs.map { n =>
      val rs = timed.filter(_._1 == n)
      ScRow(n, rs.head._2, rs.map(_._3), rs.map(_._4), rs.map(_._5))
    }
    def effOf(f: Seq[Double] => Double): Double = {
      val lo = rows.head; val hi = rows.last
      ((hi.triples / f(hi.secs)) / (lo.triples / f(lo.secs))) /
        (hi.n.toDouble / lo.n)
    }
    (rows, effOf(_.min), effOf(median))
  }

  private def scRowJson(rows: Seq[ScRow]): String =
    rows.map { r =>
      val best = r.secs.min
      s""""local_${r.n}":{"triples":${r.triples},"sec":$best,""" +
        s""""sec_trials":${jArr(r.secs)},"sec_median":${median(r.secs)},""" +
        s""""steal_pct_trials":${jArr(r.steals)},""" +
        s""""load1_trials":${jArr(r.loads)},""" +
        s""""triples_per_sec":${r.triples / best}}"""
    }.mkString(",")

  /** Representative operator subset (full coverage runs in Verify). */
  private val headline = Seq(
    "q1_agg", "topk_window", "containment_join", "dedup_minhash",
    "ann_topk", "text_stats", "vocab_build", "kg_mentions", "kg_triples")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val scaleFiles = sys.env.getOrElse("SPARK_GRAFT_SCALE_FILES", "320000").toLong
    val trials = math.max(1, sys.env.getOrElse("SPARK_GRAFT_TRIALS", "4").toInt)
    val scaleN = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "1").toInt
    val skipHeadline = sys.env.contains("SPARK_GRAFT_SKIP_HEADLINE")
    // content-versioned cache key: a generator/grammar change must not
    // silently reuse a stale materialized corpus from a previous round.
    // Several probe files are hashed (not just file 0) so a change that
    // happens to leave one file's content intact still rolls the key.
    val corpusVer = {
      val probe = Seq(0L, 1L, 12345L, 271828L)
        .map(i => graft.core.CorpusGen.file(i).source.sha256).mkString
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(probe.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
    }
    val corpusPath = s"/tmp/graft_bench_corpus_${scaleFiles}_$corpusVer"

    // 1: headline queries at `cpus` (after a JIT/codegen warm-up so
    // first-position queries aren't charged for kernel compilation)
    var spark = session(cpus, "graft-bench")
    if (!skipHeadline) {
      Pipeline.run(spark, 2000).triples.count()
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    }
    // best-of-`trials` per query, cache cleared between trials: a
    // single bursty-steal window on the shared host otherwise corrupts
    // that query's number for the whole round (observed 2x)
    val qTimes = (if (skipHeadline) Seq.empty[String] else headline).map { n =>
      val ts = (1 to trials).flatMap { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(n)(spark, sfDir).count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          // a fast-failing trial must NOT win the min — only successful
          // trials count; -1 marks a query whose every trial failed
          System.err.println(s"[bench] $n failed: ${e.getMessage}"); None }
      }
      n -> (if (ts.isEmpty) -1.0 else ts.min)
    }
    // data prep (untimed): materialize the source table once. _SUCCESS
    // is the completion marker — a bench killed mid-write otherwise
    // leaves a partial dir every later round silently benchmarks.
    // Stale dirs (other content versions, partials) are removed first:
    // each generator change rolls the key and would leak a multi-GB
    // /tmp dir per round forever.
    if (!Files.exists(Paths.get(corpusPath, "_SUCCESS"))) {
      // Sweep rules: partial dirs (no _SUCCESS) always go; a COMPLETE
      // stale-versioned corpus is deleted only when old enough that no
      // concurrent bench on this host can still be mid-read on it
      // (deleting a live one would fail that run or feed it a partial
      // table). The current key's own dir is always fair game.
      val staleAgeMs = 2L * 3600 * 1000    // complete, other version
      val partialAgeMs = 30L * 60 * 1000   // mid-write by a live run?
      val now = System.currentTimeMillis()
      Option(new java.io.File("/tmp").listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith(s"graft_bench_corpus_${scaleFiles}_"))
        .filter { d =>
          val age = now - d.lastModified()
          val complete = new java.io.File(d, "_SUCCESS").exists()
          d.getName == s"graft_bench_corpus_${scaleFiles}_$corpusVer" ||
            (!complete && age > partialAgeMs) ||
            (complete && age > staleAgeMs)
        }
        .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
      Extract.corpusWrite(spark, scaleFiles, corpusPath)
    }
    // lease touch: the stale sweep keys COMPLETE dirs on mtime, so every
    // section that READS a dir refreshes it at its start (and every
    // scaling/pipeline trial re-touches) — a concurrent bench's sweep
    // would otherwise delete a corpus mid-read once any single section
    // stretches past the 2h staleness age at large SCALE_FILES.
    touchLease(corpusPath)
    // 2: pipeline throughput at `cpus` (best of `trials`) — the
    // DYNAMIC-canon variant: the canonical map is mined from the corpus
    // (AliasMining + CC) inside the timed run, so canonicalization is
    // measured as a data-scale stage, not a prebuilt dimension.
    // clearCache + gc between trials: each run leaves localCheckpoint
    // blocks (mined edges, canon map, triples) that are only released
    // when their RDDs are garbage-collected — without the nudge,
    // storage accumulates across trials and later trials degrade into
    // eviction/spill churn (observed 20s -> 80s by trial 3).
    def pipeTrial(): (Long, Double, Double, Double) = {
      spark.catalog.clearCache()
      System.gc()
      touchLease(corpusPath)
      timedP(Pipeline.runFromTableDynamic(spark, corpusPath).triples.count())
    }
    Pipeline.runFromTableDynamic(spark, corpusPath).triples.count() // warm
    var runs = (1 to trials).map(_ => pipeTrial())
    // auto-extend: median/min > 1.5 means at least one trial landed in
    // a contention window (BENCH_r04 recorded 2/4 such trials) — buy up
    // to 2 extra trials so the artifact's median is not hostage to one
    // bad window; the per-trial steal/load arrays carry the cause
    // either way
    var extended = 0
    while (extended < 2 && runs.size > 1 &&
        median(runs.map(_._2)) > 1.5 * runs.map(_._2).min) {
      runs = runs :+ pipeTrial(); extended += 1
    }
    val nTriples = runs.head._1
    val pipeSecs = runs.map(_._2)
    val pipeSteal = runs.map(_._3)
    val pipeLoad = runs.map(_._4)
    val tPipe = pipeSecs.min
    val tpsCpus = nTriples / tPipe
    // static-canon reference (the r1/r2-comparable number): same
    // pipeline with the prebuilt dictionary canon map. Half the trial
    // budget — it is a reference row, not the headline number.
    val staticSecs = (1 to math.max(1, trials / 2)).map { _ =>
      spark.catalog.clearCache(); System.gc()
      time(Pipeline.runFromTable(spark, corpusPath).triples.count())._2
    }
    val tStatic = staticSecs.min

    // 2b: frozen-encoder cache re-run (S3): a quarter-scale slice is
    // encoded ONCE into the cache (untimed data prep); the warm run
    // scores from the cache alone (no source read, no tokenize, no
    // encode) vs the cold run over the same slice. Both use the static
    // canon map — the comparison isolates the encode-skip.
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val sp = spark // stable identifier for the implicit encoder import
    import sp.implicits._
    val cachePath = s"/tmp/graft_bench_enccache_${scaleFiles}_$corpusVer"
    def slice = sp.read.parquet(corpusPath)
      .filter(pmod(xxhash64(col("repo"), col("path")), lit(4)) === 0)
      .as[graft.core.SourceFileHashed]
    if (!Files.exists(Paths.get(cachePath, "_SUCCESS"))) {
      // same sweep discipline as the corpus dir (stale versions leak)
      val now = System.currentTimeMillis()
      Option(new java.io.File("/tmp").listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith(s"graft_bench_enccache_${scaleFiles}_"))
        .filter { dd =>
          dd.getName == s"graft_bench_enccache_${scaleFiles}_$corpusVer" ||
            now - dd.lastModified() > 2L * 3600 * 1000 ||
            !new java.io.File(dd, "_SUCCESS").exists()
        }
        .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
      graft.extract.EncodingCache.write(
        graft.extract.Extract.sentences(slice), cachePath)
    }
    // lease touch — see the corpus dir above (the cold slice reads the
    // corpus dir too, so refresh both before this section)
    touchLease(cachePath)
    touchLease(corpusPath)
    Pipeline.triplesFor(slice).count() // warm JIT for the cold shape
    val coldSecs = (1 to trials)
      .map(_ => time(Pipeline.triplesFor(slice).count())).map(_._2)
    val coldSec = coldSecs.min
    val warmRuns = (1 to trials)
      .map(_ => time(Pipeline.triplesFromCache(spark, cachePath).count()))
    val warmSecs = warmRuns.map(_._2)
    val warmSec = warmSecs.min
    val cachedTriples = warmRuns.head._1

    // 2c: delta-aware dynamic publish — the full re-canonicalization of
    // an accumulated corpus vs the incremental publish of a ~1% ingest
    // delta (round-4 VERDICT task 1b: publish cost must scale with the
    // delta, not the accumulated corpus). The accumulation layout is
    // synthesized directly (linked mentions + doc roster in batchId=
    // partitions — the same layout triplesStream commits); both
    // publishes include their GraphTables snapshot write. Untimed prep:
    // extraction+linking of the base corpus. SPARK_GRAFT_SKIP_PUBLISH
    // skips the section (pubJson degrades to absent).
    val pubJson = if (sys.env.contains("SPARK_GRAFT_SKIP_PUBLISH")) ""
    else {
      val pubTmp = Files.createTempDirectory("graft_bench_pub").toString
      val ments = s"$pubTmp/ments"; val state = s"$pubTmp/state"
      val nBase = math.max(scaleFiles / 4, 2000L)
      val nDelta = math.max(nBase / 100, 100L)
      import org.apache.spark.sql.functions.lit
      def writeBatch(a: Long, b: Long, batchId: Long): Unit = {
        val fs = spark.range(a, b)
          .map(id => graft.core.CorpusGen.file(id).source)
        graft.link.Linker.link(
          graft.extract.Extract.mentionsFused(fs)).toDF()
          .withColumn("batchId", lit(batchId))
          .write.mode("append").partitionBy("batchId").parquet(ments)
        fs.toDF().select(graft.core.DocId.column.as("docId")).distinct()
          .withColumn("batchId", lit(batchId))
          .write.mode("append").partitionBy("batchId")
          .parquet(graft.streaming.StreamingPipeline.rosterPath(ments))
      }
      writeBatch(0L, nBase, 0L)
      // base publish (creates the canon state) — untimed prep
      graft.streaming.StreamingPipeline.publishSnapshotDynamicIncremental(
        spark, ments, s"$pubTmp/graph", "pub-0", state)
      // two genuine delta publishes, each over a fresh 1% batch
      val incrTrials = (1 to 2).map { i =>
        writeBatch(nBase + (i - 1) * nDelta, nBase + i * nDelta, i.toLong)
        spark.catalog.clearCache(); System.gc()
        val r = timedP {
          val p = graft.streaming.StreamingPipeline
            .publishSnapshotDynamicIncremental(spark, ments,
              s"$pubTmp/graph", f"pub-$i%02d", state)
          require(p.incremental, s"expected incremental publish: ${p.note}")
        }
        (r._2, r._3)
      }
      // the full path over the SAME final accumulation (the pre-round-5
      // publish cost), into a throwaway table
      val fullTrials = (1 to 2).map { j =>
        spark.catalog.clearCache(); System.gc()
        val r = timedP(graft.streaming.StreamingPipeline
          .publishSnapshotDynamic(spark, ments, s"$pubTmp/graphFull$j",
            s"full-$j"))
        (r._2, r._3)
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(pubTmp))
      val iSecs = incrTrials.map(_._1); val fSecs = fullTrials.map(_._1)
      s""""publish":{"files":$nBase,"delta_files":$nDelta,""" +
        s""""incr_sec":${iSecs.min},"incr_sec_trials":${jArr(iSecs)},""" +
        s""""incr_steal_pct_trials":${jArr(incrTrials.map(_._2))},""" +
        s""""full_sec":${fSecs.min},"full_sec_trials":${jArr(fSecs)},""" +
        s""""full_steal_pct_trials":${jArr(fullTrials.map(_._2))},""" +
        s""""full_over_incr":${fSecs.min / iSecs.min}},"""
    }
    spark.stop()

    // 3: scaling evidence, local[N] vs local[4N], same input.
    // Trials ALTERNATE configurations (N, 4N, N, 4N, …) so a sustained
    // CPU-steal window on the shared host degrades both sides of the
    // ratio instead of silently halving one of them (observed eff 0.58
    // on a run where every local[8] trial landed in one window while
    // the preceding local[2] block ran clean); per-config best-of is
    // then taken across the interleaved trials. JIT persists across
    // SparkSessions (same JVM), so one untimed warm pass per config
    // suffices.
    // refresh the corpus lease again — the scaling section alone can
    // run tens of minutes at larger SCALE_FILES
    touchLease(corpusPath)
    // floor of 3: with 2 trials per config one sustained CPU-steal
    // window (they last minutes here) can swallow BOTH trials of the
    // short leg and sink the recorded efficiency — 3 interleaved
    // trials ride it out at the cost of ~one extra local[N] run.
    // SPARK_GRAFT_SCALE_TRIALS overrides for quick local iteration.
    val scaleTrials = sys.env.get("SPARK_GRAFT_SCALE_TRIALS")
      .map { v =>
        // validate the override: a typo'd value would otherwise throw a
        // bare NumberFormatException here, and 0/negative would make the
        // trial range empty and crash scalingRow later at rs.head with
        // an opaque NoSuchElementException
        val n = try v.toInt catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"SPARK_GRAFT_SCALE_TRIALS must be a positive integer, got '$v'")
        }
        require(n > 0,
          s"SPARK_GRAFT_SCALE_TRIALS must be a positive integer, got '$v'")
        n
      }.getOrElse(math.max(3, trials / 2))
    val (scRows, eff, effMed) = scalingRow(corpusPath, scaleN, scaleTrials)
    // secondary proxy row (round-3 ADVICE): the local[2]->local[8]
    // ratio stays visible every round alongside the headline
    // local[1]->local[4] one, so the two proxies can be compared across
    // rounds (the single-thread baseline has zero coordination
    // overhead; 2->8 pays scheduler/shuffle coordination but reads
    // shared-heap GC above ~8 threads — BASELINE.md documents both).
    // SPARK_GRAFT_SCALE_N2=0 skips it.
    val scaleN2 = sys.env.getOrElse("SPARK_GRAFT_SCALE_N2", "2").toInt
    val secondary =
      if (scaleN2 > 0 && scaleN2 != scaleN)
        Some((scaleN2, scalingRow(corpusPath, scaleN2, 2)))
      else {
        // no silent coverage cap: say WHY the secondary row is absent
        System.err.println(s"[bench] secondary scaling row skipped " +
          s"(SPARK_GRAFT_SCALE_N2=$scaleN2, primary N=$scaleN)")
        None
      }

    val qJson = qTimes.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    val secJson = secondary.map { case (_, (rows2, eff2, effMed2)) =>
      s""","secondary":{${scRowJson(rows2)},"efficiency":$eff2,""" +
        s""""efficiency_median":$effMed2}"""
    }.getOrElse("")
    val scJson = s"""{${scRowJson(scRows)},"efficiency":$eff,""" +
      s""""efficiency_median":$effMed$secJson}"""
    // -1 marks an all-trials-failed query; it must not DEFLATE the total
    val total = qTimes.map(_._2).filter(_ >= 0).sum + tPipe
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qJson,""" +
        s""""sf":"$sfDir","triples_per_sec":$tpsCpus,""" +
        s""""pipeline":{"files":$scaleFiles,"triples":$nTriples,"sec":$tPipe,""" +
        s""""sec_trials":${jArr(pipeSecs)},"sec_median":${median(pipeSecs)},""" +
        s""""steal_pct_trials":${jArr(pipeSteal)},""" +
        s""""load1_trials":${jArr(pipeLoad)},""" +
        s""""triples_per_sec_median":${nTriples / median(pipeSecs)}},""" +
        pubJson +
        s""""pipeline_static":{"sec":$tStatic,""" +
        s""""sec_trials":${jArr(staticSecs)},"sec_median":${median(staticSecs)},""" +
        s""""triples_per_sec":${nTriples / tStatic}},""" +
        s""""pipeline_cached":{"triples":$cachedTriples,""" +
        s""""cold_sec":$coldSec,"warm_sec":$warmSec,""" +
        s""""cold_sec_trials":${jArr(coldSecs)},""" +
        s""""warm_sec_trials":${jArr(warmSecs)},""" +
        s""""cold_sec_median":${median(coldSecs)},""" +
        s""""warm_sec_median":${median(warmSecs)},""" +
        s""""cold_tps":${cachedTriples / coldSec},""" +
        s""""warm_tps":${cachedTriples / warmSec}},""" +
        s""""scaling":$scJson}"""
    println(line)

    // append measured numbers for BASELINE.md's "Measured" section,
    // and persist the JSON line itself so the driver can parse it from
    // a file even if stdout gets log-prefixed.
    try {
      new java.io.File("BENCH").mkdirs()
      Files.writeString(Paths.get("BENCH/bench_line.json"), line + "\n")
      val tpsLo = scRows.head.triples / scRows.head.secs.min
      val tpsHi = scRows.last.triples / scRows.last.secs.min
      val secTxt = secondary.map { case (n2, (_, eff2, effMed2)) =>
        s"| eff${n2}_${4 * n2}=${"%.3f".format(eff2)}" +
          s"/med ${"%.3f".format(effMed2)} "
      }.getOrElse("")
      Files.write(Paths.get("BENCH/BASELINE.md"),
        (s"| ${java.time.Instant.now()} | files=$scaleFiles " +
          s"| tps_local$scaleN=${tpsLo.round} | tps_local${4*scaleN}=${tpsHi.round} " +
          s"| eff=${"%.3f".format(eff)}/med ${"%.3f".format(effMed)} " +
          secTxt +
          s"| tps_bench(${cpus}c)=${tpsCpus.round} |\n")
          .getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    } catch { case _: Throwable => () }
  }

  private object Extract {
    def corpusWrite(spark: SparkSession, n: Long, path: String): Unit =
      graft.extract.Extract.corpus(spark, n)
        .write.mode("overwrite").parquet(path)
  }
}

/** Publish-cost SCALING bench: the same fixed-size ingest delta
  * published incrementally (overlay snapshot) vs a full
  * republication, across GROWING accumulated corpus sizes — the
  * direct evidence that incremental publish cost tracks the DELTA
  * while full publish cost tracks the corpus. One JSON line:
  * `{"metric":"publish_scaling","delta_files":D,"bases":[{"files":B,
  *   "incr_sec":…,"incr_sec_trials":[…],"incr_rows_written":…,
  *   "snapshot_rows":…,"chain_depth":…,"read_chain_sec":…,
  *   "read_flat_sec":…,"full_sec":…,"full_sec_trials":[…],
  *   "full_over_incr":…},…]}` (also written to
  * BENCH/publish_scaling.json). The read rows price the consumer side
  * of a chain: resolving the deepest overlay vs the same content
  * after an in-place compactSnapshot. Env: SPARK_GRAFT_PUB_BASES
  * (csv base file counts, default "20000,80000"),
  * SPARK_GRAFT_PUB_DELTA (files per delta, default 400),
  * SPARK_GRAFT_PUB_TRIALS (per-mode trials, default 2),
  * SPARK_GRAFT_CPUS. Bases run ascending so the first (smallest)
  * base absorbs JIT warm-up; per-mode best-of covers the rest. */
object BenchPublish {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions.lit
    def posLong(k: String, dflt: String): Long = {
      val v = sys.env.getOrElse(k, dflt)
      val n = try v.toLong catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"$k must be a positive integer, got '$v'")
      }
      require(n > 0, s"$k must be positive, got $n"); n
    }
    val cpus = posLong("SPARK_GRAFT_CPUS", "32").toInt
    val bases = sys.env.getOrElse("SPARK_GRAFT_PUB_BASES", "20000,80000")
      .split(",").map { v =>
        try v.trim.toLong catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"SPARK_GRAFT_PUB_BASES must be csv integers, got '$v'")
        }
      }.sorted.toSeq
    val nDelta = posLong("SPARK_GRAFT_PUB_DELTA", "400")
    val trials = posLong("SPARK_GRAFT_PUB_TRIALS", "2").toInt
    val spark = Bench.session(cpus, "graft-bench-publish")
    import spark.implicits._
    val rows = bases.map { nBase =>
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_bench_pubscale").toString
      val ments = s"$tmp/ments"; val state = s"$tmp/state"
      val table = s"$tmp/graph"
      def writeBatch(a: Long, b: Long, batchId: Long): Unit = {
        val fs = spark.range(a, b)
          .map(id => graft.core.CorpusGen.file(id).source)
        graft.link.Linker.link(
          graft.extract.Extract.mentionsFused(fs)).toDF()
          .withColumn("batchId", lit(batchId))
          .write.mode("append").partitionBy("batchId").parquet(ments)
        fs.toDF().select(graft.core.DocId.column.as("docId")).distinct()
          .withColumn("batchId", lit(batchId))
          .write.mode("append").partitionBy("batchId")
          .parquet(graft.streaming.StreamingPipeline.rosterPath(ments))
      }
      writeBatch(0L, nBase, 0L)
      // base publish (creates state + the overlay chain root) — untimed
      graft.streaming.StreamingPipeline.publishSnapshotDynamicIncremental(
        spark, ments, table, "pub-00", state)
      val incr = (1 to trials).map { i =>
        writeBatch(nBase + (i - 1) * nDelta, nBase + i * nDelta, i.toLong)
        spark.catalog.clearCache(); System.gc()
        Bench.timedP {
          val p = graft.streaming.StreamingPipeline
            .publishSnapshotDynamicIncremental(spark, ments, table,
              f"pub-$i%02d", state)
          require(p.incremental, s"expected incremental: ${p.note}")
          p.rows
        }
      }
      val lastId = f"pub-$trials%02d"
      val ownRows = graft.sources.GraphTables
        .readOwnData(spark, table, lastId).count()
      val snapRows = incr.last._1
      // read-side cost of the overlay chain: resolve the deepest
      // snapshot vs the same content flattened in place — what a
      // consumer pays per read between compactions
      val chainD = graft.sources.GraphTables.chainDepth(spark, table, lastId)
      val readChain = (1 to trials).map { _ =>
        spark.catalog.clearCache()
        Bench.timedP(graft.sources.GraphTables
          .readSnapshot(spark, table, lastId).count())._2
      }
      graft.sources.GraphTables.compactSnapshot(spark, table, lastId)
      val readFlat = (1 to trials).map { _ =>
        spark.catalog.clearCache()
        Bench.timedP(graft.sources.GraphTables
          .readSnapshot(spark, table, lastId).count())._2
      }
      val full = (1 to trials).map { j =>
        spark.catalog.clearCache(); System.gc()
        Bench.timedP(graft.streaming.StreamingPipeline
          .publishSnapshotDynamic(spark, ments, s"$tmp/graphFull$j",
            s"full-$j"))
      }
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(tmp))
      val iSecs = incr.map(_._2); val fSecs = full.map(_._2)
      System.err.println(s"[bench-publish] base=$nBase incr=${iSecs.min}s " +
        s"full=${fSecs.min}s own_rows=$ownRows of $snapRows " +
        s"read_chain(d=$chainD)=${readChain.min}s read_flat=${readFlat.min}s")
      s"""{"files":$nBase,"incr_sec":${iSecs.min},""" +
        s""""incr_sec_trials":${Bench.jArr(iSecs)},""" +
        s""""incr_steal_pct_trials":${Bench.jArr(incr.map(_._3))},""" +
        s""""incr_rows_written":$ownRows,"snapshot_rows":$snapRows,""" +
        s""""chain_depth":$chainD,""" +
        s""""read_chain_sec":${readChain.min},""" +
        s""""read_flat_sec":${readFlat.min},""" +
        s""""full_sec":${fSecs.min},""" +
        s""""full_sec_trials":${Bench.jArr(fSecs)},""" +
        s""""full_steal_pct_trials":${Bench.jArr(full.map(_._3))},""" +
        s""""full_over_incr":${fSecs.min / iSecs.min}}"""
    }
    val line = s"""{"metric":"publish_scaling","delta_files":$nDelta,""" +
      s""""bases":${rows.mkString("[", ",", "]")}}"""
    println(line)
    try {
      new java.io.File("BENCH").mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH/publish_scaling.json"), line + "\n")
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
