package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

/** One-shot scale probe past the per-round bench size: run the
  * DYNAMIC-canon pipeline once at SPARK_GRAFT_PROBE_FILES (default
  * 1.5M — ~5x the bench corpus, ~100x the sf0.1 kg slice) and report
  * the ceilings the 100x story would hit first: wall time, shuffle
  * spill (memory + disk), peak JVM heap, and GC time. Corpus
  * materialization is untimed data prep (same content-versioned /tmp
  * cache discipline as Bench).
  *
  * Prints ONE JSON line; results land in BENCH/BASELINE.md + README
  * scale notes (round-4 VERDICT task 7).
  */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val nFiles =
      sys.env.getOrElse("SPARK_GRAFT_PROBE_FILES", "1500000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-probe")
      .config("spark.sql.shuffle.partitions", cpus * 2)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // content-versioned corpus cache (Bench's key scheme, own size)
    val corpusVer = {
      val probe = Seq(0L, 1L, 12345L, 271828L)
        .map(i => graft.core.CorpusGen.file(i).source.sha256).mkString
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(probe.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
    }
    val corpusPath = s"/tmp/graft_bench_corpus_${nFiles}_$corpusVer"
    if (!Files.exists(Paths.get(corpusPath, "_SUCCESS")))
      graft.extract.Extract.corpus(spark, nFiles)
        .write.mode("overwrite").parquet(corpusPath)
    new java.io.File(corpusPath).setLastModified(System.currentTimeMillis())

    val memSpill = new AtomicLong(0L)
    val diskSpill = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          ()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // JIT warm-up on a slice, then reset pool peaks so the recorded
    // peak belongs to the measured run
    Pipeline.run(spark, 2000).triples.count()
    spark.catalog.clearCache(); System.gc()
    import scala.jdk.CollectionConverters._
    val pools = java.lang.management.ManagementFactory
      .getMemoryPoolMXBeans.asScala.filter(
        _.getType == java.lang.management.MemoryType.HEAP)
    pools.foreach(_.resetPeakUsage())
    val gc0 = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    memSpill.set(0L); diskSpill.set(0L)
    val t0 = System.nanoTime()
    val nTriples =
      Pipeline.runFromTableDynamic(spark, corpusPath).triples.count()
    val sec = (System.nanoTime() - t0) / 1e9
    val gcMs = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum - gc0
    val peakHeapMb = pools.map(_.getPeakUsage.getUsed).sum / (1024 * 1024)
    val line =
      s"""{"probe":"dynamic_pipeline","files":$nFiles,""" +
        s""""triples":$nTriples,"sec":$sec,""" +
        s""""triples_per_sec":${nTriples / sec},""" +
        s""""spill_mem_mb":${memSpill.get / (1024 * 1024)},""" +
        s""""spill_disk_mb":${diskSpill.get / (1024 * 1024)},""" +
        s""""peak_heap_mb":$peakHeapMb,"gc_sec":${gcMs / 1000.0},""" +
        s""""cpus":$cpus}"""
    println(line)
    try {
      new java.io.File("BENCH").mkdirs()
      Files.write(Paths.get("BENCH/scale_probe.jsonl"),
        (line + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
