package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Also materializes the CLOSED-FORM GOLD tables (mentions, triples,
  * corpus-with-content, canonical map) under the SIBLING dir
  * `<outDir>_gold/` — the kg_* oracles are DuckDB read_parquet selects
  * over them (KgQueries.oracles), which turns the non-SQL-expressible
  * kernel pipeline into hash-compared driver rows. Gold lives OUTSIDE
  * outDir because the driver treats every outDir subdirectory as a
  * query result (round 2 recorded a phantom `_gold` row with
  * `no_oracle`). `__GOLDDIR__`/`__OUTDIR__` in any oracle string are
  * replaced with the absolute paths before the dump. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // gold dir = SIBLING of outDir (never inside it — the driver scans
    // outDir subdirs as query results); absolute, trailing-slash safe
    val goldDir = new java.io.File(outDir).getAbsolutePath
      .reverse.dropWhile(_ == '/').reverse + "_gold"
    SparkEntry.queries.foreach { case (name, fn) =>
      // compute at FULL parallelism (persist + count), then coalesce
      // only the WRITE to the single file the driver compare reads —
      // coalesce(1) directly on the query plan would pull the whole
      // computation (kernel, joins, windows) onto one thread, which
      // dominated Verify wall-clock at the 10x scale re-runs.
      // coalesce(1) over the cached partitions concatenates them in
      // partition order, so the queries' total ORDER BY survives.
      try {
        val df = fn(spark, sfDir).persist()
        df.count()
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally
        // queries that cache internally (dedup postings, LSH index)
        // must not pin executor storage for the remaining queries —
        // this also releases the per-query persist above
        spark.catalog.clearCache()
    }
    // closed-form gold for the kg_* oracles (same corpus slice the
    // kg queries ran on)
    try {
      import spark.implicits._
      val n = graft.queries.KgQueries.nFilesFor(sfDir)
      // per-table try (df is by-name): one failed gold table must not
      // skip the remaining five and fail every downstream oracle at once
      def w(df: => org.apache.spark.sql.DataFrame, t: String): Unit =
        try df.coalesce(1).write.mode("overwrite")
          .parquet(s"$goldDir/$t")
        catch { case e: Throwable =>
          System.err.println(s"[verify] gold $t failed: ${e.getMessage}")
        }
      w(Pipeline.goldMentions(spark, n), "mentions")
      w(Pipeline.goldTriples(spark, n), "triples")
      w(graft.extract.Extract.corpus(spark, n).toDF()
        .select("repo", "path", "commit", "lang", "content"), "corpus")
      w(graft.core.Vocab.canonicalOf.toSeq.sortBy(_._1)
        .toDF("entity", "canonical"), "canon")
      // closed-form sentence lengths for the neg_sample span universe
      // (K12) — same n/10 slice the query runs on
      w(Pipeline.goldSentences(spark,
        graft.queries.KgQueries.negSampleFiles(sfDir)), "sentences")
      // K10 align_lookup: per-position memory encodings + per-query
      // head transforms — the oracle replays similarity + argmax decode
      // from these tables alone (same slice + query list as the query)
      val nAlign = graft.queries.KgQueries.negSampleFiles(sfDir)
      w(graft.kernel.Aligner.memTable(graft.extract.Extract.sentences(
        graft.extract.Extract.corpus(spark, nAlign))), "align_mem")
      w(graft.kernel.Aligner.queryTable(spark,
        graft.queries.KgQueries.AlignQueries), "align_q")
      // K11 loss_cells: the sequential twin's integerized loss table —
      // the gold the distributed spanLosses plan is hash-compared to
      w(graft.evalm.Losses.twinCells(nAlign)
        .toDF("docId", "sentId", "start", "end", "label", "ce_e9",
          "focal_e9", "smooth_e9", "ldam_e9", "na_bce_e9", "ent_ce_e9"),
        "loss_cells")
      // LSH hyperplanes: the ann_lsh oracle recomputes bucket
      // assignment in DuckDB from this matrix
      w(graft.ops.SimilarityOps.defaultTables().zipWithIndex.flatMap {
        case (planes, t) => planes.zipWithIndex.map { case (v, p) =>
          (t, p, v.toSeq) }
      }.toSeq.toDF("tbl", "plane", "vec"), "lsh_planes")
      // IVF centroids: the ann_ivf oracle recomputes assignment +
      // probing in DuckDB from the trained quantizer
      w(graft.ops.SimilarityOps.ivfTrain(
        spark.read.parquet(s"$sfDir/embeddings.parquet"))
        .zipWithIndex.map { case (v, c) => (c, v.toSeq) }
        .toSeq.toDF("cell", "vec"), "ivf_centroids")
    } catch { case e: Throwable =>
      System.err.println(s"[verify] gold materialization failed: ${e.getMessage}")
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val outAbs = new java.io.File(outDir).getAbsolutePath
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v
        .replace("__GOLDDIR__", goldDir).replace("__OUTDIR__", outAbs))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
