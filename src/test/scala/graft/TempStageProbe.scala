package graft

// temp probe: per-stage wall time of the dynamic-canon pipeline
// (deleted before commit)
object TempStageProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    import spark.implicits._
    val n = 40000L
    val files = graft.extract.Extract.corpus(spark, n)
    // warm
    graft.Pipeline.triplesFor(files).count()
    t("static-full")(graft.Pipeline.triplesFor(files).count())
    val ments = graft.extract.Extract.mentionsFused(files)
    val linked = graft.link.Linker.link(ments).toDF().persist()
    t("extract+link+persist")(linked.count())
    val edges = t("alias-mining")(
      graft.canon.AliasMining.mentionAliasEdges(linked))
    t("alias-edge-count")(edges.count())
    val cm = t("cc-canonical-map") {
      val (l, rounds) = graft.canon.ConnectedComponents.runWithStats(
        graft.link.Linker.aliasDf(spark)
          .groupBy("alias")
          .agg(org.apache.spark.sql.functions.min($"entity").as("src"),
            org.apache.spark.sql.functions.collect_set($"entity").as("all"))
          .select($"src",
            org.apache.spark.sql.functions.explode($"all").as("dst"))
          .filter($"src" =!= $"dst")
          .union(edges))
      println(s"STAGE cc rounds=$rounds")
      l
    }
    t("cc-collect")(cm.count())
    val canon = graft.Pipeline.canonicalize(linked,
      graft.Pipeline.dynamicCanonMap(spark, linked), hintBroadcast = false)
    t("canon+emit")(graft.triples.TripleEmit
      .emitFused(canon.as[graft.triples.TripleEmit.CanonMention]).count())
    t("dynamic-full")(graft.Pipeline.dynamicStagesFor(files).triples.count())
    t("dynamic-full-2")(graft.Pipeline.dynamicStagesFor(files).triples.count())
    linked.unpersist()
    spark.stop()
  }
}
