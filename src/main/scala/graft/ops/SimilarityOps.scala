package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (Array[Float]).
  *
  *  - brute-force cosine top-k: the exactness baseline. Cross join of a
  *    small query set against all candidates; at cluster scale the
  *    query side is broadcast so the scan over candidates is a single
  *    narrow pass (no shuffle of the big side).
  *  - LSH-bucketed (random hyperplane signs): the scale path. Each
  *    vector gets a deterministic bucket id from the sign pattern of
  *    `nPlanes` seeded hyperplane dot products; search compares only
  *    within a bucket — candidates shrink ~2^nPlanes-fold, recall
  *    measured against brute force in tests.
  *
  * All dot products run in double precision, summed left-to-right
  * (matches the DuckDB oracle's list_dot_product evaluation order).
  */
object SimilarityOps {

  /** embedding as array<double> (float parquet values widen exactly). */
  private def dvec(c: Column): Column = c.cast("array<double>")

  /** HOF reference formulation of the dot product — kept as the
    * independent parity oracle for the native fused kernel (OpsSpec
    * compares `cosine` against `cosineHof` on the real embeddings);
    * production paths use the native kernel below. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Fused single-pass cosine (native expression, VecOps.scala) —
    * bit-identical to `cosineHof` but one tight JVM loop per row
    * instead of 3 CodegenFallback HOF passes. Callers must have
    * `VecFunctions.register`ed the session (every operator entry point
    * here does). */
  def cosine(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** Brute-force top-k neighbors for the query set (by id predicate).
    * Output: (query_id, rank, neighbor_id) — ids only; float scores are
    * order-determining but not emitted (hash-compare safety). */
  def bruteForceTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    graft.functions.VecFunctions.register(emb.sparkSession)
    val q = emb.filter(queryPred)
      .select(col("vec_id").as("query_id"), dvec(col("embedding")).as("qv"))
    val c = emb.select(col("vec_id").as("neighbor_id"),
      dvec(col("embedding")).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), asc("neighbor_id"))
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** Deterministic seeded hyperplanes (nPlanes x dim). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 11L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rng.nextGaussian())
  }

  /** Sign-pattern LSH index rows (vec_id, tbl, bucket):
    * the hyperplane dot products run in a mapPartitions kernel with
    * the plane matrices broadcast — a literal-expression version
    * (nTables*nPlanes*dim codegen terms) compiles for seconds and
    * brings no pushdown benefit, so the kernel wins here.
    *
    * Ids only, no vector column: the index is cache()d by both ANN
    * consumers and self-joined, and every consumer reads just
    * (vec_id, tbl, bucket) since the id-pair refactor — carrying the
    * embedding would pin nTables× duplicate arrays in executor storage
    * (round-3 finding). Consumers join vectors back from `emb` once
    * per surviving candidate pair. */
  def lshIndex(emb: DataFrame, tables: Array[Array[Array[Double]]]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bt = spark.sparkContext.broadcast(tables)
    emb.select(col("vec_id"), dvec(col("embedding")).as("v"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val tabs = bt.value
        it.flatMap { case (id, vs) =>
          val v = vs.toArray
          tabs.iterator.zipWithIndex.map { case (planes, ti) =>
            var b = 0L
            var p = 0
            while (p < planes.length) {
              var d = 0.0; var j = 0
              val pl = planes(p)
              val n = math.min(v.length, pl.length)
              while (j < n) { d += v(j) * pl(j); j += 1 }
              if (d > 0) b |= (1L << p)
              p += 1
            }
            (id, ti, b)
          }
        }
      }.toDF("vec_id", "tbl", "bucket")
  }

  /** The default multi-table plane set (seeds 11..11+n-1) — exposed so
    * Verify can dump it to parquet and the DuckDB oracle can recompute
    * the bucket assignment independently. */
  def defaultTables(nPlanes: Int = 4, nTables: Int = 4,
      dim: Int = 64): Array[Array[Array[Double]]] =
    (0 until nTables).map(t => hyperplanes(nPlanes, dim, 11L + t)).toArray

  /** Multi-table LSH ANN: `nTables` independent hyperplane sets; a
    * candidate matches if it shares the query's bucket in ANY table
    * (classic recall amplification: 1-(1-p^r)^L). Candidates then get
    * exact cosine + top-k. Recall < 1 by design (tested vs brute
    * force); candidate volume shrinks ~2^nPlanes/L-fold vs brute force,
    * which is the point at web scale. */
  def lshTopK(emb: DataFrame, queryPred: Column, k: Int,
      nPlanes: Int = 4, nTables: Int = 4, dim: Int = 64): DataFrame = {
    graft.functions.VecFunctions.register(emb.sparkSession)
    val tables = defaultTables(nPlanes, nTables, dim)
    // cache: both join sides project the same mapPartitions hashing
    // pass — uncached it would hash every embedding twice
    val withB = lshIndex(emb, tables).cache()
    val q = withB.filter(queryPred)
      .select(col("vec_id").as("query_id"),
        col("tbl").as("qt"), col("bucket").as("qb"))
    val c = withB.select(col("vec_id").as("neighbor_id"),
      col("tbl").as("ct"), col("bucket").as("cb"))
    // candidates are ID PAIRS only: with L tables a pair matching in
    // several buckets appears L times, and round 2 dragged both
    // embedding arrays through that multiplied dedup shuffle — dedup
    // the ids first, join the vectors back once per SURVIVING pair
    val cands = broadcast(q).join(c,
      col("qt") === col("ct") && col("qb") === col("cb") &&
        col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val qv = emb.filter(queryPred)
      .select(col("vec_id").as("query_id"), dvec(col("embedding")).as("qv"))
    val cv = emb.select(col("vec_id").as("neighbor_id"),
      dvec(col("embedding")).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), asc("neighbor_id"))
    cands
      .join(broadcast(qv), Seq("query_id"))
      .join(cv, Seq("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** IVF (inverted-file) ANN: deterministic k-means coarse quantizer
    * trained distributively (fixed seed centroids from hashed picks,
    * fixed iteration count — no Date/entropy), then search only the
    * `nProbe` nearest centroid cells. The classic scale path when
    * hyperplane LSH recall is too angle-sensitive: cells adapt to the
    * data distribution. Centroids are a tiny dimension table —
    * broadcast both for assignment and probing. */
  private def nearest(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0; var bd = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0; var j = 0
      while (j < v.length) { val t = v(j) - cs(c)(j); d += t * t; j += 1 }
      if (d < bd) { bd = d; best = c }
      c += 1
    }
    best
  }

  /** Deterministic k-means coarse quantizer (fixed seed picks, fixed
    * iteration count). Exposed so Verify can dump the centroids and
    * the DuckDB oracle can recompute assignment + probing.
    *
    * Memory bound: training runs on an EXPLICIT deterministic sample —
    * `pmod(xxhash64(vec_id), ceil(n / maxTrainSample)) == 0` — so the
    * per-cell buffer (needed for id-ordered deterministic double
    * summation; a reduceGroups would sum in fetch order) holds at most
    * ~maxTrainSample vectors TOTAL regardless of corpus size. Round 2
    * buffered every vector of a cell on one reducer — a dominant cell
    * at web scale OOMs that reducer (tested with a 10^6-vector
    * single-cluster corpus in OpsSpec). Small corpora
    * (n <= maxTrainSample) keep sampleMod = 1, i.e. train on
    * everything — bit-identical to round 2 there. */
  def ivfTrain(emb: DataFrame, nCells: Int = 8,
      iters: Int = 5, maxTrainSample: Long = 100000L): Array[Array[Double]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val n = emb.select(count(lit(1))).head().getLong(0)
    val sampleMod = math.max(1L, (n + maxTrainSample - 1) / maxTrainSample)
    val vecs = emb
      .filter(pmod(xxhash64(col("vec_id")), lit(sampleMod)) === 0)
      .select(col("vec_id"), dvec(col("embedding")).as("v"))
      .as[(Long, Seq[Double])]
    // deterministic init: the nCells sampled vectors with smallest hash
    var centroids: Array[Array[Double]] = vecs
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy("h").limit(nCells)
      .select("v").as[Seq[Double]].collect().map(_.toArray)
    (1 to iters).foreach { _ =>
      val bc = spark.sparkContext.broadcast(centroids)
      val sums = vecs.map { case (id, v) =>
        (nearest(v.toArray, bc.value), id, v.toArray)
      }.groupByKey(_._1).mapGroups { (c, it) =>
        val items = it.map(t => (t._2, t._3)).toArray.sortBy(_._1)
        val s = new Array[Double](items.head._2.length)
        items.foreach { case (_, v) =>
          var j = 0; while (j < s.length) { s(j) += v(j); j += 1 }
        }
        (c, s, items.length.toLong)
      }.collect().map(t => t._1 -> ((t._2, t._3))).toMap
      centroids = centroids.indices.map { c =>
        sums.get(c).map { case (s, n) => s.map(_ / n) }.getOrElse(centroids(c))
      }.toArray
    }
    centroids
  }

  /** `trained`: pass pre-trained centroids (e.g. the exact array dumped
    * for the DuckDB oracle) to skip the in-query training pass. */
  def ivfTopK(emb: DataFrame, queryPred: Column, k: Int,
      nCells: Int = 8, nProbe: Int = 2, iters: Int = 5,
      trained: Option[Array[Array[Double]]] = None): DataFrame = {
    graft.functions.VecFunctions.register(emb.sparkSession)
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(col("vec_id"), dvec(col("embedding")).as("v"))
      .as[(Long, Seq[Double])]
    val centroids = trained.getOrElse(ivfTrain(emb, nCells, iters))
    val bc = spark.sparkContext.broadcast(centroids)
    def cellDist(v: Array[Double], cs: Array[Double]): Double = {
      var d = 0.0; var j = 0
      while (j < v.length) { val t = v(j) - cs(j); d += t * t; j += 1 }
      d
    }
    // candidates: one row per vector, assigned to its nearest cell
    val assigned = vecs.map { case (id, v) =>
      (id, v, nearest(v.toArray, bc.value))
    }.toDF("neighbor_id", "cv", "cell")
    // queries: one row per (query, probed cell)
    val q = emb.filter(queryPred)
      .select(col("vec_id"), dvec(col("embedding")).as("v"))
      .as[(Long, Seq[Double])]
      .flatMap { case (id, v) =>
        val va = v.toArray
        bc.value.indices
          .sortBy(c => (cellDist(va, bc.value(c)), c))
          .take(nProbe).map(c => (id, v, c))
      }.toDF("query_id", "qv", "cell")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), asc("neighbor_id"))
    broadcast(q).join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** Embedding-cosine near-dup, thresholded + LSH-blocked: the scale
    * path for "drop every pair more similar than t" over a corpus too
    * big for the all-pairs join. Candidates = pairs sharing a bucket in
    * ANY hyperplane table (same blocking as [[lshTopK]]); exact cosine
    * runs on candidates only. Recall < 1 by design (the price of not
    * joining all pairs); the DuckDB oracle recomputes the buckets from
    * the dumped plane matrix so the result is value-exact anyway.
    * Output is ids only (floats decide, never emitted). */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double,
      nPlanes: Int = 4, nTables: Int = 4, dim: Int = 64): DataFrame = {
    graft.functions.VecFunctions.register(emb.sparkSession)
    // cache: see lshTopK — the self-join reads the hashing pass twice
    val withB = lshIndex(emb, defaultTables(nPlanes, nTables, dim)).cache()
    val a = withB.select(col("vec_id").as("d1"),
      col("tbl").as("t1"), col("bucket").as("b1"))
    val b = withB.select(col("vec_id").as("d2"),
      col("tbl").as("t2"), col("bucket").as("b2"))
    // id-only candidates through the dedup shuffle; vectors join back
    // once per surviving pair (see lshTopK)
    val v1 = emb.select(col("vec_id").as("d1"), dvec(col("embedding")).as("v1"))
    val v2 = emb.select(col("vec_id").as("d2"), dvec(col("embedding")).as("v2"))
    a.join(b, col("t1") === col("t2") && col("b1") === col("b2") &&
        col("d1") < col("d2"))
      .select(col("d1"), col("d2"))
      .dropDuplicates("d1", "d2")
      .join(v1, Seq("d1"))
      .join(v2, Seq("d2"))
      .filter(cosine(col("v1"), col("v2")) >= threshold)
      .select(col("d1"), col("d2"))
  }

  /** Globally top-n most-similar pairs among a sampled query side
    * (id % sampleMod == 0) vs all.
    *
    * Scale shape: `orderBy(...).limit(n)` plans as
    * TakeOrderedAndProject — every partition keeps a local n-row heap
    * and the driver merges n rows per partition. An unpartitioned
    * `row_number()` window here would instead shuffle EVERY candidate
    * pair into one partition (the round-1 scale-killer; asserted fixed
    * in PlanSpec). The tiny rank window afterwards runs over exactly
    * `topN` already-collected rows. */
  def topPairs(emb: DataFrame, sampleMod: Int, topN: Int): DataFrame = {
    graft.functions.VecFunctions.register(emb.sparkSession)
    val q = emb.filter(col("vec_id") % sampleMod === 0)
      .select(col("vec_id").as("id1"), dvec(col("embedding")).as("v1"))
    val c = emb.select(col("vec_id").as("id2"), dvec(col("embedding")).as("v2"))
    val top = broadcast(q).join(c, col("id1") < col("id2"))
      .withColumn("cos", cosine(col("v1"), col("v2")))
      .select(col("cos"), col("id1"), col("id2"))
      .orderBy(desc("cos"), asc("id1"), asc("id2"))
      .limit(topN)
    val w = Window.orderBy(desc("cos"), asc("id1"), asc("id2"))
    top.withColumn("rank", row_number().over(w))
      .select(col("rank"), col("id1"), col("id2"))
  }
}
