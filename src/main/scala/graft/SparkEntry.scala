package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{KgQueries, RelationalQueries, TrainingDataQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator-family demos (SURVEY §2) to DataFrames over
  * the driver's parquet tables at `sfDir`; `oracleSql` holds the ANSI
  * SQL DuckDB equivalent for every SQL-expressible entry. KG-pipeline
  * entries run on the deterministic synthesized source-code corpus
  * (FIXTURES.md); their oracles are read_parquet selects over the
  * closed-form gold tables Verify materializes under `<outDir>_gold/`
  * (plus the ScalaTest parity suites).
  */
object SparkEntry {

  /** Flagship query (SURVEY §3.2): full KG pipeline on a tiny corpus —
    * extract -> link -> canonicalize -> triples. Driver smoke-checks
    * rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.run(spark, nFiles = 150).triples

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all ++ TrainingDataQueries.all ++ KgQueries.all

  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ TrainingDataQueries.oracles ++
      KgQueries.oracles
}
