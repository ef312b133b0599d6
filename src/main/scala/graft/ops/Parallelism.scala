package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Scale-adaptive parallelism repair for narrow per-row kernels.
  *
  * A small table produces one or two scan splits (split size is a
  * byte budget), so an expensive narrow stage rooted at it — hash
  * signatures, window sorts — runs on one core regardless of cluster
  * width. At real scale the scan is already wide and nothing should
  * be touched. `widen` therefore repartitions ONLY when the plan's
  * scan parallelism is below half the session's shuffle parallelism
  * (the session knob is the scale signal, not a local constant), by a
  * DETERMINISTIC key column (hash repartition; round-robin would pay
  * the sort-before-repartition safety pass and is retry-fragile on
  * nondeterministic input). The partition count is pinned explicitly
  * so AQE's small-partition coalescing cannot fold the tiny table
  * back into one task.
  */
object Parallelism {

  def widen(df: DataFrame, key: String): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions * 2 >= target) df
    else df.repartition(target, col(key))
  }
}
