package graft.ext

import org.apache.spark.sql.DataFrame

/** Parallelism floor for high-fan-out / CPU-heavy per-row stages.
  *
  * The gate tables are single parquet files far under
  * `maxPartitionBytes`, so Spark plans ONE scan partition — and every
  * mapPartitions codec stage (image encode/decode, per-frame hashing)
  * or 100×+ explode downstream of it runs single-threaded, then
  * shuffle-writes the whole fan-out from one task (measured: 4.4 s of
  * the d16 lane's 5 s was a single-task shuffle write; the m6 image
  * lane decoded 50k images on one core). At cluster scale the scan has
  * thousands of partitions and this is a no-op; on small inputs one
  * cheap narrow-row shuffle buys the full executor width. Spark's
  * round-robin repartition is deterministic (local sort before
  * assignment), and every widened stage is a per-row pure function, so
  * results are multiset-identical — the hash gates re-verify. */
object Widen {
  def widened(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }
}
