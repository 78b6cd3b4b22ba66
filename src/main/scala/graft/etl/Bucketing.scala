package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location: the pre-shuffle answer to the repeated
  * big-fact x big-fact join.
  *
  * A shuffle join of two 100 TB facts re-exchanges BOTH sides on every
  * run; writing each side ONCE as a bucketed + sorted table keyed on
  * the join column moves that exchange into the write, and every
  * subsequent join (today's load, tomorrow's, every downstream query
  * on the same key) is a zero-exchange sort-merge join — Spark's
  * `HashPartitioning(key, n)` output of a bucketed scan satisfies the
  * join's distribution requirement outright. This is the warehouse
  * layout the reference's nightly fact loads would want: the ODS
  * tables it re-joins per run are exactly the "write once, join
  * nightly" shape.
  *
  * `BucketedJoinSpec` machine-asserts the plan: the bucketed join
  * contains NO ShuffleExchange while the identical plain-parquet join
  * exchanges both sides, and results are equal.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted external parquet
    * table (overwriting table and data). One file per bucket
    * (`repartition` on the key first) so the sort metadata is usable
    * and the downstream merge join needs no re-sort. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(buckets, df(key))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Zero-exchange equi-join of two co-bucketed tables (same bucket
    * count, join key = bucket key on both sides). The `merge` hint
    * pins sort-merge so the plan shape is the one that matters at
    * scale — at test scale Catalyst would otherwise broadcast the
    * small side and never exercise the co-location. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left).hint("merge")
    val r = spark.table(right).hint("merge")
    l.join(r, l(leftKey) === r(rightKey))
  }

  private val cleanupRegistered =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Register `dir` for recursive deletion at JVM exit (idempotent per
    * dir). `DROP TABLE` on an EXTERNAL table does not delete its data,
    * so without this every application would leave its bucket layout
    * in tmpdir forever.
    *
    * Registered through Hadoop's ShutdownHookManager at a priority
    * BELOW both Spark's hook chain (installed at
    * FileSystem.SHUTDOWN_HOOK_PRIORITY + 30) and the FileSystem cache
    * closer (priority 10): Hadoop runs hooks in DESCENDING priority,
    * so the delete is ordered strictly AFTER SparkContext shutdown and
    * filesystem close instead of racing them from an unordered
    * `Runtime` hook (a concurrent delete under a task still flushing
    * its bucket files could turn a clean exit into a spurious IO
    * error). */
  def deleteOnExit(dir: String): Unit =
    if (cleanupRegistered.putIfAbsent(dir, java.lang.Boolean.TRUE) == null) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      // Explicit 10-minute timeout: Hadoop caps hooks without one at
      // hadoop.service.shutdown.timeout (default ~30 s), which a large
      // bucket layout's recursive delete can exceed — the old unbounded
      // Runtime hook would have finished where the default budget
      // truncates mid-tree.
      org.apache.hadoop.util.ShutdownHookManager.get()
        .addShutdownHook(new Runnable {
          override def run(): Unit = rm(new java.io.File(dir))
        }, 5, 10, java.util.concurrent.TimeUnit.MINUTES)
    }
}
