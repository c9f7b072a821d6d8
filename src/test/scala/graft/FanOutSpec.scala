package graft

import org.apache.spark.sql.functions._
import graft.sources.FanOut

/** The r21 scale-adaptive fan-out: small unsplittable inputs get ONE
  * deterministic hash repartition to defaultParallelism; big inputs
  * (or a disabled conf) pass through untouched.  The gate is the
  * table's on-disk size, so at production scale the helper is a
  * no-op by construction. */
class FanOutSpec extends SparkSpec {

  private def writeTable(): String = {
    val dir = java.nio.file.Files.createTempDirectory("fanout_spec").toString
    spark.range(0, 1000).select(col("id"), (col("id") * 2).as("v"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/t.parquet")
    s"$dir/t.parquet"
  }

  test("below the size threshold: repartitions to defaultParallelism, rows unchanged") {
    val path = writeTable()
    val df = spark.read.parquet(path)
    val out = FanOut.small(df, path, Seq(col("id")))
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(out.count() == 1000L)
    // pure exchange, and the row->partition map is deterministic (hash
    // on the key): two independent invocations place every row the
    // same way — the task-retry safety the round-robin form lacks
    val a = out.withColumn("p", spark_partition_id()).select("id", "p").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = FanOut.small(spark.read.parquet(path), path, Seq(col("id")))
      .withColumn("p", spark_partition_id()).select("id", "p").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b, "hash fan-out must be deterministic under re-execution")
  }

  test("above the threshold (or sized-unreadable path): no-op") {
    val path = writeTable()
    val df = spark.read.parquet(path)
    withSQLConf(FanOut.MaxBytesConf -> "1") { // table is bigger than 1 byte
      val out = FanOut.small(df, path, Seq(col("id")))
      assert(out.queryExecution.logical eq df.queryExecution.logical,
        "above maxBytes the frame must pass through untouched")
    }
    // unreadable path -> sized as Long.MaxValue -> no-op, never a throw
    val out2 = FanOut.small(df, "/nonexistent/nowhere.parquet", Seq(col("id")))
    assert(out2.queryExecution.logical eq df.queryExecution.logical)
  }

  test("maxBytes <= 0 disables fan-out") {
    val path = writeTable()
    val df = spark.read.parquet(path)
    withSQLConf(FanOut.MaxBytesConf -> "0") {
      assert(FanOut.small(df, path, Seq(col("id")))
        .queryExecution.logical eq df.queryExecution.logical)
    }
  }
}
