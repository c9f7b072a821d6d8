package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch main: writes a small Arrow IPC file for the pyarrow
  * cross-engine interop check (driver tooling has pyarrow; the library
  * itself never does). */
object ArrowInteropProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val df = Seq(
      (1L, "héllo", Seq(1.0, 2.0), java.sql.Timestamp.valueOf("2023-06-01 12:34:56.789")),
      (2L, "world", Seq(3.0), null.asInstanceOf[java.sql.Timestamp]))
      .toDF("id", "s", "arr", "ts")
    graft.sources.ArrowIpc.write(graft.core.EzFrame(df), args.head)
    spark.stop()
  }
}
