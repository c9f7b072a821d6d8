package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the salted-join rescue on the hot-key rehearsal corpus
  * (ScaleRehearsal `join` mode): orders⋈customer on the custkey that
  * ~16% of all orders share, with broadcast DISABLED and AQE OFF — the
  * configuration where a plain shuffle join serializes the hot key on
  * one reducer and [[graft.operators.Relational.saltedJoin]] is the
  * remaining tool.  (With AQE on, skew-join split absorbs this case —
  * see the round-13 join rehearsal in BASELINE.md; this probe pins the
  * AQE-ineligible corner.)
  *
  * Usage: runMain graft.tools.SkewJoinProbe <joinCorpusDir> [salts]
  * Prints min-of-2 wall seconds for the plain and salted variants of
  * the same aggregate, plus the max single-task input rows of the
  * join stage (the straggler evidence).
  */
object SkewJoinProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_scale5x_join"
    val salts = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
      .select("o_custkey", "c_mktsegment")

    def agg(j: org.apache.spark.sql.DataFrame) =
      j.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          // decimal sum: exact, so the parity check is order-independent
          sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(30, 2)))
            .as("sum_price"))

    // plan factories: a FRESH DataFrame per run, otherwise Spark reuses
    // the first run's shuffle map outputs and the retry measures only
    // the final stage
    def plain() = agg(orders.join(cust, "o_custkey"))
    def salted() = agg(graft.operators.Relational.saltedJoin(
      orders, cust, Seq("o_custkey"), col("o_orderkey"), salts))

    def time(mk: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime
      mk().collect()
      (System.nanoTime - t0) / 1e9
    }
    // warm the scans once so both variants measure compute, not IO cache
    orders.count(); cust.count()
    val pT = (1 to 2).map(_ => time(plain)).min
    val sT = (1 to 2).map(_ => time(salted)).min
    // sanity: identical results
    val a = plain().collect().map(_.toSeq).toSet
    val b = salted().collect().map(_.toSeq).toSet
    require(a == b, "salted result diverged from plain join")
    println(f"plain_smj_sec=$pT%.2f salted_sec=$sT%.2f salts=$salts")
    spark.stop()
  }
}
