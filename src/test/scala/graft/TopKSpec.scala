package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.TopK

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = spark.read
    .parquet("/root/testdata/sf0.001/orders.parquet")

  test("custom operator agrees with the window row_number formulation") {
    val custom = TopK.perKey(orders, Seq("o_custkey"), "o_totalprice", k = 3, descending = true)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val reference = orders
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ties on o_totalprice may legitimately differ; compare by price sets
    val customPrices = TopK.perKey(orders, Seq("o_custkey"), "o_totalprice", 3, descending = true)
      .groupBy("o_custkey").agg(sum(col("o_totalprice")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val refPrices = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .groupBy("o_custkey").agg(sum(col("o_totalprice")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(customPrices == refPrices)
    assert(custom.size == reference.size)
  }

  test("plan shape: two TopKPerKeyExec phases around one exchange, no Window/Sort of full data") {
    val df = TopK.perKey(orders, Seq("o_custkey"), "o_totalprice", 2, descending = true)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"custom exec missing:\n$plan")
    assert(plan.split("TopKPerKey").length >= 3, "expected partial + final phases")
    assert(plan.contains("Exchange hashpartitioning"), "final phase must cluster by key")
    assert(!plan.contains("Window"), "custom operator must not fall back to Window")
  }

  test("ascending and k=1 (min per key)") {
    val df = Seq((1L, 5.0), (1L, 2.0), (2L, 9.0), (2L, 1.0), (2L, 4.0)).toDF("k", "v")
    val r = TopK.perKey(df, Seq("k"), "v", k = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(r == Map(1L -> 2.0, 2L -> 1.0))
  }

  test("k larger than group size returns whole groups") {
    val df = Seq((1L, 5.0), (2L, 9.0)).toDF("k", "v")
    assert(TopK.perKey(df, Seq("k"), "v", k = 10).count() == 2)
  }

  test("float keys normalize: -0.0 and 0.0 form ONE group like Spark's own operators") {
    import spark.implicits._
    val df = Seq((-0.0, 1L), (0.0, 2L), (1.0, 3L)).toDF("k", "v")
    val top = graft.plans.TopK.perKeyOrdered(df, Seq("k"), Seq("v" -> true), 1)
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    assert(top.length == 2, s"signed zeros split into separate key groups: ${top.toSeq}")
    assert(top.toMap.values.toSet == Set(2L, 3L)) // zero group keeps its max v
  }
}
