package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Relational

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int, s: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")

  private lazy val trades = Seq(
    (1L, 7L, ts(5)), (2L, 7L, ts(15)), (3L, 8L, ts(10)), (4L, 9L, ts(1)))
    .toDF("trade_id", "acct", "t")
  private lazy val quotes = Seq(
    (7L, ts(1), 100.0), (7L, ts(10), 110.0), (8L, ts(10), 50.0), (8L, ts(20), 60.0))
    .toDF("acct", "t", "px")

  test("asofJoin picks the latest right row at or before each left row") {
    val j = Relational.asofJoin(trades, quotes, Seq("acct"), "t", "t", Map("px" -> "quote_px"))
      .select("trade_id", "quote_px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(j(1L).contains(100.0)) // 10:05 -> quote at 10:01
    assert(j(2L).contains(110.0)) // 10:15 -> quote at 10:10
    assert(j(3L).contains(50.0))  // equal timestamp is inclusive
    assert(j(4L).isEmpty)         // acct 9 has no quotes -> null (left semantics)
  }

  test("asofJoin ignores null right timestamps; scratch collisions fail loudly") {
    // a null-ts quote satisfies no `right.ts <= left.ts` predicate, but
    // nulls sort FIRST under asc — unfiltered, its payload was carried
    // into every trade before the first real quote
    val nullQuotes = Seq((9L, null.asInstanceOf[Timestamp], 999.0))
      .toDF("acct", "t", "px").unionByName(quotes)
    val j = Relational.asofJoin(trades, nullQuotes, Seq("acct"), "t", "t",
        Map("px" -> "quote_px"))
      .select("trade_id", "quote_px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(j(4L).isEmpty, s"null-ts right row manufactured a match: ${j(4L)}")
    assert(j(1L).contains(100.0) && j(2L).contains(110.0) && j(3L).contains(50.0))
    // scratch-column collisions refuse instead of silently misjoining
    intercept[IllegalArgumentException](Relational.asofJoin(
      trades.withColumn("_graft_side", lit(1)), quotes, Seq("acct"), "t", "t", Map("px" -> "q")))
    intercept[IllegalArgumentException](Relational.rangeJoin(
      trades.withColumn("matched_ts", lit(1)), quotes, Seq("acct"), "t", "t", 300L, Map("px" -> "q")))
    intercept[IllegalArgumentException](Relational.rangeJoin(
      trades, quotes, Seq("acct"), "t", "t", 300L, Map("px" -> "t")))
  }

  test("asofJoin is one shuffle, not a nested-loop join") {
    val j = Relational.asofJoin(trades, quotes, Seq("acct"), "t", "t", Map("px" -> "q"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"))
    assert(plan.contains("Window"), "expected the carry-forward window")
  }

  test("rangeJoin pairs rows within the window, microsecond-exact") {
    val j = Relational.rangeJoin(trades, quotes, Seq("acct"), "t", "t",
        windowSec = 300L, Map("px" -> "px"))
      .select("trade_id", "px").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    // trade1@10:05: quotes 10:01 (4min) and 10:10 (5min, inclusive) match
    assert(j == Set((1L, 100.0), (1L, 110.0), (2L, 110.0), (3L, 50.0)))
  }

  test("saltedJoin returns exactly the plain join under forced shuffle + a hot key") {
    // skewed probe: one hot key carries half the rows
    val probe = spark.range(0, 4000).toDF("row_id")
      .withColumn("k", when(col("row_id") % 2 === 0, lit(7L)).otherwise(pmod(col("row_id"), lit(50L))))
      .withColumn("v", col("row_id") * 3)
    val build = spark.range(0, 50).toDF("k").withColumn("w", col("k") * 100)
    val plain = probe.join(build, Seq("k")).select("row_id", "k", "v", "w")
      .collect().map(_.toSeq).toSet
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val salted = Relational.saltedJoin(probe, build, Seq("k"), col("row_id"), salts = 8)
        .select("row_id", "k", "v", "w")
      assert(salted.collect().map(_.toSeq).toSet == plain)
      // the shuffle key is (k, salt): the physical join keys include the salt
      val plan = salted.queryExecution.executedPlan.toString
      assert(plan.contains("_graft_salt"), s"salt missing from the physical join keys:\n$plan")
      // left join keeps unmatched probe rows exactly once
      val probe2 = probe.withColumn("k", when(col("row_id") === 0, lit(999L)).otherwise(col("k")))
      val leftPlain = probe2.join(build, Seq("k"), "left").count()
      assert(Relational.saltedJoin(probe2, build, Seq("k"), col("row_id"), 8, "left").count()
        == leftPlain)
    }
  }

  test("saltedJoin spreads a hot key across reducers (partition histogram)") {
    val probe = spark.range(0, 2048).toDF("row_id").withColumn("k", lit(1L))
    val build = spark.range(0, 4).toDF("k").withColumn("w", col("k"))
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "16") {
      // all 2048 probe rows share key 1 -> a plain shuffle join puts them
      // on ONE reducer; the salted shuffle must land them on many
      val salted = Relational.saltedJoin(probe, build, Seq("k"), col("row_id"), salts = 8)
      val parts = salted.groupBy(spark_partition_id().as("p")).count()
        .collect().map(_.getLong(1))
      assert(parts.length >= 4, s"hot key stayed on ${parts.length} reducer(s)")
      assert(parts.max <= 2048 / 2, s"one reducer still holds ${parts.max} of 2048 rows")
    }
  }

  test("bloomPrunedJoin returns exactly the plain join (inner and left_semi), any fpp") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val urgent = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      for (jt <- Seq("inner", "left_semi"); fpp <- Seq(0.3, 0.01)) {
        val plain = li.join(urgent, Seq("l_orderkey"), jt)
        val pruned = Relational.bloomPrunedJoin(li, urgent, Seq("l_orderkey"), fpp, jt)
        assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty,
          s"$jt/fpp=$fpp diverged from the plain join")
      }
    }
  }

  test("bloomPrune keeps every matching row and roughly fpp of the rest") {
    val big = spark.range(0, 20000).toDF("k")
    val small = spark.range(0, 100).toDF("k") // 0.5% match rate
    val kept = Relational.bloomPrune(big, small, Seq("k"), fpp = 0.02)
    val keptKeys = kept.collect().map(_.getLong(0)).toSet
    (0L until 100L).foreach(k => assert(keptKeys.contains(k), s"bloom lost matching key $k"))
    // ~100 matches + ~2% of 19900 false positives, generous ceiling
    assert(kept.count() <= 100 + (19900 * 0.1).toLong,
      s"pruning kept ${kept.count()} of 20000 - filter not selective")
  }

  test("bloomPrunedJoin plan: the membership predicate rides below the big side's exchange") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val urgent = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"))
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
      val joined = Relational.bloomPrunedJoin(li, urgent, Seq("l_orderkey"))
      val plan = joined.queryExecution.executedPlan
      // find every Exchange; the big-side one must have the bloom
      // predicate strictly beneath it (pre-shuffle pruning)
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty, s"expected a shuffle join:\n$plan")
      // the exchange scanning the BIG table must have the bloom
      // predicate beneath it (pre-shuffle pruning); Catalyst may also
      // infer it onto the small side via join-key constraints - fine
      val bigSide = exchanges.filter(_.child.toString.contains("lineitem.parquet"))
      assert(bigSide.nonEmpty && bigSide.forall(_.child.toString.contains("bloom_might_contain")),
        s"bloom predicate must sit below the big side's exchange:\n$plan")
    }
  }

  test("review fixes: as-of carries a matched null, rejects collisions; rangeJoin guards window") {
    import spark.implicits._
    import graft.operators.Relational
    val right = Seq(("k", 1L, Some(5.0)), ("k", 2L, None))
      .toDF("key", "ts", "v")
      .select(col("key"), col("ts").cast("timestamp").as("ts"), col("v"))
    val left = Seq(("k", 3L)).toDF("key", "ts")
      .select(col("key"), col("ts").cast("timestamp").as("ts"))
    val j = Relational.asofJoin(left, right, Seq("key"), "ts", "ts", Map("v" -> "price"))
      .collect()
    // the LATEST match (ts=2) has v=null; per-column ignoreNulls carry
    // used to reach past it to the stale ts=1 value 5.0
    assert(j.length == 1 && j.head.isNullAt(j.head.fieldIndex("price")),
      s"as-of must deliver the matched row's null, got ${j.toSeq}")
    // an output name colliding with a left column is refused loudly
    intercept[IllegalArgumentException](
      Relational.asofJoin(left.withColumn("price", lit(1.0)), right,
        Seq("key"), "ts", "ts", Map("v" -> "price")))
    intercept[IllegalArgumentException](
      Relational.rangeJoin(left, right, Seq("key"), "ts", "ts", windowSec = 0, Map("v" -> "p")))
  }
}
