package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

/** The fused md5-prefix key kernel (r22) must stay BIT-IDENTICAL to
  * the expression-composed form it replaced —
  * `conv(substring(md5(s), 1, hexChars), 16, 10)::BIGINT` — for every
  * hexChars the engine uses (6: sampling buckets / q63 / q91 seeds,
  * 8: DSIR gram buckets / resample uniforms, 15: portable simhash
  * token hashes), because the SQL oracles recompute exactly the
  * composed form. */
class Md5PrefixSpec extends SparkSpec {
  import spark.implicits._

  test("md5Prefix == conv(substring(md5(s), 1, h), 16, 10) for h in {6, 8, 15}") {
    val rnd = new scala.util.Random(7)
    val strs = Seq("", "a", "hello world", "0", "-17", "the quick brown fox") ++
      (1 to 200).map(_ => rnd.alphanumeric.take(rnd.nextInt(40) + 1).mkString) ++
      (1 to 20).map(i => s"unicode-é-λ-$i") // UTF-8 multi-byte: md5 is over bytes
    val df = strs.toDF("s")
    for (h <- Seq(1, 6, 8, 15)) {
      val rows = df.select(
        graft.functions.WindowHash.md5Prefix(col("s"), h).as("fused"),
        conv(substring(md5(col("s").cast(BinaryType)), 1, h), 16, 10)
          .cast(LongType).as("composed")).collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"hexChars=$h: fused ${r.getLong(0)} != composed ${r.getLong(1)}"))
    }
    // null stays null (the composed form's null propagation)
    val n = Seq(Option.empty[String]).toDF("s")
      .select(graft.functions.WindowHash.md5Prefix(col("s"), 8)).head()
    assert(n.isNullAt(0))
    // long ids through the cast path (the md5Key shape)
    val ids = (0L until 100L).toDF("id")
    val idRows = ids.select(
      graft.functions.WindowHash.md5Prefix(col("id").cast(StringType), 6).as("fused"),
      conv(substring(md5(col("id").cast(StringType)), 1, 6), 16, 10)
        .cast(LongType).as("composed")).collect()
    idRows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }
}
