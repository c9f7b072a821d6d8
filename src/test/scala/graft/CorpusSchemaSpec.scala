package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus seam guard (round-11, after the round-10 events.parquet
  * regeneration silently changed `ts` from TIMESTAMP(NANOS)-as-long to
  * native timestamp[us] and took 8 queries down with an opaque
  * analysis error): probe every driver-generated table at every scale
  * factor and fail with a NAMED table/column/type message the moment
  * the testdata schema drifts outside what the engine accepts.
  *
  * This is intentionally a type-class check, not an exact-schema pin —
  * the driver adding a column or widening int32→int64 is fine; a type
  * the engine has no read path for is not.
  */
class CorpusSchemaSpec extends SparkSpec {

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1").filter(d => new java.io.File(d).isDirectory)

  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Types every engine path (EzFrame ops, NumpyExpr, oracle compare,
    * writers) can carry end-to-end. */
  private def accepted(t: DataType): Boolean = t match {
    case _: IntegerType | _: LongType | _: ShortType | _: ByteType => true
    case _: DoubleType | _: FloatType | _: DecimalType => true
    case _: StringType | _: BooleanType | _: BinaryType => true
    case _: TimestampType | _: TimestampNTZType | _: DateType => true
    case ArrayType(et, _) => accepted(et)
    case _ => false
  }

  test("every corpus table at every scale factor carries only engine-readable column types") {
    for (dir <- sfDirs; tbl <- tables) {
      val f = s"$dir/$tbl.parquet"
      assert(new java.io.File(f).exists(), s"corpus table missing: $f")
      // events goes through the engine's normalizing reader (it owns
      // the ts-encoding branch); everything else through the plain scan
      val df = if (tbl == "events") SparkEntry.events(spark, dir)
               else spark.read.parquet(f)
      df.schema.fields.foreach { fld =>
        assert(accepted(fld.dataType),
          s"$dir/$tbl.parquet: column '${fld.name}' has type ${fld.dataType} " +
            "the engine has no read path for — did the driver regenerate the corpus " +
            "with a new encoding? Extend SparkEntry/sources to accept it.")
      }
    }
  }

  test("events reader normalizes ts to session-zoned TIMESTAMP and executes") {
    // sf0.001 only: this runs a real scan, not just schema inference.
    val ev = SparkEntry.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == TimestampType,
      s"events.ts must normalize to TIMESTAMP, got ${ev.schema("ts").dataType}")
    val r = ev.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"),
      count(lit(1)).as("n")).collect().head
    assert(r.getAs[Long]("n") > 0, "events table is empty")
    assert(r.getAs[java.sql.Timestamp]("lo") != null, "ts min is null — decode broken")
    assert(r.getAs[java.sql.Timestamp]("hi").after(r.getAs[java.sql.Timestamp]("lo")),
      "ts range collapsed — decode broken")
  }

  test("lineitem/orders date columns decode as timestamps with sane ranges") {
    // the other two timestamp-bearing tables, same silent-change hazard
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    for ((df, c) <- Seq((li, "l_shipdate"), (o, "o_orderdate"))) {
      val t = df.schema(c).dataType
      assert(t == TimestampType || t == TimestampNTZType || t == DateType,
        s"$c: expected a temporal type, got $t")
      val n = df.filter(col(c).isNull).count()
      assert(n == 0, s"$c: $n null values after decode")
    }
  }
}
