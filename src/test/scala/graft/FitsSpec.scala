package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.EzFrame
import graft.sources.Fits

class FitsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempFile("graft_fits", ".fits").toString

  test("binary-table round trip: types, values, units, header") {
    val df = Seq(
      (1L, 1, 1.5, 2.5f, true, "alpha"),
      (2L, -7, -0.25, 0.5f, false, "bet"),
      (3L, 42, 1e300, 3.25f, true, "c"))
      .toDF("id", "n", "x", "f", "flag", "name")
    val ez = EzFrame(df).setUnit("x", "mag").setHeader("OBSERVER", "graft")
    val path = tmp()
    Fits.write(ez, path)
    val back = Fits.read(spark, path)
    assert(back.schema("id").dataType == LongType)
    assert(back.schema("n").dataType == IntegerType)
    assert(back.schema("x").dataType == DoubleType)
    assert(back.schema("f").dataType == FloatType)
    assert(back.schema("flag").dataType == BooleanType)
    assert(back.schema("name").dataType == StringType)
    assert(back.meta.units("x") == "mag")
    assert(back.meta.header.get("OBSERVER").contains("graft"))
    val rows = back.df.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows.map(_.getInt(1)).toSeq == Seq(1, -7, 42))
    assert(rows.map(_.getDouble(2)).toSeq == Seq(1.5, -0.25, 1e300))
    assert(rows.map(_.getFloat(3)).toSeq == Seq(2.5f, 0.5f, 3.25f))
    assert(rows.map(_.getBoolean(4)).toSeq == Seq(true, false, true))
    assert(rows.map(_.getString(5)).toSeq == Seq("alpha", "bet", "c"))
  }

  test("file structure: 2880-byte blocks, primary HDU skipped") {
    val df = Seq((1.0, 2.0)).toDF("a", "b")
    val path = tmp()
    Fits.write(EzFrame(df), path)
    val len = new java.io.File(path).length()
    assert(len % 2880 == 0, s"file length $len not block-aligned")
    val h = Fits.readHeader(path)
    assert(h.nRows == 1 && h.rowBytes == 16)
    assert(h.cols.map(_.name) == Seq("a", "b"))
  }

  test("distributed read over many partitions agrees with sequential") {
    val df = spark.range(10000).select(col("id"),
      (col("id") * 2).cast(DoubleType).as("v"))
    val path = tmp()
    Fits.write(EzFrame(df), path)
    val back = Fits.read(spark, path, partitions = 8)
    assert(back.df.rdd.getNumPartitions == 8)
    assert(back.count() == 10000L)
    val s = back.df.agg(sum("id"), sum("v")).collect().head
    assert(s.getLong(0) == 49995000L && s.getDouble(1) == 99990000.0)
  }

  test("queryable through the frame API with predicate") {
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val path = tmp()
    Fits.write(EzFrame(df).setAlias("val", "v"), path)
    val back = Fits.read(spark, path).setAlias("val", "v")
    assert(back.selectWhere("k", "val > 15").count() == 2)
  }

  test("append adds a second BINTABLE HDU; both readable by hdu index") {
    val path = tmp()
    Fits.write(EzFrame(Seq((1L, "a"), (2L, "b")).toDF("id", "tag")), path)
    Fits.append(EzFrame(Seq((10.0, 0.5f), (20.0, 1.5f), (30.0, 2.5f)).toDF("x", "y")), path)
    assert(new java.io.File(path).length() % 2880 == 0)
    val first = Fits.read(spark, path)
    assert(first.columns == Seq("id", "tag") && first.count() == 2)
    val second = Fits.read(spark, path, hdu = 2)
    assert(second.columns == Seq("x", "y") && second.count() == 3)
    assert(second.df.orderBy("x").collect().map(_.getDouble(0)).toSeq == Seq(10.0, 20.0, 30.0))
    val err = intercept[IllegalArgumentException](Fits.readHeader(path, hdu = 3))
    assert(err.getMessage.contains("no BINTABLE extension #3"))
  }

  test("append to a missing file creates it (primary + table)") {
    val path = java.nio.file.Files.createTempDirectory("graft_fits").resolve("new.fits").toString
    Fits.append(EzFrame(Seq((1L, 2.0)).toDF("a", "b")), path)
    val back = Fits.read(spark, path)
    assert(back.count() == 1 && back.columns == Seq("a", "b"))
  }
}
