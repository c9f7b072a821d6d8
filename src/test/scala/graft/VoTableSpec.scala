package graft

import org.apache.spark.sql.types._
import graft.core.EzFrame
import graft.sources.VoTable

class VoTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempFile("graft_vot", ".vot").toString

  test("round trip with units and description") {
    val df = Seq((266.405, -28.936, 17L, "SgrA*"), (83.633, 22.014, 9L, "M1"))
      .toDF("ra", "dec", "nobs", "name")
    val ez = EzFrame(df).setUnit("ra", "deg").setUnit("dec", "deg")
      .setHeader("DESCRIPTION", "test catalog")
    val path = tmp()
    VoTable.write(ez, path)
    val back = VoTable.read(spark, path)
    assert(back.schema("ra").dataType == DoubleType)
    assert(back.schema("nobs").dataType == LongType)
    assert(back.meta.units("ra") == "deg")
    assert(back.meta.header("DESCRIPTION") == "test catalog")
    val rows = back.df.orderBy("name").collect()
    assert(rows.map(_.getString(3)).toSeq == Seq("M1", "SgrA*"))
    assert(rows.map(_.getDouble(0)).toSeq == Seq(83.633, 266.405))
  }

  test("reads a hand-written VOTable with empty cells as nulls") {
    val path = tmp()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      """<?xml version="1.0"?>
        |<VOTABLE version="1.4">
        |  <RESOURCE>
        |    <TABLE>
        |      <FIELD name="x" datatype="double" unit="mag"/>
        |      <FIELD name="tag" datatype="char" arraysize="*"/>
        |      <DATA><TABLEDATA>
        |        <TR><TD>1.5</TD><TD>a &amp; b</TD></TR>
        |        <TR><TD></TD><TD>c</TD></TR>
        |      </TABLEDATA></DATA>
        |    </TABLE>
        |  </RESOURCE>
        |</VOTABLE>
        |""".stripMargin)
    val ez = VoTable.read(spark, path)
    assert(ez.count() == 2)
    assert(ez.meta.units("x") == "mag")
    val rows = ez.df.orderBy("tag").collect()
    assert(rows(0).getString(1) == "a & b") // entity unescaped by the parser
    assert(rows(1).isNullAt(0))             // empty TD -> null
  }
}
