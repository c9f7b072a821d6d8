package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.DoubleType

/** SQL-text registration for the engine's COMPOSITIONAL scalars.
  *
  * [[Astro]]'s sexagesimal / frame helpers are Column compositions —
  * pure builtin expression trees, already codegen'd — so exposing them
  * to `spark.sql` text needs no custom Expression: the registered
  * builder materializes the same tree from SQL-parsed children (via
  * [[GraftBridge.catalystExpression]], so the analyzer can finish
  * resolving it).  One definition table feeds BOTH registration paths
  * ([[graft.GraftExtensions]] at session build; [[register]] on a live
  * session), so the SQL surface can never drift from the Column API.
  * (`sphdist` and `healpix_ang2pix` are real custom Expressions and
  * keep their own registrations.)
  */
object SqlScalars {

  private def toCol(e: Expression): Column = GraftBridge.column(e)
  private def toExpr(c: Column): Expression = GraftBridge.catalystExpression(c)

  private def litInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal int")
    e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(s"$what must be a literal int, got $other")
    }
  }

  /** (name, arity, usage, builder over SQL-parsed catalyst children). */
  val all: Seq[(String, Int, String, Seq[Expression] => Expression)] = Seq(
    ("hms2deg", 1, "hms2deg('hh:mm:ss.s')",
      (es: Seq[Expression]) => toExpr(Astro.hms2deg(toCol(es.head)))),
    ("dms2deg", 1, "dms2deg('[+-]dd:mm:ss.s')",
      (es: Seq[Expression]) => toExpr(Astro.dms2deg(toCol(es.head)))),
    ("deg2hms", 1, "deg2hms(deg)",
      (es: Seq[Expression]) => toExpr(Astro.deg2hms(toCol(es.head).cast(DoubleType)))),
    ("deg2dms", 1, "deg2dms(deg)",
      (es: Seq[Expression]) => toExpr(Astro.deg2dms(toCol(es.head).cast(DoubleType)))),
    ("gaia_healpix", 2, "gaia_healpix(source_id, level)",
      (es: Seq[Expression]) =>
        toExpr(Astro.gaiaHealpix(toCol(es.head), litInt(es(1), "level")))))

  def builder(arity: Int, usage: String, f: Seq[Expression] => Expression)
      : Seq[Expression] => Expression = { exprs =>
    require(exprs.length == arity, usage)
    f(exprs)
  }

  /** Register the whole table on a live session (the config-free twin
    * of the [[graft.GraftExtensions]] path). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, arity, usage, f) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder(arity, usage, f), "scala_udf")
    }
}
