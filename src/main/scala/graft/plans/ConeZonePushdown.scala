package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.functions.SphDistExpr

/** Cone-search sargability: rewrite `sphdist(ra, dec, ra0, dec0) ≤ r`
  * filters to carry range pre-filters the scan can use.
  *
  * The reference's cone search (ezdata/simpletable.py:3056–3097) is a
  * haversine predicate — correct, but opaque to every storage layer:
  * `degrees(2·asin(√…)) ≤ r` never becomes a parquet row-group or
  * partition prune, so at 100 TB a 1°-radius query scans the whole
  * sky.  Its zone search (simpletable.py:3099–3137) exists precisely
  * because boxes prune.  This rule makes the engine derive the zone
  * from the cone automatically, for any Filter containing a
  * [[SphDistExpr]] comparison against a constant radius with a
  * constant center — including raw `spark.sql("… WHERE sphdist(…) <
  * r")` text no curated API ever sees:
  *
  *  - declination band `dec ∈ [dec0−r, dec0+r]` — attribute range
  *    comparisons, pushed to the scan as min/max-prunable filters.
  *    Sound for canonical dec ∈ [−90, 90] because the great-circle
  *    separation is never smaller than |Δdec|; for NON-canonical dec
  *    each band carries an `OR |dec| > 90` escape so out-of-domain
  *    rows fall through to the exact residual instead of being
  *    silently banded out (the escape stays single-column-translatable
  *    and is stats-impossible on canonical data, so pruning yield is
  *    unchanged; the sargableRaBand flag asserts the canonical
  *    convention for both coordinates and skips it).
  *  - RA guard, when the cap excludes the poles (|dec0|+r < 90): the
  *    cap's RA half-width is Δ = asin(sin r ⁄ cos dec0) (the spherical
  *    cap bounding box; same bound Q3C/pgSphere use).  Because RA is
  *    only defined mod 360 and the column's convention ([0,360) vs
  *    [−180,180]) is unknowable here, the default guard is the
  *    convention-free `pmod(ra − lo, 360) ≤ 2Δ` — not sargable, but it
  *    short-circuits the 6-trig-call haversine for every row outside
  *    the band.  Set `spark.graft.cone.sargableRaBand=true` to assert
  *    the [0, 360) convention and get plain (or wraparound-Or) range
  *    predicates that prune at the scan.
  *
  * The original haversine conjunct is always kept as the exact
  * residual, so the rewrite can only ever be a superset pre-filter —
  * results are bit-identical with the rule on or off.  Band bounds get
  * a 1e-9 relative pad so libm noise in the Δ derivation can never
  * shave a boundary row.  Registered by [[graft.GraftExtensions]]
  * (operator-batch placement: bands flow through joins/projects) and
  * installable on a live session via [[ConeZonePushdown.install]]
  * (`experimental.extraOptimizations`; bands still reach the scan via
  * `PhysicalOperation` collection).
  */
object ConeZonePushdown extends Rule[LogicalPlan] with PredicateHelper {

  /** Idempotent install on an existing session (no config restart). */
  def install(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(ConeZonePushdown))
      spark.experimental.extraOptimizations = cur :+ ConeZonePushdown
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val bands = conjuncts.flatMap(bandsFor)
        .filterNot(b => conjuncts.exists(_.semanticEquals(b)))
        .foldLeft(Seq.empty[Expression]) { (acc, b) =>  // self-dedup (two cones could derive one band)
          if (acc.exists(_.semanticEquals(b))) acc else acc :+ b
        }
      if (bands.isEmpty) f
      // bands first: the cheap guards short-circuit the trig residual
      else Filter((bands ++ conjuncts).reduce(And), child)
  }

  private def constDouble(e: Expression): Option[Double] =
    if (e.foldable && e.dataType == DoubleType)
      try e.eval(null) match {
        case d: java.lang.Double => Some(d.doubleValue())
        case _ => None
      } catch { case _: Exception => None }
    else None

  /** (raExpr, decExpr, ra0, dec0) when exactly one end of the sphdist
    * is a constant center and the other is a live (ra, dec) pair. */
  private def coneOf(s: SphDistExpr): Option[(Expression, Expression, Double, Double)] = {
    def live(e: Expression): Boolean = e.deterministic && !e.foldable && e.dataType == DoubleType
    (constDouble(s.third), constDouble(s.fourth)) match {
      case (Some(ra0), Some(dec0)) if live(s.first) && live(s.second) =>
        Some((s.first, s.second, ra0, dec0))
      case _ => (constDouble(s.first), constDouble(s.second)) match {
        case (Some(ra0), Some(dec0)) if live(s.third) && live(s.fourth) =>
          Some((s.third, s.fourth, ra0, dec0))
        case _ => None
      }
    }
  }

  private def bandsFor(conjunct: Expression): Seq[Expression] = {
    val cone = conjunct match {
      case LessThanOrEqual(s: SphDistExpr, r) => coneOf(s).zip(constDouble(r))
      case LessThan(s: SphDistExpr, r) => coneOf(s).zip(constDouble(r))
      case GreaterThanOrEqual(r, s: SphDistExpr) => coneOf(s).zip(constDouble(r))
      case GreaterThan(r, s: SphDistExpr) => coneOf(s).zip(constDouble(r))
      case _ => None
    }
    cone match {
      case Some(((ra, dec, ra0, dec0), r)) if !r.isNaN => bands(ra, dec, ra0, dec0, r)
      case _ => Nil
    }
  }

  private def pad(x: Double): Double = x * (1 + 1e-9) + 1e-9

  private def bands(ra: Expression, dec: Expression,
                    ra0: Double, dec0: Double, r: Double): Seq[Expression] = {
    // a NON-CANONICAL CENTER (|dec0| > 90, plan-time literal) breaks
    // the sep >= |Δdec| fact for CANONICAL rows too (e.g. dec0=100:
    // the row (ra0+180, 80) is at separation ~0 but outside any
    // [dec0-r, dec0+r] band) — the row-side escape can't help there,
    // so emit no bands at all and leave the raw predicate untouched
    if (dec0 < -90.0 || dec0 > 90.0 || dec0.isNaN) return Nil
    val sargable = conf.getConfString("spark.graft.cone.sargableRaBand", "false") == "true"
    // SOUNDNESS ESCAPE for non-canonical declination: sep >= |Δdec| —
    // the fact every band here rests on — only holds for dec ∈ [−90,
    // 90] (outside it the haversine's cos(dec) terms can make the
    // computed separation SMALLER than |Δdec|, so a bare band would
    // drop rows the raw predicate keeps).  Rather than trusting an
    // unverifiable data convention, each band lets out-of-domain rows
    // fall through to the exact residual: `band OR |dec| > 90`.  The
    // escape is PER CONJUNCT so the dec comparisons stay single-column
    // Or-trees that still translate to parquet row-group filters (one
    // combined Or would let the untranslatable pmod RA leaf poison the
    // dec push entirely); on canonical-dec data the extra disjuncts are
    // stats-impossible, so pruning yield is unchanged.  Under the
    // sargableRaBand flag the caller asserts the canonical convention
    // (for RA *and* dec) and the escape is skipped.
    def escaped(band: Expression): Expression =
      if (sargable) band
      else Or(band, Or(LessThan(dec, Literal(-90.0)), GreaterThan(dec, Literal(90.0))))
    val decBand = Seq(
      escaped(GreaterThanOrEqual(dec, Literal(dec0 - pad(math.max(r, 0.0))))),
      escaped(LessThanOrEqual(dec, Literal(dec0 + pad(math.max(r, 0.0))))))
    val raGuard =
      if (r <= 0 || r >= 90 || math.abs(dec0) + r >= 90) Nil
      else {
        val sinRatio = math.sin(math.toRadians(r)) / math.cos(math.toRadians(dec0))
        if (sinRatio >= 1) Nil
        else {
          val half = pad(math.toDegrees(math.asin(sinRatio)))
          val lo = ra0 - half
          val hi = ra0 + half
          if (!sargable)
            // convention-free: ra is only defined mod 360
            Seq(escaped(
              LessThanOrEqual(Pmod(Subtract(ra, Literal(lo)), Literal(360.0)), Literal(2 * half))))
          else if (lo >= 0 && hi <= 360)
            Seq(GreaterThanOrEqual(ra, Literal(lo)), LessThanOrEqual(ra, Literal(hi)))
          else {
            // [0, 360) convention asserted; band wraps the origin
            def norm(x: Double) = { val m = x % 360; if (m < 0) m + 360 else m }
            Seq(Or(GreaterThanOrEqual(ra, Literal(norm(lo))), LessThanOrEqual(ra, Literal(norm(hi)))))
          }
        }
      }
    decBand ++ raGuard
  }
}
