package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.core.{EzFrame, EzMeta}

/** Property fuzz of the alias-resolution layer against a direct model
  * of the reference's semantics (ezdata/simpletable.py:2002–2019):
  *
  *  - non-caseless: `self._aliases.get(colname, colname)` — one dict
  *    lookup, no column-first check, so an alias key shadowing a
  *    physical column resolves to the alias TARGET;
  *  - caseless: `maps = {k.lower(): v for k, v in aliases}` then
  *    `maps.update((k.lower(), k) for k in keys())` — columns
  *    OVERRIDE aliases in one lowercase dict, and among caselessly-
  *    colliding alias keys the LAST defined wins (dict build order).
  *
  * The generator drives (alias graphs × caseless flag × name-case
  * collisions): column pools with caseless collisions baked in,
  * random alias sequences (keys may shadow columns exactly or
  * caselessly, targets always physical — setAlias's loud contract),
  * redefinitions of the same key, and probes over every column name,
  * alias key, case-mangled variants, and unknown names. */
class AliasResolutionPropertySpec extends SparkSpec {
  import spark.implicits._

  // physical column pool with deliberate caseless collisions (Vmag/vmag)
  private val ColPools: Seq[Seq[String]] = Seq(
    Seq("ra", "dec", "Vmag", "vmag"),
    Seq("logTe", "LOGTE", "M_ini"),
    Seq("a", "A", "b"))

  private val aliasKeyGen = Gen.oneOf(
    "RA", "Ra", "ra", "mass", "MASS", "Vmag", "vmag", "VMAG",
    "logT", "LOGT", "a", "A", "x", "alias1")

  private case class Case(cols: Seq[String], defs: List[(String, String)],
                          caseless: Boolean, probe: String)

  private val caseGen: Gen[Case] = for {
    cols <- Gen.oneOf(ColPools)
    n <- Gen.choose(0, 6)
    defs <- Gen.listOfN(n, for {
      k <- aliasKeyGen
      t <- Gen.oneOf(cols)
    } yield (k, t))
    caseless <- Gen.oneOf(true, false)
    probe <- Gen.oneOf(
      Gen.oneOf(cols),                      // a physical name
      aliasKeyGen,                          // an alias key (maybe undefined)
      Gen.oneOf(cols).map(_.toUpperCase),   // case-mangled column
      Gen.const("no_such_name"))
  } yield Case(cols, defs, caseless, probe)

  /** Direct port of the reference's resolve_alias, dict semantics via
    * LinkedHashMap (redefinition keeps the original position — Python
    * dict update — which the keyed map build reproduces). */
  private def model(c: Case): String = {
    val aliases = collection.mutable.LinkedHashMap.empty[String, String]
    c.defs.foreach { case (k, v) => aliases(k) = v }
    if (c.caseless) {
      val maps = collection.mutable.LinkedHashMap.empty[String, String]
      aliases.foreach { case (k, v) => maps(k.toLowerCase) = v }
      c.cols.foreach(col => maps(col.toLowerCase) = col)
      maps.getOrElse(c.probe.toLowerCase, c.probe)
    } else aliases.getOrElse(c.probe, c.probe)
  }

  test("resolveAlias matches the reference model over alias graphs × caseless × collisions") {
    (1 to 400).foreach { i =>
      val c = caseGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val df = c.cols.foldLeft(Seq(1).toDF("_seed")) { (d, col) => d.withColumn(col, lit(1.0)) }
        .drop("_seed")
      val ez = c.defs.foldLeft(EzFrame(df, EzMeta(caseless = c.caseless)))(
        (e, kv) => e.setAlias(kv._1, kv._2))
      val got = ez.resolveAlias(c.probe)
      val want = model(c)
      assert(got == want,
        s"cols=${c.cols} defs=${c.defs} caseless=${c.caseless} probe=${c.probe}: " +
          s"got $got want $want")
    }
  }

  test("the pinned corners: shadowing alias wins non-caseless; caseless column beats exact alias") {
    // non-caseless: alias key 'a' shadows physical column 'a' → target
    val df = Seq((1.0, 2.0)).toDF("a", "b")
    val shadowed = EzFrame(df).setAlias("a", "b")
    assert(shadowed.resolveAlias("a") == "b")
    // caseless: alias 'A' → b exists, but physical column 'a' collides
    // caselessly and columns override — even for the exact-case probe
    val cl = EzFrame(df, EzMeta(caseless = true)).setAlias("A", "b")
    assert(cl.resolveAlias("A") == "a")
    assert(cl.resolveAlias("a") == "a")
    // last-defined alias wins among caseless alias collisions
    val df2 = Seq((1.0, 2.0, 3.0)).toDF("x", "y", "z")
    val two = EzFrame(df2, EzMeta(caseless = true)).setAlias("FOO", "y").setAlias("foo", "z")
    assert(two.resolveAlias("Foo") == "z")
    // redefinition updates in place (dict semantics)
    val redef = EzFrame(df2, EzMeta(caseless = true))
      .setAlias("FOO", "y").setAlias("bar", "x").setAlias("FOO", "z")
    assert(redef.resolveAlias("foo") == "z")
  }

  test("orphan GC: aliases to dropped targets vanish, survivors keep resolving") {
    val df = Seq((1.0, 2.0, 3.0)).toDF("x", "y", "z")
    val ez = EzFrame(df).setAlias("ex", "x").setAlias("why", "y")
    val sel = ez.select("x, z")
    assert(sel.resolveAlias("ex") == "x")
    assert(sel.resolveAlias("why") == "why") // orphan GC'd → unresolved passthrough
    assert(sel.meta.aliases.keySet == Set("ex"))
  }
}
