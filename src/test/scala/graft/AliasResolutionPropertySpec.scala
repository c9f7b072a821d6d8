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
      // one select of aliased literals — NOT a withColumn fold, which
      // resolves case-insensitively under the default resolver and
      // REPLACES the first of two caselessly-colliding names, leaving
      // a 2-column frame where the pool promised 3 (the r17 red)
      val df = spark.range(1).select(c.cols.map(name => lit(1.0).as(name)): _*)
      assert(df.columns.toSeq == c.cols, "fixture must keep every pool column")
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

  test("caseless-colliding PHYSICAL columns: names resolve (column-order last wins), access throws ambiguous") {
    // The reference's recarray permits schemas like Vmag/vmag and its
    // caseless resolver maps the shared lowercase key to the LAST
    // column (dict overwrite).  Engine contract (EzFrame.caselessMap
    // scaladoc): NAME resolution reproduces that; column ACCESS on the
    // ambiguous name goes through Spark's default case-insensitive
    // resolver and throws — the user must rename or set caseSensitive.
    val df = spark.range(1).select(lit(1.0).as("Vmag"), lit(2.0).as("vmag"), lit(3.0).as("ra"))
    val ez = graft.core.EzFrame(df, EzMeta(caseless = true))
    assert(ez.resolveAlias("VMAG") == "vmag") // last colliding column wins
    assert(ez.resolveAlias("Vmag") == "vmag")
    // keys() names the exact-case column, then resolution maps it to
    // the last colliding column — the reference's dict-overwrite shape
    assert(ez.keys("ra, Vmag") == Seq("ra", "vmag"))
    val err = intercept[org.apache.spark.sql.AnalysisException](ez.get("Vmag"))
    assert(err.getCondition == "AMBIGUOUS_REFERENCE")
  }

  test("orphan GC: aliases to dropped targets vanish, survivors keep resolving") {
    val df = Seq((1.0, 2.0, 3.0)).toDF("x", "y", "z")
    val ez = EzFrame(df).setAlias("ex", "x").setAlias("why", "y")
    val sel = ez.select("x, z")
    assert(sel.resolveAlias("ex") == "x")
    assert(sel.resolveAlias("why") == "why") // orphan GC'd → unresolved passthrough
    assert(sel.meta.aliases.keySet == Set("ex"))
  }

  // ------------------------------------------------------------------
  // resolution THROUGH the query surface: keys()/select()/evalexpr all
  // route names through the same alias layer (the reference resolves
  // aliases inside keys() pattern matching, simpletable.py:2055–2109,
  // and inside evalexpr identifier rewriting, simpletable.py:2710–2747)

  /** The reference-model alias dict for a Case (shared by all three
    * property tests): dict-build with redefinition-in-place. */
  private def modelAliases(defs: List[(String, String)]): collection.mutable.LinkedHashMap[String, String] = {
    val m = collection.mutable.LinkedHashMap.empty[String, String]
    defs.foreach { case (k, v) => m(k) = v }
    m
  }

  private def modelResolve(c: Case): String => String = {
    val aliases = modelAliases(c.defs)
    if (c.caseless) {
      val maps = collection.mutable.LinkedHashMap.empty[String, String]
      aliases.foreach { case (k, v) => maps(k.toLowerCase) = v }
      c.cols.foreach(col => maps(col.toLowerCase) = col)
      name => maps.getOrElse(name.toLowerCase, name)
    } else { name => aliases.getOrElse(name, name) }
  }

  /** Model of the ENGINE's documented keys() contract (full-match,
    * '*'-only wildcard, aliases participate, matches resolve, distinct
    * — the documented deviation from re.match prefix semantics) with
    * the resolution layer supplied by the reference model above. */
  private def modelKeys(c: Case, patterns: String): Seq[String] = {
    val resolve = modelResolve(c)
    val names = c.cols ++ modelAliases(c.defs).keys
    val pats = patterns.split("[ ,]+").filter(_.nonEmpty)
    if (pats.isEmpty || pats.sameElements(Array("*"))) c.cols
    else pats.toSeq.flatMap { p =>
      if (names.contains(p)) Seq(resolve(p))
      else {
        val rx = ("^" + p.split("\\*", -1).map(java.util.regex.Pattern.quote)
          .mkString(".*") + "$").r
        names.filter(n => rx.findFirstIn(n).isDefined).map(resolve)
      }
    }.distinct
  }

  private val patternGen: Gen[String] = for {
    n <- Gen.choose(1, 3)
    parts <- Gen.listOfN(n, Gen.oneOf(
      aliasKeyGen,
      Gen.oneOf(ColPools.flatten),
      Gen.oneOf(ColPools.flatten).map(_.toUpperCase),
      Gen.oneOf(ColPools.flatten).map(_.take(1) + "*"),
      Gen.const("*")))
    sep <- Gen.oneOf(", ", " ")
  } yield parts.mkString(sep)

  test("keys() routes every pattern match through the alias layer (and select honors it)") {
    (1 to 400).foreach { i =>
      val c = caseGen.pureApply(Gen.Parameters.default, Seed(1000L + i))
      val pats = patternGen.pureApply(Gen.Parameters.default, Seed(2000L + i))
      val df = spark.range(1).select(c.cols.map(name => lit(1.0).as(name)): _*)
      val ez = c.defs.foldLeft(EzFrame(df, EzMeta(caseless = c.caseless)))(
        (e, kv) => e.setAlias(kv._1, kv._2))
      val got = ez.keys(pats)
      val want = modelKeys(c, pats)
      assert(got == want,
        s"cols=${c.cols} defs=${c.defs} caseless=${c.caseless} pats='$pats': got $got want $want")
      // select() projects exactly the resolved keys — checkable only
      // when the frame has no caseless-colliding physical columns
      // (Spark's resolver throws AMBIGUOUS_REFERENCE there; pinned above)
      if (c.cols.map(_.toLowerCase).distinct.size == c.cols.size && want.nonEmpty)
        assert(ez.select(pats).columns == want)
    }
  }

  // non-colliding frames with DISTINCT per-column constants, so a
  // wrongly-resolved identifier yields a visibly wrong value
  private val EvalPools: Seq[Seq[String]] = Seq(
    Seq("ra", "dec", "pmra"), Seq("logTe", "M_ini", "zmet"))

  private val evalCaseGen: Gen[Case] = for {
    cols <- Gen.oneOf(EvalPools)
    n <- Gen.choose(0, 5)
    defs <- Gen.listOfN(n, for {
      k <- Gen.oneOf("RA", "Ra", "mass", "MASS", "logT", "LOGT", "x1", "alias1")
      t <- Gen.oneOf(cols)
    } yield (k, t))
    caseless <- Gen.oneOf(true, false)
    probe <- Gen.oneOf(
      Gen.oneOf(cols),
      Gen.oneOf("RA", "Ra", "mass", "MASS", "logT", "LOGT", "x1", "alias1"),
      Gen.oneOf(cols).map(_.toUpperCase))
  } yield Case(cols, defs, caseless, probe)

  test("evalexpr resolves identifiers through the alias layer; unresolved names throw") {
    (1 to 300).foreach { i =>
      val c = evalCaseGen.pureApply(Gen.Parameters.default, Seed(3000L + i))
      val const = c.cols.zipWithIndex.map { case (name, j) => name -> (j + 1) * 10.0 }.toMap
      val df = spark.range(1).select(c.cols.map(name => lit(const(name)).as(name)): _*)
      val ez = c.defs.foldLeft(EzFrame(df, EzMeta(caseless = c.caseless)))(
        (e, kv) => e.setAlias(kv._1, kv._2))
      val resolved = modelResolve(c)(c.probe)
      const.get(resolved) match {
        case Some(expected) =>
          val got = ez.select(ez.evalexpr(c.probe).as("v")).df.head().getDouble(0)
          assert(got == expected,
            s"cols=${c.cols} defs=${c.defs} caseless=${c.caseless} probe=${c.probe}: " +
              s"resolved=$resolved got $got want $expected")
        case None => // resolution falls through to a non-column → loud error
          assertThrows[IllegalArgumentException](ez.evalexpr(c.probe))
      }
    }
  }
}
