package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operators Spark lacks as builtins, composed from
  * shuffle-friendly primitives (preference (a) of the custom-operator
  * ladder — no custom plan node needed, so Catalyst/AQE keep planning
  * freedom).
  */
object Relational {

  /** As-of join (backward): each left row picks the latest right row
    * with `right.ts <= left.ts` within the same key group.
    *
    * Composition: union both sides on (keys, ts), then one
    * partitionBy(keys).orderBy(ts) window carries the most recent
    * right-side values forward (`last(ignoreNulls)` over unbounded
    * preceding).  ONE shuffle + sort over |L|+|R| rows — contrast a
    * naive theta-join (|L|·|R|).  Equal timestamps are inclusive:
    * right rows sort before left rows at the same instant.
    *
    * @param rightCols right columns carried to the output (renamed as
    *                  given in the map: rightName -> outputName)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightCols: Map[String, String]): DataFrame = {
    // an output name colliding with a left column would make the
    // window read the LEFT row's own value — silent wrong data
    rightCols.values.foreach { o =>
      require(!left.columns.exists(_.equalsIgnoreCase(o)),
        s"asofJoin output column '$o' collides with a left column — rename it in rightCols")
    }
    val sideCol = "_graft_side"
    val tsCol = "_graft_ts"
    val payCol = "_graft_pay"
    // scratch columns must not already exist on either side — the
    // union would read caller data as the side/ts markers (same loud
    // contract as Scale's _salt/_bs_* guards)
    Seq(sideCol, tsCol, payCol).foreach { sc =>
      require(!(left.columns ++ right.columns).exists(_.equalsIgnoreCase(sc)),
        s"asofJoin scratch column '$sc' already exists on an input — rename it first")
    }
    val l = left
      .withColumn(sideCol, lit(1))
      .withColumn(tsCol, col(leftTs))
    val r0 = right.select((keys.map(col) :+ col(rightTs).as(tsCol)) ++
      rightCols.map { case (from, to) => col(from).as(to) }: _*)
      .withColumn(sideCol, lit(0))
      // a null right timestamp satisfies no `right.ts <= left.ts`
      // predicate, but nulls sort FIRST under asc — unfiltered, such a
      // row's payload would be carried into every left row before the
      // first real right row, manufacturing matches
      .filter(col(tsCol).isNotNull)
    val unioned = l.unionByName(r0, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(sideCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry ONE struct, built only on right rows: last(ignoreNulls)
    // must skip LEFT filler rows yet still deliver a matched row whose
    // payload value is genuinely null (per-column carry would reach
    // past it to a stale older value — not as-of semantics)
    val outs = rightCols.values.toSeq
    val carried = unioned
      .withColumn(payCol, when(col(sideCol) === 0, struct(outs.map(col): _*)))
      .withColumn(payCol, last(col(payCol), ignoreNulls = true).over(w))
    outs.foldLeft(carried) { (df, o) => df.withColumn(o, col(payCol).getField(o)) }
      .filter(col(sideCol) === 1).drop(sideCol, tsCol, payCol)
  }

  /** Range (interval) join on event time: pairs within `windowSec`
    * seconds of each other, same key.  Composition: both sides bucket
    * to floor(epoch / windowSec); each left row joins buckets
    * {b-1, b, b+1} and the exact predicate filters — equi-join shuffle
    * on (key, bucket) instead of a nested-loop theta join.  Candidate
    * blowup is 3x, not |L|·|R|.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                leftTs: String, rightTs: String, windowSec: Long,
                rightCols: Map[String, String]): DataFrame = {
    require(windowSec > 0, s"windowSec must be positive, got $windowSec " +
      "(0 would divide by zero; negative matches nothing)")
    // microsecond-exact arithmetic (unix_timestamp would truncate to
    // seconds and silently change the predicate)
    val winUs = windowSec * 1000000L
    // scratch + output name guards (same contract as asofJoin): a
    // pre-existing _graft_bucket/_graft_rts would be clobbered then
    // dropped; a left 'matched_ts' (e.g. the output of a previous
    // rangeJoin) would make the renamed right ts ambiguous downstream
    Seq("_graft_bucket", "_graft_rts", "matched_ts").foreach { sc =>
      require(!(left.columns ++ right.columns).exists(_.equalsIgnoreCase(sc)),
        s"rangeJoin scratch/output column '$sc' already exists on an input — rename it first")
    }
    rightCols.values.foreach { o =>
      require(!left.columns.exists(_.equalsIgnoreCase(o)),
        s"rangeJoin output column '$o' collides with a left column — rename it in rightCols")
    }
    val lb = "_graft_bucket"
    val l = left.withColumn(lb,
      explode(array(Seq(-1L, 0L, 1L).map(d => floor(unix_micros(col(leftTs)) / winUs) + d): _*)))
    val r = right.select((keys.map(col) :+ col(rightTs).as("_graft_rts")) ++
        rightCols.map { case (from, to) => col(from).as(to) }: _*)
      .withColumn(lb, floor(unix_micros(col("_graft_rts")) / winUs))
    l.join(r, keys :+ lb)
      .filter(abs(unix_micros(col(leftTs)) - unix_micros(col("_graft_rts"))) <= winUs)
      .drop(lb)
      .withColumnRenamed("_graft_rts", "matched_ts")
  }

  /** Skew-hardened equi-join for the case AQE's skew split can't fix:
    * BOTH sides too big to broadcast and one join key carrying a
    * disproportionate share of the probe side.  The build side is
    * replicated into `salts` copies (explode — bounded: |build|·salts
    * rows) and each probe row is scattered to one copy by a
    * deterministic hash of `spreadBy`, so the hot key's rows land on
    * `salts` different reducers instead of one.  The join runs on
    * (key, salt) and the salt never escapes — results are EXACTLY the
    * plain equi-join's.
    *
    * `spreadBy` must be a probe-side column that varies within a key
    * group (a row id, a fact-side foreign key) — hashing the join key
    * itself would send every hot-key row to the same salt again and
    * undo the whole point.
    *
    * At 100 TB: one shuffle of |probe| + |build|·salts rows on a key
    * whose worst reducer is ~1/salts of the hot key.  Prefer AQE
    * skew-join (free) and broadcast (no shuffle at all) when they
    * apply; this is the remaining corner.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 spreadBy: Column, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salts >= 1 && salts <= 4096, s"salts in [1, 4096], got $salts")
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"salting preserves semantics for inner/left joins only, got $joinType")
    val sc = "_graft_salt"
    val p = probe.withColumn(sc, pmod(xxhash64(spreadBy), lit(salts.toLong)))
    val b = build.withColumn(sc,
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    p.join(b, keys :+ sc, joinType).drop(sc)
  }

  /** Bloom-pruned shuffle join — shrink the BIG side's exchange before
    * it happens.  When the small side exceeds the broadcast threshold
    * (so no BroadcastHashJoin) but is still far smaller than the big
    * side, a plain shuffle join moves ALL of the big side; here a
    * Bloom filter of the small side's join keys rides the big side's
    * SCAN stage as a codegen'd predicate, so only rows that might
    * match ever enter the exchange — matching rows + an fpp fraction
    * of the rest.  Spark's own runtime bloom filter
    * (InjectRuntimeFilter) does this automatically only when its
    * creation-side heuristics hold (selective filter, size bounds);
    * this operator is the explicit version for small sides born from
    * arbitrary transforms the optimizer won't instrument.
    *
    * EXACT by construction: Bloom filters have no false negatives, so
    * pruning never drops a matching row, and the join itself
    * re-verifies key equality — false positives cost shuffle bytes,
    * never correctness (oracle = the plain join, any fpp).
    *
    * Semantics guard: pruning the big side is row-preserving for
    * `inner` and `left_semi` joins of big ⋈ small.  The two
    * small-side passes (exact key count, then filter build) are scans
    * of the SMALL side only — that is the operator's premise. */
  def bloomPrunedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                      fpp: Double = 0.01, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_semi",
      s"big-side pruning preserves semantics for inner/left_semi only, got $joinType")
    bloomPrune(big, small, keys, fpp).join(small, keys, joinType)
  }

  /** The pruning half on its own: `big` filtered to rows whose key
    * hash might appear on the small side (matching rows plus ≤ fpp of
    * the rest — never fewer). */
  def bloomPrune(big: DataFrame, small: DataFrame, keys: Seq[String],
                 fpp: Double = 0.01): DataFrame = {
    require(keys.nonEmpty, "bloomPrune needs at least one key column")
    require(fpp > 0.0 && fpp < 0.5, s"fpp in (0, 0.5), got $fpp")
    // persist the small side: its plan is evaluated for the distinct
    // count, the bloom build, and (in bloomPrunedJoin) the join itself
    // — three executions of the "arbitrary transforms" lineage the
    // operator exists for; worse, a NONDETERMINISTIC small plan
    // (sample(), re-read mutable source) could build the filter from
    // different keys than the join sees, manufacturing the false
    // negatives the no-false-negative contract rules out.  The cache
    // is bounded by the small-side contract; it stays alive for the
    // lazily-returned join (callers can unpersist when done).
    val smallP = small.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keyHash = xxhash64(keys.map(col): _*)
    val nKeys = smallP.select(keys.map(col): _*).distinct().count()
    require(nKeys <= 500000000L,
      s"small side has $nKeys distinct keys — a driver-held bloom past 5e8 keys " +
        "is the wrong tool; shard the filter or let the join shuffle")
    val bf = smallP.select(keyHash.as("h"))
      .stat.bloomFilter("h", math.max(nKeys, 1L), fpp)
    big.filter(graft.functions.BloomGate.bloomMightContain(keyHash, bf))
  }
}
