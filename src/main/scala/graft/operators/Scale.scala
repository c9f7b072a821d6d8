package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out primitives: skew-aware aggregation and bucketed
  * co-located joins.  These address the two classic 100 TB failure
  * modes — a hot group key that lands one reducer with most of the
  * data, and repeated shuffles of a large fact table joined on the
  * same key (SURVEY.md §7.2 M6 posture).
  */
object Scale {

  /** Columns of `df` that Spark's hash expressions accept: xxhash64
    * rejects MapType anywhere in the type (map entry order is
    * undefined, so a map hash would be nondeterministic — exactly what
    * a retry-stable salt cannot be). */
  private def hashableCols(df: DataFrame): Seq[Column] = {
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case a: ArrayType => hasMap(a.elementType)
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case _ => false
    }
    df.schema.fields.filterNot(f => hasMap(f.dataType)).map(f => col(f.name))
  }

  /** The deterministic per-row salt — see [[saltedAggregate]].  Uses
    * `saltSource` when given, else every map-free column. */
  private def rowSalt(df: DataFrame, salt: Int, saltSource: Option[Column]): Column = {
    val src = saltSource.map(Seq(_)).getOrElse {
      val hs = hashableCols(df)
      require(hs.nonEmpty,
        "no hashable (map-free) column to derive a deterministic salt from — " +
          "pass an explicit saltSource column")
      hs
    }
    pmod(xxhash64(src: _*), lit(salt.toLong))
  }

  /** Two-phase salted aggregation for skewed group keys.  Phase 1
    * groups by (keys, salt) so a hot key's rows spread over `salt`
    * reducers; phase 2 merges the partials.  Caller supplies the
    * partial aggregates and the matching merge aggregates — algebraic
    * functions (sum/count/min/max) compose exactly.
    *
    * AQE's skew-join handling covers joins; this covers groupBy,
    * which AQE does not rebalance.
    *
    * CONTRACT — the salt is a deterministic row-content hash (map-typed
    * columns excluded; xxhash64 rejects them): a task retry re-derives
    * the same (key, salt) per row, which rules out any RNG/row-order
    * source.  The flip side: fully IDENTICAL rows share one salt, so a
    * hot key whose rows are byte-identical duplicates does not spread —
    * pass `saltSource` (e.g. a pre-assigned shard id or a stable
    * surrogate key column) to spread that shape. */
  def saltedAggregate(df: DataFrame, keys: Seq[Column], salt: Int,
                      partials: Seq[Column], merges: Seq[Column],
                      saltSource: Option[Column] = None): DataFrame = {
    require(salt > 1, "salt must be > 1")
    require(!df.columns.exists(_.equalsIgnoreCase("_salt")),
      "input already has a _salt column — rename it first")
    val keyNames = df.select(keys: _*).columns.toSeq // output names of the key exprs
    // salt from a DETERMINISTIC row-content hash: a task retry must
    // re-derive the same (key, salt) for every row, or rows recounted
    // under a different salt double/drop in phase 2.  The previous
    // monotonically_increasing_id form was row-order dependent —
    // wrong under recomputation of a nondeterministically-ordered
    // upstream.  Fully identical rows share a salt; the hot KEY still
    // spreads because its rows differ in their other columns.
    val salted = df.withColumn("_salt", rowSalt(df, salt, saltSource))
    val phase1 = salted
      .groupBy(keys :+ col("_salt"): _*)
      .agg(partials.head, partials.tail: _*)
    phase1
      .groupBy(keyNames.map(phase1.col): _*) // phase-1 output carries the aliased key names
      .agg(merges.head, merges.tail: _*) // _salt is gone: it is not a phase-2 group key
  }

  /** Convenience: salted count + sum over one key. */
  def saltedCountSum(df: DataFrame, key: Column, value: Column, salt: Int = 16): DataFrame =
    saltedAggregate(df, Seq(key.as("key")), salt,
      partials = Seq(count(lit(1)).as("_n"), sum(value).as("_s")),
      merges = Seq(sum(col("_n")).as("n"), sum(col("_s")).as("s")))

  /** Skew-salted equi join: the (large, skewed) fact side gets a
    * uniform salt; the dimension side is replicated `salt` times so
    * every (key, salt) cell finds its match.  AQE's skew-join split
    * covers sort-merge joins after the fact; explicit salting is the
    * planned-ahead variant when one key holds most of the rows and the
    * dim side is small enough to replicate. */
  def saltedJoin(facts: DataFrame, dims: DataFrame, key: String, salt: Int,
                 how: String = "inner", saltSource: Option[Column] = None): DataFrame = {
    require(salt > 1, "salt must be > 1")
    // the dim side is REPLICATED per salt, so an unmatched dim row
    // under right/full outer would surface `salt` times — same guard
    // as Relational.saltedJoin
    require(Set("inner", "left", "left_outer", "leftouter").contains(how.toLowerCase),
      s"saltedJoin supports inner/left joins only (dim replication breaks right/full outer), got $how")
    require(!facts.columns.exists(_.equalsIgnoreCase("_salt")) &&
      !dims.columns.exists(_.equalsIgnoreCase("_salt")),
      "input already has a _salt column — rename it first")
    // deterministic content hash, not row order — see saltedAggregate
    // (same contract: map columns excluded, identical duplicate rows
    // share a salt unless the caller passes saltSource)
    val f = facts.withColumn("_salt", rowSalt(facts, salt, saltSource))
    val d = dims.withColumn("_salt", explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    f.join(d, Seq(key, "_salt"), how).drop("_salt")
  }

  /** Deterministic hash sampling: keeps rows whose md5-bucket of the
    * id falls below `permille`/1000.  No RNG, no seed plumbing: the
    * same row is in or out on every run, on every executor count, and
    * under corpus growth — the property a held-out eval split needs
    * (the same contract as the q63 hash split; `rand()`-based sampling
    * re-draws per task retry).  Pure filter: pushes down, no shuffle. */
  def sampleByHash(df: DataFrame, id: Column, permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000, s"permille in [0,1000], got $permille")
    df.filter(hashBucket(id) < permille)
  }

  /** Stratified deterministic sampling: per-stratum keep rates (e.g.
    * downsample dominant languages, keep the tail whole).  Strata
    * absent from `rates` keep `defaultPermille`.  Same hash contract
    * as [[sampleByHash]] — still a pure filter. */
  def sampleStratified(df: DataFrame, id: Column, stratum: Column,
                       rates: Map[String, Int], defaultPermille: Int = 1000): DataFrame = {
    require((rates.values.toSeq :+ defaultPermille).forall(p => p >= 0 && p <= 1000),
      "every permille must be in [0,1000]")
    val rate = rates.foldLeft(lit(defaultPermille)) { case (acc, (s, p)) =>
      when(stratum === s, lit(p)).otherwise(acc) }
    df.filter(hashBucket(id) < rate)
  }

  /** Deterministic WEIGHTED sampling: keep each row with probability
    * `keepProb` (a per-row Column in [0, 1], e.g. a quality score) —
    * quality-proportional downsampling with the same md5-bucket
    * stability contract as [[sampleByHash]]: no RNG, membership
    * per-row stable under reruns, partitioning, and corpus growth.
    * Still a pure scan-stage filter.  keepProb is clamped to [0, 1]
    * (out-of-range scores behave as certain-keep / certain-drop, not
    * as an error at row 10⁹). */
  def sampleByWeight(df: DataFrame, id: Column, keepProb: Column): DataFrame = {
    // null/NaN scores mean "quality unknown" — the conservative read
    // is certain-drop, not certain-keep (least() would skip a null and
    // order NaN largest, silently keeping every unscored row)
    val pRaw = keepProb.cast(org.apache.spark.sql.types.DoubleType)
    val pSafe = when(pRaw.isNull || isnan(pRaw), lit(0.0)).otherwise(pRaw)
    val p = greatest(lit(0.0), least(lit(1.0), pSafe))
    df.filter(hashBucket(id).cast(org.apache.spark.sql.types.DoubleType) < p * 1000.0)
  }

  /** Cap rows per key — the corpus-bias control ("at most n documents
    * per domain").  The pick is deterministic: rows rank by the
    * md5-bucket of their id (a seedless stable "random" order, same
    * contract as [[sampleByHash]]) with the id itself as tiebreak.
    * Runs on the custom TopKPerKey operator, so candidates are bounded
    * to n per key BELOW the shuffle (partial top-k per partition) — a
    * hot domain never lands its full row set on one reducer, which is
    * exactly the skew a `row_number` window would suffer. */
  def capPerKey(df: DataFrame, key: String, id: Column, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(!df.columns.exists(c => c.equalsIgnoreCase("_cap_ord") || c.equalsIgnoreCase("_cap_id")),
      "input already has a _cap_ord/_cap_id column — rename it first")
    val withOrd = df
      .withColumn("_cap_ord", md5Key(id, 12))
      .withColumn("_cap_id", id)
    graft.plans.TopK.perKeyOrdered(withOrd, Seq(key),
        Seq("_cap_ord" -> false, "_cap_id" -> false), n)
      .drop("_cap_ord", "_cap_id")
  }

  /** Skew-immune per-key lag: exactly `lag(value, 1) OVER (PARTITION
    * BY part ORDER BY order)`, computed WITHOUT ever colocating a full
    * key on one task.  The round-14 window rehearsal (BASELINE.md)
    * measured the failure this avoids: an order-sensitive window must
    * sort each key's rows on a single task, so a hot key holding 20%
    * of the corpus makes that task the wall clock (2.7× there,
    * proportional at 100 TB).  Decomposition:
    *
    *  1. lag + row_number within (part, bucket) — the exchange key
    *     gains the bucket, so the hot key spreads over its buckets;
    *  2. per-(part, bucket) LAST value via one map-side-combined
    *     `max(struct(order..., value))` aggregate;
    *  3. the previous NON-EMPTY bucket's last value via a lag over the
    *     tiny per-bucket frame (one row per (part, bucket));
    *  4. first-in-bucket rows take that boundary value through a join
    *     on (part, bucket) — the same keys the window exchange used.
    *
    * CONTRACT: `bucket` must be MONOTONE in the order columns within
    * each key (e.g. a date/hour truncation of the leading order
    * column), and the order columns must be UNIQUE per key (the same
    * condition a deterministic plain lag needs — with duplicate order
    * keys the boundary pick among tied last rows may differ from the
    * window's arbitrary one).  Value/order types must be orderable
    * (struct-max).  Rows with a null leading order column land in the
    * null bucket, which sorts first — matching the plain window's
    * nulls-first order. */
  def bucketedLag(df: DataFrame, partCols: Seq[String], orderCols: Seq[Column],
                  value: Column, bucket: Column, outCol: String): DataFrame = {
    require(partCols.nonEmpty && orderCols.nonEmpty, "need partition and order columns")
    // the boundary pick is max(struct(order...)) — ASCENDING lexicographic
    // — so a .desc order column would silently hand the WRONG boundary
    // row to the next bucket; fail loudly instead
    require(orderCols.forall(c => !org.apache.spark.sql.GraftBridge.catalystExpression(c)
        .isInstanceOf[org.apache.spark.sql.catalyst.expressions.SortOrder]),
      "order columns must be plain (ascending) expressions — the per-bucket " +
        "boundary struct-max assumes ascending order; invert the column value instead of .desc")
    val scratch = Seq("_blag_bkt", "_blag_rn", "_blag_prev", "_blag_last")
    require(!df.columns.exists(c => scratch.exists(c.equalsIgnoreCase)),
      s"input already has a ${scratch.mkString("/")} column — rename it first")
    import org.apache.spark.sql.expressions.Window
    val d = df.withColumn("_blag_bkt", bucket)
    val wIn = Window.partitionBy(("_blag_bkt" +: partCols).map(col): _*)
      .orderBy(orderCols: _*)
    val within = d
      .withColumn(outCol, lag(value, 1).over(wIn))
      .withColumn("_blag_rn", row_number().over(wIn))
    // last row per (part, bucket) by lexicographic (order..., value)
    val lastPer = d.groupBy(("_blag_bkt" +: partCols).map(col): _*)
      .agg(max(struct(orderCols :+ value.as("_v"): _*)).as("_m"))
      .select((partCols.map(col) :+ col("_blag_bkt") :+ col("_m._v").as("_blag_last")): _*)
    val wBkt = Window.partitionBy(partCols.map(col): _*).orderBy(col("_blag_bkt"))
    val boundary = lastPer
      .withColumn("_blag_prev", lag(col("_blag_last"), 1).over(wBkt))
      .drop("_blag_last")
    within.join(boundary, partCols :+ "_blag_bkt", "left")
      .withColumn(outCol,
        when(col("_blag_rn") === 1, col("_blag_prev")).otherwise(col(outCol)))
      .drop("_blag_bkt", "_blag_rn", "_blag_prev")
  }

  /** Skew-immune sessionization: exactly `session_window(ts, gap)`
    * per key — maximal event chains where consecutive gaps are ≤
    * `gapSeconds`.  CLOSED gap boundary: two events spaced EXACTLY
    * `gapSeconds` apart stay in one session — Spark's session merge
    * coalesces windows with next.start ≤ current.end, so the window's
    * exclusive end does NOT split the boundary pair; the exact-gap
    * parity spec in ScaleSpec pins this empirically, and the q33/q116
    * oracles encode the same `diff > gap` split rule.  All this
    * without colocating a full key's events on one
    * task (the 1.74× skew penalty the round-14 window rehearsal
    * measured for the one-phase formulation; unbounded at 100 TB).
    * Two phases:
    *
    *  1. sessionize WITHIN (key, bucket) — the event-level window
    *     carries the bucket in its partition key, so a hot key spreads
    *     over its buckets; output is one row per session fragment
    *     (start, last, n), a frame ~|events| smaller than the input;
    *  2. merge fragments per key by classic island detection over the
    *     COMPACT fragment frame (cumulative-max of fragment ends; a
    *     new island starts when the next fragment's start exceeds the
    *     running max end by MORE than the gap) — transitively closing
    *     chains that span any number of buckets.  The per-key window
    *     here touches fragments, not events: a hot key with millions
    *     of events contributes at most (#buckets + #true sessions)
    *     rows.
    *
    * CONTRACT: `bucket` must be monotone in `ts` (a time truncation),
    * so fragments from different buckets never overlap in time —
    * island merging by sorted starts is then exactly the event-level
    * transitive closure.  Output: (partCols..., session_start,
    * n_events, last_ts). */
  def bucketedSessions(df: DataFrame, partCols: Seq[String], ts: Column,
                       gapSeconds: Long, bucket: Column): DataFrame = {
    require(partCols.nonEmpty, "need partition columns")
    require(gapSeconds > 0, s"gap must be positive, got $gapSeconds")
    val scratch = Seq("_bs_bkt", "_bs_ts", "_bs_prev", "_bs_new", "_bs_sid",
      "_bs_start", "_bs_last", "_bs_n", "_bs_pmax", "_bs_newisl", "_bs_isl")
    require(!df.columns.exists(c => scratch.exists(c.equalsIgnoreCase)),
      "input already has a _bs_* column — rename it first")
    import org.apache.spark.sql.expressions.Window
    val gapMicros = gapSeconds * 1000000L
    // unix_micros rejects TIMESTAMP_NTZ; the engine-wide UTC session
    // contract makes the NTZ->TIMESTAMP cast value-preserving
    def micros(c: Column): Column =
      unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))
    // session_window drops null-timestamp rows; parity requires the
    // same here — unfiltered, every null-ts event would become its own
    // (null, null) one-row session via the null lag
    val d = df.withColumn("_bs_bkt", bucket).withColumn("_bs_ts", ts)
      .filter(col("_bs_ts").isNotNull)
    val wIn = Window.partitionBy(("_bs_bkt" +: partCols).map(col): _*).orderBy(col("_bs_ts"))
    val frag = d
      .withColumn("_bs_prev", lag(col("_bs_ts"), 1).over(wIn))
      .withColumn("_bs_new", when(col("_bs_prev").isNull ||
        micros(col("_bs_ts")) - micros(col("_bs_prev")) > gapMicros, 1L).otherwise(0L))
      .withColumn("_bs_sid", sum(col("_bs_new"))
        .over(wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((("_bs_bkt" +: partCols) :+ "_bs_sid").map(col): _*)
      .agg(min(col("_bs_ts")).as("_bs_start"), max(col("_bs_ts")).as("_bs_last"),
        count(lit(1)).as("_bs_n"))
    val wKey = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col("_bs_start"), col("_bs_last"))
    frag
      .withColumn("_bs_pmax", max(col("_bs_last"))
        .over(wKey.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("_bs_newisl", when(col("_bs_pmax").isNull ||
        micros(col("_bs_start")) - micros(col("_bs_pmax")) > gapMicros, 1L).otherwise(0L))
      .withColumn("_bs_isl", sum(col("_bs_newisl"))
        .over(wKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((partCols :+ "_bs_isl").map(col): _*)
      .agg(min(col("_bs_start")).as("session_start"), sum(col("_bs_n")).as("n_events"),
        max(col("_bs_last")).as("last_ts"))
      .drop("_bs_isl")
  }

  /** The shared md5-prefix key: first `hexChars` hex digits of
    * md5(id as string) as a long.  ONE definition for every
    * deterministic-hash contract in the engine (sampling buckets,
    * per-key cap ordering, k-means seed order) so the SQL-oracle
    * mirrors — `('0x' || substr(md5(...), 1, N))::BIGINT` — can never
    * drift from a stray local copy.  `hexChars` ≤ 15 keeps the value
    * inside a signed long. */
  private[operators] def md5Key(id: Column, hexChars: Int): Column = {
    require(hexChars >= 1 && hexChars <= 15, s"hexChars in [1,15], got $hexChars")
    // fused kernel (r22): bit-identical to
    //   conv(substring(md5(id::string), 1, hexChars), 16, 10)::BIGINT
    // (Md5PrefixSpec pins the equality) in one digest pass — the
    // composed form materialized the 32-char hex string, substring'd
    // it, and base-16-parsed it per ROW in every deterministic-hash
    // path (sampling buckets, caps, shuffle order, k-means seeds)
    graft.functions.WindowHash.md5Prefix(
      id.cast(org.apache.spark.sql.types.StringType), hexChars)
  }

  private def hashBucket(id: Column): Column = md5Key(id, 6) % 1000

  /** Leakage-safe dataset split: assign train/val/test so that no
    * near-duplicate CLUSTER ever straddles a split boundary.  A plain
    * per-document hash split (q63's contract) leaks — a test document
    * with a near-duplicate in train is a contaminated eval — so the
    * split key here is the connected-component id of the duplicate
    * graph, not the document id: every member of a cluster hashes to
    * the same bucket, and independent documents (singleton components)
    * degrade to exactly the per-id split.
    *
    * `cuts` are cumulative percentile fences over the md5 bucket of
    * the component id (same seedless md5-prefix contract as
    * [[sampleByHash]] — stable under reruns, executor counts, and
    * corpus growth; a cluster only moves splits if its MINIMUM id
    * changes).
    *
    * Scale shape: one bounded connected-components pass over `pairs`
    * (duplicate-proportional, never corpus-proportional —
    * [[Dedup.connectedComponents]]'s contract), an md5 on the
    * component id, and ONE hash join of the narrow (id, split) frame
    * back to the corpus on its id.  No global sort, no window. */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                       cuts: Seq[(String, Int)] =
                         Seq("train" -> 80, "val" -> 90, "test" -> 100)): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 == 100, "last cut must close at 100")
    require(cuts.map(_._2) == cuts.map(_._2).sorted, "cuts must be cumulative")
    require(!df.columns.map(_.toLowerCase).contains("split"),
      "input already has a 'split' column — rename it before splitting")
    val comp = Dedup.connectedComponents(df.select(col(idCol)), idCol, pairs)
    val bucket = md5Key(col("component"), 6) % 100
    val split = cuts.init.foldRight(lit(cuts.last._1): Column) {
      case ((name, fence), acc) => when(bucket < fence, lit(name)).otherwise(acc)
    }
    df.join(comp.select(col("node").as(idCol), split.as("split")), Seq(idCol))
  }

  /** Deterministic training-order shuffle: the global randomization a
    * training run needs before packing/serving, without RNG and without
    * a global sort.  Each row gets the shared md5 key; `shard` =
    * key mod `shards` and `pos` = rank within the shard by (key, id).
    * Reading shards in order then rows by pos visits the corpus in a
    * fixed pseudo-random order, reproducible across runs, executor
    * counts, and retries.
    *
    * Scale shape: ONE hash exchange on `shard` plus a per-shard sort —
    * never a single-partition global window.  Size `shards` to the
    * target parallelism (hundreds–thousands at 100 TB) so each shard's
    * sort fits an executor; the md5 key distributes rows uniformly, so
    * shards are balanced by construction. */
  def deterministicShuffle(df: DataFrame, id: Column, shards: Int): DataFrame = {
    require(shards >= 1 && shards <= (1 << 20), s"shards in [1, 2^20], got $shards")
    // `shard`/`pos` are the operator's OUTPUT contract — refuse to
    // silently clobber caller data rather than overwrite in place.
    // caseless: withColumn resolves case-insensitively under the
    // default spark.sql.caseSensitive=false, so a 'Shard' column would
    // be silently clobbered by a case-sensitive check
    Seq("shard", "pos").foreach { c =>
      require(!df.columns.exists(_.equalsIgnoreCase(c)),
        s"deterministicShuffle: input already has a '$c' column; rename it first " +
          "(shard/pos are this operator's output columns)")
    }
    // The scratch key column picks a name the input provably lacks
    // (caseless, like the shard/pos guard: withColumn resolves
    // case-insensitively, so a '_SHUF_KEY' column would otherwise be
    // clobbered and then dropped).
    val key = Iterator.from(0).map(i => if (i == 0) "_shuf_key" else s"_shuf_key$i")
      .find(n => !df.columns.exists(_.equalsIgnoreCase(n))).get
    import org.apache.spark.sql.expressions.Window
    val keyed = df.withColumn(key, md5Key(id, 12))
      .withColumn("shard", pmod(col(key), lit(shards.toLong)))
    val w = Window.partitionBy(col("shard")).orderBy(col(key), id)
    keyed.withColumn("pos",
        row_number().over(w).cast(org.apache.spark.sql.types.LongType))
      .drop(key)
  }

  /** Temperature-based mixture weights over a grouping key — the
    * data-mixing step of a multi-source training run: source s gets
    * weight n_s^α / Σ_t n_t^α (equivalently (n_s/N)^α renormalized —
    * the N^α cancels).  α = 1 reproduces natural proportions, α → 0
    * flattens toward uniform; α ≈ 0.3–0.7 is the usual multilingual /
    * multi-domain temperature.  Shape: one count aggregate to ~|sources|
    * rows, then a broadcast of the 1-row total — nothing else moves.
    *
    * @return (source, n_docs, weight) with Σ weight = 1 */
  def mixtureWeights(df: DataFrame, key: Column, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0, 1], got $alpha")
    val counts = df.groupBy(key.as("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("p", pow(col("n_docs").cast(org.apache.spark.sql.types.DoubleType), lit(alpha)))
    val tot = counts.agg(sum(col("p")).as("ptot"))
    counts.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), round(col("p") / col("ptot"), 6).as("weight"))
  }

  /** Materialize a temperature-mixed corpus under a TOKEN budget: the
    * step after [[mixtureWeights]] — actually select the rows.  Each
    * source's token mass is raised to `alpha` and normalized (mass-
    * weighted, where mixtureWeights is count-weighted: budgets are
    * spent in tokens, not documents), its share of `budgetTokens`
    * becomes a per-source keep probability (capped at 1 — a source
    * can't contribute more than it has), and membership is the
    * engine-wide deterministic md5 contract ([[sampleByWeight]]): no
    * RNG, per-row stable under reruns, executor counts, and corpus
    * growth.
    *
    * Expected sampled token mass ≈ min over sources of their budget
    * share — exact only in expectation (hash sampling is per-row);
    * callers needing a hard cap compose with [[capPerKey]] or
    * [[graft.operators.Packing]].
    *
    * Scale shape: one ~|sources|-row aggregate, a broadcast of that
    * tiny stats frame onto the corpus scan, then a pure filter —
    * nothing else moves. */
  def mixSample(df: DataFrame, id: Column, source: Column, tokens: Column,
                alpha: Double, budgetTokens: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0, 1], got $alpha")
    require(budgetTokens > 0, s"budget must be positive, got $budgetTokens")
    val D = org.apache.spark.sql.types.DoubleType
    val stats = df.groupBy(source.as("__mix_src"))
      .agg(sum(tokens.cast(D)).as("__mix_tok"))
      .withColumn("__mix_p", pow(col("__mix_tok"), lit(alpha)))
    val tot = stats.agg(sum(col("__mix_p")).as("__mix_ptot"))
    val keep = stats.crossJoin(broadcast(tot))
      .select(col("__mix_src"),
        // a zero-/null-mass source has no tokens to spend budget on:
        // keep 0, not the NaN->least->1.0 accident of 0/0
        when(col("__mix_tok") > 0,
          round(least(lit(1.0),
            lit(budgetTokens.toDouble) * (col("__mix_p") / col("__mix_ptot")) / col("__mix_tok")), 6))
          .otherwise(lit(0.0))
          .as("__mix_keep"))
    // null-safe equality: groupBy keeps a null-source group, so a
    // plain === join would silently DROP every null-source row while
    // its token mass still diluted __mix_ptot — the null group is a
    // group like any other and spends its own share
    df.join(broadcast(keep), source <=> col("__mix_src"))
      .filter(hashBucket(id).cast(D) < col("__mix_keep") * 1000.0)
      .drop("__mix_src", "__mix_keep")
  }

  /** Deterministic CURRICULUM ordering: the quality-descending twin of
    * [[deterministicShuffle]] — shard 0 holds the top-score slice, the
    * last shard the lowest, and `pos` ranks quality-descending inside
    * each shard (ties broken by the engine-wide md5 key, then the id).
    * Reading shards in order visits the corpus highest-quality-first —
    * the easy→hard (or clean→noisy annealing) schedule.
    *
    * Shard fences are EXACT rank thresholds: fence s = the smallest
    * score with cumulative count ≥ ⌈s·n/shards⌉, computed from a
    * map-side-combined value histogram folded on the driver — the same
    * bounded-domain contract as [[Quantiles.exact]]'s integral path
    * (doc lengths / quantized quality scores have thousands of
    * distinct values at any corpus size; an unbounded-domain score
    * must be quantized first, enforced by a limit probe).  Fences
    * become literals in a codegen'd bucket expression, so sharding
    * adds NO join and no shuffle; the only exchange is the hash
    * partition on `shard` under the per-shard rank window.  Tied
    * scores stay in one shard (fence splitting would be
    * nondeterministic); shard populations are equal only up to ties.
    *
    * @return input rows + (shard ∈ [0, shards), pos ∈ 1..) */
  def curriculumOrder(df: DataFrame, id: Column, score: Column, shards: Int): DataFrame = {
    require(shards >= 1 && shards <= 4096,
      s"shards in [1, 4096] (fences embed as literals in one codegen expression), got $shards")
    require(!df.columns.exists(c => c.equalsIgnoreCase("shard") || c.equalsIgnoreCase("pos")),
      "input already has a shard/pos column — rename it before ordering")
    val D = org.apache.spark.sql.types.DoubleType
    val v = score.cast(D)
    val maxDistinct = 1 << 20
    val hist = df.select(v.as("v")).where(col("v").isNotNull && !isnan(col("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("k"))
      .limit(maxDistinct + 1).collect()
    require(hist.length <= maxDistinct,
      s"curriculumOrder needs a bounded score domain (≤ $maxDistinct distinct); quantize first")
    val byValue = hist.map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
    val n = byValue.iterator.map(_._2).sum
    val cum = byValue.map(_._2).scanLeft(0L)(_ + _).tail
    def fenceAt(target: Long): Double = { // smallest value with cum >= target
      var lo = 0; var hi = byValue.length - 1
      while (lo < hi) { val mid = (lo + hi) >>> 1; if (cum(mid) >= target) hi = mid else lo = mid + 1 }
      byValue(lo)._1
    }
    val fences =
      if (n == 0) Seq.empty[Double]
      else (1 until shards).map(s => fenceAt(math.ceil(s.toDouble * n / shards).toLong))
    // STRICTLY above: fence s is the smallest score whose cumulative
    // count reaches shard s's quota, i.e. the row that COMPLETES the
    // lower-score shard — it belongs below the fence.  `v >= f` would
    // push every fence value one shard up, leaving populations
    // unequal even with fully distinct scores (e.g. 10 distinct over
    // 5 shards: 3,2,2,2,1 instead of 2,2,2,2,2).
    val below = fences.foldLeft(lit(0)) { (acc, f) =>
      acc + when(v > lit(f), 1).otherwise(0)
    }
    // null/NaN scores carry no quality evidence: route them to the
    // LAST shard and rank them after every real score (NaN would
    // otherwise compare greater than everything — shard 0, pos 1, the
    // head of the curriculum)
    val vOrd = when(!isnan(v), v) // NaN -> null, then nulls_last below
    val shardCol = when(v.isNull || isnan(v), lit(shards - 1))
      .otherwise(lit(shards - 1) - below)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(vOrd.desc_nulls_last, md5Key(id, 12).asc, id.asc)
    df.withColumn("shard", shardCol.cast(org.apache.spark.sql.types.LongType))
      .withColumn("pos", row_number().over(w).cast(org.apache.spark.sql.types.LongType))
  }

  /** Write a table bucketed+sorted by join keys so subsequent equi
    * joins on those keys are exchange-free (co-located).  Bucket count
    * should match the expected parallelism of the join at target
    * scale; both sides must agree. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String], buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** True when the executed plan of `df` contains no shuffle exchange —
    * the co-location check for bucketed joins.  The plan must EXECUTE
    * before inspection (AQE finalizes — and can eliminate — exchanges
    * at runtime); `foreach` drives the frame's own query execution
    * without shipping a single row to the driver, so the check is safe
    * on frames of any size (a collect() here pulled the whole result
    * driver-side). */
  def isExchangeFree(df: DataFrame): Boolean = {
    // toRdd belongs to the SAME QueryExecution inspected below
    // (Dataset.foreach/rdd would execute a separate deserializing
    // QueryExecution and leave this one un-finalized); count() ships
    // one long per partition, never rows
    df.queryExecution.toRdd.count()
    // ANY shuffle exchange breaks the contract — hash, range,
    // round-robin, or single-partition (the old hashpartitioning-only
    // grep passed a sorted or repartitioned plan as "exchange-free").
    // BroadcastExchange is not a shuffle and stays allowed.
    // (ReusedExchange lines are skipped: if they reuse a shuffle, the
    // original Exchange node appears elsewhere in the plan and is
    // caught there)
    !df.queryExecution.executedPlan.toString.linesIterator.exists(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange") && !l.contains("ReusedExchange"))
  }
}
