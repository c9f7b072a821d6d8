package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`Array[Float]`).  Beyond-reference extension (SURVEY.md §7.2
  * M6).  Dot products go through [[graft.functions.VectorSim]] — a
  * custom codegen'd Catalyst expression, because Spark's higher-order
  * functions evaluate interpreted and the per-pair dot product IS the
  * hot loop of every operator here (measured 28 s → 4 s on the exact
  * all-pairs query at sf0.1).
  *
  * Scale posture: brute-force top-k is the *correctness baseline* (a
  * cartesian product — only for small probe sets or verification); the
  * production path is [[lshTopK]], which buckets by random-hyperplane
  * signs so the join key is the LSH signature and only intra-bucket
  * pairs are scored.
  */
object Similarity {

  /** The driver-bounded centroid-set contract, in one place: every
    * literal-argmin assignment path ([[collectCentroidLits]]) rejects
    * a larger set, so any code that CHOOSES a k (e.g. semanticDedup's
    * auto-k population discipline) must clamp to the same bound — a
    * k the fit will train but the assignment will refuse is a job
    * that burns the whole k-means pass and then throws. */
  val MaxCentroids: Int = 65536

  /** Cosine similarity between two array columns (computed in double;
    * zero-norm input yields NaN, never an ANSI divide error). */
  def cosine(a: Column, b: Column): Column = graft.functions.VectorSim.cosine(a, b)

  def dot(a: Column, b: Column): Column = graft.functions.VectorSim.dot(a, b)

  def l2Distance(a: Column, b: Column): Column = graft.functions.VectorSim.l2(a, b)

  private[graft] def asDouble(c: Column): Column = c.cast(ArrayType(DoubleType))

  /** Brute-force cosine top-k per probe vector: probes × corpus scored
    * pairwise, ranked by a window.  Exact; O(|probes|·|corpus|). The
    * probe side should be small — broadcast it. */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     excludeSelf: Boolean = true): DataFrame = {
    // squared norms once per row (carried-norm scorer, the r21
    // convention across the similarity family): the per-pair cost is
    // one dot instead of the fused kernel's 3·d — bit-identical, see
    // exactPairs' equivalence note
    val c = corpus.select(col(idCol).as("corpus_id"), asDouble(col(vecCol)).as("cvec"))
      .withColumn("_cn2", dot(col("cvec"), col("cvec")))
    val p = probes.select(col(idCol).as("probe_id"), asDouble(col(vecCol)).as("pvec"))
      .withColumn("_pn2", dot(col("pvec"), col("pvec")))
    val scored0 = c.crossJoin(broadcast(p))
    val scored1 = if (excludeSelf) scored0.filter(col("corpus_id") =!= col("probe_id")) else scored0
    val bfDenom = sqrt(col("_cn2")) * sqrt(col("_pn2"))
    val scored = scored1.withColumn("cos_sim",
      when(bfDenom === 0.0, lit(Double.NaN))
        .otherwise(dot(col("cvec"), col("pvec")) / bfDenom))
      // a zero-norm or null vector yields NaN/null cosine; NaN sorts
      // ABOVE every real similarity in the desc ranking (Spark orders
      // NaN greatest), so it would take rank 1 for every probe —
      // exclude it, as lshPairs/exactPairs already do
      .filter(col("cos_sim").isNotNull && !isnan(col("cos_sim")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("corpus_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("corpus_id"), round(col("cos_sim"), 6).as("cos_sim"), col("rank"))
  }

  /** Random-hyperplane LSH signature: `planes` sign bits packed into a
    * long.  Vectors with high cosine similarity collide with high
    * probability (signature = coarse angular cell).  The hyperplanes
    * are seeded literal arrays (fixed seed → reproducible), so each
    * row pays only `planes` dot products — no per-element hashing in
    * the hot path.  Distinct seeds give independent hash tables for
    * OR-amplification. */
  /** The seeded hyperplane set behind [[lshSignature]] — exposed so a
    * SQL oracle can embed the SAME plane components as literals and
    * reproduce every sign bit-for-bit (same doubles, same
    * left-to-right fold → identical IEEE results). */
  private[graft] def planeVecs(planes: Int, dim: Int, seed: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  def lshSignature(vec: Column, planes: Int, dim: Int, seed: Int = 42): Column = {
    val pv = planeVecs(planes, dim, seed)
    val v = asDouble(vec)
    (0 until planes).map { p =>
      // codegen'd dot kernel (VectorSim) — this runs once per plane per
      // corpus row, exactly the place an interpreted HOF would tax
      val proj = graft.functions.VectorSim.dot(v, typedlit(pv(p)))
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** planes for a target expected bucket population: each table has
    * 2^planes cells, so `planes = ceil(log2(n / targetBucket))` keeps
    * the expected cell population in (targetBucket/2, targetBucket] at
    * ANY corpus size — the r4 review's scale hazard was fixed
    * small-corpus defaults (planes=6..8 → 64–256 cells), whose
    * quadratic intra-bucket pairing explodes when the corpus grows
    * 100×.  Clamped to [4, 30]: fewer than 16 cells makes every bucket
    * quadratic-huge anyway, and 30 planes (2^30 cells — cells are join
    * keys, never materialized; the per-row cost is `planes` dot
    * products) covers a ~10^11-document corpus at target 256. */
  private[graft] def planesFor(n: Long, targetBucket: Long = 256L): Int = {
    val cells = math.max(1.0, n.toDouble / targetBucket)
    val p = math.ceil(math.log(cells) / math.log(2.0)).toInt
    math.min(30, math.max(4, p))
  }

  /** planes <= 0 (the defaults) derives the plane count from a corpus
    * count so bucket population stays bounded at any scale; an explicit
    * positive value pins the geometry exactly (the snapshot gates do).
    * The count job re-executes the corpus' upstream plan — callers who
    * already know the size (or whose corpus is an expensive derived
    * frame, or a stream, where count() is illegal) pass it via
    * `corpusCount` and pay nothing. */
  private def resolvePlanes(corpus: DataFrame, planes: Int, knownCount: Long): Int =
    if (planes > 0) planes
    else planesFor(if (knownCount > 0) knownCount else corpus.count())

  /** ONE definition of the bounded per-probe rank tail shared by
    * [[lshTopK]] / [[pqTopK]] / [[ivfPqTopK]] / [[ivfTopK]]:
    * TopK.perKeyOrdered ships at most k rows per probe per partition,
    * then the rank window runs over the ≤ k·|probes| survivors — a
    * bounded, cheap window.  `scoreDesc` = true ranks higher scores
    * first (cosine), false ranks lower first (ADC distance); ties
    * break on corpus_id ascending.  A tie-break or rank-dtype change
    * here reaches all four search surfaces at once. */
  private def rankPerProbe(scored: DataFrame, scoreCol: String,
                           scoreDesc: Boolean, k: Int): DataFrame = {
    val top = graft.plans.TopK.perKeyOrdered(scored, Seq("probe_id"),
      Seq(scoreCol -> scoreDesc, "corpus_id" -> false), k)
    val ord = if (scoreDesc) col(scoreCol).desc else col(scoreCol).asc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(ord, col("corpus_id").asc)
    top.withColumn("rank", row_number().over(w))
  }

  /** LSH-bucketed ANN: score only pairs sharing a signature cell.
    * One shuffle on the signature; bucket sizes ~ n / 2^planes keep the
    * intra-bucket pairing bounded.  Recall < 1 by construction — the
    * scale path, verified against [[bruteForceTopK]] in tests.
    *
    * `planes = 0` (default) derives the plane count from the corpus
    * count ([[planesFor]]: expected bucket population ≤ 256 at any
    * scale, one extra count job); pass a positive value to pin the
    * geometry. */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
              k: Int, planes: Int = 0, corpusCount: Long = -1L): DataFrame = {
    // embedding dimensionality from one NON-NULL row (tiny driver-side
    // probe); an all-null/empty corpus has no pairs to rank.  Plain
    // match, not getOrElse(return …): a non-local return inside an
    // expression silently becomes a NonLocalReturnControl throw if
    // this body is ever refactored into a closure
    val dim = probeDim(corpus, vecCol) match {
      case None =>
        return corpus.select(col(idCol).as("probe_id"), col(idCol).as("corpus_id"),
          lit(0.0).as("cos_sim"), lit(0).as("rank")).limit(0)
      case Some(d) => d
    }
    val nPlanes = resolvePlanes(corpus, planes, corpusCount)
    // drop null vectors BEFORE signing (the lshPairs rationale: they
    // would all collide in signature 0 and square in the self-join,
    // scoring pairs the NaN/null filter below discards anyway)
    // carried-norm scorer (the r21 convention): one extra double per
    // row through the signature join, one dot per candidate pair
    val sig = corpus.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
      .where(col("v").isNotNull)
      .withColumn("n2", dot(col("v"), col("v")))
      .withColumn("sig", lshSignature(col("v"), nPlanes, dim))
    val a = sig.select(col("sig"), col("vid").as("probe_id"), col("v").as("pvec"),
      col("n2").as("_pn2"))
    val b = sig.select(col("sig"), col("vid").as("corpus_id"), col("v").as("cvec"),
      col("n2").as("_cn2"))
    val lshDenom = sqrt(col("_pn2")) * sqrt(col("_cn2"))
    val scored = a.join(b, Seq("sig"))
      .filter(col("probe_id") =!= col("corpus_id"))
      .withColumn("cos_sim",
        when(lshDenom === 0.0, lit(Double.NaN))
          .otherwise(dot(col("pvec"), col("cvec")) / lshDenom))
      // NaN/null similarity (zero-norm or null vector) must not rank —
      // NaN sorts above every real cosine in the desc top-k
      .filter(col("cos_sim").isNotNull && !isnan(col("cos_sim")))
      .select(col("probe_id"), col("corpus_id"), round(col("cos_sim"), 6).as("cos_sim"))
    // bound rows BELOW the shuffle with the custom TopKPerKey operator:
    // a row_number window would shuffle and fully sort every scored
    // pair; the two-phase operator ships at most k rows per probe per
    // partition.  The rank column is recomputed over the ≤ k·|probes|
    // survivors — a bounded, cheap window.
    rankPerProbe(scored, "cos_sim", scoreDesc = true, k)
      .select(col("probe_id"), col("corpus_id"), col("cos_sim"), col("rank"))
  }

  /** All intra-bucket candidate pairs (id_a < id_b) with exact cosine,
    * OR-amplified across `tables` independent hyperplane sets: a pair
    * is a candidate if it collides in ANY table, which lifts recall
    * from p^1 to 1-(1-p)^tables without changing the per-table bucket
    * cost.  Unlike [[lshTopK]] there is no rank window and no k cap —
    * every colliding pair is scored, so a threshold filter downstream
    * sees ALL pairs the tables surface (a 25-member duplicate cluster
    * yields all C(25,2) pairs).
    *
    * Scale: each table is one self-join on a long signature key
    * (ReusedExchange computes the signature pipeline once per table);
    * the cosine is computed map-side inside each table's join output,
    * so the cross-table dedup shuffle carries only (id_a, id_b,
    * cos_sim) — never the vectors.  A pair colliding in several tables
    * pays the dot product once per collision (cheap ALU work) instead
    * of shipping 2·dim·8 bytes per pair through the dedup exchange.
    *
    * `planes = 0` (default) derives the plane count from the corpus
    * count ([[planesFor]]) so bucket population — and with it the
    * quadratic intra-bucket expansion — stays bounded when the corpus
    * grows; pass a positive value to pin the geometry. */
  def lshPairs(corpus: DataFrame, idCol: String, vecCol: String,
               planes: Int = 0, tables: Int = 2, corpusCount: Long = -1L,
               maxBucket: Int = 0): DataFrame = {
    // empty / all-null corpus: no row to probe dimensionality from —
    // return an empty pair frame (with the REAL id dtype) instead of
    // throwing at plan-build time.  Plain match, not getOrElse(return):
    // a non-local return inside a by-name argument is a
    // NonLocalReturnControl throw — the hazard lshTopK's comment
    // documents — and would escape or be swallowed under refactoring
    val dim = probeDim(corpus, vecCol) match {
      case None    => return emptyPairFrame(corpus, idCol)
      case Some(d) => d
    }
    val nPlanes = resolvePlanes(corpus, planes, corpusCount)
    // null vectors must not reach the signature: every `when(proj >=
    // 0, …).otherwise(0)` term yields 0 for a null projection, so ALL
    // null-vector rows would share signature 0 — one quadratic bucket
    // of rows whose cosines can never rank (and whose null cos_sim
    // would pass the !isnan filter below: isnan(null) is FALSE in
    // Spark, not null)
    // squared norm carried with the vector (one extra double per row
    // through the signature shuffle) so the intra-bucket scorer pays
    // d flops per pair instead of the fused kernel's 3·d — same
    // bit-exact value, see the exactPairs note
    val v = corpus.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
      .where(col("v").isNotNull)
      .withColumn("n2", dot(col("v"), col("v")))
    val perTable = (0 until tables).map { tbl =>
      // identical projections on both sides -> the signature shuffle
      // canonicalizes equal and is computed once per table
      val sigAll = v.select(col("vid"), col("v"), col("n2"),
        lshSignature(col("v"), nPlanes, dim, seed = 42 + tbl).as("sig"))
      // optional bucket cap: plane auto-resolution bounds the EXPECTED
      // occupancy, but a mass of identical/near-identical vectors
      // shares one signature at any plane count and squares in the
      // self-join — same quadratic, same mitigation as the text
      // banding's capBuckets (Dedup.scala): drop oversized buckets
      // before the join; the count groups on the join key, adding no
      // new exchange shape
      val sig =
        if (maxBucket <= 0) sigAll
        else {
          val small = sigAll.groupBy(col("sig")).agg(count(lit(1)).as("_bn"))
            .filter(col("_bn") <= maxBucket).select(col("sig"))
          sigAll.join(small, Seq("sig"), "left_semi")
        }
      val denom = sqrt(col("a.n2")) * sqrt(col("b.n2"))
      sig.alias("a").join(sig.alias("b"), Seq("sig"))
        .filter(col("a.vid") < col("b.vid"))
        .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"),
          round(when(denom === 0.0, lit(Double.NaN))
            .otherwise(dot(col("a.v"), col("b.v")) / denom), 6).as("cos_sim"))
    }
    // NaN cosine (zero-norm vector) sorts GREATER than every double in
    // Spark, so it would pass any >= threshold filter downstream — a
    // pair with no defined similarity is dropped, not reported
    perTable.reduce(_ unionAll _).dropDuplicates("id_a", "id_b")
      .filter(!isnan(col("cos_sim")))
  }

  /** Embedding dimensionality from one non-null row.  Filtering nulls
    * BEFORE the limit matters: if the arbitrary first row's vector is
    * null, `size()` is null and the caller would silently take the
    * empty-corpus path even though the corpus has valid vectors.
    * Returns None only when every vector is null (or the corpus is
    * empty). */
  private def probeDim(corpus: DataFrame, vecCol: String): Option[Int] = {
    val row = corpus.where(col(vecCol).isNotNull)
      .select(size(col(vecCol))).limit(1).collect()
    row.headOption.collect { case r if !r.isNullAt(0) && r.getInt(0) >= 0 => r.getInt(0) }
  }

  /** Zero-row pair frame whose id columns keep the input's id dtype, so
    * the empty edge case unions cleanly with the non-empty path. */
  private def emptyPairFrame(corpus: DataFrame, idCol: String): DataFrame =
    corpus.select(col(idCol).as("id_a"), col(idCol).as("id_b"),
      lit(0.0).as("cos_sim")).limit(0)

  /** Exact all-pairs cosine threshold (id_a < id_b): the brute-force
    * ORACLE TWIN of [[lshPairs]]/embeddingNearDup — O(n²) dot products
    * via a broadcast nested-loop self-join, for verification and small
    * corpora only.  The scale path is lshPairs (bucketed); this exists
    * so the near-dup semantics stay checkable against a SQL oracle. */
  def exactPairs(corpus: DataFrame, idCol: String, vecCol: String,
                 threshold: Double): DataFrame = {
    // squared norms precomputed ONCE per row (n ops) instead of inside
    // the fused cosine kernel per pair (the O(n²) hot loop paid 3·d
    // flops per pair; dot alone is d).  Bit-identical values FOR
    // EQUAL-LENGTH vectors (every declared corpus is fixed-dim): each
    // of the fused kernel's three accumulators is an independent
    // in-order sum, so dot(v,v) equals the fused na term exactly, and
    // the final dot/(√na·√nb) expression is the same float expression
    // the kernel evaluated; the denom==0 arm reproduces its NaN
    // contract.  RAGGED pairs (defensive case) score with each
    // vector's FULL norm — the cosine of the stored vectors with the
    // shorter one zero-padded — where the fused kernel truncated the
    // norms to min(|a|,|b|); spec-pinned ("carried-norm scorer on
    // RAGGED pairs").  The same convention applies to every carried-
    // norm scorer in this file (lshPairs, bruteForceTopK, lshTopK,
    // ivfTopK, semanticDedup).
    val v = corpus.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
      .withColumn("n2", dot(col("v"), col("v")))
    val denom = sqrt(col("a.n2")) * sqrt(col("b.n2"))
    v.alias("a").join(v.alias("b"), col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"),
        round(when(denom === 0.0, lit(Double.NaN))
          .otherwise(dot(col("a.v"), col("b.v")) / denom), 6).as("cos_sim"))
      // NaN (zero-norm input) sorts greater than any double in Spark
      // and would pass >= threshold; an undefined similarity is not a
      // near-duplicate
      .filter(col("cos_sim") >= threshold && !isnan(col("cos_sim")))
  }

  /** Approximate k-nearest-neighbor GRAPH: for every vector, its k
    * most-similar OTHER vectors — the input to graph-based curation
    * (SemDeDup-style cluster pruning, connectivity analysis, kNN
    * classifiers over corpus slices).  Candidate pairs come from the
    * OR-amplified LSH tables ([[lshPairs]] — bucketed, never all
    * pairs), exact cosine ranks within the candidate set, and the
    * per-source top-k runs on the custom TopKPerKey operator, so each
    * task forwards at most k rows per source BELOW the shuffle — the
    * window-function formulation would shuffle and sort every
    * candidate edge.  Approximate by construction: a true neighbor
    * sharing no bucket in any table is missed (recall is spec-pinned
    * on the fixture corpus); [[knnGraphExact]] is the O(n²) oracle
    * twin.  Output (src, dst, cos_sim), ties broken by dst. */
  def knnGraph(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
               planes: Int = 0, tables: Int = 2, maxBucket: Int = 0,
               corpusCount: Long = -1L): DataFrame =
    knnFromPairs(lshPairs(corpus, idCol, vecCol, planes, tables,
      corpusCount = corpusCount, maxBucket = maxBucket), k)

  /** Exact kNN graph — brute-force twin of [[knnGraph]] for oracles
    * and small corpora (same broadcast nested-loop scope caveat as
    * [[exactPairs]]). */
  def knnGraphExact(corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame =
    knnFromPairs(exactPairs(corpus, idCol, vecCol, threshold = -1.0), k)

  // private[graft]: the q110b gate derives its exact twin from an
  // already-computed pair frame — sharing this keeps the top-k
  // ordering/tie-break spec in exactly one place
  private[graft] def knnFromPairs(pairs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // undirected candidate pairs -> directed edges (both orientations)
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"), col("cos_sim"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst"), col("cos_sim")))
    graft.plans.TopK.perKeyOrdered(edges, Seq("src"),
      Seq("cos_sim" -> true, "dst" -> false), k)
  }

  /** Mutual-kNN filter over a kNN-graph frame ([[knnGraph]] /
    * [[knnGraphExact]] output): keep (src, dst) only when dst also
    * lists src among ITS top-k — the standard symmetrization that
    * strips hub-induced one-way edges before graph clustering
    * (mutual edges ⊂ kNN edges, so components over them are tighter).
    * One self-join of the already-k-bounded edge frame; output keeps
    * src < dst once per mutual pair. */
  def mutualKnn(knn: DataFrame): DataFrame = {
    val e = knn.select(col("src"), col("dst"), col("cos_sim"))
    e.alias("f").join(e.select(col("src").as("r_dst"), col("dst").as("r_src")).alias("r"),
        col("f.src") === col("r.r_src") && col("f.dst") === col("r.r_dst"))
      .filter(col("f.src") < col("f.dst"))
      .select(col("f.src").as("src"), col("f.dst").as("dst"), col("f.cos_sim").as("cos_sim"))
  }

  /** L2-normalize a vector column in place (zero vectors stay zero
    * rather than dividing to NaN) — cosine against normalized vectors
    * reduces to the cheaper dot product.  DataFrame-level on purpose:
    * the norm must be a materialized attribute before the per-element
    * division, because a higher-order-function lambda that captures a
    * non-attribute subtree re-evaluates it PER ELEMENT (the O(len²)
    * hazard documented at TextAnalysis.shinglesRaw) — as an attribute
    * it is computed once per row. */
  def l2Normalized(df: DataFrame, vecCol: String): DataFrame = {
    val v = asDouble(col(vecCol))
    df.withColumn("_norm", sqrt(graft.functions.VectorSim.dot(v, v)))
      .withColumn(vecCol,
        when(col("_norm") === 0.0, v)
          .otherwise(transform(v, x => x / col("_norm"))))
      .drop("_norm")
  }

  /** Element-wise mean of vectors per group — the pooling step that
    * turns chunk embeddings into document embeddings (or members into
    * a cluster centroid).  Same aggregate shape as a k-means mean
    * round: posexplode feeds a (group, dim) average whose map-side
    * combine collapses to groups x dim rows per partition before the
    * shuffle; the per-group array is reassembled from at most `dim`
    * elements.  Null vectors are excluded.
    *
    * UNIFORM-LENGTH CONTRACT: all vectors within a group must share
    * one dimensionality.  With ragged lengths the tail dims would be
    * averaged over fewer members while n_members (= the per-dim count)
    * overstates their support — instead of returning that silently
    * misleading frame, the per-group min(n)/max(n) probe (one cheap
    * extra aggregate) fails the job loudly. */
  def meanPool(df: DataFrame, key: Column, vecCol: Column): DataFrame =
    df.filter(vecCol.isNotNull)
      // an EMPTY vector is a ragged length the min(n)==max(n) probe
      // below cannot see: posexplode emits no rows for it, so the
      // member silently vanishes from both the mean and n_members —
      // assert before the explode (the generator evaluates its child,
      // so empty arrays still trip the guard)
      .select(key.as("group_id"), posexplode(
        when(assert_true(size(asDouble(vecCol)) > 0,
            lit("meanPool: empty vector — an empty member is a ragged length " +
              "and would silently vanish from the mean and n_members")).isNull,
          asDouble(vecCol))).as(Seq("dim", "x")))
      .groupBy(col("group_id"), col("dim"))
      .agg(avg(col("x")).as("m"), count(lit(1)).as("n"))
      .groupBy(col("group_id"))
      .agg(
        // the assert is folded into BOTH caller-visible columns: a
        // standalone assert column is silently removed by column
        // pruning when the caller projects it away, and a caller that
        // keeps only n_members (dropping vec) would otherwise lose the
        // guard and read an n_members that overstates tail-dim support
        when(assert_true(min(col("n")) === max(col("n")),
            lit("meanPool: ragged vector lengths within a group — all members " +
              "of a group must share one embedding dimensionality")).isNull,
          transform(array_sort(collect_list(struct(col("dim"), col("m")))),
            e => e("m"))).as("vec"),
        when(assert_true(min(col("n")) === max(col("n")),
            lit("meanPool: ragged vector lengths within a group — all members " +
              "of a group must share one embedding dimensionality")).isNull,
          max(col("n"))).as("n_members"))

  /** Lloyd's k-means over the embedding column — trains the coarse
    * centroids [[ivfAssign]]/[[ivfTopK]] quantize against (sampled-id
    * centroids are the zero-training fallback; trained cells are
    * tighter, so recall at a given nprobe is higher).
    *
    * Deterministic throughout: initial centroids are the `k` rows
    * first in (md5(id), id) order — a seedless pseudo-random draw that
    * is stable under corpus growth and SQL-mirrorable — and ties in
    * the assignment argmin break toward the lowest centroid id.
    *
    * Scale shape (the MLlib pattern): centroids live on the driver
    * between rounds — k·dim doubles, BOUNDED state like the packing
    * offset fold — so each round's assignment is a pure projection (k
    * codegen'd l2 kernels + an argmin case chain, ZERO shuffle), and
    * the only shuffle is the mean aggregate, whose map-side combine
    * collapses to k·dim skinny rows per partition before anything
    * moves.  The corpus projection is persisted across rounds.
    *
    * A cell that loses every member keeps its previous centroid with
    * n_members = 0 (no respawn — deterministic).
    *
    * @return (centroid_id = seed row id, centroid Array[Double],
    *         n_members of the assignment that produced the final mean)
    */
  def kmeansFit(corpus: DataFrame, idCol: String, vecCol: String,
                k: Int, iters: Int = 2): DataFrame = {
    require(k >= 1 && iters >= 1, s"k and iters must be >= 1, got k=$k iters=$iters")
    // the single shared bound (scaladoc at MaxCentroids): a k the fit
    // trains but collectCentroidLits-tier assignment refuses burns the
    // whole k-means pass and then throws — fail BEFORE the pass
    require(k <= MaxCentroids,
      s"kmeansFit: k=$k exceeds the driver-bounded centroid contract (<= $MaxCentroids)")
    requireIntegralId(corpus, idCol, "kmeansFit")
    import org.apache.spark.storage.StorageLevel
    val spark = corpus.sparkSession
    import spark.implicits._
    // ragged vector lengths would corrupt centroids silently (tail
    // dims averaged over only the longer members) and make n_members
    // nondeterministic — the same invariant meanPool enforces; the
    // assert is folded into the vector column so pruning keeps it
    val dim = probeDim(corpus, vecCol).getOrElse(
      throw new IllegalArgumentException("kmeansFit: corpus has no non-null vectors"))
    val v = corpus.select(col(idCol).cast(LongType).as("vid"), asDouble(col(vecCol)).as("v"))
      .filter(col("v").isNotNull)
      .select(
        // a null id would sort FIRST into the seed set (md5(null) is
        // null, asc = nulls first) and NPE at getLong in the collect —
        // the same obscure failure requireIntegralId names, via a null
        // VALUE instead of a wrong dtype; fail with the contract
        when(assert_true(col("vid").isNotNull,
            lit("kmeansFit: null id — ids must be non-null integral")).isNull,
          col("vid")).as("vid"),
        when(assert_true(size(col("v")) === lit(dim),
            lit(s"kmeansFit: ragged vector lengths — every vector must have " +
              s"dimensionality $dim")).isNull,
          col("v")).as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    try {
      val seedKey = Scale.md5Key(col("vid"), 6)
      var cents: Seq[(Long, Seq[Double])] = v
        .orderBy(seedKey.asc, col("vid").asc).limit(k)
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toList
        .sortBy(_._1)
      // an empty / all-null-vector corpus yields no seeds, and the
      // argmin fold below would die in an obscure empty.reduceLeft —
      // fail with the actual contract violation instead
      require(cents.nonEmpty, "kmeansFit: corpus has no non-null vectors")
      var lastCounts: Map[Long, Long] = Map.empty
      for (_ <- 0 until iters) {
        // argmin over the k-centroid matrix: lexicographic (dist, cid)
        // with ties toward the lowest centroid id — identical
        // semantics to the unrolled literal struct-min it replaces,
        // but the generated code stays CONSTANT-size at any k (the
        // unrolled form blew Janino's 64 KB limit past ~80 centroids
        // and dropped the fit to interpreted eval)
        val cidExpr = org.apache.spark.sql.GraftBridge.column(
          graft.functions.NearestCentroids(
            org.apache.spark.sql.GraftBridge.expression(col("v")),
            cents.map(_._1).toArray, cents.map(_._2.toArray).toArray, 1))
          .getItem(0).getField("cid")
        val stats = v.withColumn("cid", cidExpr)
          .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
          .groupBy(col("cid"), col("dim"))
          .agg(avg(col("x")).as("m"), count(lit(1)).as("n"))
          .collect()
        val byCid = stats.groupBy(_.getLong(0))
        cents = cents.map { case (cid, old) =>
          byCid.get(cid) match {
            case Some(rows) => cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toList
            case None       => cid -> old
          }
        }
        lastCounts = byCid.view.mapValues(_.head.getLong(3)).toMap
      }
      cents.map { case (cid, c) => (cid, c, lastCounts.getOrElse(cid, 0L)) }
        .toDF("centroid_id", "centroid", "n_members")
    } finally { v.unpersist(); () }
  }

  /** Product-quantization encode — the residual-compression companion
    * to [[ivfAssign]] in the standard 100 TB ANN recipe (IVF for the
    * coarse cells, PQ for the in-cell codes): the vector splits into
    * `m` contiguous subspaces and each sub-vector is quantized to the
    * nearest of `k` codewords in that subspace's codebook, so a
    * dim-dimensional float vector compresses to m code ids (~m bytes
    * at k ≤ 256 — a 64-dim float32 embedding becomes 4 bytes at
    * m=4/k=256, a 64× reduction of what the candidate-scoring pass
    * has to read).
    *
    * Codebooks here are SEED codebooks: the sub-vectors of the `k`
    * rows first in (md5(id), id) order — the same deterministic,
    * SQL-mirrorable draw [[kmeansFit]] seeds from (train tighter
    * codebooks by running kmeansFit per subspace and passing its
    * centroids through the same literal-argmin shape if recall needs
    * it).  Assignment is a pure projection: k·m codegen'd l2 kernels
    * over literal codewords + a lexicographic struct-min argmin —
    * ZERO shuffle beyond the tiny seed sort, exactly the kmeansFit
    * assignment shape.
    *
    * @return (vec_id, sub_id, code_cid, dist) — one row per vector
    *         per subspace, dist = l2 of the chosen codeword, ties
    *         broken toward the lowest codeword id */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               m: Int, k: Int, iters: Int = 0): DataFrame = {
    require(m >= 1 && k >= 1 && iters >= 0,
      s"m, k >= 1 and iters >= 0 required, got m=$m k=$k iters=$iters")
    val (v, seeds, sub) = pqSetup(corpus, idCol, vecCol, m, k)
    val book = pqRefine(v, pqSlicedBook(seeds, m, sub), sub, iters)
    val perSub = (0 until m).map { s =>
      val arg = pqArgminSub(col("v"), book(s), s, sub)
      struct(lit(s.toLong).as("sub_id"), arg.getField("cid").as("code_cid"),
        round(arg.getField("d"), 6).as("dist"))
    }
    v.select(col("vid").as("vec_id"), explode(array(perSub: _*)).as("e"))
      .select(col("vec_id"), col("e.sub_id").as("sub_id"),
        col("e.code_cid").as("code_cid"), col("e.dist").as("dist"))
  }

  /** Seed codebook as per-subspace sub-vectors. */
  private def pqSlicedBook(seeds: Seq[(Long, Seq[Double])], m: Int,
                           sub: Int): IndexedSeq[Seq[(Long, Seq[Double])]] =
    (0 until m).map(s => seeds.map { case (cid, c) =>
      cid -> c.slice(s * sub, (s + 1) * sub) })

  /** Lloyd refinement of the per-subspace codebooks (`iters` rounds;
    * 0 = the raw seed codebook).  All m subspaces train in the SAME
    * corpus pass per round: the per-row assignment adds one argmin
    * column per subspace, a posexplode feeds a (code-of-dim, dim)
    * mean aggregate whose map-side combine collapses to m·k·subWidth
    * skinny rows per partition, and the updated codebooks live on the
    * driver between rounds — bounded state, exactly the kmeansFit
    * shape.  A codeword that loses every member keeps its position
    * (deterministic, like kmeansFit's empty-cell contract). */
  private def pqRefine(v: DataFrame, book0: IndexedSeq[Seq[(Long, Seq[Double])]],
                       sub: Int, iters: Int): IndexedSeq[Seq[(Long, Seq[Double])]] = {
    if (iters == 0) return book0
    import org.apache.spark.storage.StorageLevel
    val m = book0.size
    val vp = v.persist(StorageLevel.MEMORY_AND_DISK_SER)
    try {
      var book = book0
      for (_ <- 0 until iters) {
        val cidCols = (0 until m).map(s =>
          pqArgminSub(col("v"), book(s), s, sub).getField("cid"))
        val stats = vp
          .select(array(cidCols: _*).as("cids"), posexplode(col("v")).as(Seq("dim", "x")))
          .select(element_at(col("cids"), (col("dim") / sub).cast(IntegerType) + 1).as("cid"),
            col("dim"), col("x"))
          .groupBy(col("cid"), col("dim"))
          .agg(avg(col("x")).as("mu"))
          .collect()
        // stats rows: (cid, absolute dim, mean) — regroup per subspace
        val bySubCid = stats.groupBy(r => (r.getInt(1) / sub, r.getLong(0)))
        book = (0 until m).map { s =>
          book(s).map { case (cid, old) =>
            bySubCid.get((s, cid)) match {
              case Some(rows) =>
                cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toList
              case None => cid -> old
            }
          }
        }
      }
      book
    } finally { vp.unpersist(); () }
  }

  /** Per-probe LUT entry: d²(subspace s, codeword c) with EXACTLY the
    * codegen kernel's arithmetic (left-to-right squared-diff sum,
    * sqrt, then square — so an oracle's pow(list_distance, 2) is
    * bit-identical). */
  private def pqD2(p: Seq[Double], c: Seq[Double], s: Int, sub: Int): Double = {
    var acc = 0.0
    var i = s * sub
    while (i < (s + 1) * sub) { val d = p(i) - c(i); acc += d * d; i += 1 }
    val l2 = math.sqrt(acc)
    l2 * l2
  }

  /** Lexicographic (l2, cid) argmin of subspace `s` against explicit
    * per-subspace codewords. */
  private def pqArgminSub(vec: Column, codes: Seq[(Long, Seq[Double])],
                          s: Int, sub: Int): Column =
    array_min(array(codes.map { case (cid, cvec) =>
      struct(graft.functions.VectorSim.l2(slice(vec, s * sub + 1, sub),
          typedlit(cvec)).as("d"),
        lit(cid).as("cid")) }: _*))

  /** kmeansFit/pqSetup key their internal state on a LONG vid; a
    * non-integral id column would cast to null and die in an obscure
    * NPE at the seed collect — refuse loudly instead.  String-id
    * corpora: derive a long id first (e.g. `Scale.md5Key(id, 12)`,
    * the engine-wide deterministic hash contract). */
  private def requireIntegralId(df: DataFrame, idCol: String, op: String): Unit =
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"$op requires an integral id column (internal state keys on a Long vid); " +
          s"'$idCol' is $other — derive a long id first (e.g. a 12-hex md5 prefix)")
    }

  /** Shared PQ setup: non-null corpus projection, the deterministic
    * md5-order seed codebook, and the subspace width. */
  private def pqSetup(corpus: DataFrame, idCol: String, vecCol: String,
                      m: Int, k: Int): (DataFrame, Seq[(Long, Seq[Double])], Int) = {
    requireIntegralId(corpus, idCol, "pq")
    val dim = probeDim(corpus, vecCol).getOrElse(
      throw new IllegalArgumentException("pq: corpus has no non-null vectors"))
    require(dim % m == 0, s"pq: dim=$dim not divisible by m=$m subspaces")
    // ragged corpora corrupt PQ codes SILENTLY: a short vector's tail
    // subspaces l2-fold over zero elements → distance 0 → always the
    // minimum codeword — enforce the same loud uniform-length contract
    // kmeansFit and meanPool carry; null ids would NPE at the seed
    // collect (the kmeansFit rationale)
    val v = corpus.select(col(idCol).cast(LongType).as("vid"), asDouble(col(vecCol)).as("v"))
      .filter(col("v").isNotNull)
      .select(
        when(assert_true(col("vid").isNotNull,
            lit("pq: null id — ids must be non-null integral")).isNull,
          col("vid")).as("vid"),
        when(assert_true(size(col("v")) === lit(dim),
            lit(s"pq: ragged vector lengths — every vector must have " +
              s"dimensionality $dim")).isNull,
          col("v")).as("v"))
    val seedKey = Scale.md5Key(col("vid"), 6)
    val seeds: Seq[(Long, Seq[Double])] = v
      .orderBy(seedKey.asc, col("vid").asc).limit(k)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toList
      .sortBy(_._1)
    (v, seeds, dim / m)
  }

  /** Driver-collected probe rows shared by [[pqTopK]]/[[ivfPqTopK]]:
    * non-null vectors, non-null LongType ids, dimensionality == the
    * corpus `dim` (a short probe would index past its end in the
    * driver-side LUT arithmetic — an obscure IndexOutOfBounds), and
    * the 1024 bound (per-probe literal LUTs are plan state). */
  private def collectProbes(probes: DataFrame, idCol: String, vecCol: String,
                            dim: Int, what: String): Seq[(Long, Seq[Double])] = {
    val rows = probes
      .select(col(idCol).cast(LongType).as("pid"), asDouble(col(vecCol)).as("pv"))
      .filter(col("pv").isNotNull)
      .collect().map { r =>
        require(!r.isNullAt(0), s"$what: null probe id — ids must be non-null integral")
        r.getLong(0) -> r.getSeq[Double](1).toList
      }.toList.sortBy(_._1)
    require(rows.nonEmpty, s"$what: probe set has no non-null vectors")
    require(rows.forall(_._2.size == dim),
      s"$what: every probe must have the corpus dimensionality $dim")
    // each probe contributes a k-entry literal LUT per subspace to the
    // scan-stage plan: bounded like the kmeansFit centroids, so an
    // oversized probe frame must fail fast, not build a huge plan that
    // degrades every executor (per-lookup cost is linear in |probes|)
    require(rows.size <= 1024, s"$what: ${rows.size} probes — " +
      "the per-probe literal LUTs require a driver-bounded probe set " +
      "(<= 1024); batch larger probe frames")
    rows
  }

  /** ADC (asymmetric-distance) top-k over PQ codes — the query side of
    * [[pqEncode]], and the reason PQ exists at 100 TB: each probe
    * precomputes a k×m lookup table of squared subspace distances to
    * the codewords ONCE (driver-side — k·m doubles per probe, bounded
    * like the kmeansFit centroid state), and every corpus vector is
    * then scored by summing m table entries selected by its code ids —
    * NO vector arithmetic in the corpus scan, which only reads the m
    * code columns (the 64× compression is also a 64× scan-bandwidth
    * cut when codes are stored columnar).  Encoding is inlined so the
    * corpus is scanned once; candidates are bounded below the shuffle
    * by TopKPerKey exactly like [[lshTopK]]/[[ivfTopK]].
    *
    * Distance is approximate by construction (vector ≈ its codewords);
    * recall rises with m·k.  Probes must be small (collected).  The
    * ADC sum is the fixed fold ((d²₀+d²₁)+…) so a SQL oracle can
    * mirror it term-for-term.
    *
    * @return (probe_id, corpus_id, adc_dist, rank) — adc_dist =
    *         √Σ d²(sub), ties toward the lower corpus id */
  def pqTopK(corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
             m: Int, k: Int, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val (v, seeds, sub) = pqSetup(corpus, idCol, vecCol, m, k)
    val book = pqSlicedBook(seeds, m, sub)
    val enc = v.select(col("vid") +:
      (0 until m).map(s => pqArgminSub(col("v"), book(s), s, sub).getField("cid").as(s"c$s")): _*)
    val probeRows = collectProbes(probes, idCol, vecCol, sub * m, "pqTopK")
    val perProbe = probeRows.map { case (pid, pv) =>
      val adc2 = (0 until m).map { s =>
        val lut = seeds.map { case (cid, c) => cid -> pqD2(pv, c, s, sub) }.toMap
        element_at(typedlit(lut), col(s"c$s"))
      }.reduce(_ + _)
      struct(lit(pid).as("probe_id"), adc2.as("adc2"))
    }
    val scored = enc
      .select(col("vid").as("corpus_id"), explode(array(perProbe: _*)).as("p"))
      .select(col("p.probe_id").as("probe_id"), col("corpus_id"), col("p.adc2").as("adc2"))
      .filter(col("probe_id") =!= col("corpus_id"))
    rankPerProbe(scored, "adc2", scoreDesc = false, topK)
      .select(col("probe_id"), col("corpus_id"),
        round(sqrt(col("adc2")), 6).as("adc_dist"), col("rank"))
  }

  /** IVF + PQ composed search — the standard billion-scale ANN recipe
    * in one operator: the corpus is scanned ONCE computing both its
    * coarse cell (argmin over broadcast `centroids`, as [[ivfAssign]])
    * and its PQ codes (literal-codebook argmin, as [[pqEncode]]);
    * each probe visits its `nprobe` nearest cells and ADC-scores ONLY
    * the in-cell candidates by summing per-probe lookup-table entries
    * selected by code ids — the candidate set is bounded by
    * |corpus|·nprobe/|centroids| on balanced cells AND each candidate
    * costs m map lookups instead of a dim-wide dot product.
    *
    * `residual = false` is the IVFFlat-PQ variant: codes quantize the
    * raw vectors.  `residual = true` is the classic IVFADC refinement:
    * codes quantize `v − centroid(cell)` — residuals concentrate near
    * the origin, so the same codebook budget quantizes them tighter —
    * with the seed codebook built from the seed rows' residuals and
    * the probe LUTs computed per VISITED CELL against the probe's own
    * residual (`q − centroid`).  With a single zero centroid the
    * residual path degenerates to the raw path exactly (spec-pinned);
    * with `nprobe = |centroids|` the non-residual variant is
    * bit-identical to [[pqTopK]] (spec-pinned).
    *
    * @return (probe_id, corpus_id, adc_dist, rank) */
  def ivfPqTopK(corpus: DataFrame, centroids: DataFrame, probes: DataFrame,
                idCol: String, vecCol: String, m: Int, k: Int,
                topK: Int, nprobe: Int = 2, residual: Boolean = false): DataFrame = {
    require(topK >= 1 && nprobe >= 1, s"topK and nprobe must be >= 1")
    val (v, seeds, sub) = pqSetup(corpus, idCol, vecCol, m, k)
    // cast like the corpus/probe ids: the driver collect and the
    // residual LUT (keyed by Scala Long) both require LongType
    val cents = centroids.select(col(idCol).cast(LongType).as("centroid_id"),
      asDouble(col(vecCol)).as("cv"))
    // centroids are small by contract — driver copies feed the seed
    // residuals and the per-cell probe LUTs
    val centRows: Seq[(Long, Seq[Double])] = cents
      .filter(col("cv").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toList
      .sortBy(_._1)
    require(centRows.nonEmpty, "ivfPqTopK: centroid set has no non-null vectors")
    // the ONE shared driver-bounded centroid contract ([[MaxCentroids]],
    // same bound collectCentroidLits enforces — the coarse assignment
    // below rides the constant-size NearestCentroids kernel, so no
    // tighter codegen-era cap applies); this path hand-collects because
    // the residual LUTs need the (Long id, Seq[Double]) rows themselves
    require(centRows.length <= MaxCentroids, s"ivfPqTopK: ${centRows.length} centroids — " +
      s"assignment expects a driver-bounded centroid set (<= $MaxCentroids " +
      "coarse cells); train fewer cells or shard the index")
    def scalaL2(a: Seq[Double], b: Seq[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < math.min(a.size, b.size)) { val d = a(i) - b(i); acc += d * d; i += 1 }
      math.sqrt(acc)
    }
    def cellOf(vec: Seq[Double]): (Long, Seq[Double]) =
      centRows.map { case (cid, cv) => ((scalaL2(vec, cv), cid), cv) }.minBy(_._1) match {
        case ((_, cid), cv) => (cid, cv)
      }
    // codebook: raw seed sub-vectors, or the seed rows' residuals
    val book = pqSlicedBook(
      if (!residual) seeds
      else seeds.map { case (sid, sv) =>
        sid -> sv.zip(cellOf(sv)._2).map { case (a, b) => a - b } },
      m, sub)
    // coarse-cell assignment via the matrix argmin ([[nearestCell]]) —
    // a pure projection, no exchange on the corpus at any size
    val centLits: (Array[Long], Array[Array[Double]]) =
      (centRows.map(_._1).toArray, centRows.map(_._2.toArray).toArray)
    val assigned = v.select(col("vid").as("corpus_id"), col("v"))
      .withColumn("centroid_id", nearestCell(col("v"), centLits).getField("cid"))
    // the encoded vector: raw, or the residual against the assigned
    // centroid (cv looked up from the driver-collected centroid map;
    // enc materialized as its own attribute — the m·k argmin kernels
    // reference it, and CollapseProject keeps a multi-referenced
    // non-cheap expression out of line)
    val withEnc =
      if (!residual) assigned.withColumn("enc", col("v"))
      else assigned
        .withColumn("cv", element_at(typedlit(centRows.toMap), col("centroid_id")))
        .withColumn("enc", zip_with(col("v"), col("cv"), (a, b) => a - b))
    val corpusCells = withEnc
      .select(col("centroid_id") +: col("corpus_id") +:
        (0 until m).map(s => pqArgminSub(col("enc"), book(s), s, sub)
          .getField("cid").as(s"c$s")): _*)
    val probeRows = collectProbes(probes, idCol, vecCol, sub * m, "ivfPqTopK")
    // probe cells computed ON THE DRIVER from the already-collected
    // probe and centroid rows (both driver-bounded by contract) — no
    // window, no shuffle; scalaL2 accumulates in the same order as the
    // l2 kernel, so the (dist, centroid_id) ranking is bit-identical
    // to the former crossJoin + row_number formulation
    val spark = corpus.sparkSession
    import spark.implicits._
    val probeCellPairs: Seq[(Long, Long)] = probeRows.flatMap { case (pid, pv) =>
      centRows.map { case (ccid, cv) => (scalaL2(pv, cv), ccid) }
        .sorted.take(nprobe).map { case (_, ccid) => (ccid, pid) }
    }
    // the residual LUT below is keyed (probe -> cell); only a probe's
    // nprobe VISITED cells can ever be looked up (the probeCells join
    // restricts rows to those pairs), so the literal map is bounded at
    // |probes|·nprobe·k·m — not |probes|·|centroids|·k·m
    val visitedCells: Map[Long, Set[Long]] =
      probeCellPairs.groupBy(_._2).map { case (pid, cs) => pid -> cs.map(_._1).toSet }
    val probeCells = probeCellPairs.toDF("centroid_id", "probe_id")
    // probe LUTs as literal nested maps; probe_id (and, for residual,
    // centroid_id) are data here, so lookups chain element_at calls.
    // Non-residual: probe -> code -> d².  Residual: the probe's own
    // residual differs per visited cell -> probe -> cell -> code -> d².
    val adc2 = (0 until m).map { s =>
      if (!residual) {
        val lutMap = probeRows.map { case (pid, pv) =>
          pid -> seeds.map { case (cid, c) => cid -> pqD2(pv, c, s, sub) }.toMap }.toMap
        element_at(element_at(typedlit(lutMap), col("probe_id")), col(s"c$s"))
      } else {
        val bookS = book(s)
        val lutMap = probeRows.map { case (pid, pv) =>
          pid -> centRows.filter { case (ccid, _) => visitedCells(pid)(ccid) }.map { case (ccid, cv) =>
            val qr = pv.zip(cv).map { case (a, b) => a - b }
            ccid -> bookS.map { case (cid, cw) =>
              // codewords are already per-subspace residual slices;
              // compare against the probe-residual's slice with the
              // same sqrt-then-square arithmetic as pqD2
              val d = scalaL2(qr.slice(s * sub, (s + 1) * sub), cw)
              cid -> d * d
            }.toMap
          }.toMap
        }.toMap
        element_at(element_at(element_at(typedlit(lutMap), col("probe_id")),
          col("centroid_id")), col(s"c$s"))
      }
    }.reduce(_ + _)
    val scored = probeCells.join(corpusCells, Seq("centroid_id"))
      .filter(col("probe_id") =!= col("corpus_id"))
      .select(col("probe_id"), col("corpus_id"), adc2.as("adc2"))
    rankPerProbe(scored, "adc2", scoreDesc = false, topK)
      .select(col("probe_id"), col("corpus_id"),
        round(sqrt(col("adc2")), 6).as("adc_dist"), col("rank"))
  }

  /** Driver-collected (id-literal, vector) centroid rows — the state
    * every IVF assignment quantizes against.  The literal keeps the
    * input id's dtype, so downstream schemas match the provided frame.
    * Centroid sets are driver-bounded by contract (they are the
    * codebook, not data); the cap fails an oversized set fast instead
    * of silently building a megabyte literal plan. */
  private def collectCentroidLits(cents: DataFrame, what: String): (Array[Long], Array[Array[Double]]) = {
    // a null centroid vector would NPE the getSeq below; drop it like
    // the probe-row collects drop null probe vectors
    val rows = cents.filter(col(cents.columns(1)).isNotNull).collect()
    require(rows.nonEmpty, s"$what: centroid set has no non-null vectors")
    require(rows.length <= MaxCentroids, s"$what: ${rows.length} centroids — " +
      s"assignment expects a driver-bounded centroid set (<= $MaxCentroids " +
      "coarse cells); train fewer cells or shard the index")
    val ids = rows.map { r =>
      r.get(0) match {
        case n: java.lang.Number => n.longValue()
        case other => throw new IllegalArgumentException(
          s"$what: centroid ids must be integral, got ${other.getClass.getSimpleName}")
      }
    }
    (ids, rows.map(_.getSeq[Double](1).toArray))
  }

  /** Lexicographic (l2, centroid_id) argmin over the driver-collected
    * centroid MATRIX — a pure scan-stage projection, ZERO shuffle, and
    * (since r18) constant generated-code size at ANY centroid count:
    * [[graft.functions.NearestCentroids]] carries the matrix as a
    * referenced object, where the former unrolled literal formulation
    * (k inlined l2 kernels + struct array_min) blew Janino's 64 KB
    * method limit past ~80 centroids and dropped the whole stage to
    * interpreted eval — exactly when the population discipline makes
    * k large.  Ties break toward the lowest centroid id, exactly the
    * old window's (dist asc, centroid_id asc) order; centroid ids are
    * integral and emitted as BIGINT. */
  private def nearestCell(vec: Column, cents: (Array[Long], Array[Array[Double]])): Column =
    nearestCells(vec, cents, 1).getItem(0)

  /** The `nprobe` nearest cells in (l2, centroid_id) order — the probe
    * side of the same zero-shuffle, constant-codegen shape. */
  private def nearestCells(vec: Column, cents: (Array[Long], Array[Array[Double]]),
                           nprobe: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.functions.NearestCentroids(
      GraftBridge.expression(vec.cast(ArrayType(DoubleType))), cents._1, cents._2, nprobe))
  }

  /** Cell assignment that keeps the VECTOR alongside (vid, cell) — the
    * within-cell pairing feed of [[graft.operators.Dedup.semanticDedup]]
    * (a join back against [[ivfAssign]] would rescan and reshuffle the
    * corpus just to recover the vectors).  Same argmin semantics. */
  private[graft] def cellAssigned(corpus: DataFrame, centroids: DataFrame,
                                  idCol: String, vecCol: String): DataFrame = {
    val cents = centroids.select(col(idCol).as("centroid_id"), asDouble(col(vecCol)).as("cv"))
    val lits = collectCentroidLits(cents, "semanticDedup")
    corpus.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
      .filter(col("v").isNotNull)
      .select(col("vid"), col("v"),
        nearestCell(col("v"), lits).getField("cid").as("cell"))
  }

  /** IVF-style coarse quantization: assign each vector to the nearest
    * of `centroids` (small, driver-collected into the literal argmin),
    * so queries probe only matching cells.  Centroid set is provided
    * (e.g. sampled ids or [[kmeansFit]] output), making training an
    * explicit, separate step.  Assignment is a pure projection over
    * the corpus scan — no shuffle at any corpus size. */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame,
                idCol: String, vecCol: String): DataFrame = {
    val c = corpus.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
    val cents = centroids.select(col(idCol).as("centroid_id"), asDouble(col(vecCol)).as("cv"))
    val best = nearestCell(col("v"), collectCentroidLits(cents, "ivfAssign"))
    c.select(col("vid"), best.getField("cid").as("centroid_id"),
      round(best.getField("d"), 6).as("dist"))
  }

  /** IVF probe search — the query side of [[ivfAssign]]'s inverted-file
    * layout: each probe scores ONLY the corpus vectors living in the
    * `nprobe` cells whose centroids are nearest the probe.  Recall < 1
    * by construction (a true neighbor can live in a cell the probe does
    * not visit), rising with `nprobe`; verified against
    * [[bruteForceTopK]] in tests.
    *
    * Scale: the corpus is scanned ONCE — assignment is the literal
    * argmin ([[nearestCell]]), a pure projection with NO exchange at
    * any corpus size — then one shuffle on the cell id joins the probe
    * cells; probes × nprobe cell visits bound the scored candidates at
    * |corpus| · nprobe / |centroids| on balanced cells — never the
    * |probes| · |corpus| cartesian of the exact baseline.  The top-k
    * is bounded below the shuffle by the custom TopKPerKey operator,
    * like [[lshTopK]]. */
  def ivfTopK(corpus: DataFrame, centroids: DataFrame, probes: DataFrame,
              idCol: String, vecCol: String, k: Int, nprobe: Int = 2): DataFrame = {
    val cents = centroids.select(col(idCol).as("centroid_id"), asDouble(col(vecCol)).as("cv"))
    val centLits = collectCentroidLits(cents, "ivfTopK")
    // same assignment semantics as ivfAssign (l2 argmin, centroid_id
    // tiebreak) but computed inline so cvec rides along — a join back
    // against ivfAssign would rescan and reshuffle the whole corpus
    // carried-norm scorer (the r21 convention): norms computed once
    // per corpus/probe row, one dot per visited candidate
    val corpusCells = corpus
      .select(col(idCol).as("corpus_id"), asDouble(col(vecCol)).as("cvec"))
      .select(nearestCell(col("cvec"), centLits).getField("cid").as("centroid_id"),
        col("corpus_id"), col("cvec"), dot(col("cvec"), col("cvec")).as("_cn2"))
    val probeCells = probes
      .select(col(idCol).as("probe_id"), asDouble(col(vecCol)).as("pvec"))
      .select(explode(nearestCells(col("pvec"), centLits, nprobe)).as("cell"),
        col("probe_id"), col("pvec"), dot(col("pvec"), col("pvec")).as("_pn2"))
      .select(col("cell.cid").as("centroid_id"), col("probe_id"), col("pvec"), col("_pn2"))
    val ivfDenom = sqrt(col("_pn2")) * sqrt(col("_cn2"))
    val scored = probeCells.join(corpusCells, Seq("centroid_id"))
      .filter(col("probe_id") =!= col("corpus_id"))
      .select(col("probe_id"), col("corpus_id"),
        round(when(ivfDenom === 0.0, lit(Double.NaN))
          .otherwise(dot(col("pvec"), col("cvec")) / ivfDenom), 6).as("cos_sim"))
      // NaN/null cosine (zero-norm or null corpus vector in a visited
      // cell) must not rank — NaN sorts above every real similarity in
      // the desc top-k, so it would take rank 1 for every probe
      // visiting that cell (the lshTopK/bruteForceTopK guard; this
      // surface had missed it)
      .filter(col("cos_sim").isNotNull && !isnan(col("cos_sim")))
    rankPerProbe(scored, "cos_sim", scoreDesc = true, k)
      .select(col("probe_id"), col("corpus_id"), col("cos_sim"), col("rank"))
  }
}
