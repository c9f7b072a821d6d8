package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Streaming MinHash-LSH near-duplicate detection — the ingestion-time
  * counterpart of [[graft.operators.Dedup.minhashLsh]] for a
  * training-data pipeline: documents arriving on a stream are flagged
  * against previously seen documents WITHOUT re-scanning the corpus.
  *
  * Shape: a row-local MinHash signature (one compiled pass per
  * document — no aggregation, so the stateful stage remains the only
  * stateful operator in the query), exploded into LSH band keys; each
  * band bucket is a `flatMapGroupsWithState` group whose state holds
  * the bucket's representative signatures.  A new document that agrees
  * with a representative on ≥ `threshold` of signature positions is
  * emitted as a hit (best match per band); otherwise it becomes a
  * representative itself.
  *
  * Scale posture: state is per band-bucket, bounded by
  * `maxPerBucket` representatives (FIFO eviction beyond); pass
  * `stateTtl` to ALSO drop idle buckets via processing-time timeout.
  * The shuffle key is the band hash — uniformly distributed; no
  * bucket ever sees the corpus.
  *
  * Recall under eviction (measured — StreamingDedupSpec's flooded-
  * bucket drive, values pinned): `maxPerBucket` is a RECALL bound
  * sized to the per-bucket distinct-duplicate-family pressure, not a
  * shrink-to-fit memory knob.  With cap ≥ families-per-bucket, recall
  * is exactly 1.0; below it, random-arrival recall decays roughly as
  * cap/families (measured 0.50 at cap = half the pressure, 0.02 at
  * cap 1/32nd), and an adversarial interleave (every family's members
  * separated by a full stride of foreign docs) loses EVERYTHING below
  * the pressure — FIFO re-seeds each member and evicts it before its
  * next sibling arrives.  The default (64) flags exactly the
  * unbounded twin's documents on the sf0.1 corpus; a hot production
  * bucket (e.g. a template family) wants the cap raised or the
  * upstream exact-hash dedup run first.
  * Semantics are at-least-once per pair (a pair colliding in several
  * bands emits per band); sink-side `dropDuplicates(doc_id, dup_of)`
  * tightens it.
  *
  * TTL caveat: processing-time timeouts make Spark schedule no-data
  * micro-batches to fire them — with the default as-fast-as-possible
  * trigger that is a busy loop of empty state-store commits.  Only set
  * `stateTtl` together with a real `Trigger.ProcessingTime(...)` on
  * the query; the default (None) uses NoTimeout and relies on the
  * per-bucket FIFO bound alone.
  *
  * The signature formula matches the batch operator bit-for-bit
  * (xxhash64 of the normalized 5-gram, re-hashed per permutation
  * seed), so stream decisions agree with batch backfills over the same
  * text. */
object StreamingDedup {

  final case class NearDupHit(doc_id: Long, dup_of: Long, est_jaccard: Double)

  private val Seed = 42L

  /** JVM mirror of TextAnalysis.normalize — TEST surface only.  The
    * streaming path itself normalizes through the SAME Catalyst
    * expression as batch (see nearDupHits), so there is no lowercase-
    * locale divergence in production; this copy exists for parity
    * specs that drive [[signature]] directly with raw text. */
  private def normalize(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ").trim

  /** Batch-identical MinHash signature over ALREADY-normalized text:
    * sig(i) = min over shingles of xxhash64(i, xxhash64(shingle));
    * null when the text yields no shingle (mirrors the batch
    * formulation dropping such docs).  Delegates to the fused batch
    * kernel ([[graft.functions.MinHash.minhashData]]) — one
    * implementation, so stream decisions agree with batch backfills by
    * construction. */
  private[graft] def signatureNormalized(norm: String, shingleSize: Int, k: Int): Array[Long] = {
    val arr = graft.functions.MinHash.minhashData(
      UTF8String.fromString(if (norm == null) "" else norm), shingleSize, k)
    if (arr == null) null else arr.toLongArray()
  }

  /** [[signatureNormalized]] over raw text (JVM-normalized) — parity
    * specs only. */
  private[graft] def signature(text: String, shingleSize: Int, k: Int): Array[Long] =
    signatureNormalized(normalize(if (text == null) "" else text), shingleSize, k)

  /** Batch-identical band key: xxhash64(sig slice ++ band index). */
  private[graft] def bandKey(sig: Array[Long], band: Int, rowsPerBand: Int): Long = {
    var h = Seed
    var r = 0
    while (r < rowsPerBand) {
      h = XxHash64Function.hash(sig(band * rowsPerBand + r), LongType, h)
      r += 1
    }
    XxHash64Function.hash(band, IntegerType, h)
  }

  /** @param docs streaming (or batch) frame with `idCol` (long) and
    *             `textCol` (string)
    * @return hits (doc_id, dup_of, est_jaccard), at-least-once per pair */
  def nearDupHits(docs: DataFrame, idCol: String, textCol: String,
                  shingleSize: Int = 5, bands: Int = 8, rowsPerBand: Int = 4,
                  threshold: Double = 0.7, maxPerBucket: Int = 64,
                  stateTtl: Option[String] = None): Dataset[NearDupHit] = {
    val k = bands * rowsPerBand
    // the CODEGEN'D batch kernel, not a UDF wrapper around it: the UDF
    // form deserialized every row UTF8String->String->UTF8String and
    // blocked whole-stage codegen for the same bit-identical values
    // (signatureNormalized remains the JVM seam the parity specs pin)
    val sigs = docs
      .select(col(idCol).cast("long").as("doc_id"),
        graft.functions.MinHash.minhashSig(
          graft.operators.TextAnalysis.normalize(col(textCol)), shingleSize, k).as("sig"))
    nearDupHitsCore(banded(sigs, bands, rowsPerBand), k, threshold, maxPerBucket, stateTtl)
  }

  /** The ORACLE-PORTABLE twin of [[nearDupHits]]: same stateful
    * leader-clustering core, but the per-document signature is the
    * portable md5+LCG minhash ([[graft.functions.WindowHash
    * .portableMinhashSig]], the q26/q40 lane family DuckDB can
    * recompute arithmetically).  Banding still uses [[bandKey]] —
    * any deterministic injective-modulo-collisions function of the
    * band slice partitions identically to grouping by the slice
    * values themselves, which is what the SQL mirror does.  With
    * `maxPerBucket` large enough that FIFO eviction never fires, the
    * semantics are exactly leader clustering per bucket in
    * (micro-batch, doc_id) order — a recursive-CTE replay (the q59
    * oracle). */
  def nearDupHitsPortable(docs: DataFrame, idCol: String, textCol: String,
                          shingleSize: Int = 5, bands: Int = 8, rowsPerBand: Int = 4,
                          threshold: Double = 0.7, maxPerBucket: Int = 1 << 20,
                          stateTtl: Option[String] = None): Dataset[NearDupHit] = {
    val k = bands * rowsPerBand
    val sigs = docs.select(col(idCol).cast("long").as("doc_id"),
      graft.functions.WindowHash.portableMinhashSig(
        graft.operators.TextAnalysis.normalize(col(textCol)), shingleSize, k).as("sig"))
    nearDupHitsCore(banded(sigs, bands, rowsPerBand), k, threshold, maxPerBucket, stateTtl)
  }

  /** (doc_id, sig) → one row per (doc, band) with the band's bucket
    * key; null signatures (no shingle) dropped, the batch contract.
    * The key expression IS the batch family's
    * ([[graft.operators.Dedup.explodedBandKeys]], non-portable arm —
    * xxhash64 over the band's lanes + band index, seed 42, value-equal
    * to the row-local [[bandKey]] the specs pin), so stream keys join
    * batch-built indexes by construction instead of by a hand-kept
    * duplicate of the fold. */
  private def banded(sigs: DataFrame, bands: Int,
                     rowsPerBand: Int): Dataset[(Long, Array[Long], Long)] = {
    val spark = sigs.sparkSession
    import spark.implicits._
    sigs.where(col("sig").isNotNull)
      .select(col("doc_id"), col("sig"),
        graft.operators.Dedup.explodedBandKeys(col("sig"), bands, rowsPerBand,
          portable = false).as("band_key"))
      .as[(Long, Array[Long], Long)]
  }

  /** The stateful leader-clustering core over pre-banded rows —
    * signature-agnostic (xxhash64 and portable variants share it, so
    * stream decisions agree with their batch twins by construction).
    * private[graft]: the recall-under-eviction spec drives it with
    * synthetic signatures/band keys to control bucket populations
    * exactly. */
  private[graft] def nearDupHitsCore(banded: Dataset[(Long, Array[Long], Long)], k: Int,
                                     threshold: Double, maxPerBucket: Int,
                                     stateTtl: Option[String]): Dataset[NearDupHit] = {
    val spark = banded.sparkSession
    import spark.implicits._
    // maxPerBucket <= 0 means UNBOUNDED — the batch capBuckets
    // convention.  (takeRight(0) would silently empty the rep list
    // after every doc: zero hits forever, mistaken for a clean corpus.)
    val cap = if (maxPerBucket <= 0) Int.MaxValue else maxPerBucket
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    banded.groupByKey(_._3)
      .flatMapGroupsWithState[List[(Long, Array[Long])], NearDupHit](
        OutputMode.Append(), timeoutConf) {
        (_: Long, rows: Iterator[(Long, Array[Long], Long)],
         state: GroupState[List[(Long, Array[Long])]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var reps = state.getOption.getOrElse(Nil)
            val out = List.newBuilder[NearDupHit]
            // deterministic order within a micro-batch
            rows.toSeq.sortBy(_._1).foreach { case (id, sig, _) =>
              var bestId = -1L
              var bestAgree = -1
              reps.foreach { case (repId, repSig) =>
                if (repId != id) {
                  var agree = 0
                  var i = 0
                  while (i < k) { if (sig(i) == repSig(i)) agree += 1; i += 1 }
                  // unique-id tiebreak: lowest rep id wins equal agreement
                  if (agree > bestAgree || (agree == bestAgree && repId < bestId)) {
                    bestAgree = agree; bestId = repId
                  }
                }
              }
              if (bestAgree.toDouble / k >= threshold)
                out += NearDupHit(id, bestId,
                  // HALF_UP like Spark's round() (the batch operators'
                  // rendering) — math.rint's half-even would disagree
                  // with a batch backfill of the same pair on .5
                  // boundaries (non-power-of-two k); est >= 0 so the
                  // +0.5 floor IS HALF_UP
                  math.floor(bestAgree.toDouble / k * 1e6 + 0.5) / 1e6)
              else if (!reps.exists(_._1 == id))
                // FIFO bound: newest rep appended, oldest evicted.
                // A REDELIVERED id (at-least-once source: Kafka replay,
                // re-ingested file) is already a representative — it
                // must not burn a second FIFO slot and evict a distinct
                // doc early (silent recall loss beyond the bound)
                reps = (reps :+ (id, sig)).takeRight(cap)
            }
            state.update(reps)
            stateTtl.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  /** Streaming documents flagged against a STATIC, precomputed band
    * index ([[graft.operators.Dedup.minhashBandIndex]] of yesterday's
    * corpus): a stateless stream-static equi join on the band key —
    * no state store at all, so it composes freely with downstream
    * stateful stages.  Chain with [[nearDupHits]] to dedup an ingest
    * stream against BOTH the historical corpus and itself.
    *
    * The stream side's band keys are computed by the same row-local
    * kernel as [[nearDupHits]] (bit-identical to the batch
    * `mhBanded`), so stream hits agree with a batch
    * `minhashLshAgainstIndex` backfill by construction.  At-least-once
    * per band — sink-side `dropDuplicates(doc_id, dup_of)` tightens
    * it (kept out of this operator: an unwatermarked streaming
    * dropDuplicates would grow state forever).
    *
    * @return (doc_id, dup_of, est_jaccard) hits with est ≥ threshold */
  def nearDupHitsAgainstIndex(docs: DataFrame, idCol: String, textCol: String,
                              index: DataFrame,
                              shingleSize: Int = 5, bands: Int = 8, rowsPerBand: Int = 4,
                              threshold: Double = 0.7): DataFrame = {
    val k = bands * rowsPerBand
    // eager geometry probe, exactly like the batch twin: the INDEX
    // side is static (collectable even inside a streaming query), and
    // a same-k bands/rowsPerBand split, a shingle mismatch, or a
    // PORTABLE-family index (string md5 band keys — the long=string
    // join would coerce and match nothing) all produce a silently
    // near-empty hit stream the signature-LENGTH assert below can
    // never see.  Legacy geom-less indexes keep the length probe.
    if (index.columns.contains("index_geom")) {
      val want = s"$shingleSize:$bands:$rowsPerBand:x"
      index.select(col("index_geom")).limit(1).collect().headOption.foreach { r =>
        require(r.getString(0) == want,
          s"minhash index geometry mismatch: stream is '$want' " +
            s"(shingleSize:bands:rowsPerBand:hashFamily) but the index was built " +
            s"with '${r.getString(0)}' — rebuild one side to match")
      }
    }
    // signature + banding through the SAME code as [[nearDupHits]]
    // (one shape to fix, never two drifting copies), which itself
    // delegates to the batch kernel/key expressions
    val sigs = docs.select(col(idCol).cast("long").as("doc_id"),
      graft.functions.MinHash.minhashSig(
        graft.operators.TextAnalysis.normalize(col(textCol)), shingleSize, k).as("sig"))
    banded(sigs, bands, rowsPerBand).toDF("doc_id", "sig", "band_key")
      .join(index.drop("index_geom"), Seq("band_key"))
      .filter(col("doc_id") =!= col("index_id"))
      // same fail-fast geometry guard as the batch operator (folded
      // into the kept expression so column pruning can't drop it)
      .select(col("doc_id"), col("index_id").as("dup_of"),
        when(assert_true(size(col("sig")) === size(col("index_sig")),
            lit(s"minhash index geometry mismatch: stream k=$k != index " +
              "signature length — rebuild the index with the same " +
              "shingleSize/bands/rowsPerBand")).isNull,
          round(graft.functions.VectorSim.agreeCount(col("sig"), col("index_sig"))
            .cast("double") / lit(k), 6)).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }
}
