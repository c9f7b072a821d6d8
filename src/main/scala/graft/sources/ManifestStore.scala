package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Atomic, versioned table commits for the incremental ingest stores
  * (the span evidence of q122, the sketch columns of q118–q120, the
  * kept-embedding store of q127): a minimal manifest layer in the
  * Delta/Iceberg family, built from nothing but parquet + one atomic
  * rename.
  *
  * The problem it closes: every store-once/merge-later operator here
  * appends parquet files into a directory, and a reader that lists
  * that directory mid-append sees a TORN table (some of the new
  * files, or a _temporary dir).  At one ingest per day that is a
  * nuisance; at a 100 TB pipeline with writers and readers on
  * different schedules it is silent corruption.
  *
  * Layout:
  * {{{
  * <root>/data/v<version>-<label>-<uuid8>/part-*.parquet  immutable once committed
  * <root>/data/batch<id>/part-*.parquet                   streaming micro-batches
  * <root>/_manifests/v%020d.json                   header lines + one line per data file
  * <root>/_manifests/_latest                       version pointer (hint; listing fallback)
  * <root>/_manifests/_batches                      batchId -> version ledger (hint; header fallback)
  * }}}
  *
  * The commit protocol — classic write-ahead + atomic publish:
  *  1. write the new data files under `data/v<next>-<label>/`
  *     (invisible: no manifest references them yet);
  *  2. write the FULL new file list to `_manifests/.tmp-<next>-<uuid>`;
  *  3. `rename` it to `_manifests/v<next>.json` — atomic on POSIX
  *     and HDFS, and rename-refuses-to-overwrite gives optimistic
  *     concurrency: two racing committers of version N cannot both
  *     win (the loser throws; retry on the new current version).
  *     NOT atomic on bare S3 — front it with a locking catalog there,
  *     the same caveat every manifest design carries.  On the LOCAL
  *     filesystem FileContext's no-overwrite rename is an exists
  *     check followed by rename(2) — a TOCTOU window for two truly
  *     concurrent committers; a per-root JVM lock serializes
  *     same-process publishes (the realistic local case: tests and
  *     local-mode drivers), and cross-PROCESS local races remain the
  *     documented local-fs caveat.
  *
  * Readers resolve ONE manifest (latest or a pinned `version`) and
  * read exactly the files it lists — a torn state is unobservable,
  * and old versions stay readable until [[vacuum]] (time travel).
  * [[compact]] rewrites the CURRENT file set through the byte-sized
  * coalesce of [[graft.operators.Layout.compactSmallFiles]]'s shape
  * and publishes a manifest listing only the rewritten files — data
  * files are never mutated, so concurrent pinned readers are
  * untouched.
  *
  * Discovery is O(1), not O(versions): publishes refresh a
  * `_latest` pointer, [[currentVersion]] reads it and forward-probes
  * the (contiguous) versions above it — the directory listing is
  * only the fallback for a missing/corrupt pointer (counted by
  * [[listingFallbacks]] so the spec can assert commit cost stays
  * flat over long histories).  Likewise [[commitStreamBatch]]'s
  * replay probe is one ledger read on the happy path; the manifest
  * headers (`#batch` lines, written atomically WITH the commit)
  * remain the ground truth the ledger is rebuilt from.
  */
object ManifestStore {

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(hadoopConf(spark))

  // newHadoopConf() clones the WHOLE Spark conf into a fresh Hadoop
  // Configuration (~tens of ms); a commit touches the filesystem
  // handle several times, and for a streaming sink that cost is paid
  // per micro-batch.  Cache per SESSION — sessions can carry their own
  // runtime-set hadoop options (fs.*, credentials), so a context-wide
  // cache would silently serve the first caller's conf to every later
  // session — but through WEAK keys, so the throwaway sessions this
  // codebase mints (newSession() in Dedup.collectPairsIfSmall) are
  // collectable the moment they are unreachable, never pinned by the
  // cache.  A benign double-compute under concurrency beats a lock
  // held across the clone.
  private val confCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, org.apache.hadoop.conf.Configuration]())
  private[graft] def hadoopConf(spark: SparkSession): org.apache.hadoop.conf.Configuration = {
    val cached = confCache.get(spark)
    if (cached != null) cached
    else {
      val fresh = spark.sessionState.newHadoopConf()
      confCache.put(spark, fresh)
      fresh
    }
  }

  // versioned data dirs carry a uuid tail: two racing committers of
  // the same version (or a retry after a crash that left debris) must
  // never collide on the DATA path — only the manifest rename decides
  // the race, and loser/crash dirs are reclaimed (catch blocks below,
  // vacuum's orphan sweep) instead of blocking every future attempt
  // at that version with errorifexists.  Batch dirs stay deterministic
  // on purpose: the batchId-keyed path is how a replay finds and
  // clears its own torn write.
  private def versionedDataDir(root: String, v: Long, label: String): Path =
    new Path(root, s"data/v$v-$label-${java.util.UUID.randomUUID().toString.take(8)}")

  private def manifestDir(root: String) = new Path(root, "_manifests")
  private def manifestPath(root: String, v: Long) =
    new Path(manifestDir(root), f"v$v%020d.json")
  private def pointerPath(root: String) = new Path(manifestDir(root), "_latest")
  private def ledgerPath(root: String) = new Path(manifestDir(root), "_batches")

  /** Listing-fallback counter: every [[currentVersion]] that could
    * not resolve through the `_latest` pointer bumps it.  Spec-level
    * observability for the O(1)-discovery contract — a long commit
    * history must not grow this per commit. */
  private[graft] val listingFallbacks = new java.util.concurrent.atomic.AtomicLong(0L)

  // serializes same-JVM publishes per root (the local-fs TOCTOU note
  // in the publish scaladoc); cross-process races are the fs's problem.
  // Deliberately never evicted: a lock must stay CANONICAL per root
  // for the JVM's life (weak eviction could hand two committers two
  // different locks for one root), and the cost is one bare Object
  // per distinct root string ever touched.
  private val publishLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  // keyed by the fs-QUALIFIED path, never the raw string: '/x/store',
  // '/x/store/' and 'file:/x/store' are one physical root and must
  // share one lock — distinct keys would reopen the TOCTOU the lock
  // closes
  private def lockFor(f: FileSystem, root: String): Object =
    publishLocks.computeIfAbsent(
      f.makeQualified(new Path(root)).toString, _ => new Object)

  /** Newest committed version, None for an empty/uninitialized root.
    * O(1): pointer read + forward-probe of the contiguous versions
    * above it (zero when the pointer is fresh, which every publish
    * keeps it); directory listing only as the fallback. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, root)
    readPointer(f, root) match {
      case Some(v) if f.exists(manifestPath(root, v)) =>
        var cur = v
        while (f.exists(manifestPath(root, cur + 1))) cur += 1
        Some(cur)
      case _ =>
        listingFallbacks.incrementAndGet()
        listVersions(f, root).lastOption
    }
  }

  /** All committed versions present on disk, ascending (gaps where
    * [[vacuum]] dropped manifests).  One directory listing. */
  private def listVersions(f: FileSystem, root: String): Seq[Long] = {
    val dir = manifestDir(root)
    if (!f.exists(dir)) return Nil
    f.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toLong).sorted
  }

  // hint files live OUTSIDE the checksum layer: the local
  // ChecksumFileSystem/ChecksumFs pair leaves stale or missing .crc
  // siblings when a file is repeatedly rename-overwritten, turning a
  // perfectly good pointer into intermittent ChecksumExceptions.
  // Hints are self-validating (a parseable long / tsv, with a correct
  // fallback path behind them), so raw bytes + POSIX rename is the
  // honest tier for them.
  private def rawFs(f: FileSystem): FileSystem = f match {
    case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
    case other => other
  }

  private def readPointer(f: FileSystem, root: String): Option[Long] = {
    val p = pointerPath(root)
    val rf = rawFs(f)
    if (!rf.exists(p)) return None
    try {
      val in = rf.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim finally in.close()
      Some(s.toLong)
    } catch { case scala.util.control.NonFatal(_) => None } // corrupt hint: fall back
  }

  // hint files are rewritten whole via tmp + rename — atomic overwrite
  // on the raw local fs (rename(2)); on filesystems whose rename
  // refuses an existing target, delete-then-rename (a torn hint just
  // means the correct, slower fallback path)
  private def writeHint(spark: SparkSession, root: String, target: Path, body: String): Unit = {
    val f = rawFs(fs(spark, root))
    f.mkdirs(manifestDir(root))
    val tmp = new Path(manifestDir(root),
      s".hint-${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      val out = f.create(tmp, false)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      if (!f.rename(tmp, target)) {
        // rename refused an existing target: replace via direct
        // overwrite-create rather than delete-then-rename — a second
        // rename failure after the delete would leave NO hint at all
        // (for the ledger that means losing replay entries whose
        // manifests vacuum already dropped, not just a slow listing)
        val direct = f.create(target, true)
        try direct.write(body.getBytes("UTF-8")) finally direct.close()
        f.delete(tmp, false); ()
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        // never leak .hint tmp debris on a failed write (a streaming
        // sink under sustained disk pressure would mint one per
        // micro-batch otherwise)
        try { f.delete(tmp, false); () } catch { case scala.util.control.NonFatal(_) => () }
        throw e
    }
  }

  /** The file list of `version` (default: current).  Paths are the
    * absolute strings the manifest recorded; `#`-prefixed header
    * lines (the committed schema, the batch id) are skipped. */
  def files(spark: SparkSession, root: String, version: Option[Long] = None): Seq[String] =
    manifestLines(spark, root, version).filterNot(_.startsWith("#"))

  /** The schema the table committed (recorded in the manifest header),
    * None for manifests written before schema tracking. */
  def schemaOf(spark: SparkSession, root: String, version: Option[Long] = None): Option[StructType] =
    manifestLines(spark, root, version).find(_.startsWith(SchemaHeader))
      .map(l => DataType.fromJson(l.stripPrefix(SchemaHeader)).asInstanceOf[StructType])

  private val SchemaHeader = "#schema\t"
  private val BatchHeader = "#batch\t"

  private def manifestLines(spark: SparkSession, root: String, version: Option[Long]): Seq[String] = {
    val v = version.orElse(currentVersion(spark, root)).getOrElse(
      throw new IllegalStateException(s"no committed version under $root"))
    val p = manifestPath(root, v)
    val f = fs(spark, root)
    require(f.exists(p), s"version $v does not exist under $root")
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toList
    finally in.close()
  }

  /** The streaming batch id `version` committed, None for non-batch
    * commits.  Reads ONLY the header lines (headers precede file
    * lines by construction), so a replay probe over a version delta
    * never pays a full manifest read. */
  private def headerBatchOf(spark: SparkSession, root: String, v: Long): Option[Long] = {
    val p = manifestPath(root, v)
    val f = fs(spark, root)
    if (!f.exists(p)) return None
    val in = f.open(p)
    // toLongOption: a corrupt '#batch' line degrades to "no batch
    // header" (the readPointer/readLedger convention), never a
    // NumberFormatException that aborts a replay probe or vacuum fold
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty)
      .takeWhile(_.startsWith("#"))
      .collectFirst { case l if l.startsWith(BatchHeader) => l.stripPrefix(BatchHeader).trim }
      .flatMap(_.toLongOption)
    finally in.close()
  }

  /** Loud schema gate for appends: a mismatched batch would not fail
    * here but at some LATER read as missing columns or type errors —
    * name the drift at the commit that introduces it.  Field order is
    * irrelevant (parquet resolves by name); names and types must
    * match exactly. */
  private def requireSameSchema(stored: StructType, incoming: StructType, root: String): Unit = {
    def norm(s: StructType) = s.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq
    if (norm(stored) != norm(incoming)) {
      val a = norm(stored).map { case (n, t) => s"$n: ${t.simpleString}" }.mkString(", ")
      val b = norm(incoming).map { case (n, t) => s"$n: ${t.simpleString}" }.mkString(", ")
      throw new IllegalArgumentException(
        s"schema drift on append to $root — stored [$a] vs incoming [$b]; " +
          "migrate with an explicit rewrite, never a silent append")
    }
  }

  /** Snapshot read: exactly the files `version` (default: current)
    * committed — mid-flight appends are unobservable. */
  def read(spark: SparkSession, root: String, version: Option[Long] = None): DataFrame =
    spark.read.parquet(files(spark, root, version): _*)

  /** Append `df` as a new version (previous files + the new ones).
    * Returns the committed version.  Throws if another committer
    * published the same version first (optimistic concurrency —
    * re-read and retry). */
  def commitAppend(spark: SparkSession, root: String, df: DataFrame,
                   label: String = "append"): Long = {
    require(label.matches("[A-Za-z0-9_-]+"), s"label must be path-safe, got '$label'")
    val prev = currentVersion(spark, root)
    // schema gate BEFORE the data write: fail without spending the job
    prev.flatMap(v => schemaOf(spark, root, Some(v)))
      .foreach(stored => requireSameSchema(stored, df.schema, root))
    val next = prev.map(_ + 1).getOrElse(0L)
    val dataDir = versionedDataDir(root, next, label)
    df.write.mode("errorifexists").parquet(dataDir.toString)
    val newFiles = listParquet(spark, dataDir)
    try publish(spark, root, next, df.schema,
      prev.map(v => files(spark, root, Some(v))).getOrElse(Nil) ++ newFiles)
    catch {
      case e: java.util.ConcurrentModificationException =>
        // the loser's data files are referenced by nothing and never
        // will be — reclaim them now instead of leaking an orphan dir
        fs(spark, root).delete(dataDir, true)
        throw e
    }
    next
  }

  /** Replace the ENTIRE table as a new version: the manifest lists
    * only the new data files; previous files stay readable for pinned
    * versions until [[vacuum]].  This is the EXPLICIT-rewrite
    * migration path the append-time schema gate points at (a store
    * reassignment after a centroid refit, a global re-shuffle, a
    * schema migration) — the schema may legitimately change here and
    * the new one is recorded. */
  def commitReplace(spark: SparkSession, root: String, df: DataFrame,
                    label: String = "replace"): Long = {
    require(label.matches("[A-Za-z0-9_-]+"), s"label must be path-safe, got '$label'")
    val prev = currentVersion(spark, root)
    val next = prev.map(_ + 1).getOrElse(0L)
    val dataDir = versionedDataDir(root, next, label)
    df.write.mode("errorifexists").parquet(dataDir.toString)
    try publish(spark, root, next, df.schema, listParquet(spark, dataDir))
    catch {
      case e: java.util.ConcurrentModificationException =>
        fs(spark, root).delete(dataDir, true)
        throw e
    }
    next
  }

  /** Rewrite the CURRENT file set into ~targetFileBytes files (the
    * small-files maintenance pass, manifest edition): shuffle-free
    * coalesce sized from the manifest's own byte count, then a new
    * manifest listing ONLY the rewritten files.  Old versions keep
    * reading the old files until [[vacuum]]. */
  def compact(spark: SparkSession, root: String,
              targetFileBytes: Long = 128L << 20): Long = {
    require(targetFileBytes >= (1L << 20), s"target below 1 MiB recreates the problem: $targetFileBytes")
    val prev = currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"nothing to compact under $root"))
    val next = prev + 1
    val f = fs(spark, root)
    val cur = files(spark, root, Some(prev))
    val bytes = cur.map(p => f.getFileStatus(new Path(p)).getLen).sum
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val dataDir = versionedDataDir(root, next, "compact")
    val rewritten = spark.read.parquet(cur: _*)
    rewritten.coalesce(n)
      .write.mode("errorifexists").parquet(dataDir.toString)
    try publish(spark, root, next,
      schemaOf(spark, root, Some(prev)).getOrElse(rewritten.schema),
      listParquet(spark, dataDir))
    catch {
      case e: java.util.ConcurrentModificationException =>
        // same reclaim as commitAppend: a losing compaction's rewrite
        // is referenced by nothing — without this it would leak
        // permanently (vacuum only reclaims files DROPPED manifests
        // referenced, never never-referenced ones)
        f.delete(dataDir, true)
        throw e
    }
    next
  }

  /** Exactly-once streaming sink step: commit one micro-batch,
    * IDEMPOTENT on `batchId`.  Structured Streaming's `foreachBatch`
    * re-delivers a batch after a failure with the SAME batchId; a
    * plain parquet append would duplicate those rows, and a plain
    * [[commitAppend]] would commit them twice.
    *
    * Replay detection is DURABLE, not inferred from data-dir
    * presence: each batch commit records `#batch <id>` in its
    * manifest header (atomic with the commit itself) and mirrors it
    * into the `_batches` ledger.  A replay resolves through the
    * ledger in one read; a ledger missing the id (crash between
    * publish and ledger write, or a rebuilt root) falls back to
    * scanning only the manifest HEADERS of the versions the ledger
    * has not yet covered.  In particular a [[compact]] + [[vacuum]]
    * between a batch's commit and its crash-recovery replay — which
    * rewrites the batch's files and may delete its data dir — no
    * longer misclassifies the replay as a torn write (the failure
    * mode of the r18 data-dir probe): the ledger entry survives both.
    * Retention note: [[vacuum]] folds the `#batch` headers of the
    * manifests it drops INTO the ledger before dropping them, so the
    * replay contract survives any single loss — headers heal a lost
    * ledger hint, the ledger preserves dropped headers.
    *
    * Use as `stream.writeStream.foreachBatch { (df, id) =>
    * ManifestStore.commitStreamBatch(df.sparkSession, root, df, id); () }`.
    * One streaming writer per root — the ledger is single-writer.
    *
    * Pass `runId` (e.g. the streaming query's id) to arm the
    * checkpoint-reset guard: a NEW run against an old root reuses
    * batch ids from 0, and without the guard its batches would be
    * silently classified as replays and DROPPED; with it the mismatch
    * fails loudly (resume the original checkpoint or use a new root).
    *
    * @return the version holding this batch (new or already present) */
  def commitStreamBatch(spark: SparkSession, root: String, df: DataFrame,
                        batchId: Long, runId: Option[String] = None): Long = {
    val f = fs(spark, root)
    val dataDir = new Path(root, s"data/batch$batchId")
    val led = readLedger(f, root)
    val (ledger, coveredThrough, ledgerFloor) = (led.entries, led.through, led.floor)
    // checkpoint-reset guard (opt-in): a NEW stream run with a fresh
    // checkpoint numbers batches from 0 again, and the ledger would
    // classify every reused id as a replay — silently DROPPING the new
    // run's rows, which is worse than the duplicates a reset already
    // voids.  A caller that passes its query's runId gets a loud
    // failure instead: resume the old checkpoint, or start a new root.
    runId.foreach { r =>
      led.run.foreach(prev => require(prev == r,
        s"stream run '$r' does not match the run '$prev' that wrote $root — " +
          "a reset checkpoint reuses batch ids and its batches would be dropped " +
          "as replays; resume the original checkpoint or write to a fresh root"))
    }
    val runRec = runId.orElse(led.run)
    ledger.get(batchId) match {
      case Some(v) => return v // already committed — the replay is a no-op
      case None => ()
    }
    val cur = currentVersion(spark, root)
    // the ledger is a hint; manifest headers are truth.  Fold EVERY
    // batch id the uncovered delta contains, not just the one sought:
    // '#through' will claim the whole delta as covered, so an id
    // observed here but discarded would become permanently unledgered
    // — invisible to later replays and unreclaimable by vacuum's
    // sweep.  (The delta is normally empty or a few interleaved
    // non-batch commits; the one full walk is first adoption of a
    // root with a long pre-stream history.)
    val fromV = math.max(coveredThrough + 1, 0L)
    val deltaIds: Map[Long, Long] = cur.toSeq.flatMap(c => fromV to c)
      .flatMap(v => headerBatchOf(spark, root, v).map(_ -> v)).toMap
    deltaIds.get(batchId) match {
      case Some(v) =>
        writeLedger(spark, root, ledger ++ deltaIds,
          math.max(coveredThrough, cur.getOrElse(v)), ledgerFloor, runRec)
        return v
      case None => ()
    }
    // ledger and header-delta both missed.  Before treating a leftover
    // data dir as a torn pre-publish write, one LAST guard: never
    // delete a dir ANY surviving manifest references.  The ledger can
    // miss a genuinely committed batch (a store written by a release
    // that predates '#batch' headers, or an id pruned past the ledger
    // tail) — and a compaction may have removed the dir's files from
    // the CURRENT manifest while older retained manifests (pinned
    // time-travel readers) still list them, so the guard must scan
    // every surviving version, newest-first.  This is the rare-path
    // cost (paid only when hint + header scan both missed AND the dir
    // exists), and it re-seeds the ledger so the next replay is one
    // read again.
    if (f.exists(dataDir)) {
      val marker = s"/data/batch$batchId/"
      val referencedAt = listVersions(f, root).reverse
        .find(v => files(spark, root, Some(v)).exists(_.contains(marker)))
      referencedAt match {
        case Some(v) =>
          writeLedger(spark, root, ledger ++ deltaIds + (batchId -> v),
            math.max(coveredThrough, cur.getOrElse(v)), ledgerFloor, runRec)
          return v
        case None =>
          // torn pre-publish write: clear and redo
          f.delete(dataDir, true); ()
      }
    }
    cur.flatMap(v => schemaOf(spark, root, Some(v)))
      .foreach(stored => requireSameSchema(stored, df.schema, root))
    df.write.mode("errorifexists").parquet(dataDir.toString)
    val next = cur.map(_ + 1).getOrElse(0L)
    try publish(spark, root, next, df.schema,
      cur.map(v => files(spark, root, Some(v))).getOrElse(Nil) ++ listParquet(spark, dataDir),
      batchId = Some(batchId))
    catch {
      case e: java.util.ConcurrentModificationException =>
        f.delete(dataDir, true)
        throw e // the restarted query replays this batchId and recommits
    }
    writeLedger(spark, root, ledger ++ deltaIds + (batchId -> next), next, ledgerFloor,
      runRec)
    next
  }

  // ledger format: "#through\t<version>" (headers scanned so far),
  // then "<batchId>\t<version>" lines.  ~20 bytes/batch; rewritten
  // whole per batch commit via the atomic hint write — and BOUNDED to
  // the most recent MaxLedgerEntries batch ids so the per-commit
  // rewrite stays constant-size over an unbounded stream (a year of
  // minute-batches is ~525k batches; an unbounded ledger would make
  // every commit rewrite megabytes).  Pruning is safe because
  // Structured Streaming re-delivers only batches at/after the
  // checkpoint — the crash window is ONE batch wide, and 10k retained
  // ids give ~10k windows of margin; a replay of a batch older than
  // the retained tail means the user reset the checkpoint, where
  // exactly-once is void by definition.
  // var ONLY so the spec can exercise the pruning/floor arms without
  // paying 10k real commits; production never writes it
  private[graft] var MaxLedgerEntries = 10000
  /** (entries, through, floor): `through` = highest version whose
    * headers are folded in; `floor` = smallest batchId NOT pruned off
    * the tail (ids below it were once ledgered and then aged out —
    * vacuum may reclaim their unreferenced dirs). */
  private final case class BatchLedger(entries: Map[Long, Long], through: Long,
                                       floor: Long, run: Option[String])
  private val EmptyLedger = BatchLedger(Map.empty, -1L, Long.MinValue, None)

  private def readLedger(f0: FileSystem, root: String): BatchLedger = {
    val f = rawFs(f0)
    val p = ledgerPath(root)
    if (!f.exists(p)) return EmptyLedger
    try {
      val in = f.open(p)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty).toList finally in.close()
      val through = lines.collectFirst {
        case l if l.startsWith("#through\t") => l.stripPrefix("#through\t").toLong
      }.getOrElse(-1L)
      val floor = lines.collectFirst {
        case l if l.startsWith("#floor\t") => l.stripPrefix("#floor\t").toLong
      }.getOrElse(Long.MinValue)
      val run = lines.collectFirst {
        case l if l.startsWith("#run\t") => l.stripPrefix("#run\t")
      }.filter(_.nonEmpty)
      val entries = lines.filterNot(_.startsWith("#")).map { l =>
        val Array(b, v) = l.split('\t'); b.toLong -> v.toLong
      }.toMap
      BatchLedger(entries, through, floor, run)
    } catch {
      case scala.util.control.NonFatal(_) => EmptyLedger
    } // corrupt hint: full header scan
  }

  private def writeLedger(spark: SparkSession, root: String,
                          entries: Map[Long, Long], through: Long,
                          priorFloor: Long, run: Option[String]): Unit = {
    val sorted = entries.toSeq.sortBy(_._1)
    val kept = sorted.takeRight(MaxLedgerEntries)
    // the floor is monotonic: once ids age off the tail, later writes
    // must keep saying so even though the pruned ids are no longer in
    // the map to count
    val floor =
      if (kept.size < sorted.size) math.max(priorFloor, kept.head._1) else priorFloor
    val floorLine = if (floor == Long.MinValue) "" else s"#floor\t$floor\n"
    val runLine = run.map(r => s"#run\t$r\n").getOrElse("")
    // BEST-EFFORT: the ledger is a hint (manifest headers are truth —
    // a lost write is healed by the next replay's header scan); it is
    // written after a durable publish, so an IO failure here must not
    // fail the batch and kill the stream.  (vacuum's fold, where the
    // write IS load-bearing, verifies the result and aborts loudly.)
    try writeHint(spark, root, ledgerPath(root),
      s"#through\t$through\n" + floorLine + runLine +
        kept.map { case (b, v) => s"$b\t$v" }.mkString("\n") + "\n")
    catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Batch-id → version ledger entries (spec/observability surface). */
  private[graft] def batchLedger(spark: SparkSession, root: String): Map[Long, Long] =
    readLedger(fs(spark, root), root).entries

  /** Delete data files referenced by NO manifest among the newest
    * `keepVersions`, then drop the older manifests, then sweep
    * crash-orphaned data dirs (a committer that died between its data
    * write and its publish, before its own cleanup ran) that no
    * surviving manifest references: versioned dirs older than the
    * oldest retained manifest, and batch dirs whose id the ledger
    * already maps to a version (committed, files since compacted
    * away).  An UNLEDGERED batch dir is never touched — it may be the
    * live stream's in-flight write.  Returns the deleted file paths.
    * Run it only when every reader has moved past the dropped
    * versions and no committer is mid-flight on a version at or below
    * them — the standard retention contract. */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int = 2): Seq[String] = {
    require(keepVersions >= 1, "must keep at least the current version")
    val f = fs(spark, root)
    val all = listVersions(f, root)
    if (all.isEmpty) return Nil
    val keep = all.takeRight(keepVersions)
    val keepFiles = keep.flatMap(v => files(spark, root, Some(v))).toSet
    val dropVs = all.dropRight(keepVersions)
    // BEFORE dropping manifests, fold their '#batch' headers into the
    // ledger: the headers are the durable replay truth, and this is
    // the moment they would otherwise be destroyed.  Without the fold,
    // a lost ledger hint + a vacuum past a batch's manifest + a replay
    // of that batch would re-commit it (duplicate rows); with it, the
    // replay-window contract survives any SINGLE loss — headers heal a
    // lost ledger, the ledger heals dropped headers.
    val led0 = readLedger(f, root)
    val folded = dropVs.flatMap(v => headerBatchOf(spark, root, v).map(_ -> v)).toMap
    if (folded.exists { case (b, _) => !led0.entries.contains(b) }) {
      writeLedger(spark, root, folded ++ led0.entries, led0.through, led0.floor, led0.run)
      // the fold is LOAD-BEARING here, not a hint: the manifests about
      // to be dropped are the only other record of these batch ids, so
      // a swallowed hint-write failure would silently destroy the
      // replay truth.  Verify the ids landed (or were legitimately
      // pruned below the new floor) and abort the vacuum BEFORE any
      // manifest is deleted otherwise — the caller retries later.
      val after = readLedger(f, root)
      val lost = folded.keySet.filterNot(b => after.entries.contains(b) || b < after.floor)
      require(lost.isEmpty,
        s"vacuum aborted: could not fold batch ids $lost of the to-be-dropped manifests " +
          s"into the ledger under $root — retry when the ledger is writable")
    }
    val dropFiles = dropVs.flatMap(v => files(spark, root, Some(v))).distinct
      .filterNot(keepFiles.contains)
    dropFiles.foreach(p => f.delete(new Path(p), false))
    dropVs.foreach(v => f.delete(manifestPath(root, v), false))
    // orphan sweep: data dirs referenced by no surviving manifest.
    // A batch dir is reclaimable when its id is LEDGERED (committed,
    // files since compacted away) or BELOW THE LEDGER FLOOR (was
    // ledgered, then aged off the bounded tail — an in-flight write's
    // id is always >= the newest ledgered id, so never below the
    // floor); an unledgered-above-floor batch dir may be the live
    // stream's in-flight write and is never touched.
    val dataRoot = new Path(root, "data")
    val ledAfter = readLedger(f, root)
    val (ledgered, ledgerFloor) = (ledAfter.entries.keySet, ledAfter.floor)
    val oldestKept = keep.head
    val orphanDirs =
      if (!f.exists(dataRoot)) Nil
      else f.listStatus(dataRoot).toSeq.filter(_.isDirectory).map(_.getPath).filter { d =>
        val referenced = keepFiles.exists(_.startsWith(d.toString + "/"))
        val name = d.getName
        !referenced && (name match {
          case s if s.startsWith("batch") =>
            s.stripPrefix("batch").toLongOption
              .exists(id => ledgered.contains(id) || id < ledgerFloor)
          case s if s.startsWith("v") =>
            s.stripPrefix("v").takeWhile(_.isDigit).toLongOption.exists(_ < oldestKept)
          case _ => false
        })
      }
    orphanDirs.foreach(d => f.delete(d, true))
    // sweep stale publish/hint debris (a committer that died between
    // create and rename, a failed hint write).  Age-gated a full hour
    // so a CONCURRENT publisher's in-flight .tmp is never pulled out
    // from under its rename.
    val cutoff = System.currentTimeMillis() - 3600L * 1000
    val mdir = manifestDir(root)
    if (f.exists(mdir))
      f.listStatus(mdir).toSeq
        .filter { s =>
          val n = s.getPath.getName
          (n.startsWith(".hint-") || n.startsWith(".tmp-")) &&
            s.getModificationTime < cutoff
        }
        .foreach(s => f.delete(s.getPath, false))
    dropFiles
  }

  private def listParquet(spark: SparkSession, dir: Path): Seq[String] = {
    val f = fs(spark, dir.toString)
    f.listStatus(dir).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
  }

  private[graft] def publish(spark: SparkSession, root: String, version: Long,
                             schema: StructType, fileList: Seq[String],
                             batchId: Option[Long] = None): Unit = {
    val f = fs(spark, root)
    f.mkdirs(manifestDir(root))
    val tmp = new Path(manifestDir(root),
      s".tmp-$version-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = f.create(tmp, false)
    val headers = SchemaHeader + schema.json + "\n" +
      batchId.map(b => BatchHeader + b + "\n").getOrElse("")
    try out.write((headers + fileList.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val target = manifestPath(root, version)
    // FileContext.rename with no OVERWRITE option REFUSES an existing
    // target — server-side-atomic on HDFS; on the LOCAL fs it is an
    // exists check + rename(2), so the per-root JVM lock closes the
    // same-process TOCTOU window (cross-process local races remain
    // the fs's caveat, like bare S3's)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      target.toUri, hadoopConf(spark))
    lockFor(f, root).synchronized {
      try fc.rename(tmp, target)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
             _: java.nio.file.FileAlreadyExistsException |
             _: org.apache.hadoop.fs.ParentNotDirectoryException =>
          f.delete(tmp, false)
          throw new java.util.ConcurrentModificationException(
            s"version $version was committed concurrently under $root — re-read and retry")
      }
      // refresh the O(1)-discovery pointer.  BEST-EFFORT by contract:
      // the rename above already committed the version durably, so a
      // hint failure here (disk pressure, permissions on the .hint
      // tmp) must not surface as a failed commit — a caller that
      // retried a "failed" append would double-commit the same rows.
      // A lost hint only costs the next reader one listing.
      try writeHint(spark, root, pointerPath(root), version.toString + "\n")
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}
