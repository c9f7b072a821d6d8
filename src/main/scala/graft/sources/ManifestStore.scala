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
  * <root>/data/v<version>-<label>/part-*.parquet   immutable once committed
  * <root>/_manifests/v%020d.json                   one line per data file
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
  *     the same caveat every manifest design carries.
  *
  * Readers resolve ONE manifest (latest or a pinned `version`) and
  * read exactly the files it lists — a torn state is unobservable,
  * and old versions stay readable until [[vacuum]] (time travel).
  * [[compact]] rewrites the CURRENT file set through the byte-sized
  * coalesce of [[graft.operators.Layout.compactSmallFiles]]'s shape
  * and publishes a manifest listing only the rewritten files — data
  * files are never mutated, so concurrent pinned readers are
  * untouched.
  */
object ManifestStore {

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(hadoopConf(spark))

  // newHadoopConf() clones the WHOLE Spark conf into a fresh Hadoop
  // Configuration (~tens of ms); a commit touches the filesystem
  // handle several times, and for a streaming sink that cost is paid
  // per micro-batch — cache one conf per session (Hadoop Configuration
  // is effectively read-only here)
  private val confCache =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, org.apache.hadoop.conf.Configuration]()
  private def hadoopConf(spark: SparkSession): org.apache.hadoop.conf.Configuration =
    confCache.computeIfAbsent(spark, s => s.sessionState.newHadoopConf())

  private def manifestDir(root: String) = new Path(root, "_manifests")
  private def manifestPath(root: String, v: Long) =
    new Path(manifestDir(root), f"v$v%020d.json")

  /** Newest committed version, None for an empty/uninitialized root. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, root)
    val dir = manifestDir(root)
    if (!f.exists(dir)) return None
    val vs = f.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toLong)
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** The file list of `version` (default: current).  Paths are the
    * absolute strings the manifest recorded; `#`-prefixed header
    * lines (the committed schema) are skipped. */
  def files(spark: SparkSession, root: String, version: Option[Long] = None): Seq[String] =
    manifestLines(spark, root, version).filterNot(_.startsWith("#"))

  /** The schema the table committed (recorded in the manifest header),
    * None for manifests written before schema tracking. */
  def schemaOf(spark: SparkSession, root: String, version: Option[Long] = None): Option[StructType] =
    manifestLines(spark, root, version).find(_.startsWith(SchemaHeader))
      .map(l => DataType.fromJson(l.stripPrefix(SchemaHeader)).asInstanceOf[StructType])

  private val SchemaHeader = "#schema\t"

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
    val dataDir = new Path(root, s"data/v$next-$label")
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
    val dataDir = new Path(root, s"data/v$next-$label")
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
    val dataDir = new Path(root, s"data/v$next-compact")
    val rewritten = spark.read.parquet(cur: _*)
    rewritten.coalesce(n)
      .write.mode("errorifexists").parquet(dataDir.toString)
    publish(spark, root, next,
      schemaOf(spark, root, Some(prev)).getOrElse(rewritten.schema),
      listParquet(spark, dataDir))
    next
  }

  /** Exactly-once streaming sink step: commit one micro-batch,
    * IDEMPOTENT on `batchId`.  Structured Streaming's `foreachBatch`
    * re-delivers a batch after a failure with the SAME batchId; a
    * plain parquet append would duplicate those rows, and a plain
    * [[commitAppend]] would commit them twice.  Here the batchId is
    * baked into the data directory name, so a replay finds the
    * already-committed directory and returns the existing version —
    * end-to-end exactly-once from a replayable source down to the
    * table, the manifest analog of the parquet sink's log.
    *
    * Use as `stream.writeStream.foreachBatch { (df, id) =>
    * ManifestStore.commitStreamBatch(df.sparkSession, root, df, id); () }`.
    *
    * @return the version holding this batch (new or already present) */
  def commitStreamBatch(spark: SparkSession, root: String, df: DataFrame,
                        batchId: Long): Long = {
    val f = fs(spark, root)
    // batchId keys the data directory, so the replay probe is ONE
    // exists() — no manifest scan on the happy path
    val dataDir = new Path(root, s"data/batch$batchId")
    val cur = currentVersion(spark, root)
    if (f.exists(dataDir)) {
      val marker = s"/data/batch$batchId/"
      val committed = cur.map(c => (c to 0L by -1L)).getOrElse(Seq.empty)
        .filter(v => f.exists(manifestPath(root, v)))
        .find(v => files(spark, root, Some(v)).exists(_.contains(marker)))
      committed match {
        case Some(v) => return v // already committed — the replay is a no-op
        case None => f.delete(dataDir, true); () // torn pre-publish write: redo
      }
    }
    cur.flatMap(v => schemaOf(spark, root, Some(v)))
      .foreach(stored => requireSameSchema(stored, df.schema, root))
    df.write.mode("errorifexists").parquet(dataDir.toString)
    val next = cur.map(_ + 1).getOrElse(0L)
    publish(spark, root, next, df.schema,
      cur.map(v => files(spark, root, Some(v))).getOrElse(Nil) ++ listParquet(spark, dataDir))
    next
  }

  /** Delete data files referenced by NO manifest among the newest
    * `keepVersions`, then drop the older manifests.  Returns the
    * deleted file paths.  Run it only when every reader has moved
    * past the dropped versions — the standard retention contract. */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int = 2): Seq[String] = {
    require(keepVersions >= 1, "must keep at least the current version")
    val f = fs(spark, root)
    val cur = currentVersion(spark, root).getOrElse(return Nil)
    val all = (0L to cur).filter(v => f.exists(manifestPath(root, v)))
    val keep = all.takeRight(keepVersions)
    val keepFiles = keep.flatMap(v => files(spark, root, Some(v))).toSet
    val dropVs = all.dropRight(keepVersions)
    val dropFiles = dropVs.flatMap(v => files(spark, root, Some(v))).distinct
      .filterNot(keepFiles.contains)
    dropFiles.foreach(p => f.delete(new Path(p), false))
    dropVs.foreach(v => f.delete(manifestPath(root, v), false))
    dropFiles
  }

  private def listParquet(spark: SparkSession, dir: Path): Seq[String] = {
    val f = fs(spark, dir.toString)
    f.listStatus(dir).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
  }

  private[graft] def publish(spark: SparkSession, root: String, version: Long,
                             schema: StructType, fileList: Seq[String]): Unit = {
    val f = fs(spark, root)
    f.mkdirs(manifestDir(root))
    val tmp = new Path(manifestDir(root),
      s".tmp-$version-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = f.create(tmp, false)
    try out.write((SchemaHeader + schema.json + "\n" +
      fileList.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val target = manifestPath(root, version)
    // FileContext.rename with no OVERWRITE option REFUSES an existing
    // target (FileSystem.rename on the local fs silently overwrites —
    // java File.renameTo is POSIX rename(2)): the losing committer of
    // a race throws here, never publishes a torn manifest
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      target.toUri, hadoopConf(spark))
    try fc.rename(tmp, target)
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException |
           _: java.nio.file.FileAlreadyExistsException |
           _: org.apache.hadoop.fs.ParentNotDirectoryException =>
        f.delete(tmp, false)
        throw new java.util.ConcurrentModificationException(
          s"version $version was committed concurrently under $root — re-read and retry")
    }
  }
}
