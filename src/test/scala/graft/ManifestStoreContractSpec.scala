package graft

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, Path, RawLocalFileSystem}
import graft.sources.ManifestStore

/** A FileSystem whose `rename` silently OVERWRITES an existing
  * destination — the bare-object-store shape ManifestStore's publish
  * scaladoc warns about ("NOT atomic on bare S3 — front it with a
  * locking catalog there"): no check-and-rename primitive exists, so
  * the dst-exists precondition cannot be enforced atomically.  Local
  * files underneath; only the rename contract is violated. */
class S3LikeFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "s3mock"
  override def getUri: URI = URI.create("s3mock:///")
  override def rename(src: Path, dst: Path): Boolean = {
    if (exists(dst)) delete(dst, true)
    super.rename(src, dst)
  }
}

/** The FileContext (AbstractFileSystem) twin: skips the CLIENT-SIDE
  * dst-exists check that rename-refuses-overwrite filesystems rely on
  * — on an eventually-consistent store that check is a TOCTOU race at
  * best, so the worst case (it never fires) is modeled
  * deterministically. */
class S3LikeAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new S3LikeFileSystem, conf, "s3mock", false) {
  override def renameInternal(src: Path, dst: Path, overwrite: Boolean): Unit = {
    if (!fsImpl.rename(src, dst))
      throw new java.io.IOException(s"rename $src -> $dst failed")
  }
}

/** Exercises ManifestStore against the contract-violating filesystem:
  * the documented caveat must be EXACTLY the degradation observed —
  * optimistic concurrency (loser detection) is lost, nothing else.
  * The complementary fact — that a rename-refusing fs catches the
  * same race loudly — is pinned by ManifestStoreSpec's "racing
  * committers" test. */
class ManifestStoreContractSpec extends SparkSpec {
  import spark.implicits._

  private def withS3Root(body: String => Unit): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_s3mock").toFile
    // register the shim for Spark jobs (scans/writes resolve the
    // scheme through the context conf) AND for ManifestStore's cached
    // per-session conf (FileContext + direct fs calls)
    for (conf <- Seq(spark.sparkContext.hadoopConfiguration,
                     ManifestStore.hadoopConf(spark))) {
      conf.set("fs.s3mock.impl", classOf[S3LikeFileSystem].getName)
      conf.set("fs.AbstractFileSystem.s3mock.impl", classOf[S3LikeAbstractFs].getName)
    }
    try body("s3mock:" + tmp.getAbsolutePath)
    finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }

  test("silently-overwriting rename: exactly the documented guarantee degrades, and only that one") {
    withS3Root { root =>
      // the store WORKS on the shim for the single-writer contract:
      // commits, snapshot reads, time travel, maintenance
      ManifestStore.commitAppend(spark, root, Seq(1L, 2L).toDF("x"), "day0")
      ManifestStore.commitAppend(spark, root, Seq(3L).toDF("x"), "day1")
      assert(ManifestStore.read(spark, root).as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
      assert(ManifestStore.read(spark, root, Some(0L)).as[Long].collect().sorted.toSeq == Seq(1L, 2L))
      val v0Files = ManifestStore.files(spark, root, Some(0L))
      val v1Files = ManifestStore.files(spark, root, Some(1L))
      val schema = ManifestStore.schemaOf(spark, root).get

      // THE DEGRADATION: two committers of the same version.  On a
      // rename-refusing fs the second publish throws
      // ConcurrentModificationException (ManifestStoreSpec pins it);
      // here the losing committer SILENTLY WINS — the lost update the
      // scaladoc tells users to prevent with a locking catalog.
      ManifestStore.publish(spark, root, 2L, schema, v1Files) // "winner"
      ManifestStore.publish(spark, root, 2L, schema, v0Files) // silent clobber
      assert(ManifestStore.files(spark, root, Some(2L)) == v0Files,
        "on the bare-S3 shape the last writer wins silently — the documented degradation")

      // ...and NOTHING ELSE degrades: data files are immutable, so the
      // clobbering manifest still describes a complete, consistent
      // snapshot — readers see a valid committed table (the second
      // writer's), never a torn or partially-listed one
      assert(ManifestStore.read(spark, root, Some(2L)).as[Long]
        .collect().sorted.toSeq == Seq(1L, 2L))
      assert(ManifestStore.read(spark, root).as[Long].collect().sorted.toSeq == Seq(1L, 2L))
      // the overwritten winner's data files were never deleted — a
      // locking-catalog recovery could still reconstruct its commit
      assert(v1Files.forall(p => new java.io.File(new java.net.URI("file:" +
        new Path(p).toUri.getPath)).exists()),
        "data files must survive a manifest clobber (immutable-data contract)")

      // exactly-once streaming on the shim, single writer: the replay
      // ledger lives on hints + headers, neither of which needs the
      // refusing rename
      ManifestStore.commitStreamBatch(spark, root, Seq(9L).toDF("x"), 0L)
      assert(ManifestStore.commitStreamBatch(spark, root, Seq(9L).toDF("x"), 0L) ==
        ManifestStore.batchLedger(spark, root)(0L))
      assert(ManifestStore.read(spark, root).as[Long].collect().sorted.toSeq == Seq(1L, 2L, 9L))

      // maintenance still safe: compact + vacuum never mutate data
      // files in place, so they hold on the shim too
      ManifestStore.compact(spark, root, 1L << 20)
      ManifestStore.vacuum(spark, root, keepVersions = 1)
      assert(ManifestStore.read(spark, root).as[Long].collect().sorted.toSeq == Seq(1L, 2L, 9L))
    }
  }
}
