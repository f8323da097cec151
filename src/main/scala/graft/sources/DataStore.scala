package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, File,
  FileInputStream, FileOutputStream, InputStream, OutputStream}
import java.nio.file.{Files, StandardCopyOption}

/** The DATA-plane twin of [[CommitStore]]: every filesystem touch the
  * versioned table makes OUTSIDE Spark's own parquet reads/writes —
  * staged-dir promotion, dir listing/sizing, sidecar (bloom / per-file
  * stats) IO, vacuum deletes, clone linking — goes through this seam, so
  * an object-store deployment swaps ONE implementation instead of
  * auditing `java.io.File` call sites.
  *
  * Division of labor with the other storage seams:
  *   - [[CommitStore]] owns the MANIFESTS — the one primitive needing
  *     atomicity (conditional put).
  *   - Spark's own `spark.read.parquet` / `df.write.parquet` already speak
  *     any Hadoop `FileSystem` (s3a/gcs/abfs), so bulk data IO needs no
  *     seam here.
  *   - [[DataStore]] owns everything else: the engine's direct
  *     side-channel IO, none of which needs atomicity (sidecars and staged
  *     dirs are attempt-uniquely named and invisible until a manifest
  *     references them) but ALL of which must exist on a store with no
  *     rename, no hard links, and listing as an API call.
  *
  * Two first-party implementations:
  *   - [[LocalDataStore]]: POSIX semantics — `renameTo` promotion (free),
  *     hard-link clone (free), `listFiles` listing.
  *   - [[ObjectModelDataStore]]: the no-rename model of S3/GCS — promotion
  *     is per-file copy+delete (the server-side-COPY path; on a real
  *     object store the staged key could simply BE the final key, since
  *     nothing references it until the manifest publishes), clone is a
  *     byte copy, and nothing ever relies on rename or link. Running the
  *     FULL test suite through this impl (`GRAFT_DATASTORE=object`)
  *     proves the table protocol never leans on POSIX-only semantics —
  *     the same role [[InMemoryCommitStore]] plays for the commit plane.
  *
  * All paths are RELATIVE to the table root, exactly as manifests record
  * them, so an implementation is free to map `root + rel` onto keys.
  */
trait DataStore {

  /** Open `rel` for writing (parents created as needed). The write is
    * NOT atomic and need not be: callers only hand the path to a
    * manifest AFTER this stream is closed.
    */
  def create(root: String, rel: String): OutputStream

  /** Open `rel` for reading; None if absent (sidecar loads treat absence
    * as "no index" — conservative, never an error).
    */
  def open(root: String, rel: String): Option[InputStream]

  /** Immediate children of dir `rel` (empty if absent). */
  def list(root: String, rel: String): Seq[DataStore.Entry]

  def exists(root: String, rel: String): Boolean

  /** Last-modified wall clock of `rel`, ms; 0 if absent. */
  def modifiedMs(root: String, rel: String): Long

  /** Total bytes of the FILES directly under dir `rel` — the O(1)-per-dir
    * sizing probe behind compact-small-dirs and maintenance policies.
    */
  def sizeOfDir(root: String, rel: String): Long =
    list(root, rel).filter(_.isFile).map(_.length).sum

  /** Move staged dir `stagedRel` (flat dir of part files) to `finalRel`.
    * Local: one rename. Object model: copy each file + delete staged —
    * legal because nothing references either name until the manifest
    * publishes `finalRel`, so non-atomicity is unobservable.
    */
  def promoteDir(root: String, stagedRel: String, finalRel: String): Unit

  /** Recursive delete (no-op if absent). */
  def deleteTree(root: String, rel: String): Unit

  /** Single-file delete (no-op if absent). */
  def deleteFile(root: String, rel: String): Unit

  /** Clone file tree `srcRoot/srcRel` to `dstRoot/dstRel` — SHALLOW CLONE's
    * data primitive. Local: hard links (zero bytes moved). Object model:
    * byte copy (S3 has no links; server-side copy is the analogue).
    */
  def cloneTree(srcRoot: String, srcRel: String,
      dstRoot: String, dstRel: String): Unit
}

object DataStore {

  /** One listing entry: `name` relative to the listed dir. */
  final case class Entry(name: String, isFile: Boolean, length: Long,
      modifiedMs: Long)

  val local: DataStore = new LocalDataStore
  val objectModel: DataStore = new ObjectModelDataStore

  /** Seam selector: `GRAFT_DATASTORE=object` (env or `graft.datastore`
    * system property) routes the WHOLE engine — tests included — through
    * the no-rename model; anything else is the POSIX store.
    */
  val default: DataStore =
    sys.props.get("graft.datastore")
      .orElse(sys.env.get("GRAFT_DATASTORE")) match {
      case Some("object") => objectModel
      case _              => local
    }
}

/** POSIX data plane: rename promotion, hard-link clone. */
final class LocalDataStore extends DataStore {

  private def f(root: String, rel: String) = new File(root, rel)

  override def create(root: String, rel: String): OutputStream = {
    val file = f(root, rel)
    Option(file.getParentFile).foreach(_.mkdirs())
    new BufferedOutputStream(new FileOutputStream(file))
  }

  override def open(root: String, rel: String): Option[InputStream] = {
    val file = f(root, rel)
    if (file.isFile) Some(new BufferedInputStream(new FileInputStream(file)))
    else None
  }

  override def list(root: String, rel: String): Seq[DataStore.Entry] =
    Option(f(root, rel).listFiles()).toSeq.flatten.map(c =>
      DataStore.Entry(c.getName, c.isFile, c.length(), c.lastModified()))

  override def exists(root: String, rel: String): Boolean = f(root, rel).exists()

  override def modifiedMs(root: String, rel: String): Long =
    f(root, rel).lastModified()

  override def promoteDir(root: String, stagedRel: String,
      finalRel: String): Unit = {
    val dst = f(root, finalRel)
    Option(dst.getParentFile).foreach(_.mkdirs())
    require(f(root, stagedRel).renameTo(dst),
      s"rename failed: $stagedRel -> $finalRel under $root")
  }

  override def deleteTree(root: String, rel: String): Unit = {
    VersionedTable.deleteRecursively(f(root, rel)); ()
  }

  override def deleteFile(root: String, rel: String): Unit = {
    f(root, rel).delete(); ()
  }

  override def cloneTree(srcRoot: String, srcRel: String,
      dstRoot: String, dstRel: String): Unit =
    VersionedTable.linkTree(new File(srcRoot, srcRel), new File(dstRoot, dstRel))
}

/** No-rename data plane — the S3/GCS model, exercised on local disk.
  * Promotion copies bytes file-by-file then deletes the staged tree;
  * clone copies bytes. Never calls `renameTo` or `createLink`, so a
  * green test run through this store is a proof the table protocol works
  * where those primitives do not exist.
  */
final class ObjectModelDataStore extends DataStore {

  private val posix = new LocalDataStore // list/read/delete model API calls

  override def create(root: String, rel: String): OutputStream =
    posix.create(root, rel)

  override def open(root: String, rel: String): Option[InputStream] =
    posix.open(root, rel)

  override def list(root: String, rel: String): Seq[DataStore.Entry] =
    posix.list(root, rel)

  override def exists(root: String, rel: String): Boolean = posix.exists(root, rel)

  override def modifiedMs(root: String, rel: String): Long =
    posix.modifiedMs(root, rel)

  override def promoteDir(root: String, stagedRel: String,
      finalRel: String): Unit = {
    val src = new File(root, stagedRel)
    val dst = new File(root, finalRel)
    dst.mkdirs()
    copyTree(src, dst)
    VersionedTable.deleteRecursively(src)
    ()
  }

  override def deleteTree(root: String, rel: String): Unit =
    posix.deleteTree(root, rel)

  override def deleteFile(root: String, rel: String): Unit =
    posix.deleteFile(root, rel)

  override def cloneTree(srcRoot: String, srcRel: String,
      dstRoot: String, dstRel: String): Unit =
    copyTree(new File(srcRoot, srcRel), new File(dstRoot, dstRel))

  private def copyTree(src: File, dst: File): Unit =
    if (src.isDirectory) {
      dst.mkdirs()
      Option(src.listFiles()).toSeq.flatten
        .foreach(c => copyTree(c, new File(dst, c.getName)))
    } else {
      Option(dst.getParentFile).foreach(_.mkdirs())
      Files.copy(src.toPath, dst.toPath, StandardCopyOption.REPLACE_EXISTING)
      ()
    }
}
