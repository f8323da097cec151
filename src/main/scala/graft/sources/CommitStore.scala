package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.concurrent.TrieMap

/** The commit-point abstraction of [[VersionedTable]]: publishing a manifest
  * for version N is THE atomic step that makes a commit visible, so the only
  * primitive a storage backend must supply is a conditional put —
  * "write this manifest iff no manifest for N exists" — plus reads/listing.
  *
  * Two first-party implementations:
  *   - [[LocalCommitStore]]: manifests are files; the conditional put is a
  *     temp-write + hard-link (atomic, fail-if-exists on POSIX and HDFS).
  *   - [[InMemoryCommitStore]]: a `putIfAbsent` map — the semantic model of
  *     an object store's conditional put (S3 `If-None-Match: *`, GCS
  *     `x-goog-if-generation-match: 0`, ABFS conditional create). Deploying
  *     the versioned table on an object store means writing a store that
  *     issues that header; nothing in the table protocol changes, because
  *     data files never need atomic semantics — they are written under
  *     unique names and only become visible via the manifest. (The reference
  *     gets the equivalent transaction point from TimescaleDB MVCC,
  *     `ARCHITECTURE.md:49-55`; Delta Lake calls this seam LogStore.)
  */
trait CommitStore {

  /** Atomically publish `body` as version `version`'s manifest iff absent.
    * @return true iff this call won the version; false = a concurrent (or
    *         earlier) writer already holds it and `body` was NOT written.
    */
  def putIfAbsent(root: String, version: Int, body: String): Boolean

  /** The manifest body for `version`, if committed. */
  def get(root: String, version: Int): Option[String]

  /** All committed version numbers (any order). */
  def versions(root: String): Seq[Int]

  /** Remove `version`'s manifest (vacuum of expired history). */
  def delete(root: String, version: Int): Unit
}

object CommitStore {
  /** Default store: POSIX/HDFS filesystem manifests. */
  val local: CommitStore = new LocalCommitStore
}

/** Filesystem-backed store: `<root>/_commits/v%05d.manifest` files. The
  * conditional put writes a temp file then `Files.createLink` onto the final
  * name — a hard link is atomic AND fails with EEXIST if the target exists
  * (unlike `rename`, which silently replaces), so the full manifest appears
  * in one step and the loser of a race learns it lost. Correct on POSIX and
  * HDFS; object stores need a conditional-put store instead (see trait doc).
  */
final class LocalCommitStore extends CommitStore {

  private def dir(root: String) = new File(root, "_commits")
  private def file(root: String, v: Int) = new File(dir(root), f"v$v%05d.manifest")

  override def putIfAbsent(root: String, version: Int, body: String): Boolean = {
    dir(root).mkdirs()
    // Attempt-unique tmp name (UUID, like the data dirs) — NOT the thread id:
    // two writers in different JVMs plausibly share a thread id (main=1), and
    // a shared tmp path would let writer A link writer B's body under the
    // version, breaking "a losing writer can never damage the winner".
    val tmp = Paths.get(dir(root).getPath,
      s".v$version.tmp${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    try { Files.createLink(file(root, version).toPath, tmp); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp)
  }

  override def get(root: String, version: Int): Option[String] = {
    val f = file(root, version)
    if (f.isFile)
      Some(new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8))
    else None
  }

  override def versions(root: String): Seq[Int] = {
    val d = dir(root)
    if (!d.isDirectory) Seq.empty
    else Option(d.listFiles((_, n) => n.matches("v\\d{5}\\.manifest")))
      .toSeq.flatten.map(f => f.getName.substring(1, 6).toInt).toSeq
  }

  override def delete(root: String, version: Int): Unit = {
    file(root, version).delete(); ()
  }
}

/** `O_CREAT|O_EXCL` store: the conditional put claims the manifest name by
  * EXCLUSIVE CREATE (`FileChannel.open(CREATE_NEW)` → `open(2)` with
  * O_CREAT|O_EXCL — atomic fail-if-exists on POSIX, NFSv3+, HDFS) and then
  * streams the body into the claimed file. A deliberately different
  * primitive from [[LocalCommitStore]]'s temp-write + hard-link: the claim
  * and the body are NOT one atomic step here, which is exactly the failure
  * mode an object store's multipart/conditional-create path has — so this
  * store makes the protocol prove itself against it.
  *
  * The body is length-framed (`len=<bytes>\n` + body); `get`/`versions`
  * treat an incomplete frame as NOT COMMITTED. That closes the torn-read
  * window soundly: a reader observing a half-written manifest is observing
  * an UNACKNOWLEDGED put (the writer's `putIfAbsent` has not returned yet),
  * and "not yet committed" is the correct answer for it. The residual cost
  * of the two-step primitive is a writer crashing INSIDE its write window:
  * it leaves a permanently incomplete claim that wedges that version number
  * (readers skip it; later writers get `false`) — the filesystem analogue
  * of S3 multipart debris, repaired the same way (delete the torn object).
  * [[LocalCommitStore]] does not have this window, which is why it stays
  * the default.
  */
final class ExclusiveCreateCommitStore extends CommitStore {

  import java.nio.channels.FileChannel
  import java.nio.file.StandardOpenOption.{CREATE_NEW, WRITE}

  private def dir(root: String) = new File(root, "_commits")
  private def file(root: String, v: Int) = new File(dir(root), f"v$v%05d.manifest")

  override def putIfAbsent(root: String, version: Int, body: String): Boolean = {
    dir(root).mkdirs()
    val payload = body.getBytes(StandardCharsets.UTF_8)
    val framed = s"len=${payload.length}\n".getBytes(StandardCharsets.UTF_8) ++ payload
    val ch =
      try FileChannel.open(file(root, version).toPath, CREATE_NEW, WRITE)
      catch { case _: java.nio.file.FileAlreadyExistsException => return false }
    try {
      val buf = java.nio.ByteBuffer.wrap(framed)
      while (buf.hasRemaining) ch.write(buf)
      ch.force(true) // the put is acknowledged only once the body is durable
      true
    } finally ch.close()
  }

  /** The framed body iff complete — an incomplete frame is "not committed". */
  private def readComplete(f: File): Option[String] = {
    if (!f.isFile) return None
    val bytes = Files.readAllBytes(f.toPath)
    val nl = bytes.indexOf('\n'.toByte)
    if (nl <= 4) return None // no complete header yet
    val header = new String(bytes, 0, nl, StandardCharsets.UTF_8)
    val want = header match {
      case s if s.startsWith("len=") => s.drop(4).toIntOption
      case _                         => None
    }
    want.filter(_ <= bytes.length - nl - 1)
      .map(n => new String(bytes, nl + 1, n, StandardCharsets.UTF_8))
  }

  override def get(root: String, version: Int): Option[String] =
    readComplete(file(root, version))

  override def versions(root: String): Seq[Int] = {
    val d = dir(root)
    if (!d.isDirectory) Seq.empty
    else Option(d.listFiles((_, n) => n.matches("v\\d{5}\\.manifest")))
      .toSeq.flatten.filter(readComplete(_).isDefined)
      .map(f => f.getName.substring(1, 6).toInt).toSeq
  }

  override def delete(root: String, version: Int): Unit = {
    file(root, version).delete(); ()
  }
}

/** In-memory conditional-put store — the semantic twin of S3/GCS conditional
  * create. Exercises the exact protocol an object-store deployment would run:
  * no rename, no link, just compare-and-set on the manifest key.
  */
final class InMemoryCommitStore extends CommitStore {
  private val manifests = TrieMap.empty[(String, Int), String]

  override def putIfAbsent(root: String, version: Int, body: String): Boolean =
    manifests.putIfAbsent((root, version), body).isEmpty

  override def get(root: String, version: Int): Option[String] =
    manifests.get((root, version))

  override def versions(root: String): Seq[Int] =
    manifests.keysIterator.collect { case (r, v) if r == root => v }.toSeq

  override def delete(root: String, version: Int): Unit = {
    manifests.remove((root, version)); ()
  }
}
