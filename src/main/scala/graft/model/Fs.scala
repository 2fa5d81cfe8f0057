package graft.model

/** The one recursive-delete helper — the walk/collect/reverse/delete
  * idiom existed in four hand-maintained copies (Bench warehouse,
  * artifact-orphan sweep, layout measurement, layout spec); a fix to
  * its edge behavior now lands once. */
object Fs {

  /**
   * Conditional-create commit for small immutable marker blobs — the
   * primitive [[graft.streaming.ExactlyOnceSink]]'s ledger stands on.
   *
   * Contract: `putIfAbsent` publishes `bytes` at `path` iff nothing is
   * committed there, ATOMICALLY with respect to both concurrent
   * committers and readers — exactly one writer wins, a loser gets the
   * winner's bytes back, and no reader ever observes a partially
   * written blob. `read` returns the committed bytes, or None while
   * nothing is committed.
   *
   * Store contracts by backend:
   *  - [[PosixMarkerStore]] (default): per-attempt UNIQUE temp file +
   *    hard-link publish (`Files.createLink` fails atomically on an
   *    existing target, and the content is fully on disk before the
   *    name appears). Scope: LINK-CAPABLE local/POSIX filesystems —
   *    mounts that reject hard links (CIFS, some NFS exports, FUSE
   *    object-store shims) and non-`java.nio` filesystems (HDFS)
   *    need their own implementation (HDFS: `create(path,
   *    overwrite=false)` is its atomic conditional-create).
   *  - S3 / object stores WITHOUT atomic rename: a rename-based commit
   *    is NOT valid there — implement this trait over the store's
   *    conditional put (`If-None-Match: *`, a DynamoDB lock item, or a
   *    manifest-pointer swap); the trait is exactly that API's shape,
   *    so the exactly-once analysis carries over unchanged (the spec
   *    proves it against a conditional-put fake).
   *
   * The namespace operations (`ensureDir`, `listBatches`,
   * `deletePrefix`) belong to the SAME trait so retention and
   * directory setup never silently fall back to local-filesystem
   * calls against a remote store: a ledger whose markers live in S3
   * must also retire them in S3.
   */
  trait MarkerStore extends Serializable {
    /** None = we won and `bytes` is committed; Some(existing) = a
      * concurrent or earlier committer won and `existing` is what the
      * path holds. */
    def putIfAbsent(path: java.nio.file.Path,
        bytes: Array[Byte]): Option[Array[Byte]]
    def read(path: java.nio.file.Path): Option[Array[Byte]]
    /** Prepare the location markers will be committed under. No-op
      * for flat-namespace stores (object stores have no directories). */
    def ensureDir(dir: java.nio.file.Path): Unit = ()
    /** Batch ids (the `b<id>` level) with any state under `root` —
      * drives retention. */
    def listBatches(root: java.nio.file.Path): Seq[Long]
    /** Retire every marker at or under `prefix` (retention sweep). */
    def deletePrefix(prefix: java.nio.file.Path): Unit
  }

  /** Default [[MarkerStore]] for POSIX/HDFS-semantics storage. */
  object PosixMarkerStore extends MarkerStore {
    import java.nio.file.{Files, FileAlreadyExistsException}
    import scala.jdk.CollectionConverters._
    override def putIfAbsent(path: java.nio.file.Path,
        bytes: Array[Byte]): Option[Array[Byte]] = {
      // Per-attempt unique temp name: two concurrent attempts (task
      // speculation, zombie tasks) must never share a staging file —
      // a shared name lets one attempt atomically publish the OTHER
      // attempt's half-written bytes as a truncated marker.
      val tmp = path.resolveSibling(
        s"${path.getFileName}.${java.util.UUID.randomUUID()}.tmp")
      Files.write(tmp, bytes)
      try {
        Files.createLink(path, tmp)
        Files.deleteIfExists(tmp)
        None
      } catch {
        case _: FileAlreadyExistsException =>
          Files.deleteIfExists(tmp)
          read(path) // the winner's committed bytes
      }
    }
    override def read(path: java.nio.file.Path): Option[Array[Byte]] =
      if (Files.exists(path)) Some(Files.readAllBytes(path)) else None
    override def ensureDir(dir: java.nio.file.Path): Unit = {
      Files.createDirectories(dir); ()
    }
    override def listBatches(root: java.nio.file.Path): Seq[Long] =
      if (!Files.exists(root)) Seq.empty
      else {
        val listing = Files.list(root)
        try listing.iterator().asScala.flatMap { p =>
          val n = p.getFileName.toString
          if (n.startsWith("b")) n.stripPrefix("b").toLongOption else None
        }.toList
        finally listing.close()
      }
    override def deletePrefix(prefix: java.nio.file.Path): Unit =
      deleteRecursively(prefix)
  }

  /** Delete `root` and everything under it, deepest first. Missing
    * entries are tolerated (a concurrent sweep may have raced us);
    * a non-existent root is a no-op. */
  def deleteRecursively(root: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      val files = try {
        val it = walk.iterator()
        val b = List.newBuilder[java.nio.file.Path]
        while (it.hasNext) b += it.next()
        b.result()
      } finally walk.close()
      files.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
