package graft.model

/** The one recursive-delete helper — the walk/collect/reverse/delete
  * idiom existed in four hand-maintained copies (Bench warehouse,
  * artifact-orphan sweep, layout measurement, layout spec); a fix to
  * its edge behavior now lands once. */
object Fs {
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
