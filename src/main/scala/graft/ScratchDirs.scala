package graft

/** JVM-lifetime local scratch roots for derived physical layouts (bucketed
  * copies, partitioned copies): one fixed dir per (tag, input dir), wiped on
  * (re)creation, reclaimed by a shutdown hook. The layouts themselves are
  * per-dir model state — built once per JVM, joined/scanned many times —
  * so the scratch lives as long as the session that amortizes it.
  * (Streaming scratch stays in StreamOps: its lifecycle is per-invocation,
  * not per-JVM.) */
private[graft] object ScratchDirs {

  private val roots =
    scala.collection.concurrent.TrieMap.empty[String, java.nio.file.Path]

  private lazy val hook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      roots.values.foreach(deleteRecursively)))

  def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.deleteIfExists(q))
      finally walk.close()
    }
  }

  /** A fresh (emptied) fixed root for (tag, key); registered for
    * shutdown-time reclaim. */
  def freshRoot(tag: String, key: String): java.nio.file.Path = {
    hook
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$tag|$key".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val root = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_${tag}_$digest")
    deleteRecursively(root)
    java.nio.file.Files.createDirectories(root)
    roots.put(s"$tag|$key", root)
    root
  }
}
