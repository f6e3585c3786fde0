package graft

/** JVM-lifetime local scratch roots for derived physical layouts (bucketed
  * copies, partitioned copies): one fixed dir per (tag, input dir), wiped on
  * (re)creation, reclaimed by a shutdown hook. The layouts themselves are
  * per-dir model state — built once per JVM, joined/scanned many times —
  * so the scratch lives as long as the session that amortizes it.
  * (Streaming scratch stays in StreamOps: its lifecycle is per-invocation,
  * not per-JVM.)
  *
  * CLUSTER CAVEAT (round-14 multi-executor audit): a derived layout is
  * parquet that EXECUTOR tasks write and later scan, so the scratch root
  * must resolve to the SAME storage from every JVM. The default —
  * java.io.tmpdir — satisfies that on local and local-cluster (one host,
  * where the round-14 battery ran green) and on any deployment whose
  * executors mount shared storage at the same path; a multi-host
  * shared-nothing cluster must point `SPARK_GRAFT_SCRATCH` at a shared
  * mount or the layout files scatter across hosts. */
private[graft] object ScratchDirs {

  private val roots =
    scala.collection.concurrent.TrieMap.empty[String, java.nio.file.Path]

  /** Scratch base: `SPARK_GRAFT_SCRATCH` (a shared mount on multi-host
    * deployments) or the JVM tmpdir. `overridden` gates [[sweepStale]]:
    * ProcessHandle pid-liveness is a PER-HOST signal, so on a shared
    * mount a LIVE remote owner's pid can look dead locally and its files
    * must not be swept — stale dirs lingering beats deleting a live
    * owner's layout mid-query. */
  private lazy val (scratchBase, overridden): (java.nio.file.Path, Boolean) =
    sys.env.get("SPARK_GRAFT_SCRATCH") match {
      case Some(p) if p.nonEmpty => (java.nio.file.Paths.get(p), true)
      case _ => (java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")), false)
    }

  /** One random token per JVM for overridden-mount owner suffixes: drawn
    * once at class init (SecureRandom-free — collision here is a
    * convenience property, not security), 31 random bits ≈ 2^31 space, so
    * two drivers sharing (tag, digest, host, pid) — possible in
    * containers with generic hostnames and small pid namespaces — still
    * get distinct roots. Exposed for the spec. */
  private[graft] lazy val jvmToken: String =
    f"${new java.util.Random().nextInt() & 0x7fffffff}%08x"

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
    * shutdown-time reclaim. The name carries the OWNING PROCESS's pid
    * (round-8 advisor item): a purely (tag, key)-derived name let a second
    * JVM on the same input dir wipe a live process's layout files
    * mid-query, so liveness is per-process by construction and crashed
    * runs are reclaimed by [[sweepStale]] instead of wipe-on-create. */
  def freshRoot(tag: String, key: String): java.nio.file.Path = {
    hook
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$tag|$key".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    if (!overridden) sweepStale(tag, digest)
    // On a SHARED mount (overridden) a bare pid is not unique across
    // hosts — two drivers on different machines can share (tag, digest,
    // pid) and wipe each other on create; qualify the root with the
    // hostname AND a per-JVM random token there (round-14 advisor item:
    // containerized drivers commonly share a generic hostname like
    // "localhost", so (host, pid) can still collide across containers —
    // the token makes the owner suffix unique regardless of hostname
    // quality). The local default keeps the bare-pid form that
    // sweepStale's liveness regex understands.
    val owner = ownerFor(overridden)
    val root = scratchBase.resolve(s"graft_${tag}_${digest}_$owner")
    deleteRecursively(root)
    java.nio.file.Files.createDirectories(root)
    roots.put(s"$tag|$key", root)
    root
  }

  /** Owner suffix of a scratch root (pure core, spec-pinned): local roots
    * keep the bare-pid form `sweepStale`'s liveness regex understands; on
    * an overridden (shared) mount the suffix is hostname + pid + the
    * per-JVM random token, sanitized to [A-Za-z0-9_] ONLY — the bucketed
    * layout derives Spark CATALOG table names from the root's file name,
    * where a dot is a namespace separator and a dash is not an
    * identifier char. */
  private[graft] def ownerFor(overridden: Boolean): String =
    if (overridden) {
      val host = try java.net.InetAddress.getLocalHost.getHostName
        catch { case scala.util.control.NonFatal(_) => "unknownhost" }
      s"h${host.replaceAll("[^A-Za-z0-9]", "_")}_p${ProcessHandle.current.pid}_j$jvmToken"
    } else s"p${ProcessHandle.current.pid}"

  /** Best-effort reclaim of same-(tag, digest) roots whose owning process
    * is no longer alive (crashed or kill -9'd before its shutdown hook).
    * A recycled pid can make a stale root look alive — then it simply
    * lingers until that process exits; never deleted from under a live
    * owner. */
  private def sweepStale(tag: String, digest: String): Unit = {
    val tmp = scratchBase
    val pat = s"graft_${tag}_${digest}_p(\\d+)".r
    val self = ProcessHandle.current.pid
    val listing = java.nio.file.Files.list(tmp)
    try listing.forEach { p =>
      p.getFileName.toString match {
        case pat(pid) if pid.toLong != self &&
            !ProcessHandle.of(pid.toLong).map[Boolean](_.isAlive).orElse(false) =>
          try deleteRecursively(p)
          catch { case scala.util.control.NonFatal(_) => () }
        case _ => ()
      }
    } finally listing.close()
  }
}
