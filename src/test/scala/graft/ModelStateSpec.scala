package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the shared fingerprint-validated model-state lookup (round-14
  * verdict item 2: the pattern proved on the sketch gate in round 13 is
  * now the ONE way every registry looks up state — boundary caches, IVF
  * centroids, edge checkpoints, bucketed/partitioned layouts, bloom
  * bytes, footer row counts, streaming staging). These tests pin the
  * helper's contract; the end-to-end rebuild-on-regenerated-parquet is
  * pinned per registry class in EntrySpec ([[Tables.rowCount]]) because
  * every registry routes through this same code path. */
class ModelStateSpec extends AnyFunSuite {

  private def tmpDir(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_ms_spec")

  private def write(dir: java.nio.file.Path, name: String, content: String): Unit =
    java.nio.file.Files.write(dir.resolve(name), content.getBytes("UTF-8"))

  test("validated: caches on unchanged source, rebuilds on content change, calls onStale") {
    val src = tmpDir()
    write(src, "a.bin", "one")
    val m = scala.collection.concurrent.TrieMap.empty[String, (String, Int)]
    var builds = 0
    var staled = List.empty[Int]
    def lookup(): Int = ModelState.validated(m, "k", Seq(src.toString), "spec")(
      { builds += 1; builds }, onStale = v => staled ::= v)

    assert(lookup() == 1 && builds == 1)
    assert(lookup() == 1 && builds == 1, "unchanged source must serve the cache")
    assert(staled.isEmpty)

    // regenerate the source: same name, different size -> new fingerprint
    write(src, "a.bin", "one-two")
    assert(lookup() == 2 && builds == 2, "changed source must rebuild")
    assert(staled == List(1), "the replaced value goes through onStale")
    assert(lookup() == 2 && builds == 2, "the rebuilt value is cached in turn")
  }

  test("validated: mtime-only change rebuilds; distinct keys are independent") {
    val src = tmpDir()
    write(src, "a.bin", "xx")
    val m = scala.collection.concurrent.TrieMap.empty[String, (String, Int)]
    var builds = 0
    def lookup(k: String): Int =
      ModelState.validated(m, k, Seq(src.toString), "spec")({ builds += 1; builds })
    assert(lookup("k1") == 1 && lookup("k2") == 2, "per-key entries")
    // same size, bumped mtime — the freshness signal Spark's own
    // FileStatusCache trusts
    java.nio.file.Files.setLastModifiedTime(src.resolve("a.bin"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 60000))
    assert(lookup("k1") == 3, "mtime bump invalidates")
    assert(lookup("k2") == 4)
    assert(lookup("k1") == 3, "and the rebuilt entries cache again")
  }

  test("validated: absent source dir is a stable fingerprint; appearing dir invalidates") {
    val src = tmpDir()
    val gone = src.resolve("sub")
    val m = scala.collection.concurrent.TrieMap.empty[String, (String, Int)]
    var builds = 0
    def lookup(): Int =
      ModelState.validated(m, "k", Seq(gone.toString), "spec")({ builds += 1; builds })
    assert(lookup() == 1 && lookup() == 1, "'absent' is stable — no rebuild loop")
    java.nio.file.Files.createDirectories(gone)
    write(gone, "a.bin", "now-here")
    assert(lookup() == 2, "a source that appears invalidates the absent-keyed entry")
  }

  test("validated: multi-source fingerprint — any one source changing rebuilds") {
    val s1 = tmpDir(); val s2 = tmpDir()
    write(s1, "a", "1"); write(s2, "b", "2")
    val m = scala.collection.concurrent.TrieMap.empty[String, (String, Int)]
    var builds = 0
    def lookup(): Int = ModelState.validated(m, "k",
      Seq(s1.toString, s2.toString), "spec")({ builds += 1; builds })
    assert(lookup() == 1 && lookup() == 1)
    write(s2, "b", "2-changed")
    assert(lookup() == 2, "the second source alone must invalidate")
  }

  test("validated: onStale failure is swallowed, rebuild still lands") {
    val src = tmpDir()
    write(src, "a", "v1")
    val m = scala.collection.concurrent.TrieMap.empty[String, (String, Int)]
    var builds = 0
    def lookup(): Int = ModelState.validated(m, "k", Seq(src.toString), "spec")(
      { builds += 1; builds }, onStale = _ => sys.error("release boom"))
    assert(lookup() == 1)
    write(src, "a", "v2-bigger")
    assert(lookup() == 2, "a throwing release callback must not block the rebuild")
  }
}
