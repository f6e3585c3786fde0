package graft.sources

import org.apache.spark.sql.SparkSession

/** Shared registry for DERIVED FORMAT COPIES of a source table (round-16
  * review: OrcSource and CsvSource carried the same 15-line registry
  * scaffold verbatim, and the format axis is planned to keep growing):
  * one copy per (application, format tag, input dir), fingerprint-
  * validated against the SOURCE parquet via [[graft.ModelState.validated]]
  * (regenerated source rebuilds the copy), scratch named per-process via
  * [[graft.ScratchDirs.freshRoot]], dead-application entries evicted on
  * every lookup. At 100 TB nothing is copied — the table already lives in
  * its format; the copy is only the fixture's way to have a non-parquet
  * table to scan. */
private[sources] object DerivedCopy {

  /** (appId | tag | dir) → derived-copy path. */
  private val registry = scala.collection.concurrent.TrieMap
    .empty[String, (String, String)]

  /** Path of the `tag`-format copy of `$dir/$sourceTable.parquet`,
    * building it with `write` on first use (or when the source's content
    * fingerprint moved). */
  def apply(spark: SparkSession, dir: String, tag: String, sourceTable: String,
            label: String)(write: String => Unit): String =
    registry.synchronized {
      val ctxKey = s"${spark.sparkContext.applicationId}|$tag|$dir"
      graft.ModelState.evictStale(registry, spark)(_ => ())
      graft.ModelState.validated(registry, ctxKey,
          Seq(s"$dir/$sourceTable.parquet"), label)({
        val root = graft.ScratchDirs.freshRoot(tag, dir)
        val path = s"$root/${sourceTable}_$tag"
        write(path)
        path
      })
    }
}
