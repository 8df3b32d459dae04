package graft

/**
 * Catalog backend abstraction — the reference selects its metadata
 * index implementation by config (`json` → filesystem metadata.json
 * walk, `redis` → redis-backed index), see
 * /root/reference/querier/queryClient.go:418-432 (table index) and
 * :660-666 (db index). [[Catalog]] is the `json` backend;
 * [[RedisCatalog]] is the `redis` one. [[Engine]] works against this
 * trait so the two are interchangeable.
 */
trait CatalogBackend {
  def databases: Seq[String]
  def tables(db: String): Seq[String]

  /**
   * Parquet paths for `db.table`, pruned to files whose zone map
   * overlaps `range` (inclusive epoch-ns bounds). Files with no stats
   * MUST be kept — pruning is an optimization, never a filter.
   */
  def prunedPaths(db: String, table: String, range: Option[(Long, Long)]): Seq[String]

  def tableExists(db: String, table: String): Boolean

  /**
   * Writer-side hook: record newly written files for `db.table` so
   * the backend can serve them from `prunedPaths` (and, with row
   * counts, from `metadataStats`). Default is a no-op — the json
   * backend discovers files from the `metadata.json` zone maps the
   * writer already leaves on disk; index-server backends (redis)
   * override this to publish entries. `LakeWriter.write(catalog =
   * Some(…))` calls it after a commit, keeping the backends
   * interchangeable end-to-end.
   */
  def register(db: String, table: String,
               entries: Seq[CatalogBackend.FileStat]): Unit = ()

  /**
   * Exact row count for `db.table` when the backend can PROVE it from
   * metadata alone — i.e. every file of the table carries a row_count
   * stat. None ⇒ the caller must scan (a single stat-less file makes
   * the metadata sum unprovable). Lets the engine answer unfiltered
   * `count(*)` without touching a byte of parquet.
   */
  def metadataRowCount(db: String, table: String): Option[Long] =
    metadataStats(db, table)._1

  /**
   * Both metadata aggregates from ONE metadata pass:
   * (provable row count, provable (min_time, max_time)). Each side is
   * independently None when unprovable.
   */
  def metadataStats(db: String, table: String)
      : (Option[Long], Option[(Long, Long)]) = (None, None)

  /**
   * Exact row count of `db.table` restricted to the INCLUSIVE time
   * range — provable only when every file is either fully inside the
   * range (counts whole) or fully outside it (counts zero): one
   * partially-overlapping or stat-less file ⇒ None ⇒ scan. The
   * day-aligned lake layout makes day/hour-bucketed counts provable
   * in the common case.
   */
  def metadataRangeCount(db: String, table: String,
                         range: (Long, Long)): Option[Long] = None

  /**
   * Exact (min_time, max_time) over `db.table` when every file carries
   * time stats — a stat-less file could extend the range, so one makes
   * the bounds unprovable ⇒ None. Empty table ⇒ None (min/max of no
   * rows is NULL; let the scan produce it).
   */
  def metadataTimeBounds(db: String, table: String): Option[(Long, Long)] =
    metadataStats(db, table)._2

  /**
   * Writer-side hook: drop specific file entries (a compactor removing
   * the files it just replaced). Default no-op, like `register`.
   */
  def deregister(db: String, table: String, paths: Seq[String]): Unit = ()

  /**
   * Writer-side hook: drop every registered file entry for `db.table`.
   * Called by `LakeWriter.write` before `register` when the write mode
   * is Overwrite — the fresh part files have new names, so without a
   * clear the index would keep stale paths to deleted files and a
   * subsequent read of `prunedPaths` would fail on them. Default no-op
   * (the json backend's index IS the on-disk state the overwrite
   * already replaced).
   */
  def clear(db: String, table: String): Unit = ()
}

object CatalogBackend {
  /** One file's registration payload: path + zone-map stats. */
  case class FileStat(path: String, minTime: Option[Long],
                      maxTime: Option[Long], rowCount: Option[Long] = None)

  /** (provable count, provable bounds) over per-file metadata entries
    * — each side independently None when any entry lacks its stat.
    * Empty entries ⇒ count 0 but no bounds (min/max of no rows is
    * NULL; a scan must produce it). */
  def statsOf(es: Seq[(Option[Long], Option[(Long, Long)])])
      : (Option[Long], Option[(Long, Long)]) = {
    val cnt = if (es.exists(_._1.isEmpty)) None else Some(es.flatMap(_._1).sum)
    val bs = es.map(_._2)
    val bounds =
      if (es.isEmpty || bs.exists(_.isEmpty)) None
      else Some((bs.flatten.map(_._1).min, bs.flatten.map(_._2).max))
    (cnt, bounds)
  }

  /** Provable row count within the INCLUSIVE range: files fully
    * inside count whole, fully outside count zero; a partial overlap
    * or a stat-less entry makes the count unprovable. */
  def rangeCountOf(es: Seq[(Option[Long], Option[(Long, Long)])],
                   range: (Long, Long)): Option[Long] = {
    val (lo, hi) = range
    es.foldLeft(Option(0L)) {
      case (acc, (rc, Some((mn, mx)))) =>
        if (mx < lo || mn > hi) acc // fully outside
        else if (mn >= lo && mx <= hi) for (a <- acc; c <- rc) yield a + c
        else None // partial overlap: the range splits this file
      case _ => None // no time stats: can't classify the file
    }
  }
}
