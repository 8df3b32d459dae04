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
}
