package graft.util

import org.apache.spark.sql.DataFrame

/** Cache + EAGERLY materialize a relation that multiple subtrees of one
  * executed plan will scan.
  *
  * `.cache()` alone is lazy: when a self-join (or any plan with ≥2 scans of
  * the same InMemoryRelation) executes before the cache is built, both scan
  * nodes race to materialize it and each recomputes the full upstream
  * subtree — the cache dedupes storage, not concurrent computation.
  * Measured on the s08 pair join at sf0.1: 24 s racing vs ~1 s with the
  * relation pre-built. The extra `count()` is one cheap job over data that
  * had to be computed anyway, and it is how an index/sketch build would be
  * sequenced in production (build once, THEN serve).
  *
  * Lifecycle contract: cached relations are INTRA-QUERY — nothing here
  * unpersists, so any harness that runs many queries in one session must
  * release between queries (`spark.catalog.clearCache()`, as Bench and
  * Verify do after every query). Letting ~115 queries' eagerly-built
  * partitions accumulate in one heap caused the round-3 bench DNF.
  */
object Eager {
  def cached(df: DataFrame): DataFrame = {
    val c = df.cache()
    c.count()
    c
  }
}
