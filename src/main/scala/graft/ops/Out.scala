package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** The determinism sort without the sampling recompute (round 10).
  *
  * Every declared query ends with a global orderBy so the driver's
  * hash-compare sees one canonical row order. A global sort plans as a
  * range-partitioning exchange whose partitioner is built by a SEPARATE
  * sampling job over the child RDD, and lineage is only reused back to
  * the nearest shuffle boundary (map-output files), cache block, or
  * checkpoint RDD — so a sort placed directly above per-row compute
  * RE-RUNS that compute: once for the sample, once for the shuffle.
  * Measured: q193's Bloom probe twice (two ~410 s-CPU stages at 100×),
  * q93's 3-gram scoring twice (31 of 88 CPU-s was the re-run). The
  * QSortAudit dev tool lists every declared sort's recomputed chain.
  *
  * `cachedOrderBy` caches the pre-sort rows — the query's OUTPUT, the
  * smallest relation in the plan — so the sampling pass reads the cache
  * and the per-row work runs once. Applied to the compute-heavy tails
  * (text scoring, HOF bundles, hashing, regex); NOT applied where the
  * recomputed chain is a bare scan+project, where a cache would cost
  * about what the rescan does. At deployment scale the determinism
  * sort is dropped entirely — it exists for the verification contract,
  * not the pipeline — so this is bench/test hygiene, not the 100 TB
  * story; the cache is released by Bench's per-query clearCache.
  */
object Out {
  implicit class SortOps(private val df: DataFrame) extends AnyVal {
    def cachedOrderBy(cols: Column*): DataFrame =
      df.cache().orderBy(cols: _*)
    def cachedOrderBy(col1: String, rest: String*): DataFrame =
      df.cache().orderBy(col1, rest: _*)
  }
}
