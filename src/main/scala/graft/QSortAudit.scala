package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: find declared queries whose global sort samples a NARROW
  * subtree — the q193 round-10 finding. A global orderBy plans as a
  * range-partitioning shuffle whose partitioner is built by a separate
  * sampling job over the child RDD; lineage is only reused back to the
  * nearest shuffle boundary (map-output files) or cached block, so a
  * sort placed directly over a narrow chain (scan → heavy projection)
  * RECOMPUTES that chain: the whole per-row computation runs twice
  * (measured on q193 at 100×: two ~410 s-CPU stages for one Bloom
  * probe; on q93: 31 of 88 CPU-s was the re-run). A sort above any
  * shuffle/cache is fine — the sample pass replays cheap reads.
  *
  * Usage: runMain graft.QSortAudit [sfDir]. Prints one RANGESORT line
  * per range-partitioning exchange with the chain its sampling pass
  * re-executes, truncated at the nearest barrier (<shuffle>, <cache>,
  * <checkpoint> — those are reused, not recomputed). EVERY range sort
  * is printed, safe ones included; the reader judges: a chain that
  * starts at a barrier is fine, a long bare chain is the q193 bug.
  */
object QSortAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE off so executedPlan is a plain tree: exchanges are inserted
      // by EnsureRequirements during preparation (sparkPlan has NONE),
      // and AdaptiveSparkPlanExec would hide them behind its wrapper
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.{RDDScanExec, SparkPlan}
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    // the chain of operators the sampling pass re-executes: walk from
    // the range exchange's child down to the nearest barrier (shuffle
    // map-output files, a cache block, a localCheckpoint RDD — all
    // reused, not recomputed); everything ABOVE the barrier runs twice
    def chain(p: SparkPlan): Seq[String] = p match {
      case _: ShuffleExchangeExec => Seq("<shuffle>")
      case _: InMemoryTableScanExec => Seq("<cache>")
      case _: RDDScanExec => Seq("<checkpoint>")
      case leaf if leaf.children.isEmpty =>
        Seq(leaf.getClass.getSimpleName.stripSuffix("Exec"))
      case n =>
        n.getClass.getSimpleName.stripSuffix("Exec") +:
          n.children.flatMap(chain)
    }
    var audited = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        audited += 1
        plan.collect {
          case e: ShuffleExchangeExec
              if e.outputPartitioning.isInstanceOf[RangePartitioning] =>
            println(s"RANGESORT $name: ${chain(e.child).mkString(" ")}")
        }
      } catch { case ex: Throwable =>
        println(s"SKIP $name: ${Option(ex.getMessage).getOrElse(ex.toString).take(70)}")
      }
    }
    println(s"AUDIT_DONE audited=$audited")
    spark.stop()
  }
}
