package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec

/** Throwaway audit main: prints EVERY query whose plan has a window
  * partitioned only by known ≤10-distinct columns (the PlanAuditSpec rule
  * reports them one assertion at a time; this sweeps all 171 in one run). */
object QAudit {
  private val lowCardCols = Set("l_returnflag", "l_linestatus",
    "event_type", "source", "lang", "o_orderstatus", "o_orderpriority",
    "l_shipmode", "variant", "split", "et", "flag")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val offenders = fn(spark, dir).queryExecution.sparkPlan.collect {
          case w: WindowExec if w.partitionSpec.nonEmpty &&
              w.partitionSpec.forall(
                _.references.iterator.forall(a => lowCardCols(a.name))) =>
            w.partitionSpec.flatMap(_.references.iterator.map(_.name))
        }
        if (offenders.nonEmpty)
          println(s"OFFENDER $name: ${offenders.map(_.mkString(",")).mkString("; ")}")
      } catch {
        case e: Throwable => println(s"PLANFAIL $name: ${e.getClass.getSimpleName}")
      }
    }
    println("AUDIT_DONE")
    spark.stop()
  }
}
