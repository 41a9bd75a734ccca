package graft
import org.apache.spark.sql.SparkSession

/** Print the physical plan of declared queries (dev tool). One name →
  * full formatted plan; comma-separated names → compact tree per query
  * (for auditing join strategies / exchanges across many queries in one
  * JVM). */
object QPlan {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (names.length == 1)
      println(SparkEntry.queries(names.head)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode))
    else names.foreach { name =>
      println(s"===== $name")
      println(SparkEntry.queries(name)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
