package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Loader contract guard (VERDICT r6 item 7). The driver regenerated
  * `/root/testdata` between rounds and silently flipped `events.ts` from
  * parquet TIMESTAMP(NANOS) to plain `timestamp[us]`, which turned a
  * hard-coded nanos workaround into a 37-query outage. This spec pins the
  * loader's behavior under BOTH storage generations so the next regen
  * fails ONE named test instead of every events query:
  *   - current driver data: every table loads, `events.ts` is TimestampType
  *   - legacy generation: a synthesized TIMESTAMP(NANOS) parquet fixture
  *     (written with parquet-java's example API — Spark itself cannot
  *     write nanos) takes the LongType branch and lands on the exact
  *     microsecond instant.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val dir = SparkTest.sfDir

  test("every driver table loads and is non-empty") {
    val loaders: Seq[(String, String => org.apache.spark.sql.DataFrame)] = Seq(
      "region" -> (Tables.region(spark, _)),
      "nation" -> (Tables.nation(spark, _)),
      "customer" -> (Tables.customer(spark, _)),
      "supplier" -> (Tables.supplier(spark, _)),
      "part" -> (Tables.part(spark, _)),
      "orders" -> (Tables.orders(spark, _)),
      "lineitem" -> (Tables.lineitem(spark, _)),
      "events" -> (Tables.events(spark, _)),
      "documents" -> (Tables.documents(spark, _)),
      "embeddings" -> (Tables.embeddings(spark, _)))
    loaders.foreach { case (name, ld) =>
      assert(ld(dir).limit(1).count() == 1L, s"table $name is empty")
    }
  }

  test("events.ts normalizes to TimestampType on the current storage generation") {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"loader must present one stable ts type; got ${ev.schema("ts").dataType}")
    // Session TZ is UTC, so whatever physical generation is on disk, the
    // loaded instant must agree with DuckDB's reading of the same file —
    // pin one deterministic value: the minimum ts as epoch micros equals
    // the raw column's minimum (cast path is value-identity under UTC).
    val loaded = ev.agg(min(unix_micros(col("ts")))).head.getLong(0)
    val raw = spark.read.parquet(s"$dir/events.parquet")
      .agg(min(unix_micros(col("ts").cast(TimestampType)))).head.getLong(0)
    assert(loaded == raw)
  }

  test("legacy TIMESTAMP(NANOS) generation takes the LongType branch exactly") {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType, Types}
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.example.data.simple.SimpleGroupFactory

    val schema = Types.buildMessage()
      .required(PrimitiveType.PrimitiveTypeName.INT64).named("event_id")
      .required(PrimitiveType.PrimitiveTypeName.INT64)
      .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.NANOS)).named("ts")
      .required(PrimitiveType.PrimitiveTypeName.INT64).named("user_id")
      .required(PrimitiveType.PrimitiveTypeName.BINARY)
      .as(LogicalTypeAnnotation.stringType).named("event_type")
      .required(PrimitiveType.PrimitiveTypeName.DOUBLE).named("value")
      .required(PrimitiveType.PrimitiveTypeName.BINARY)
      .as(LogicalTypeAnnotation.stringType).named("props")
      .named("events")

    val tmp = java.nio.file.Files.createTempDirectory("graft-nanos-fixture")
    try {
      val conf = new org.apache.hadoop.conf.Configuration()
      GroupWriteSupport.setSchema(schema, conf)
      val writer = ExampleParquetWriter
        .builder(new org.apache.hadoop.fs.Path(s"$tmp/events.parquet"))
        .withConf(conf).withType(schema).build()
      val gf = new SimpleGroupFactory(schema)
      // 2024-01-01T10:00:00.123456Z as nanos (µs-aligned, like the driver data)
      val nanos = 1704103200123456000L
      writer.write(gf.newGroup()
        .append("event_id", 1L).append("ts", nanos).append("user_id", 7L)
        .append("event_type", "view").append("value", 1.5)
        .append("props", "{}"))
      writer.close()

      // sanity: under the entrypoint conf (SparkTest's builder pins it
      // true, like Verify/Bench/Q*) the file really reads as LongType
      assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true",
        "test session must mirror the entrypoint builders")
      val rawType = spark.read.parquet(s"$tmp/events.parquet")
        .schema("ts").dataType
      assert(rawType == LongType, s"fixture did not store nanos: $rawType")

      val ev = Tables.events(spark, tmp.toString)
      assert(ev.schema("ts").dataType == TimestampType)
      assert(ev.select(unix_micros(col("ts"))).head.getLong(0) == nanos / 1000L)

      // without the conf the loader must fail ACTIONABLY and must not
      // flip session state behind the caller's back (VERDICT r7 "wrong"
      // #3: no loader mutates session config)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
      try {
        val e = intercept[IllegalStateException] {
          Tables.events(spark, tmp.toString)
        }
        assert(e.getMessage.contains("nanosAsLong"))
        assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "false",
          "loader mutated session config")
      } finally {
        // the session is shared across suites — restore the entrypoint pin
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
