package graft

import graft.pipeline.MoviePipeline
import graft.sink.{InMemoryKVStore, KVForeachWriter, KVSink}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The KV sink (the reference's Redis surface, R13) in both batch and
  * streaming shapes, fed by the movie pipeline's (key, value) output. */
class KVSinkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  test("batch: pipeline output lands in the KV store under customer: keys") {
    InMemoryKVStore.data.clear()
    val events = Seq(
      ("c1", "m1", "A", 2010, 5, "2024-01-01"),
      ("c1", "m1", "A2", 2010, 4, "2024-02-01"),
      ("c2", "m2", "B", 2011, 3, "2024-01-05"))
      .toDF("customerId", "movieId", "title", "yearOfRelease", "rating", "date")
    val kv = MoviePipeline.toKv(
      MoviePipeline.regroupCustomers(MoviePipeline.dedupLatest(events)))
    KVSink.writeBatch(kv, new InMemoryKVStore)
    assert(InMemoryKVStore.data.size() == 2)
    val c1 = InMemoryKVStore.data.get("customer:c1")
    assert(c1 != null && c1.contains(""""title":"A2"""") && !c1.contains(""""title":"A""""))
    assert(InMemoryKVStore.data.get("customer:c2").contains(""""movieId":"m2""""))
  }

  test("streaming: ForeachWriter sink receives stateful upsert output") {
    InMemoryKVStore.data.clear()
    val input = MemoryStream[EventIn](spark)
    val kv = ops.StreamingOps.statefulUpsert(input.toDF())
      .selectExpr("concat('user:', user_id, ':', event_type) AS key",
        "cast(event_id AS string) AS value")
    val q = kv.writeStream
      .foreach(new KVForeachWriter(new InMemoryKVStore))
      .outputMode("update").start()
    try {
      input.addData(EventIn(7, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
        1, "click", 1.0))
      q.processAllAvailable()
      input.addData(EventIn(9, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"),
        1, "click", 2.0))
      q.processAllAvailable()
      assert(InMemoryKVStore.data.get("user:1:click") == "9")
    } finally q.stop()
  }

  test("streaming: foreachBatch sink reuses the batch writer per micro-batch") {
    InMemoryKVStore.data.clear()
    val input = MemoryStream[EventIn](spark)
    val kv = ops.StreamingOps.statefulUpsert(input.toDF())
      .selectExpr("concat('user:', user_id, ':', event_type) AS key",
        "cast(event_id AS string) AS value")
    val q = kv.writeStream
      .foreachBatch(KVSink.foreachBatchWriter(new InMemoryKVStore))
      .outputMode("update").start()
    try {
      input.addData(EventIn(7, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
        1, "click", 1.0))
      q.processAllAvailable()
      input.addData(EventIn(9, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"),
        1, "click", 2.0))
      q.processAllAvailable()
      assert(InMemoryKVStore.data.get("user:1:click") == "9")
    } finally q.stop()
  }
}
