package graft

import graft.ops.MultimodalOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{BinaryType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal plumbing: binary column + metadata struct schema, and
  * the mapPartitions stub decoder agreeing with the q40 column
  * arithmetic (they must stay behavior-identical). */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val dir: String = SparkTest.sfDir

  test("media table: bytes is BinaryType with typed metadata struct") {
    val schema = MultimodalOps.mediaTable(spark, dir).schema
    assert(schema("bytes").dataType == BinaryType)
    val meta = schema("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSeq == Seq("mime", "byte_len", "origin"))
  }

  test("decodeStub matches q40 column arithmetic row-for-row") {
    val decoded = MultimodalOps.decodeStub(MultimodalOps.mediaTable(spark, dir))
      .collect().map(d => d.media_id ->
        (d.byte_len, d.width, d.height, d.n_frames, d.sampled_frames.length)).toMap
    val q40 = MultimodalOps.q40Multimodal(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
    assert(decoded.keySet == q40.keySet)
    decoded.foreach { case (id, d) => assert(d == q40(id), s"media $id: $d vs ${q40(id)}") }
  }

  test("frameSample: stride sampling") {
    assert(MultimodalOps.frameSample(1, 4) == Seq(0))
    assert(MultimodalOps.frameSample(9, 4) == Seq(0, 4, 8))
    assert(MultimodalOps.frameSample(8, 4) == Seq(0, 4))
  }
}
