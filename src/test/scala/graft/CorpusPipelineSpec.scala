package graft

import graft.pipeline.CorpusPipeline
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The composed corpus-prep pipeline: exact dups collapse, near-dups
  * drop the later doc, the quality gate filters, and the token budget
  * cuts in doc_id priority order. */
class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " * 5

  private def docs = Seq(
    (1L, base, base.length, "en"),
    (2L, base, base.length, "en"), // exact duplicate of 1
    (3L, base + " tiny extra suffix", base.length + 18, "en"), // near-dup of 1
    (4L, "completely different legal proceedings concerning the estate " * 4,
      248, "en"),
    (5L, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))", 39, "und")) // junk
    .toDF("doc_id", "text", "n_chars", "lang")

  test("exact and near duplicates drop, junk fails the gate, originals survive") {
    val out = CorpusPipeline.prepare(docs, minQuality = 0.3,
      tokenBudget = 1000000L).collect()
    val ids = out.map(_.getLong(0)).toSeq
    assert(ids == Seq(1L, 4L), s"survivors: $ids")
  }

  test("token budget keeps the doc_id-ordered prefix") {
    val all = CorpusPipeline.prepare(docs, minQuality = -10,
      tokenBudget = 1000000L).collect()
    assert(all.length >= 2)
    val firstTokens = all.head.getLong(3)
    val out = CorpusPipeline.prepare(docs, minQuality = -10,
      tokenBudget = firstTokens).collect()
    assert(out.length == 1 && out.head.getLong(0) == all.head.getLong(0))
    // cum_tokens is monotone and within budget on the full run
    val cums = all.map(_.getLong(5)).toSeq
    assert(cums == cums.sorted)
  }

  test("q46 on testdata returns rows with positive budget accounting") {
    val rows = CorpusPipeline.q46CorpusPrep(spark, SparkTest.sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) > 0 && r.getLong(5) <= 10000L)
    }
  }
}
