package graft

import graft.ops.{Extended8, Extended9}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Extended9Spec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  val dir: String = SparkTest.sfDir

  test("q167: paths are valid type-trigrams in descending count order") {
    val rows = Extended9.q167PathAnalysis(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val types = Set("view", "click", "purchase", "signup", "error")
    rows.foreach { r =>
      assert(types(r.getString(0)) && types(r.getString(1)) &&
        types(r.getString(2)))
      assert(r.getLong(3) >= 1)
    }
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) >= b.getLong(3))
      case _ =>
    }
  }

  test("q168: every planted twin ranks first (scale-invariant cosine)") {
    val r = Extended9.q168RetrievalEval(spark, dir).head
    val (n, h1, h5) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n == 50)
    // cosine is scale-invariant: the 1.01-scaled twin is exactly
    // parallel, every other vector is not — rank 1 always
    assert(h1 == n && h5 == n)
    assert(r.getDouble(3) == 1.0 && r.getLong(4) == 1L)
  }

  test("q174: segment dedup keeps exactly one copy of every distinct segment") {
    val rows = ops.Extended9.q174SegmentDedup(spark, dir).collect()
    assert(rows.nonEmpty)
    // global invariant: reassembled texts contain each distinct segment once
    val allSegs = rows.flatMap { r =>
      val segs = r.getString(2).split(" ").grouped(10).map(_.mkString(" "))
      segs.toSeq
    }
    // n_kept bookkeeping matches the reassembled text
    rows.foreach { r =>
      val nk = r.getLong(1)
      val nTokens = r.getString(2).split(" ").length
      assert(nTokens <= nk * 10 && nTokens > (nk - 1) * 10,
        s"doc ${r.getLong(0)}: $nTokens tokens vs n_kept=$nk")
    }
    // regrouping a doc's reassembled text by 10 reproduces its kept
    // segments exactly (kept segments are full 10-token chunks plus at
    // most one short tail, which is last by construction), and the
    // first-occurrence rule means no segment VALUE survives twice
    assert(allSegs.length == allSegs.distinct.length,
      "a segment value survived dedup more than once")
  }

  test("q169: every drifting source exposes an under-represented cell") {
    val cells = Extended9.q169MixCells(spark, dir).collect()
    cells.foreach { r =>
      assert(r.getDouble(3) < 1.0 && r.getDouble(3) >= 0.0)
    }
    // mass balance: a source with TV distance > 0 must have at least
    // one cell BELOW expectation (an over-represented cell implies an
    // under-represented one within the same source)
    val drifting = Extended8.q163LangmixDrift(spark, dir).collect()
      .filter(_.getDouble(1) > 0).map(_.getString(0)).toSet
    val flagged = cells.map(_.getString(0)).toSet
    assert(drifting.subsetOf(flagged),
      s"sources ${drifting -- flagged} drift but expose no low cell")
  }
}
