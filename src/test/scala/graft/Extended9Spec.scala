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
