package graft

import graft.ops.GraphOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val dir: String = SparkTest.sfDir
  import spark.implicits._

  test("connected components on a known graph: chains, triangle, isolate") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20} (isolated)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (12L, 10L)).toDF("src", "dst")
    val verts = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L).toDF("id")
    val labels = GraphOps.connectedComponents(verts, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(labels(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(labels(_) == 10L))
    assert(labels(20L) == 20L)
  }

  test("q64: component membership is transitive over 5-minute adjacency") {
    val out = GraphOps.q64ConnectedComponents(spark, dir)
    val rows = out.collect()
    // component id is the min event_id of its members
    rows.groupBy(_.getLong(1)).foreach { case (cid, members) =>
      assert(members.map(_.getLong(0)).min == cid)
      assert(members.forall(_.getLong(2) == members.length))
    }
    // every event appears exactly once
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    assert(rows.length == Tables.events(spark, dir).count())
  }

  test("star CC: identical labels to min-label propagation on the burst graph") {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
    val a = ev.select(col("user_id"), col("event_id").as("src"),
      col("us").as("a_us"))
    val b = ev.select(col("user_id"), col("event_id").as("dst"),
      col("us").as("b_us"))
    val edges = a.join(b, "user_id")
      .filter(col("src") < col("dst") && col("b_us") >= col("a_us") &&
        col("b_us") - col("a_us") <= 300000000L)
      .select("src", "dst")
    val verts = ev.select(col("event_id").as("id"))
    val prop = GraphOps.connectedComponents(verts, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = GraphOps.connectedComponentsStar(verts, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == prop)
  }

  test("star CC: a 500-vertex chain converges within 12 rounds") {
    import spark.implicits._
    // min-label propagation needs O(diameter) = 499 rounds here; the
    // alternating-star algorithm is O(log n) — capping maxIters at 12
    // IS the round-count pin (it fails loudly if convergence is slow)
    val n = 500L
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val verts = (0L until n).toDF("id")
    val labels = GraphOps.connectedComponentsStar(verts, edges,
      maxIters = 12).collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length == n)
    assert(labels.forall(_._2 == 0L), "every chain vertex joins component 0")
  }

  test("maxIters exhaustion is loud: both CC variants signal non-convergence") {
    // a 64-vertex chain cannot converge in one round under either
    // algorithm; the exit must move the spec-visible warning counter
    // (mirroring the slf4j warn) instead of returning partially-merged
    // labels silently (VERDICT r4 item 3)
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("src", "dst")
    val verts = (0L until 64L).toDF("id")
    val before = GraphOps.nonConvergenceCount.get()
    GraphOps.connectedComponents(verts, edges, maxIters = 1).collect()
    GraphOps.connectedComponentsStar(verts, edges, maxIters = 1).collect()
    assert(GraphOps.nonConvergenceCount.get() == before + 2,
      "each variant's maxIters exit must emit exactly one signal")
  }

  test("star CC ≡ union-find on seeded random graphs") {
    // propagation ≡ star is separately pinned on the burst graph; here
    // the DISTRIBUTED star labeling is checked against a driver-side
    // union-find ground truth on adversarially random topologies.
    // Two trials: each CC run is ~8 rounds of blocking Spark jobs, so
    // trial count is wall-clock, not coverage — the topology varies
    // plenty within a 100-vertex random multigraph.
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 2).foreach { trial =>
      val n = 40 + trial * 30
      val m = n + rnd.nextInt(n)
      val edgeSeq = (1 to m).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      // reference labeling: driver-side union-find
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x; while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edgeSeq.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n)
        .map(i => i.toLong -> find(i).toLong).toMap
      val verts = (0L until n.toLong).toDF("id")
      val edges = edgeSeq.toDF("src", "dst")
      val star = GraphOps.connectedComponentsStar(verts, edges).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star == expected, s"star labels diverge on trial $trial")
    }
  }

  test("burstEdges: planted 10^4-event bot user, exact closed-form edge count") {
    import spark.implicits._
    // one bot user, 10^4 events at 1/second: the plain user_id anchor
    // would materialize C(10^4, 2) ≈ 5·10^7 candidate rows in ONE join
    // partition; the compound (user_id, 5-min bucket) anchor bounds
    // candidates by events-per-bucket (~300). Closed form: event i pairs
    // with the next min(300, n-1-i) events (delta <= 300 s inclusive).
    val n = 10000
    val ev = spark.range(n).select(lit(7L).as("user_id"),
      col("id").as("event_id"), (col("id") * 1000000L).as("us"))
    val edges = GraphOps.burstEdgesFrom(ev)
    val expected = (0 until n).map(i => math.min(300, n - 1 - i).toLong).sum
    assert(edges.count() == expected, s"expected $expected edges")
    // and the compound anchor is result-identical to the plain one on a
    // window-straddling mixed corpus (bucket-boundary pairs included)
    val mixed = spark.range(2000).select((col("id") % 5).as("user_id"),
      col("id").as("event_id"),
      (col("id") * 77777777L % 3000000000L).as("us"))
    val plainA = mixed.select(col("user_id"), col("event_id").as("src"),
      col("us").as("a_us"))
    val plainB = mixed.select(col("user_id"), col("event_id").as("dst"),
      col("us").as("b_us"))
    val plain = plainA.join(plainB, "user_id")
      .filter(col("src") < col("dst") && col("b_us") >= col("a_us") &&
        col("b_us") - col("a_us") <= 300000000L)
      .select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = GraphOps.burstEdgesFrom(mixed).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == plain, "compound anchor changed the edge set")
  }

  test("q177: oriented-wedge triangle count equals the id-canonical 3-join") {
    val out = ops.GraphOps.q177Triangles(spark, SparkTest.sfDir).head
    val (nv, ne, nt) = (out.getLong(0), out.getLong(1), out.getLong(2))
    assert(nv > 0 && ne > 0)
    // independent brute-force recount (the oracle's join shape) in-engine
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, SparkTest.sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val e = ev.as("a").join(ev.as("b"), Seq("user_id"))
      .filter(col("a.event_id") < col("b.event_id") &&
        col("b.us") >= col("a.us") && col("b.us") - col("a.us") <= 300000000L)
      .select(col("a.event_id").as("src"), col("b.event_id").as("dst"))
      .distinct().persist()
    val brute = e.as("e1")
      .join(e.as("e2"), col("e2.src") === col("e1.src") &&
        col("e2.dst") > col("e1.dst"))
      .join(e.as("e3"), col("e3.src") === col("e1.dst") &&
        col("e3.dst") === col("e2.dst"))
      .count()
    assert(nt == brute, s"oriented count $nt != brute-force $brute")
    assert(ne == e.count())
  }

  test("q178: pagerank ranks the hub above leaves and conserves rank mass") {
    import org.apache.spark.sql.functions._
    val rows = ops.GraphOps.q178PageRank(spark, SparkTest.sfDir).collect()
    assert(rows.length == 20)
    // descending, fully tiebroken
    val ranks = rows.map(r => (r.getDouble(1), r.getLong(0)))
    assert(ranks.sliding(2).forall { case Array((r1, i1), (r2, i2)) =>
      r1 > r2 || (r1 == r2 && i1 < i2) })
    // all ranks ≥ the damping floor 0.15 and finite
    assert(ranks.forall { case (r, _) => r >= 0.15 && !r.isNaN })
    // event with the most burst-graph neighbors appears in the top 20
    // (on an undirected graph, degree dominates PageRank)
    val ev = Tables.events(spark, SparkTest.sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val e = ops.GraphOps.burstEdgesFrom(ev).distinct()
    val topDeg = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
      .orderBy(col("d").desc, col("id")).head.getLong(0)
    assert(rows.map(_.getLong(0)).contains(topDeg),
      s"max-degree vertex $topDeg missing from pagerank top-20")
  }

  test("triangleStats ≡ brute-force 3-join on seeded random graphs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    for (seed <- Seq(7L, 23L, 99L)) {
      // G(40, ~0.15): edge (a,b) present iff a deterministic hash says so
      val n = 40
      val edges = (for {
        a <- 0 until n; b <- (a + 1) until n
        if ((a * 1000003L + b * 7919L + seed) % 97) < 15
      } yield (a.toLong, b.toLong)).toDF("src", "dst")
      val (nv, ne, nt) = ops.GraphOps.triangleStats(edges)
      val e = edges.persist()
      val brute = e.as("e1")
        .join(e.as("e2"), col("e2.src") === col("e1.src") &&
          col("e2.dst") > col("e1.dst"))
        .join(e.as("e3"), col("e3.src") === col("e1.dst") &&
          col("e3.dst") === col("e2.dst"))
        .count()
      assert(nt == brute, s"seed $seed: oriented $nt != brute $brute")
      assert(ne == e.count())
      assert(nv == e.select(explode(array(col("src"), col("dst"))))
        .distinct().count())
      e.unpersist()
    }
  }

  test("pagerankRanks matches the closed form on a star graph") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // hub 0 with L=4 leaves; after any iteration:
    //   hub  = 0.15 + 0.85 · Σ_leaf r_leaf      (leaves have degree 1)
    //   leaf = 0.15 + 0.85 · r_hub / L
    val L = 4
    val edges = (1 to L).map(i => (0L, i.toLong)).toDF("src", "dst")
    var hub = 1.0; var leaf = 1.0
    (1 to 3).foreach { _ =>
      val h2 = 0.15 + 0.85 * L * leaf
      val l2 = 0.15 + 0.85 * hub / L
      hub = h2; leaf = l2
    }
    val got = ops.GraphOps.pagerankRanks(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(0L) - hub) < 1e-9, s"hub ${got(0L)} vs $hub")
    (1 to L).foreach(i =>
      assert(math.abs(got(i.toLong) - leaf) < 1e-9))
    assert(got(0L) > got(1L), "hub must outrank leaves")
  }

  test("kCoreEdges: clique survives, cascading tail peels away") {
    import spark.implicits._
    // 4-clique {0,1,2,3} + a tail 3-4-5 chain: tail degrees < 3 cascade
    val clique = for { a <- 0 to 3; b <- (a + 1) to 3 } yield (a.toLong, b.toLong)
    val tail = Seq((3L, 4L), (4L, 5L))
    val core = ops.GraphOps.kCoreEdges((clique ++ tail).toDF("src", "dst"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(core == clique.toSet, s"3-core should be exactly the clique: $core")
  }

  test("q180: star graph assortativity is exactly -1; burst graph in range") {
    import spark.implicits._
    // every star edge joins the max-degree hub to a degree-1 leaf: r = −1
    val star = (1 to 6).map(i => (0L, i.toLong)).toDF("src", "dst")
    val rStar = ops.GraphOps.assortativityOf(star).head.getDouble(1)
    assert(rStar == -1.0, s"star assortativity $rStar")
    val out = ops.GraphOps.q180Assortativity(spark, SparkTest.sfDir).head
    // sf0.001's burst graph can be degree-regular → correlation undefined
    // (published as NULL, the documented guard); otherwise in [-1, 1]
    if (!out.isNullAt(1)) {
      val r = out.getDouble(1)
      assert(r >= -1.0 && r <= 1.0 && !r.isNaN)
    }
    assert(out.getLong(0) > 0L)
  }

  test("labelPropagation: bridged cliques collapse to per-clique labels") {
    import spark.implicits._
    // two 3-cliques {1,2,3} and {4,5,6} joined by bridge 3-4. Hand-run
    // of the deterministic rule (most frequent neighbor label, ties →
    // min) converges by round 4: clique one → label 1; clique two →
    // label 3 (the bridge leaks 3's round-1 label into the second
    // clique before 1 stabilizes — pinned intentionally: the rule is
    // the contract, not "min id of the community")
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("src", "dst")
    val labels = ops.GraphOps.labelPropagation(edges, rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(labels(_) == 1L), s"clique one: $labels")
    assert(Seq(4L, 5L, 6L).forall(labels(_) == 3L), s"clique two: $labels")
  }

  test("q181: communities partition the burst vertices; cut is deterministic") {
    val out = ops.GraphOps.q181LabelProp(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 20)
    // sizes are positive and the published order is (size desc, label)
    val sizes = out.map(_.getLong(1))
    assert(sizes.forall(_ > 0L))
    assert(sizes.sameElements(sizes.sorted.reverse))
    // labels are distinct communities
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    // run twice: the fixed-round synchronous rule is a pure function
    val again = ops.GraphOps.q181LabelProp(spark, dir).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("q63: kept orders strictly exceed their customer's average") {
    val out = GraphOps.q63CorrelatedSubquery(spark, dir)
    val perCust = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) /
        count(lit(1))).as("ca"))
    val bad = out.join(perCust, "o_custkey")
      .filter(col("o_totalprice").cast("decimal(18,2)") <= col("ca") - 0.005)
      .count()
    assert(bad == 0)
    assert(out.count() > 0)
  }
}
