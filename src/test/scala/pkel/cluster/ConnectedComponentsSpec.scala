package pkel.cluster

import pkel.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  /** Union-find oracle. */
  private def oracle(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  private def runCc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.run(spark, edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("simple chain and star") {
    assert(runCc(Seq((1L, 2L), (2L, 3L), (3L, 4L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    assert(runCc(Seq((10L, 5L), (10L, 7L), (10L, 20L))) ==
      Map(5L -> 5L, 7L -> 5L, 10L -> 5L, 20L -> 5L))
  }

  test("two disjoint components with negative anchor ids") {
    val got = runCc(Seq((100L, -58L), (101L, -58L), (200L, 201L)))
    assert(got(100L) == -58L && got(101L) == -58L && got(-58L) == -58L)
    assert(got(200L) == 200L && got(201L) == 200L)
  }

  test("reliable parquet checkpoints produce the identical fixpoint") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(150)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2)
    val dir = java.nio.file.Files.createTempDirectory("cc-ck").toString
    // threshold 0 forces the distributed fixpoint (the adaptive small-graph
    // path would satisfy this graph driver-side and write no checkpoints)
    val durable = ConnectedComponents.run(spark, edges.toDF("src", "dst"),
      checkpointDir = Some(dir), reliableEvery = 2, smallGraphThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(durable == runCc(edges))
    // durable state actually landed on disk, and superseded checkpoints were
    // deleted as the run advanced — at most ONE edge-set copy remains
    val checkpoints = new java.io.File(dir).listFiles().filter(_.getName.startsWith("cc_iter_"))
    assert(checkpoints.length == 1,
      s"expected exactly one surviving checkpoint, got ${checkpoints.map(_.getName).toSeq}")
  }

  test("onIteration surfaces the fixpoint's per-iteration cost and edge counts") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(200)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(e => e._1 != e._2)
    val stats = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    val (roots, iters) = ConnectedComponents.runWithStats(
      spark, edges.toDF("src", "dst"), smallGraphThreshold = 0L,
      onIteration = (it, n, ms) => stats += ((it, n, ms)))
    // one callback for the initial canonicalization + one per star round
    assert(stats.map(_._1) == (0 to iters))
    assert(stats.forall(_._3 >= 0L))
    // iteration 0 reports the canonical (dedup'd, undirected) edge count
    val canonical = edges.map(e => (math.max(e._1, e._2), math.min(e._1, e._2))).distinct.size
    assert(stats.head._2 == canonical)
    // at fixpoint every edge is (node, root): last reported count = nodes
    // that are not their own root
    val rootMap = roots.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stats.last._2 == rootMap.count { case (n, r) => n != r })
    assert(rootMap == oracle(edges))
    // the small-graph path never iterates: a single callback for iteration 0
    val small = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    ConnectedComponents.runWithStats(spark, edges.toDF("src", "dst"),
      onIteration = (it, n, ms) => small += ((it, n, ms)))
    assert(small.map(_._1) == Seq(0) && small.head._2 == canonical)
  }

  test("kill/resume: a fresh run resumes from the last durable iterate, same roots") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // long chains force several star iterations, so an iteration cap stops
    // strictly before convergence (the simulated kill)
    val edges = (0L until 400L).map(i => (i, i + 1)) ++
      Seq.fill(200)((rnd.nextInt(400).toLong, rnd.nextInt(400).toLong)).filter(e => e._1 != e._2)
    val expect = oracle(edges)
    // cold full run (its own dir) for the iteration-count baseline
    val coldDir = java.nio.file.Files.createTempDirectory("cc_cold_").toString
    val (coldDf, coldIters) = ConnectedComponents.runWithStats(spark, edges.toDF("src", "dst"),
      checkpointDir = Some(coldDir), reliableEvery = 1, smallGraphThreshold = 0L)
    val cold = coldDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cold == expect)
    assert(coldIters >= 2, s"graph too easy for a resume test ($coldIters iterations)")
    // simulated kill: stop after 1 iteration, leaving durable cc_iter_1
    val dir = java.nio.file.Files.createTempDirectory("cc_resume_").toString
    ConnectedComponents.runWithStats(spark, edges.toDF("src", "dst"),
      maxIterations = 1, checkpointDir = Some(dir), reliableEvery = 1,
      smallGraphThreshold = 0L)._1.count()
    assert(new java.io.File(dir).listFiles().exists(_.getName == "cc_iter_1"),
      "kill simulation left no durable iterate")
    // fresh run, same dir: must pick up cc_iter_1 (total iterations match the
    // cold run's — the first iteration is NOT redone) and match the oracle
    val (resumedDf, totalIters) = ConnectedComponents.runWithStats(spark,
      edges.toDF("src", "dst"), checkpointDir = Some(dir), reliableEvery = 1,
      smallGraphThreshold = 0L)
    val resumed = resumedDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resumed == expect, "resumed run diverged from the oracle")
    assert(totalIters == coldIters,
      s"resume restarted from scratch ($totalIters vs cold $coldIters iterations)")
    // an interrupted (_SUCCESS-less) checkpoint is ignored: corrupt the
    // latest iterate's marker and rerun — the run must fall back cleanly
    val files = new java.io.File(dir).listFiles().filter(_.getName.startsWith("cc_iter_"))
    val latest = files.maxBy(_.getName.stripPrefix("cc_iter_").toInt)
    assert(new java.io.File(latest, "_SUCCESS").delete())
    val again = ConnectedComponents.run(spark, edges.toDF("src", "dst"),
      checkpointDir = Some(dir), reliableEvery = 1, smallGraphThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == expect)
  }

  test("random graphs match union-find oracle on BOTH execution paths") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { trial =>
      val n = 60 + rnd.nextInt(60)
      val edges = Seq.fill(n) {
        (rnd.nextInt(40).toLong - 5, rnd.nextInt(40).toLong - 5)
      }.filter(e => e._1 != e._2)
      val expect = oracle(edges)
      // adaptive default → driver-side union-find path
      val small = runCc(edges)
      assert(small == expect, s"trial $trial small-path mismatch\n got=$small\n exp=$expect")
      // threshold 0 → distributed large-star/small-star fixpoint, in BOTH
      // physical forms of the star round (window / join)
      Seq("window", "join").foreach { impl =>
        val (dist, iters) = ConnectedComponents.runWithStats(
          spark, edges.toDF("src", "dst"), smallGraphThreshold = 0L, starImpl = impl)
        val distMap = dist.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(iters > 0, s"distributed $impl path must actually iterate")
        assert(distMap == expect, s"trial $trial $impl mismatch\n got=$distMap\n exp=$expect")
      }
    }
  }

  test("window and join star rounds take the same iteration count to the same roots") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // long chains + random chords: several rounds to converge
    val edges = (0L until 300L).map(i => (i, i + 1)) ++
      Seq.fill(120)((rnd.nextInt(300).toLong, rnd.nextInt(300).toLong)).filter(e => e._1 != e._2)
    val expect = oracle(edges)
    val results = Seq("window", "join").map { impl =>
      val (df, iters) = ConnectedComponents.runWithStats(
        spark, edges.toDF("src", "dst"), smallGraphThreshold = 0L, starImpl = impl)
      (df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, iters)
    }
    assert(results.forall(_._1 == expect))
    // both forms compute the identical edge-set sequence, so the star-forest
    // early stop fires at the same iteration in each
    assert(results.map(_._2).distinct.size == 1,
      s"iteration counts diverged: ${results.map(_._2)}")
  }

  test("star-forest early stop: an input that is already a star forest converges in one round") {
    import spark.implicits._
    // two disjoint stars rooted at their minima — the fixpoint shape
    val edges = Seq((5L, 1L), (7L, 1L), (9L, 1L), (20L, 10L), (30L, 10L))
    val stats = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    val (df, iters) = ConnectedComponents.runWithStats(
      spark, edges.toDF("src", "dst"), smallGraphThreshold = 0L,
      onIteration = (it, n, ms) => stats += ((it, n, ms)))
    // round 1 reproduces the star forest; the shape test detects the
    // fixpoint there — no second (verification) round is spent
    assert(iters == 1, s"expected 1 iteration, got $iters (stats=$stats)")
    val roots = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(roots == oracle(edges))
  }

  test("inputCanonical: same roots, and no durable iter-0 copy of the input") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val raw = (0L until 200L).map(i => (i, i + 1)) ++
      Seq.fill(80)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong)).filter(e => e._1 != e._2)
    // canonical-distinct form (src > dst, each unordered pair once)
    val canon = raw.map(e => (math.max(e._1, e._2), math.min(e._1, e._2))).distinct
    val expect = oracle(raw)
    val dir = java.nio.file.Files.createTempDirectory("cc-canon").toString
    val (df, iters) = ConnectedComponents.runWithStats(spark,
      canon.toDF("src", "dst"), checkpointDir = Some(dir), reliableEvery = 3,
      smallGraphThreshold = 0L, inputCanonical = true)
    assert(df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == expect)
    // iteration 0 (the canonicalize + durable re-write of the input) was
    // skipped: no cc_iter_0 directory ever appears
    val names = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty).map(_.getName)
    assert(!names.contains("cc_iter_0"), s"iter-0 copy written: ${names.toSeq}")
    assert(iters >= 1)
    // a wrong vouch (duplicates, both orders) still yields correct roots —
    // rounds canonicalize internally; the flag is a performance contract
    val messy = raw ++ raw.map(e => (e._2, e._1))
    val got = ConnectedComponents.run(spark, messy.toDF("src", "dst"),
      smallGraphThreshold = 0L, inputCanonical = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("starImpl is validated") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      ConnectedComponents.run(spark, Seq((1L, 2L)).toDF("src", "dst"), starImpl = "graphx")
    }
    assert(e.getMessage.contains("starImpl"))
  }
}
