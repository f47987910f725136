package graft.dedup

import org.apache.spark.sql.functions._

import graft.GraftSuite

class CcSpec extends GraftSuite {
  import spark.implicits._

  /** Local union-find oracle. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(i => i)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to the minimum root
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain collapses to the minimum id") {
    val edges = (0L until 19L).map(i => (i, i + 1))
    val got = run(edges)
    assert(got == (0L until 20L).map(_ -> 0L).toMap)
  }

  test("two bridged cliques merge; a separate clique stays apart") {
    val cliqueA = for (i <- 0L to 4L; j <- i + 1 to 4L) yield (i, j)
    val cliqueB = for (i <- 10L to 14L; j <- i + 1 to 14L) yield (i, j)
    val cliqueC = for (i <- 20L to 24L; j <- i + 1 to 24L) yield (i, j)
    val got = run(cliqueA ++ cliqueB ++ cliqueC :+ (4L, 10L))
    assert((0L to 4L).forall(got(_) == 0L) && (10L to 14L).forall(got(_) == 0L))
    assert((20L to 24L).forall(got(_) == 20L))
  }

  test("deterministic pseudo-random graph matches union-find, any partitioning") {
    val n = 300
    // hash-derived sparse edges: no RNG state, reproducible
    val edges = (0 until 900).map { i =>
      val a = (i * 7919 + 13) % n; val b = (i * 104729 + 7) % n
      (a.toLong, b.toLong)
    }.filter { case (a, b) => a != b && (a + b) % 3 != 0 }
    val oracle = unionFind(n, edges)
    val got = run(edges)
    got.foreach { case (id, comp) => assert(comp == oracle(id), s"node $id") }
    // repartitioned input must give identical assignments
    val got7 = ConnectedComponents
      .components(edges.toDF("src", "dst").repartition(7), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got7 == got)
  }

  test("self-loops, duplicates, and reversed edges are harmless") {
    val got = run(Seq((1L, 2L), (2L, 1L), (2L, 2L), (2L, 3L), (3L, 2L), (1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("superseded iteration checkpoints are unpersisted (only the final star forest stays)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val edges = (0L until 40L).map(i => (i, i + 1)) // long chain => several rounds
    run(edges)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.diff(before)
    assert(leaked.size <= 1, s"leaked ${leaked.size} checkpointed RDDs")
  }

  test("assign gives isolated vertices their own singleton component") {
    val vertices = (0L until 8L).toDF("id")
    val edges = Seq((1L, 2L), (5L, 6L)).toDF("src", "dst")
    val got = ConnectedComponents.assign(vertices, "id", edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("string id columns are rejected loudly, not silently nulled to singletons") {
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      ConnectedComponents.components(edges, "src", "dst")
    }
    assert(ex.getMessage.contains("integral"))
  }

  test("empty edge list converges immediately") {
    val vertices = (0L until 4L).toDF("id")
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val got = ConnectedComponents.assign(vertices, "id", empty, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L until 4L).map(i => i -> i).toMap)
  }

  test("dupGroups: end-to-end minhash -> verify -> groups matches brute-force closure") {
    // three near-dup families with chained edits + unrelated docs
    def doc(words: Seq[String]) = words.mkString(" ")
    val base = (0 until 12).map(i => s"tok$i")
    val docs = Seq(
      0L -> doc(base),
      1L -> doc(base.updated(0, "xx")), // near 0
      2L -> doc(base.updated(0, "xx").updated(1, "yy")), // near 1, farther from 0
      10L -> doc((20 until 32).map(i => s"tok$i")),
      11L -> doc((20 until 32).map(i => s"tok$i").updated(5, "zz")), // near 10
      20L -> doc((50 until 62).map(i => s"w$i")) // singleton
    ).toDF("doc_id", "text")
    val got = ConnectedComponents
      .dupGroups(docs, "doc_id", "text", shingleK = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = got.map(t => t._1 -> t._2).toMap
    assert(byId(0L) == 0L && byId(1L) == 0L && byId(2L) == 0L)
    assert(byId(10L) == 10L && byId(11L) == 10L)
    assert(byId(20L) == 20L)
    assert(got.find(_._1 == 0L).get._3 == 3L)
    assert(got.find(_._1 == 20L).get._3 == 1L)
    spark.sharedState.cacheManager.clearCache() // dedup stages persist
  }
}
