package graft.agg

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.GraftSuite

class FreqItemsSpec extends GraftSuite {
  import spark.implicits._

  private def sketch(values: Seq[String], k: Int, parts: Int = 4):
      (Map[String, Long], Long, Long) = {
    val row = values.toDF("v").repartition(parts)
      .agg(FreqItems.freqItemsAgg(col("v"), k).as("s"))
      .select(col("s.items"), col("s.n"), col("s.err")).head()
    val items = row.getSeq[Row](0).map(r => r.getString(0) -> r.getLong(1)).toMap
    (items, row.getLong(1), row.getLong(2))
  }

  test("exact when distinct keys fit in k (no purge, err 0)") {
    val vals = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val (items, n, err) = sketch(vals, k = 8)
    assert(n == 9 && err == 0)
    assert(items == Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
  }

  test("MG guarantee on a skewed stream with distinct >> k: bounds + completeness") {
    // 40 heavy keys (60 copies each) buried in 4000 singletons
    val heavy = (0 until 40).flatMap(i => Seq.fill(60)(f"hot_$i%02d"))
    val noise = (0 until 4000).map(i => s"cold_$i")
    // deterministic interleave
    val vals = (heavy ++ noise).zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 6400 }.map(_._1)
    val truth = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val k = 128
    val (items, n, err) = sketch(vals, k)
    assert(n == vals.size)
    // err bound: n / ceil((k+1)/2), with merge purges folded in
    assert(err <= n / ((k + 1) / 2), s"err $err > bound ${n / ((k + 1) / 2)}")
    // every reported counter is a lower bound within err of the truth
    items.foreach { case (s, lb) =>
      assert(lb <= truth(s) && truth(s) <= lb + err, s"key $s lb=$lb err=$err")
    }
    // completeness: every key with true count > err is present
    truth.filter(_._2 > err).keys.foreach(key =>
      assert(items.contains(key), s"guaranteed key $key missing (err=$err)"))
    assert(items.size <= k)
  }

  test("merge across partitionings preserves the guarantee") {
    val vals = (0 until 3000).map(i => if (i % 7 == 0) "mega" else s"k${i % 997}")
    val truth = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 4, 13)) {
      val (items, n, err) = sketch(vals, k = 64, parts = parts)
      assert(n == 3000)
      truth.filter(_._2 > err).keys.foreach(key =>
        assert(items.contains(key), s"parts=$parts key=$key err=$err"))
      items.foreach { case (s, lb) =>
        assert(lb <= truth(s) && truth(s) <= lb + err, s"parts=$parts key=$s")
      }
    }
  }

  test("two-pass heavyHitters equals the exact groupBy/HAVING census") {
    // mega-conversation shape: a few giant keys, a long tail
    val vals = (0 until 40).flatMap(i => Seq.fill(200)(f"mega_$i%02d")) ++
      (0 until 5000).map(i => s"tail_${i % 2500}")
    val df = vals.toDF("conv").repartition(8)
    val got = FreqItems.heavyHitters(df, "conv", k = 512, den = 256.0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = vals.size.toDouble
    val expected = vals.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 > n / 256.0).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("sliced sketch blobs union to a summary with the direct guarantee (resume path)") {
    val vals = (0 until 2400).map(i => if (i % 5 == 0) s"hot_${i % 15}" else s"cold_$i")
    val truth = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val k = 96
    // 4 disjoint slices, each reduced to a serialized blob...
    val df = vals.zipWithIndex.map { case (v, i) => (i % 4, v) }.toDF("slice", "v")
    val blobs = df.groupBy("slice")
      .agg(FreqItems.freqItemsSketch(col("v"), k).as("blob"))
    assert(blobs.count() == 4)
    // ...then unioned WITHOUT rescanning the data
    val row = blobs.agg(FreqItems.freqItemsMergeAgg(col("blob"), k).as("s"))
      .select(col("s.items"), col("s.n"), col("s.err")).head()
    val items = row.getSeq[Row](0).map(r => r.getString(0) -> r.getLong(1)).toMap
    val (n, err) = (row.getLong(1), row.getLong(2))
    assert(n == 2400)
    truth.filter(_._2 > err).keys.foreach(key =>
      assert(items.contains(key), s"guaranteed key $key missing after merge (err=$err)"))
    items.foreach { case (s, lb) =>
      assert(lb <= truth(s) && truth(s) <= lb + err, s"merged key $s")
    }
  }

  test("keys beyond writeUTF's 64 KiB limit survive the shuffle serde") {
    val big = "x" * 70000
    val vals = Seq.fill(5)(big) ++ Seq.fill(3)("small")
    val (items, n, err) = sketch(vals, k = 8)
    assert(n == 8 && err == 0)
    assert(items == Map(big -> 5L, "small" -> 3L))
  }

  test("non-string key columns census in string space; nulls excluded from the share") {
    // int keys + nulls: threshold over the 8 non-null values (den 2 -> > 4)
    val df = Seq[Option[Int]](Some(7), Some(7), Some(7), Some(7), Some(7),
      Some(8), Some(8), Some(9), None, None, None, None).toDF("k")
    val got = FreqItems.heavyHitters(df, "k", k = 16, den = 2.0)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("7", 5L)))
  }

  test("nulls are skipped, empty input yields an empty census") {
    val df = Seq[Option[String]](Some("a"), None, Some("a"), None).toDF("v")
    val (items, n, err) = {
      val row = df.agg(FreqItems.freqItemsAgg(col("v"), 4).as("s"))
        .select(col("s.items"), col("s.n"), col("s.err")).head()
      (row.getSeq[Row](0).map(r => r.getString(0) -> r.getLong(1)).toMap,
        row.getLong(1), row.getLong(2))
    }
    assert(n == 2 && err == 0 && items == Map("a" -> 2L))
    val empty = Seq.empty[String].toDF("v")
    assert(FreqItems.heavyHitters(empty, "v").isEmpty)
  }
}
