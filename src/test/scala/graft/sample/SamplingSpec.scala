package graft.sample

import org.apache.spark.sql.functions._

import graft.GraftSuite

class SamplingSpec extends GraftSuite {
  import spark.implicits._

  private lazy val ids = spark.range(20000)
    .select(format_string("k_%06d", col("id")).as("key"),
      pmod(col("id"), lit(4)).cast("string").as("g"))

  test("uniform rate is honored within binomial tolerance and deterministic") {
    val kept = Sampling.uniform(ids, "key", 0.25)
    val n = kept.count()
    // 20000 * 0.25 = 5000, sd = sqrt(20000*0.25*0.75) ~ 61; 6 sd ~ 367
    assert(math.abs(n - 5000L) < 400, s"kept $n of 20000 at rate 0.25")
    assert(kept.count() == n) // recompute = same rows (no RNG state)
    val again = Sampling.uniform(ids, "key", 0.25).select("key").collect().toSet
    assert(again == kept.select("key").collect().toSet)
  }

  test("repartitioning does not change the selected set") {
    val before = Sampling.uniform(ids, "key", 0.1).select("key").collect().toSet
    val after = Sampling.uniform(ids.repartition(13, col("g")), "key", 0.1)
      .select("key").collect().toSet
    assert(before == after)
  }

  test("different salts draw different samples; rate 0/1 are exact") {
    val a = Sampling.uniform(ids, "key", 0.5, salt = "s1").select("key").collect().toSet
    val b = Sampling.uniform(ids, "key", 0.5, salt = "s2").select("key").collect().toSet
    assert(a != b && (a.intersect(b).size.toDouble / 20000 - 0.25).abs < 0.02)
    assert(Sampling.uniform(ids, "key", 0.0).count() == 0)
    assert(Sampling.uniform(ids, "key", 1.0).count() == 20000)
  }

  test("stratified honors per-stratum rates and the default") {
    val got = Sampling.stratified(ids, "g", "key",
      Map("0" -> 1.0, "1" -> 0.5, "2" -> 0.0), defaultRate = 0.25)
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("0") == 5000L)
    assert(math.abs(got("1") - 2500L) < 250)
    assert(!got.contains("2"))
    assert(math.abs(got("3") - 1250L) < 220)
  }

  test("sampling is a pure filter: no shuffle in the plan") {
    val plan = Sampling.uniform(ids, "key", 0.3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("hex threshold is the exact 48-bit cut, clamped to 12 chars") {
    assert(Sampling.hexThreshold(0.0) == "000000000000")
    assert(Sampling.hexThreshold(0.5) == "800000000000")
    // rates rounding up to the full space clamp to the max 12-char hex —
    // a 13-char "1000000000000" would undersort every hash and keep ~1/16
    assert(Sampling.hexThreshold(1.0) == "ffffffffffff")
    assert(Sampling.hexThreshold(1.0 - 1e-16) == "ffffffffffff")
  }

  test("a rate just under 1.0 keeps (essentially) everything") {
    assert(Sampling.uniform(ids, "key", 1.0 - 1e-16).count() == 20000)
  }

  test("null keys are never sampled, at any rate (matches SQL semantics)") {
    val withNulls = ids.withColumn("key",
      when(col("g") === "3", lit(null)).otherwise(col("key")))
    assert(Sampling.uniform(withNulls, "key", 1.0).count() == 15000)
    assert(Sampling.uniform(withNulls, "key", 0.5)
      .where(col("key").isNull).count() == 0)
  }
}
