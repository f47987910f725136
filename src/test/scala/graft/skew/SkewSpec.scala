package graft.skew

import org.apache.spark.sql.functions._
import graft.GraftSuite
import graft.compile.Validator
import graft.dsl._
import graft.sources.{Tables, TranscriptGen}

/** SURVEY §5.6 scale/skew smoke: a mega-conversation must not change
  * verdicts and must not own a partition after salting.
  */
class SkewSpec extends GraftSuite {
  import spark.implicits._

  test("salting bounds per-reducer rows for the mega key") {
    val t = TranscriptGen.generate(spark, nConvs = 101, baseTurns = 40,
      megaFactor = 100).cache() // conv 0 and 100? (0 and 100 % 101 → only 0)
    val counts = t.groupBy("conv_id").count()
    val maxConv = counts.agg(max("count")).collect()(0).getLong(0)
    val meanConv = counts.agg(avg("count")).collect()(0).getDouble(0)
    assert(maxConv > 20 * meanConv, "fixture must be skewed")

    val salted = Salting.saltedRepartition(t, "conv_id", "turn_idx",
      salts = 16, numPartitions = 16)
    val perPartition = salted
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").count()
      .agg(max("count")).collect()(0).getLong(0)
    val total = t.count()
    // no partition holds more than ~3x its fair share
    assert(perPartition < 3.0 * total / 16,
      s"partition holds $perPartition of $total rows")
  }

  test("verdicts identical with and without the mega-conversation's skew handling") {
    val t = TranscriptGen.generate(spark, nConvs = 50, baseTurns = 30,
      megaFactor = 60)
    val check = Check("skew", Seq(
      UniqueKey(Seq("conv_id", "turn_idx")),
      ReferentialIntegrity("role", "role_dim", "role")))
    val ctx = Validator.Context(Map("role_dim" -> Tables.roleDim(spark)))
    val a = Validator.validate(t.repartition(4), check, ctx)
    val b = Validator.validate(
      Salting.saltedRepartition(t, "conv_id", "turn_idx", 8, 16)
        .drop("_salt"), check, ctx)
    val va = a.violations.orderBy("constraint", "conv_id", "turn_idx").collect().toSeq
    val vb = b.violations.orderBy("constraint", "conv_id", "turn_idx").collect().toSeq
    assert(va == vb)
  }

  test("mega-key census finds exactly the mega conversations") {
    val t = TranscriptGen.generate(spark, nConvs = 300, baseTurns = 40,
      megaFactor = 50)
    val mega = Salting.megaKeys(t, "conv_id", factor = 10.0)
      .select("conv_id").as[String].collect().toSet
    // generator: conv_idx % 101 == 0 → 0, 101, 202
    assert(mega == Set("conv_00000000", "conv_00000101", "conv_00000202"))
  }
}
