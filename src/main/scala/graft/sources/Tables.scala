package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parquet table access over the driver testdata dir plus the derived
  * `transcripts` view.
  *
  * The driver's DuckDB oracle reads the same parquet files, so every
  * derivation here has an exact SQL twin (see SparkEntry.oracleSql). The
  * transcripts view maps the `events` stream (the testdata analog of the
  * reference's monitor streams, TESTDATA.md) onto the BASELINE.json
  * input_hint shape (conv_id, turn_idx, role, text, tool, ts) with
  * deterministic rules, including injected referential-integrity violations
  * ("invalid_role", "tool_xx") mirroring the reference mock generator's 5%
  * injected anomalies (reference: src/hive_data_loader.py:388-411).
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "events")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** Valid role values (role_dim). */
  val validRoles: Seq[String] = Seq("user", "assistant", "system", "tool")

  /** role_dim dimension table. */
  def roleDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    validRoles.toDF("role")
  }

  /** tool_dim dimension table: tool_00 .. tool_15. */
  def toolDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 16).map(i => f"tool_$i%02d").toDF("tool")
  }

  /** SQL twin of [[transcripts]] as a WITH-clause body for the DuckDB
    * oracle. Keep in exact sync with the Column derivation below.
    */
  val transcriptsSql: String =
    """transcripts AS (
      |  SELECT printf('conv_%06d', user_id) AS conv_id,
      |         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
      |         CASE event_type WHEN 'click' THEN 'user' WHEN 'view' THEN 'assistant'
      |              WHEN 'error' THEN 'system' WHEN 'purchase' THEN 'tool'
      |              ELSE 'invalid_role' END AS role,
      |         props AS text,
      |         CASE WHEN event_type = 'purchase' THEN
      |              (CASE WHEN event_id % 97 = 0 THEN 'tool_xx'
      |                    ELSE printf('tool_%02d', event_id % 16) END) END AS tool,
      |         ts, value
      |  FROM events
      |)""".stripMargin

  /** Deterministic transcripts view over `events`:
    * user_id -> conv_id, per-conversation (ts, event_id)-ordered turn_idx,
    * event_type -> role (with injected invalid roles), props -> text,
    * tool codes on 'purchase' turns (with injected invalid tools).
    * Also carries `value` through as the per-turn measure for drift checks.
    */
  def transcripts(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    e.select(
      format_string("conv_%06d", col("user_id")).as("conv_id"),
      (row_number().over(w) - 1).as("turn_idx"),
      when(col("event_type") === "click", "user")
        .when(col("event_type") === "view", "assistant")
        .when(col("event_type") === "error", "system")
        .when(col("event_type") === "purchase", "tool")
        .otherwise("invalid_role").as("role"),
      col("props").as("text"),
      when(col("event_type") === "purchase",
        when(pmod(col("event_id"), lit(97)) === 0, lit("tool_xx"))
          .otherwise(format_string("tool_%02d", pmod(col("event_id"), lit(16))))).as("tool"),
      col("ts"),
      col("value"))
  }
}
