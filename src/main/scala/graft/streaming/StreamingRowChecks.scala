package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.compile.Validator
import graft.dsl.{Check, Constraint}

/** Stateless streaming validation — the row-level half of the batch
  * Validator run directly on a `readStream` DataFrame: NotNull / InSet /
  * MatchesRegex / ValueBounds / TextEquals / Compliance / ParsableAs /
  * NoPii / MinTextQuality all read only the
  * current row, so they evaluate per micro-batch as a pure projection —
  * no state store, no watermark, no shuffle, and violation rows land in
  * the sink within one trigger of the bad turn arriving (hours before a
  * nightly batch suite would see it).
  *
  * The checks compile through the SAME `Validator.compileStateless` site
  * the batch pass uses, so batch/stream violation parity holds by
  * construction (and is still gated by StreamingRowChecksSpec). Stateful
  * or aggregate constraints are REFUSED up front: silently dropping a
  * configured check is the one unforgivable failure mode of a validation
  * engine (same contract as SuiteConfig's strict parsing) — route those
  * to [[StreamingValidator]] / [[StreamingSequence]] (bounded-state
  * kernels) or the batch Validator.
  */
object StreamingRowChecks {

  /** The constraints [[violations]] accepts. */
  def isStateless(c: Constraint): Boolean =
    Validator.compileStateless(Seq(c)).nonEmpty

  /** Violation rows (batch Validator shape: constraint / conv_id /
    * turn_idx / column / observed / bound / severity) for every row of
    * `df` failing a row-level check. Works on streaming AND batch frames
    * (the parity spec runs both). Append-mode friendly: each output row
    * derives from exactly one input row.
    */
  def violations(df: DataFrame, check: Check): DataFrame = {
    val unsupported = check.constraints.filterNot(isStateless)
    require(unsupported.isEmpty,
      "stateless streaming validation cannot evaluate: " +
        unsupported.map(_.name).mkString(", ") +
        " — route to the batch Validator or a stateful streaming kernel")
    val compiled = Validator.compileStateless(check.constraints)
    // an empty battery is a valid degenerate suite (the batch path
    // guards it too): exploding a ZERO-struct array would die in the
    // analyzer with an unrelated-looking array<null> resolver error —
    // return the empty stream with the violation schema instead
    if (compiled.isEmpty) {
      import org.apache.spark.sql.functions.{col, lit}
      df.where(lit(false)).select(
        lit("").as("constraint"), col(check.keyCol).as("conv_id"),
        col(check.orderCol).cast("int").as("turn_idx"),
        lit("").as("column"), lit("").as("observed"), lit("").as("bound"),
        lit("").as("severity"))
    } else
      Validator.explodeChecks(df, check.keyCol, check.orderCol,
        compiled.map(sc =>
          (sc.name, sc.column, sc.observed, sc.bound, sc.severity,
            sc.violated)))
  }
}
