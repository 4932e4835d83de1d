package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Age-range bucketing (reference README.md:553-560, boundaries <25,
  * 25-35, 36-50, else).
  *
  * The reference implements this as a Python UDF — which forces a
  * per-row interpreter round-trip and blocks codegen. The engine's
  * primary form is the when/otherwise expression chain (Catalyst-native,
  * fused into whole-stage codegen); a Scala UDF variant is kept only to
  * exercise the UDF surface (SURVEY.md §2.9 U1).
  */
object Buckets {

  /** Expression form — use this one. */
  def ageRange(age: Column): Column =
    when(age < 25, "18-24")
      .when(age <= 35, "25-35")
      .when(age <= 50, "36-50")
      .otherwise("+50")

  /** UDF form — semantics-identical, kept to prove the UDF surface.
    * Deliberately NOT used in queries: a black-box function hides the
    * expression from Catalyst (no pruning through it, no codegen).
    */
  val ageRangeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((age: Int) =>
      if (age < 25) "18-24"
      else if (age <= 35) "25-35"
      else if (age <= 50) "36-50"
      else "+50")
}
