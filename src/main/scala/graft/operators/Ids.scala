package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scalable global row numbering.
  *
  * The naive form — `row_number() OVER (ORDER BY …)` with no partition
  * key — forces every row through ONE task (a single-partition window),
  * the classic 100 TB dead end. This operator keeps the data
  * distributed: a range-partitioned sort (the same shuffle any global
  * sort pays), then `zipWithIndex`, which assigns contiguous ids from
  * per-partition counts with one tiny O(#partitions) driver round —
  * no row data ever moves to the driver.
  *
  * This is the repo's one deliberate RDD usage: per-partition index
  * arithmetic is genuine imperative per-partition logic (SURVEY.md
  * "RDDs only for…"), and no Column-API equivalent exists that avoids
  * the single-partition window.
  */
object Ids {

  /** Assign 1-based ids in the total order given by `order` (pass every
    * tie-break key — determinism requires a total order). Output schema:
    * (rid, <keyName>) with the ordering column preserved.
    */
  def stableRowIds(df: DataFrame, order: Seq[Column], keyName: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.orderBy(order: _*)
      .select(org.apache.spark.sql.functions.col(keyName).cast("long"))
      .as[Long]
      .rdd
      .zipWithIndex()
      .map { case (k, i) => (i + 1, k) }
      .toDF("rid", keyName)
  }
}
