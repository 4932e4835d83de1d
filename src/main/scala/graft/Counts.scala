package graft

/** Prints the SURVEY §8 headline counts from the source of truth
  * (SparkEntry itself), so the doc never hand-maintains them.
  *
  * Usage: bash tools/counts.sh   (wraps this + the spec-file count)
  */
object Counts {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    println(s"queries: ${q.size}")
    println(s"oracle_checked: ${(q & o).size}")
    println(s"rows_only: ${(q -- o).toSeq.sorted.mkString(", ")}")
  }
}
