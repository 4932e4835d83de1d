package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Throwaway piece-wise profiler for q42 (round 8). */
object QProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t(tag: String)(f: => Unit): Unit = {
      f
      val t0 = System.nanoTime(); f
      println(f"$tag%-28s ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    val li = Tables.lineitem(spark, dir)
    t("scan+collapse price") {
      li.groupBy(col("l_returnflag"), col("l_extendedprice").cast("double"))
        .agg(count(lit(1))).write.format("noop").mode("overwrite").save() }
    t("qty-only wide (q94 shape)") {
      operators.Stats.exactPercentilesWide(li, col("l_returnflag"),
        col("l_quantity"), Seq(0.25,0.5,0.75), Seq("a","b","c"))
        .write.format("noop").mode("overwrite").save() }
    t("price-only wide") {
      operators.Stats.exactPercentilesWide(li, col("l_returnflag"),
        col("l_extendedprice"), Seq(0.5), Seq("a"))
        .write.format("noop").mode("overwrite").save() }
    t("unpivot+collapse only") {
      li.select(col("l_returnflag").as("rf"),
        explode(array(
          struct(lit("qty").as("m"), col("l_quantity").cast("double").as("v")),
          struct(lit("price").as("m"), col("l_extendedprice").cast("double").as("v")))).as("x"))
        .select(col("rf"), col("x")("m").as("m"), col("x")("v").as("v"))
        .groupBy(col("rf"), col("m"), col("v")).agg(count(lit(1)))
        .write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
