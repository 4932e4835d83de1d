package graft

import org.apache.spark.sql.functions._
import graft.streaming.Kafka

/** S4 surface evidence in a broker-less, connector-less environment:
  * the record envelope (the engine-side half of the Kafka path) is
  * round-trip-tested as a pure transform, and the `format("kafka")`
  * resolution path is pinned — it must fail fast and clearly when the
  * connector jar is absent (this environment), and resolves the real
  * connector wherever `spark-sql-kafka` is on the cluster classpath.
  */
class KafkaSurfaceSpec extends SparkSpec {

  import spark.implicits._

  test("envelope/unenvelope round-trips typed rows through (key, value) records") {
    val df = Seq((7L, "Peru", 3.5), (8L, "Kenya", -1.0), (9L, null.asInstanceOf[String], 0.0))
      .toDF("ind", "country", "score")
    val env = Kafka.envelope(df, "ind")
    assert(env.columns.toSeq == Seq("key", "value"))
    // same-key records carry the partition key as text
    assert(env.select("key").as[String].collect().sorted.toSeq == Seq("7", "8", "9"))
    val back = Kafka.unenvelope(env, df.schema)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("format(kafka) fails fast with a clear error when the connector is absent") {
    // the connector is resolved by name at load() — no broker contact
    val e = intercept[Exception] {
      Kafka.source(spark, "localhost:9092", "t",
        Seq((1L, "x")).toDF("ind", "s").schema)
    }
    val msg = Option(e.getMessage).getOrElse("") + e.getClass.getName
    assert(msg.toLowerCase.contains("kafka"),
      s"expected a kafka-connector resolution error, got: $e")
  }
}
