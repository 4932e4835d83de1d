package graft

import org.apache.spark.sql.functions._
import graft.operators.{Buckets, Dedup, Multimodal, Ranking}

/** Per-operator specs (SURVEY.md §5.2 layer 1) for ranking/argmax,
  * dedup, bucketing, and the multimodal plumbing.
  */
class OperatorsSpec extends SparkSpec {

  import spark.implicits._

  test("Audit.observed: counters ride the job and equal a recomputation; no second scan needed") {
    import graft.operators.Audit
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("lang", when(col("doc_id") % 7 === 0, lit(null)).otherwise(col("lang")))
    val (instrumented, obs) = Audit.observed(docs, "gate",
      Audit.qualityMetrics(Seq("lang", "text")))
    instrumented.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("rows") == docs.count())
    assert(m("lang_nulls") == docs.filter(col("lang").isNull).count())
    assert(m("text_nulls") == 0L)
  }

  test("argmax picks max measure per group") {
    val df = Seq(("us", "art", 5L), ("us", "diy", 9L), ("pe", "art", 2L))
      .toDF("country", "category", "cnt")
    val r = Ranking.argmax(df, Seq(col("country")), col("cnt"), col("category"))
      .orderBy("country").collect()
    assert(r.map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq ==
      Seq(("pe", "art", 2L), ("us", "diy", 9L)))
  }

  test("argmax breaks ties by ascending tie-break key") {
    val df = Seq(("us", "zeta", 5L), ("us", "alpha", 5L)).toDF("k", "v", "cnt")
    val r = Ranking.argmax(df, Seq(col("k")), col("cnt"), col("v")).collect()
    assert(r.length == 1 && r(0).getString(1) == "alpha")
  }

  test("argmax returns exactly one row per group key") {
    val df = (1 to 100).map(i => (i % 7, s"v$i", (i % 13).toLong)).toDF("k", "v", "cnt")
    val r = Ranking.argmax(df, Seq(col("k")), col("cnt"), col("v"))
    assert(r.count() == 7)
    assert(r.select("k").distinct().count() == 7)
  }

  test("argmaxGlobal returns the single max row with deterministic ties") {
    val df = Seq(("b", 9L), ("a", 9L), ("c", 1L)).toDF("v", "cnt")
    val r = Ranking.argmaxGlobal(df, col("cnt"), col("v")).collect()
    assert(r.toSeq.map(x => (x.getString(0), x.getLong(1))) == Seq(("a", 9L)))
  }

  test("topPerGroup keeps n rows per group in order") {
    val df = (1 to 10).map(i => ("g", i.toLong)).toDF("k", "x")
    val r = Ranking.topPerGroup(df, Seq(col("k")), Seq(col("x").desc), 3)
      .select("x").as[Long].collect().sorted
    assert(r.toSeq == Seq(8L, 9L, 10L))
  }

  test("exactByKey keeps the row with the smallest keep-order value") {
    val df = Seq((1L, "en", "keep"), (3L, "en", "drop"), (2L, "de", "solo"))
      .toDF("doc_id", "lang", "tag")
    val r = Dedup.exactByKey(df, Seq(col("lang")), col("doc_id"))
      .orderBy("doc_id").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(r.map(_.getString(2)).toSeq == Seq("keep", "solo"))
  }

  test("normalizedText groups case/whitespace variants") {
    val df = Seq((1L, "Hello World"), (2L, "  hello world  "), (3L, "other"))
      .toDF("doc_id", "text")
    val r = Dedup.normalizedText(df, col("text"), col("doc_id"))
      .orderBy("keep_id").collect()
    assert(r.map(x => (x.getLong(1), x.getLong(2))).toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("exactFullRow removes exact duplicate rows") {
    val df = Seq((1, "a"), (1, "a"), (2, "b")).toDF("i", "s")
    assert(Dedup.exactFullRow(df).count() == 2)
  }

  test("age buckets: expression and UDF forms agree on all boundaries") {
    val ages = Seq(18, 24, 25, 35, 36, 50, 51, 80)
    val df = ages.toDF("age")
    val r = df.select(
      Buckets.ageRange(col("age")).as("expr"),
      Buckets.ageRangeUdf(col("age")).as("udf")).collect()
    assert(r.forall(x => x.getString(0) == x.getString(1)))
    assert(r.map(_.getString(0)).toSeq ==
      Seq("18-24", "18-24", "25-35", "25-35", "36-50", "36-50", "+50", "+50"))
  }

  test("multimodal: expression and mapPartitions decode agree") {
    val df = Seq((1L, "abc"), (2L, "a longer payload here"))
      .toDF("id", "s")
      .select(col("id"), col("s").cast("binary").as("payload"))
    val viaExpr = df.select(col("id") +: Multimodal.imageMetaCols(col("payload")): _*)
      .orderBy("id").collect()
    val viaPart = Multimodal.decodePartitioned(df, "id", "payload")
      .orderBy("id").collect()
    assert(viaExpr.map(_.toSeq).toSeq == viaPart.map(_.toSeq).toSeq)
  }

  test("multimodal: feature extraction emits a normalized histogram embedding") {
    val df = Seq((1L, "aaaabbbb"), (2L, "")).toDF("id", "s")
      .select(col("id"), col("s").cast("binary").as("payload"))
    val r = Multimodal.featureExtractPartitioned(df, "id", "payload", bins = 4)
      .orderBy("id").as[(Long, Seq[Float])].collect()
    assert(r(0)._2.length == 4)
    assert(math.abs(r(0)._2.sum - 1.0f) < 1e-6) // normalized
    assert(r(1)._2.forall(_ == 0f))             // empty payload
  }

  test("multimodal: resize preserves aspect ratio and never upscales") {
    val df = Seq((1L, "x" * 300)).toDF("id", "s")
      .select(col("id"), col("s").cast("binary").as("payload"))
    val meta = df.select(col("id") +: Multimodal.imageMetaCols(col("payload")): _*)
      .collect()(0)
    val resized = df.select(col("id") +: Multimodal.resizedMetaCols(col("payload"), 128): _*)
      .collect()(0)
    val (w, h) = (meta.getAs[Long]("width"), meta.getAs[Long]("height"))
    val (rw, rh) = (resized.getAs[Long]("resized_width"), resized.getAs[Long]("resized_height"))
    assert(math.max(rw, rh) <= 128)
    assert(rw <= w && rh <= h)
    // aspect ratio within rounding
    assert(math.abs(rw.toDouble / rh - w.toDouble / h) < 0.05)
  }

  test("multimodal: frame sampling yields ceil(len/stride) offsets") {
    val df = Seq((1L, "0123456789")).toDF("id", "s")
      .select(col("id"), col("s").cast("binary").as("payload"))
    val frames = Multimodal.sampleFrames(df, "id", "payload", stride = 4)
      .select("frame_offset").as[Long].collect().sorted
    assert(frames.toSeq == Seq(0L, 4L, 8L))
  }

  test("multimodal: frame sampling yields no rows for empty payloads") {
    val df = Seq((1L, "")).toDF("id", "s")
      .select(col("id"), col("s").cast("binary").as("payload"))
    assert(Multimodal.sampleFrames(df, "id", "payload", stride = 4).count() == 0)
  }

  test("Stage.staged: identical rows/schema, one materialization for " +
      "many consumers (the cluster-swap staging seam)") {
    import graft.operators.Stage
    import graft.operators.Stage.StagedOps
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .withColumn("h", md5(col("v")))
    val st = Stage.staged(df)
    assert(st.schema == df.schema)
    assert(st.collect().sortBy(_.getLong(0)).toSeq ==
      df.collect().sortBy(_.getLong(0)).toSeq)
    // the suffix form is the same seam
    assert(df.staged.collect().length == 3)
    // the stage cuts the producing plan: consumers read the staged rows
    // (scan of an existing RDD), not the original subtree — the
    // property a parquet-stage swap must also satisfy
    val planStr = st.queryExecution.optimizedPlan.toString
    assert(planStr.contains("LogicalRDD") || planStr.contains("Scan"),
      s"staged plan did not cut lineage:\n$planStr")
  }
}
