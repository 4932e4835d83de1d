package graft

import java.nio.file.Files
import java.sql.DriverManager
import graft.sources.Sources

/** S1 execution evidence: [[Sources.jdbc]] against a REAL database —
  * embedded Apache Derby, which ships in /opt/spark/jars (Spark's Hive
  * metastore dependency), so the zero-egress environment can run a
  * genuine JDBC round trip. Covers the single-partition read, predicate
  * pushdown into the remote scan, and the partitioned parallel read
  * that makes JDBC ingest scale past one connection.
  */
class JdbcSourceSpec extends SparkSpec {

  import spark.implicits._

  private lazy val url: String = {
    val dbDir = Files.createTempDirectory("graft-derby").toString + "/db"
    val u = s"jdbc:derby:$dbDir;create=true"
    val conn = DriverManager.getConnection(u)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE accounts (id INT NOT NULL, name VARCHAR(32), balance DOUBLE)")
      val ps = conn.prepareStatement("INSERT INTO accounts VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ps.setInt(1, i); ps.setString(2, s"acct_$i"); ps.setDouble(3, i * 10.0)
        ps.addBatch(): Unit
      }
      ps.executeBatch(): Unit
    } finally conn.close()
    u
  }

  private val driverOpt = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  test("jdbc scan reads a real Derby table") {
    val df = Sources.jdbc(spark, url, "accounts", driverOpt)
    assert(df.columns.map(_.toLowerCase).toSeq == Seq("id", "name", "balance"))
    val rows = df.select("ID", "NAME").as[(Int, String)].collect().sortBy(_._1)
    assert(rows.length == 100 && rows.head == ((1, "acct_1")) &&
      rows.last == ((100, "acct_100")))
  }

  test("jdbc filters push down into the database scan") {
    val df = Sources.jdbc(spark, url, "accounts", driverOpt)
      .filter($"ID" > 90)
    // the predicate must reach the JDBC relation (remote WHERE clause),
    // not run as a post-scan Spark filter over the full table
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(ID,90)"),
      s"filter not pushed to JDBC scan:\n$scan")
    assert(df.count() == 10)
  }

  test("jdbc partitioned read splits the table across parallel connections") {
    val df = Sources.jdbc(spark, url, "accounts", driverOpt ++ Map(
      "partitionColumn" -> "ID", "lowerBound" -> "1",
      "upperBound" -> "101", "numPartitions" -> "4"))
    // 4 stride partitions — the scale shape: each executor opens its
    // own connection for its ID range
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
  }
}
