package graft

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Jdbc

/** JDBC source/sink against an in-memory Derby database (the JDBC driver
  * that ships with Spark). Skips cleanly if Derby is absent.
  */
class JdbcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val derbyAvailable =
    scala.util.Try(Class.forName("org.apache.derby.iapi.db.Factory")).isSuccess ||
      scala.util.Try(Class.forName("org.apache.derby.jdbc.EmbeddedDriver")).isSuccess

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val conn = Jdbc.Conn(url, driver = Some("org.apache.derby.jdbc.EmbeddedDriver"))

  private lazy val seeded: Boolean = {
    System.setProperty("derby.system.home",
      java.nio.file.Files.createTempDirectory("derby").toString)
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.execute("CREATE TABLE subjects (user_id INT NOT NULL, name VARCHAR(64), age INT)")
    (1 to 20).foreach { i =>
      st.execute(s"INSERT INTO subjects VALUES ($i, 'user_$i', ${20 + i % 40})")
    }
    st.close(); c.close()
    true
  }

  test("single-connection table read sees the seeded rows") {
    assume(derbyAvailable, "Derby JDBC driver not on the classpath")
    assume(seeded)
    val df = Jdbc.readTable(spark, conn, "subjects")
    assert(df.count() == 20)
    assert(df.columns.map(_.toLowerCase).toSet == Set("user_id", "name", "age"))
  }

  test("partitioned read fans out to N parallel slices with identical content") {
    assume(derbyAvailable, "Derby JDBC driver not on the classpath")
    assume(seeded)
    val df = Jdbc.readTablePartitioned(spark, conn, "subjects",
      partitionCol = "user_id", lower = 1, upper = 21, numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4, "one task per key stride")
    assert(df.count() == 20, "strides must tile the key space exactly")
  }

  test("filter pushdown reaches the database scan") {
    assume(derbyAvailable, "Derby JDBC driver not on the classpath")
    assume(seeded)
    val df = Jdbc.readTable(spark, conn, "subjects")
      .filter(org.apache.spark.sql.functions.col("user_id") <= 5)
    val plan = df.queryExecution.executedPlan.toString
    // Derby uppercases identifiers; match case-insensitively.
    assert(plan.contains("PushedFilters") &&
      plan.toLowerCase.contains("lessthanorequal(user_id,5)"), plan.take(600))
    assert(df.count() == 5)
  }

  test("query pushdown runs SQL remotely; write round-trips a frame") {
    assume(derbyAvailable, "Derby JDBC driver not on the classpath")
    assume(seeded)
    val agg = Jdbc.readQuery(spark, conn,
      "SELECT COUNT(*) AS n, MAX(age) AS max_age FROM subjects")
    val row = agg.head()
    assert(row.getAs[Number]("N").longValue == 20L ||
      row.getAs[Number]("n").longValue == 20L)

    import spark.implicits._
    val out = Seq((100, "imported_1"), (101, "imported_2")).toDF("user_id", "name")
    Jdbc.writeTable(out, conn, "staged_users")
    val back = Jdbc.readTable(spark, conn, "staged_users")
    assert(back.count() == 2)
  }
}
