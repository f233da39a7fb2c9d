package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Jdbc

/** Opt-in Postgres/PostGIS smoke for the dialect notes in
  * [[graft.sources.Jdbc]] (the reference's actual store is Postgres;
  * the always-on spec runs on embedded Derby).
  *
  * Skips cleanly unless BOTH hold:
  *   - `GRAFT_PG_URL` is set (e.g.
  *     `jdbc:postgresql://localhost:5432/graft?user=graft&password=graft`)
  *   - the Postgres JDBC driver is on the classpath
  *
  * Run against a dockerized `postgis/postgis` to exercise the deltas the
  * Derby spec cannot: TIMESTAMPTZ/NUMERIC/BYTEA type mapping, lower-cased
  * identifiers, LIMIT pushdown, and `ST_AsBinary` geometry extraction
  * decoded by the engine's WKB expression.
  */
class PgJdbcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val pgUrl = sys.env.get("GRAFT_PG_URL")
  private val driverPresent =
    scala.util.Try(Class.forName("org.postgresql.Driver")).isSuccess
  private def conn = Jdbc.Conn(pgUrl.get)

  private def withPg(testBody: java.sql.Connection => Unit): Unit = {
    assume(pgUrl.isDefined, "GRAFT_PG_URL not set — Postgres smoke skipped")
    assume(driverPresent, "Postgres JDBC driver not on the classpath")
    val c = java.sql.DriverManager.getConnection(pgUrl.get)
    try testBody(c) finally c.close()
  }

  private def seed(c: java.sql.Connection): Unit = {
    val st = c.createStatement()
    st.execute("DROP TABLE IF EXISTS graft_pg_smoke")
    st.execute("""CREATE TABLE graft_pg_smoke (
      user_id INT NOT NULL, name VARCHAR(64), weight NUMERIC,
      joined TIMESTAMPTZ, payload BYTEA)""")
    (1 to 20).foreach { i =>
      st.execute(s"""INSERT INTO graft_pg_smoke VALUES ($i, 'user_$i',
        ${60 + i}.5, '2024-01-0${i % 9 + 1}T00:00:00Z', '\\x0${i % 10}ff')""")
    }
    st.close()
  }

  test("Postgres type mapping matches the dialect notes (TIMESTAMPTZ/NUMERIC/BYTEA)") {
    withPg { c =>
      seed(c)
      val df = Jdbc.readTable(spark, conn, "graft_pg_smoke")
      val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
      assert(types("joined") == "timestamp", types.toString) // instant-preserving
      assert(types("weight") == "decimal(38,18)", types.toString)
      assert(types("payload") == "binary", types.toString)
      assert(df.count() == 20)
    }
  }

  test("filter + LIMIT pushdown reach the Postgres scan (lower-cased identifiers)") {
    withPg { c =>
      seed(c)
      val df = Jdbc.readTable(spark, conn, "graft_pg_smoke")
        .filter(col("user_id") <= 5).limit(3)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") &&
        plan.toLowerCase.contains("lessthanorequal(user_id,5)"), plan.take(600))
      assert(plan.contains("PushedLimit"), "Postgres dialect accepts LIMIT pushdown")
      assert(df.count() == 3)
    }
  }

  test("partitioned read tiles the key space over parallel connections") {
    withPg { c =>
      seed(c)
      val df = Jdbc.readTablePartitioned(spark, conn, "graft_pg_smoke",
        partitionCol = "user_id", lower = 1, upper = 21, numPartitions = 4)
      assert(df.rdd.getNumPartitions == 4)
      assert(df.count() == 20)
    }
  }

  test("PostGIS geometry travels as ST_AsBinary WKB and decodes with GeoFunctions") {
    withPg { c =>
      val st = c.createStatement()
      val hasPostgis = scala.util.Try {
        st.execute("SELECT postgis_version()"); true
      }.getOrElse(false)
      assume(hasPostgis, "PostGIS not installed in the target database")
      st.execute("DROP TABLE IF EXISTS graft_pg_geo")
      st.execute("""CREATE TABLE graft_pg_geo (id INT,
        geom geometry(Point, 4326))""")
      st.execute("""INSERT INTO graft_pg_geo VALUES
        (1, ST_SetSRID(ST_MakePoint(-118.25, 34.05), 4326)),
        (2, ST_SetSRID(ST_MakePoint(2.35, 48.86), 4326))""")
      st.close()
      // geometry has no JDBC mapping — ST_AsBinary in a pushed query is
      // the documented path; encode() hex → engine WKB decode.
      val df = Jdbc.readQuery(spark, conn,
        "SELECT id, encode(ST_AsBinary(geom), 'hex') AS geom_hex FROM graft_pg_geo")
      val pts = df.select(col("id"),
          graft.functions.GeoFunctions.wkbPointDecode(col("geom_hex")).as("pt"))
        .select(col("id"), col("pt.lon"), col("pt.lat"))
        .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      assert(pts(1) == (-118.25, 34.05) && pts(2) == (2.35, 48.86), pts.toString)
    }
  }

  test("write round-trips a frame into Postgres") {
    withPg { c =>
      c.createStatement().execute("DROP TABLE IF EXISTS graft_pg_staged")
      import spark.implicits._
      val out = Seq((100, "imported_1"), (101, "imported_2")).toDF("user_id", "name")
      Jdbc.writeTable(out, conn, "graft_pg_staged")
      assert(Jdbc.readTable(spark, conn, "graft_pg_staged").count() == 2)
    }
  }
}
