package graft.model

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Replayable query history (SURVEY.md §1.1; reference
  * `script/query_history.py:2-19`, stored via sqlite+pickle at
  * `w4h_db_utils.py:252-275`): each saved entry is a QuerySpec JSON with a
  * user and sequence number, persisted as a parquet table so history
  * survives sessions and replays through [[graft.query.QueryEngine]].
  */
object QueryHistory {

  /** Append one executed spec to a user's history. */
  def append(spark: SparkSession, table: String, username: String, spec: QuerySpec): Unit = {
    import spark.implicits._
    val seq = nextSeq(spark, table, username)
    Seq((username, seq, spec.toJson))
      .toDF("username", "seq", "spec_json")
      .write.mode(SaveMode.Append).format("parquet").saveAsTable(table)
  }

  private def nextSeq(spark: SparkSession, table: String, username: String): Long =
    if (!spark.catalog.tableExists(table)) 0L
    else {
      import org.apache.spark.sql.functions._
      spark.table(table).filter(col("username") === username)
        .agg(coalesce(max(col("seq")) + 1, lit(0L))).head().getLong(0)
    }

  /** A user's history, newest first, parsed back into QuerySpecs. */
  def list(spark: SparkSession, table: String, username: String): Seq[(Long, QuerySpec)] = {
    import org.apache.spark.sql.functions._
    if (!spark.catalog.tableExists(table)) Seq.empty
    else spark.table(table).filter(col("username") === username)
      .orderBy(col("seq").desc)
      .collect()
      .map(r => (r.getAs[Long]("seq"), QuerySpec.fromJson(r.getAs[String]("spec_json"))))
      .toSeq
  }
}
