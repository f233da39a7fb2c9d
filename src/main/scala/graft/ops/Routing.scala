package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic row-routing primitives for laying a 100 TB table out
  * across stores/shards — the placement layer a training-data pipeline
  * needs around its engine (cf. the reference's per-user table routing;
  * everything here is classic public technique).
  */
object Routing {

  /** Rendezvous (highest-random-weight) shard assignment: each key goes
    * to the shard whose `md5(key ":" shard)` digest is lexicographically
    * greatest (Thaler & Ravishankar 1996). Versus `hash(key) mod n`,
    * adding or removing ONE shard moves only ~1/n of the keys — the
    * property that makes resharding a 100 TB table an incremental copy
    * instead of a full rewrite. Entirely map-side (an n-way literal
    * struct array max inside whole-stage codegen, no shuffle, no UDF);
    * md5 is bit-stable across engines, so the assignment is globally
    * reproducible — any writer, reader, or oracle derives the same
    * placement.
    */
  def rendezvousAssign(df: DataFrame, keyCol: String,
                       nShards: Int): DataFrame = {
    require(nShards >= 1 && nShards <= 1024, "1..1024 shards")
    val cands = array((0 until nShards).map(s =>
      struct(
        md5(concat(col(keyCol).cast("string"), lit(":"), lit(s.toString)))
          .as("h"),
        lit(s).as("shard"))): _*)
    df.select(col(keyCol),
      array_max(cands).getField("shard").as("shard"))
  }

  /** Shard-level movement report between two shard counts — the
    * planning query before a reshard: for every key, its rendezvous
    * placement at `nFrom` and at `nTo` shards, aggregated to movement
    * counts. The rendezvous property bounds `moved / total` near
    * (nTo − nFrom)/nTo for grows; the report MEASURES it instead of
    * assuming it.
    */
  def reshardReport(df: DataFrame, keyCol: String, nFrom: Int,
                    nTo: Int): DataFrame = {
    def assign(n: Int) = array_max(array((0 until n).map(s =>
      struct(
        md5(concat(col(keyCol).cast("string"), lit(":"), lit(s.toString)))
          .as("h"),
        lit(s).as("shard"))): _*)).getField("shard")
    // Both placements evaluate in ONE map-side pass over the keys — no
    // self-join, the only exchange is the tiny (from, to)-cell
    // aggregation. The first nFrom digests are shared by construction
    // (same strings), which is the rendezvous stability argument made
    // visible in the plan.
    df.select(assign(nFrom).as("shard_from"), assign(nTo).as("shard_to"))
      .groupBy(col("shard_from"), col("shard_to"))
      .agg(count(lit(1)).as("n_keys"))
  }
}
