package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Classic star-schema aggregation/join queries over the driver's TPC-H-ish
  * tables — exercise scan, hash-agg with partial aggregation, broadcast vs
  * shuffle join selection, and top-k. Doubles are rounded AFTER aggregation
  * so the DuckDB oracle compares bit-stable values.
  */
object TpchQueries {

  type Q = (SparkSession, String) => DataFrame

  def defs: Map[String, Q] = Map(
    // Flagship: TPC-H Q1-style pricing summary (hash-agg, map-side combine).
    "q1_pricing_summary" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order")
        )
    },

    // 3-way join: small dims broadcast, big fact shuffles once.
    "q3_revenue_join" -> { (s, dir) =>
      val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },

    // TPC-H Q5-style local-supplier volume: the 6-table star join. Region
    // and nation broadcast (constant-size dims); customer and supplier are
    // key-joins the optimizer orders; the extra c_nationkey = s_nationkey
    // equi-condition rides the supplier join, not a post-filter.
    "q5_local_supplier" -> { (s, dir) =>
      val asia = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1998-01-01")
      Tables.lineitem(s, dir)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, dir),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asia), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
    },

    // TPC-H Q6-style forecast revenue: pure scan + conjunctive filter +
    // global agg — every predicate must reach the parquet scan as a pushed
    // filter (PlanShapeSpec pins this).
    "q6_forecast_revenue" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // TPC-H Q18-style large-volume customers: the aggregate side (orders
    // whose total quantity clears the threshold) is filtered BEFORE the
    // joins, so AQE broadcasts the tiny survivor set instead of shuffling
    // the full fact twice; quantity sums are integer-valued doubles —
    // exact, so the HAVING cut is engine-stable.
    "q18_large_orders" -> { (s, dir) =>
      val big = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 300)
      big.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    },

    // TPC-H Q17-style small-quantity revenue: the CORRELATED-SUBQUERY
    // shape (l_quantity < 0.2 × that part's average quantity),
    // decorrelated the way Catalyst would: ONE per-part aggregation over
    // the fact (a single exchange on l_partkey — plan-guarded), joined
    // back to the fact. The per-part threshold rounds to 6 dp so both
    // engines cut on the identical double; the filtered part dim
    // broadcasts. Reported per brand (Q17 reports one global row — too
    // weak a hash check).
    "q17_small_quantity" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val thresholds = li.groupBy(col("l_partkey"))
        .agg(round(lit(0.2) * avg(col("l_quantity")), 6).as("qty_threshold"))
      val part = Tables.part(s, dir)
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
      li.join(thresholds, Seq("l_partkey"))
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .filter(col("l_quantity") < col("qty_threshold"))
        .groupBy(col("p_brand"))
        .agg(round(sum(col("l_extendedprice")) / lit(7.0), 2).as("avg_yearly"))
    },

    // TPC-H Q21-style suppliers-kept-waiting: the EXISTS / NOT EXISTS
    // double self-join on the fact — the classic decorrelation + join-order
    // stress. The testdata carries no l_receiptdate/l_commitdate, so "kept
    // waiting" is shipped >30 days after the order date (same role, same
    // shape). Decorrelated as Catalyst would: EXISTS → left_semi, NOT
    // EXISTS → left_anti, both equi-keyed on l_orderkey with the
    // s2 <> s1 inequality riding the join condition — never a cartesian.
    // The `late` frame feeds l1 AND the anti side; both semi/anti joins
    // shuffle on the even, unskewed l_orderkey.
    "q21_suppliers_kept_waiting" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val ordF = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
      val late = li
        .join(ordF, col("l_orderkey") === col("o_orderkey"))
        .filter(datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))) > 30)
        .select(col("l_orderkey"), col("l_suppkey"))
      val others = li.select(col("l_orderkey").as("__o2"), col("l_suppkey").as("__s2"))
      val lateOthers = late.select(col("l_orderkey").as("__o3"), col("l_suppkey").as("__s3"))
      late
        .join(others,
          col("l_orderkey") === col("__o2") && col("l_suppkey") =!= col("__s2"),
          "left_semi")
        .join(lateOthers,
          col("l_orderkey") === col("__o3") && col("l_suppkey") =!= col("__s3"),
          "left_anti")
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },

    // TPC-H Q2-style min-cost supplier: the CORRELATED SCALAR-MIN subquery
    // (cost = min cost any same-region supplier offers that part). The
    // testdata has no partsupp, so the supply relation derives from
    // lineitem: per (part, supplier) the minimum observed unit price,
    // rounded to 6 dp so both engines cut on the identical double.
    // Decorrelated as Catalyst would: ONE per-part min over the
    // region-filtered supply (single exchange on partkey), joined back on
    // (partkey, cost) — ties (several suppliers at the min) all survive,
    // exactly like Q2. Region/nation dims broadcast; the part filter
    // broadcasts too (p_size/p_type cut it to ~2% of part).
    "q2_min_cost_supplier" -> { (s, dir) =>
      val europe = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
      val supply = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(round(min(col("l_extendedprice") / col("l_quantity")), 6).as("cost"))
      val eu = supply
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(europe), col("s_nationkey") === col("n_nationkey"))
        .select(col("l_partkey"), col("cost"), col("s_acctbal"),
          col("s_name"), col("n_name"))
      val minCost = eu.groupBy(col("l_partkey")).agg(min(col("cost")).as("cost"))
      val part = Tables.part(s, dir)
        .filter(col("p_size") <= 15 && col("p_type") === "LARGE")
      eu.join(minCost, Seq("l_partkey", "cost"))
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("l_partkey").as("p_partkey"), col("cost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    },

    // TPC-H Q4-style order-priority check: EXISTS over the fact with a
    // condition referencing BOTH sides (the ship lag is relative to the
    // order's own date) — the semi-join carries the cross-side predicate
    // on its join condition, so decorrelation cannot degrade to a
    // post-join filter over an inner join (which would double-count
    // orders with several late lines).
    "q4_priority_check" -> { (s, dir) =>
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-07-01")
      val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
      ord.join(li,
          col("o_orderkey") === col("l_orderkey") &&
            datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))) > 60,
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    },

    // TPC-H Q11-style important-stock cut: per-key aggregate filtered
    // against a GLOBAL scalar aggregate of itself (value > fraction ×
    // total). Decorrelated: the total is a 1-row broadcast cross join —
    // never a second scan of the fact, never a window over the whole
    // aggregate. Threshold rounded to 4 dp so both engines cut the same
    // boundary.
    "q11_important_parts" -> { (s, dir) =>
      // Scoped-cache the per-part aggregate: it feeds BOTH the global
      // threshold and the filter side — uncached, the fact would scan and
      // aggregate twice.
      val pv = graft.ops.OpCaches.scoped(
        Tables.lineitem(s, dir)
          .groupBy(col("l_partkey"))
          .agg(round(sum(col("l_extendedprice") * col("l_quantity")), 2).as("value")))
      val tot = pv.agg(round(sum(col("value")) * lit(0.0005), 4).as("__threshold"))
      pv.crossJoin(broadcast(tot))
        .filter(col("value") > col("__threshold"))
        .select(col("l_partkey"), col("value"))
    },

    // TPC-H Q15-style top-supplier-by-revenue: aggregate view + scalar-MAX
    // equality — here relaxed to the ≥ 0.9×max band so the gate hashes
    // several rows instead of one. Same decorrelated shape: the max is a
    // 1-row broadcast; the revenue view computes ONCE (cached) and feeds
    // both the max and the filter — not two fact scans.
    "q15_top_supplier" -> { (s, dir) =>
      val rev = graft.ops.OpCaches.scoped(
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-04-01")
          .groupBy(col("l_suppkey"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("total_revenue")))
      val mx = rev.agg(round(max(col("total_revenue")) * lit(0.9), 6).as("__floor"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_revenue") >= col("__floor"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
    },

    // TPC-H Q20-style excess-stock supplier chain — the NESTED semi-join
    // shape: suppliers ← semi (excess supply rows ← correlated-agg filter
    // ← semi part gate). Decorrelated to ONE fact pass: the (part,
    // supplier) aggregate carries BOTH the total supply and the
    // conditional in-window demand (sum of a when()), so the demand
    // threshold derives from the same aggregate instead of a second
    // corpus scan — plan-guarded. Quantity sums are integer-valued
    // doubles, so the qty > 0.5×demand cut is exact in both engines.
    "q20_excess_suppliers" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val ps = graft.ops.OpCaches.scoped(
        li.groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("l_quantity")).as("qty"),
            sum(when(col("l_shipdate") >= "1996-01-01" &&
              col("l_shipdate") < "1997-01-01", col("l_quantity"))
              .otherwise(lit(0.0))).as("yqty")))
      val demand = ps.groupBy(col("l_partkey"))
        .agg((lit(0.5) * sum(col("yqty"))).as("th"))
      val promo = Tables.part(s, dir).filter(col("p_type") === "PROMO")
        .select(col("p_partkey"))
      val excess = ps.join(demand, Seq("l_partkey"))
        .filter(col("qty") > col("th"))
        .join(broadcast(promo), col("l_partkey") === col("p_partkey"), "left_semi")
        .select(col("l_suppkey"))
      val asia = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
      Tables.supplier(s, dir)
        .join(broadcast(asia), col("s_nationkey") === col("n_nationkey"))
        .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
    },

    // TPC-H Q7-style shipping volume between a nation PAIR: the
    // DISJUNCTIVE cross-side predicate ((c=A ∧ s=B) ∨ (c=B ∧ s=A)) —
    // the shape that breaks equi-join extraction when written on the fact
    // keys. Scale-safe form: the OR narrows BOTH broadcast nation dims to
    // the two named nations BEFORE the fact joins (each side's IN-filter
    // is implied by the disjunction), so the fact never carries rows
    // outside the pair; the residual pair condition evaluates on
    // broadcast-joined dim columns, never as a join of facts.
    "q7_nation_volume" -> { (s, dir) =>
      val pair = Seq("NATION_1", "NATION_2")
      val n1 = Tables.nation(s, dir).filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("__ck"), col("n_name").as("cust_nation"))
      val n2 = Tables.nation(s, dir).filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("__sk"), col("n_name").as("supp_nation"))
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("c_nationkey") === col("__ck"))
        .join(broadcast(n2), col("s_nationkey") === col("__sk"))
        .filter((col("cust_nation") === pair(0) && col("supp_nation") === pair(1)) ||
          (col("cust_nation") === pair(1) && col("supp_nation") === pair(0)))
        .groupBy(col("cust_nation"), col("supp_nation"),
          year(to_date(col("l_shipdate"))).as("l_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
    },

    // TPC-H Q13-style customer order-count distribution: LEFT OUTER join
    // (customers with no qualifying orders must appear at count 0) into a
    // TWO-LEVEL aggregation — per-customer counts, then the histogram of
    // those counts. The "distribution of X per Y" report shape; the
    // second aggregation runs over |customers| rows, the histogram output
    // is tiny. count(o_orderkey) — not count(*) — so the null-extended
    // rows of orderless customers count 0, exactly the outer-join
    // semantics the gate exists to pin.
    "q13_order_count_distribution" -> { (s, dir) =>
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderpriority") =!= "1-URGENT")
      Tables.customer(s, dir)
        .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },

    // TPC-H Q22-style anti-join + global scalar subquery: above-average-
    // balance customers with NO urgent orders. The average is a 1-row
    // broadcast (rounded 6 dp for a bit-stable cut); the NOT EXISTS is a
    // left_anti against the priority-filtered orders — the filter
    // pushes below the anti join, so the join probe side is the small
    // urgent subset, not all orders.
    "q22_idle_customers" -> { (s, dir) =>
      val avgBal = Tables.customer(s, dir).filter(col("c_acctbal") > 0)
        .agg(round(avg(col("c_acctbal")), 6).as("__avg_bal"))
      val urgent = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      Tables.customer(s, dir)
        .crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("__avg_bal"))
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("numcust"),
          round(sum(col("c_acctbal")), 2).as("totacctbal"))
    },

    // TPC-H Q8-style national market share: the deepest join tree in the
    // suite (fact + orders + customer + supplier + part + two nation
    // aliases + region) feeding a conditional-share aggregation. All five
    // dims broadcast (constant-size); the fact shuffles only for the
    // year-keyed aggregation. Numerator and denominator are rounded
    // BEFORE the division so the 6-dp share is bit-stable across engines.
    "q8_market_share" -> { (s, dir) =>
      val america = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("__ck"))
      val suppNation = Tables.nation(s, dir)
        .select(col("n_nationkey").as("__sk"), col("n_name").as("supp_nation"))
      val large = Tables.part(s, dir).filter(col("p_type") === "LARGE")
        .select(col("p_partkey"))
      Tables.lineitem(s, dir)
        .join(broadcast(large), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(america), col("c_nationkey") === col("__ck"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(suppNation), col("s_nationkey") === col("__sk"))
        .withColumn("vol", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .groupBy(year(to_date(col("o_orderdate"))).as("o_year"))
        .agg(
          round(sum(when(col("supp_nation") === "NATION_3", col("vol"))
            .otherwise(lit(0.0))), 2).as("nation_vol"),
          round(sum(col("vol")), 2).as("total_vol"))
        .withColumn("mkt_share",
          round(col("nation_vol") / col("total_vol"), 6))
    },

    // TPC-H Q9-style product-type profit: supplier-nation × order-year
    // profit over a LIKE-filtered part subset. The testdata has no
    // partsupp, so supply cost is the standard substitute
    // 0.6 × p_retailprice carried on the broadcast part dim. Exercises a
    // LIKE pushdown into the dim scan + a two-key aggregation whose keys
    // come from two different join branches.
    "q9_product_profit" -> { (s, dir) =>
      val widget = Tables.part(s, dir).filter(col("p_name").like("%widget%"))
        .select(col("p_partkey"), col("p_retailprice"))
      val suppNation = Tables.nation(s, dir)
        .select(col("n_nationkey").as("__sk"), col("n_name").as("supp_nation"))
      Tables.lineitem(s, dir)
        .join(broadcast(widget), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(suppNation), col("s_nationkey") === col("__sk"))
        .groupBy(col("supp_nation"), year(to_date(col("o_orderdate"))).as("o_year"))
        .agg(round(sum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
            lit(0.6) * col("p_retailprice") * col("l_quantity")), 2).as("profit"))
    },

    // TPC-H Q10-style returned-item report: top-20 customers by revenue
    // lost to returns in a quarter. Fact filters (returnflag) and the
    // order-date window push to the scans; customer joins shuffle on the
    // even custkey; the final top-k is TakeOrderedAndProject, never a
    // global sort.
    "q10_returned_items" -> { (s, dir) =>
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-07-01")
      val natName = Tables.nation(s, dir)
        .select(col("n_nationkey").as("__ck"), col("n_name"))
      Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(natName), col("c_nationkey") === col("__ck"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // TPC-H Q12-style shipping-lag priority pivot: the testdata carries no
    // l_shipmode, so the categorical axis is the DERIVED ship-lag class
    // (days between order and ship date) — same CASE-pivot aggregation
    // shape: per class, how many high- vs low-priority lines. One
    // fact-orders join, map-side CASE projection, 3-row output.
    "q12_ship_lag_priority" -> { (s, dir) =>
      val lag = datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
      val highPrio = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .withColumn("lag_class",
          when(lag > 90, "SLOW").when(lag > 30, "MEDIUM").otherwise("FAST"))
        .groupBy(col("lag_class"))
        .agg(sum(when(highPrio, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(highPrio, 0L).otherwise(1L)).as("low_line_count"))
    },

    // TPC-H Q14-style promo revenue share, one row per 1996 month: the
    // share of revenue from PROMO parts. Part dim broadcasts; the share
    // divides two already-rounded sums so the 4-dp ratio is bit-stable.
    // Monthly grain (12 rows) instead of Q14's single global row — a
    // 1-row result is too weak a hash check.
    "q14_promo_share" -> { (s, dir) =>
      val ptype = Tables.part(s, dir).select(col("p_partkey"), col("p_type"))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
        .join(broadcast(ptype), col("l_partkey") === col("p_partkey"))
        .withColumn("vol", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .groupBy(month(to_date(col("l_shipdate"))).as("ship_month"))
        .agg(
          round(sum(when(col("p_type") === "PROMO", col("vol"))
            .otherwise(lit(0.0))), 2).as("promo_rev"),
          round(sum(col("vol")), 2).as("total_rev"))
        .withColumn("promo_share",
          round(lit(100.0) * col("promo_rev") / col("total_rev"), 4))
    },

    // TPC-H Q16-style supplier-relationship count: distinct suppliers per
    // (brand, type, size) for a filtered part subset, EXCLUDING a
    // NOT-IN supplier list (planned as a broadcast left_anti — the
    // exclusion list is a bounded dim subset). The distinct-count runs as
    // Spark's two-phase partial-distinct aggregate on the join output; the
    // supply relation is the fact's (partkey, suppkey) projection, never
    // materialized driver-side.
    "q16_supplier_relationship" -> { (s, dir) =>
      val excluded = Tables.supplier(s, dir)
        .filter(col("s_name").like("%7")).select(col("s_suppkey"))
      val parts = Tables.part(s, dir)
        .filter(col("p_brand") =!= "Brand#1" &&
          col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    },

    // TPC-H Q19-style disjunctive brand/size/quantity predicate: an
    // OR-of-conjunctions spanning fact AND dim columns. The per-brand
    // grouping keeps the hash check meaningful (Q19's single global row
    // is too weak); the quantity bounds shared across branches
    // (1 ≤ qty ≤ 30) are implied conjuncts Catalyst can push to the fact
    // scan before the broadcast join evaluates the residual disjunction.
    "q19_disjunctive_revenue" -> { (s, dir) =>
      val pdim = Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      Tables.lineitem(s, dir)
        .join(broadcast(pdim), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#11" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#21" && col("p_size").between(1, 35) &&
            col("l_quantity").between(20, 30)))
        .groupBy(col("p_brand"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
          count(lit(1)).as("n_lines"))
    }
  )

  def oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_revenue_join" ->
      """SELECT o_orderkey,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q5_local_supplier" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01'
        |GROUP BY n_name""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300)
        |SELECT c_name, c_custkey, o_orderkey, o_totalprice, sum_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q17_small_quantity" ->
      """WITH th AS (SELECT l_partkey,
        |    round(0.2 * avg(l_quantity), 6) AS qty_threshold
        |  FROM lineitem GROUP BY 1)
        |SELECT p_brand,
        |  round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem l JOIN th USING (l_partkey)
        |JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        |  AND l.l_quantity < th.qty_threshold
        |GROUP BY 1""".stripMargin,

    "q21_suppliers_kept_waiting" ->
      """WITH late AS (
        |  SELECT l.l_orderkey, l.l_suppkey
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderstatus = 'F'
        |    AND date_diff('day', CAST(o.o_orderdate AS DATE),
        |                  CAST(l.l_shipdate AS DATE)) > 30)
        |SELECT s_name, count(*) AS numwait
        |FROM late l1
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,

    "q2_min_cost_supplier" ->
      """WITH supply AS (
        |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
        |         round(min(l_extendedprice / l_quantity), 6) AS cost
        |  FROM lineitem GROUP BY 1, 2),
        |eu AS (
        |  SELECT sp.partkey, sp.cost, s.s_acctbal, s.s_name, n.n_name
        |  FROM supply sp JOIN supplier s ON sp.suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  WHERE r.r_name = 'EUROPE')
        |SELECT e.s_acctbal, e.s_name, e.n_name, e.partkey AS p_partkey, e.cost
        |FROM eu e JOIN part p ON e.partkey = p.p_partkey
        |WHERE p.p_size <= 15 AND p.p_type = 'LARGE'
        |  AND e.cost = (SELECT min(e2.cost) FROM eu e2
        |                WHERE e2.partkey = e.partkey)
        |ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "q4_priority_check" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND date_diff('day', CAST(o.o_orderdate AS DATE),
        |                    CAST(l.l_shipdate AS DATE)) > 60)
        |GROUP BY 1""".stripMargin,

    "q11_important_parts" ->
      """WITH pv AS (SELECT l_partkey,
        |    round(sum(l_extendedprice * l_quantity), 2) AS value
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT round(sum(value) * 0.0005, 4) AS th FROM pv)
        |SELECT l_partkey, value FROM pv, tot WHERE value > th""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
        |    round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_revenue >=
        |  (SELECT round(max(total_revenue) * 0.9, 6) FROM rev)""".stripMargin,

    "q20_excess_suppliers" ->
      """WITH supply AS (
        |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
        |  FROM lineitem GROUP BY 1, 2),
        |demand AS (
        |  SELECT l_partkey, 0.5 * sum(l_quantity) AS th
        |  FROM lineitem
        |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |  GROUP BY 1),
        |excess AS (
        |  SELECT sp.l_suppkey FROM supply sp
        |  JOIN demand d USING (l_partkey)
        |  WHERE sp.qty > d.th
        |    AND EXISTS (SELECT 1 FROM part p
        |      WHERE p.p_partkey = sp.l_partkey AND p.p_type = 'PROMO'))
        |SELECT s_suppkey, s_name FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND EXISTS (SELECT 1 FROM excess e WHERE e.l_suppkey = s_suppkey)""".stripMargin,

    "q7_nation_volume" ->
      """SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
        |  CAST(year(CAST(l_shipdate AS DATE)) AS INTEGER) AS l_year,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        |GROUP BY 1, 2, 3""".stripMargin,

    "q13_order_count_distribution" ->
      """WITH cc AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS custdist FROM cc GROUP BY 1""".stripMargin,

    "q22_idle_customers" ->
      """WITH avg_bal AS (SELECT round(avg(c_acctbal), 6) AS a
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_mktsegment AS segment, count(*) AS numcust,
        |  round(sum(c_acctbal), 2) AS totacctbal
        |FROM customer, avg_bal
        |WHERE c_acctbal > a
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY 1""".stripMargin,

    "q8_market_share" ->
      """WITH vols AS (
        |  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS o_year,
        |    l_extendedprice * (1.0 - l_discount) AS vol,
        |    n2.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'LARGE'
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey),
        |agg AS (
        |  SELECT o_year,
        |    round(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE 0.0 END), 2)
        |      AS nation_vol,
        |    round(sum(vol), 2) AS total_vol
        |  FROM vols GROUP BY 1)
        |SELECT o_year, nation_vol, total_vol,
        |  round(nation_vol / total_vol, 6) AS mkt_share
        |FROM agg""".stripMargin,

    "q9_product_profit" ->
      """SELECT n_name AS supp_nation,
        |  CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS o_year,
        |  round(sum(l_extendedprice * (1.0 - l_discount)
        |            - 0.6 * p_retailprice * l_quantity), 2) AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1996-07-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q12_ship_lag_priority" ->
      """SELECT CASE
        |    WHEN date_diff('day', CAST(o_orderdate AS DATE),
        |                   CAST(l_shipdate AS DATE)) > 90 THEN 'SLOW'
        |    WHEN date_diff('day', CAST(o_orderdate AS DATE),
        |                   CAST(l_shipdate AS DATE)) > 30 THEN 'MEDIUM'
        |    ELSE 'FAST' END AS lag_class,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,

    "q14_promo_share" ->
      """WITH agg AS (
        |  SELECT CAST(month(CAST(l_shipdate AS DATE)) AS INTEGER) AS ship_month,
        |    round(sum(CASE WHEN p_type = 'PROMO'
        |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END), 2)
        |      AS promo_rev,
        |    round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |  GROUP BY 1)
        |SELECT ship_month, promo_rev, total_rev,
        |  round(100.0 * promo_rev / total_rev, 4) AS promo_share
        |FROM agg""".stripMargin,

    "q16_supplier_relationship" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
        |GROUP BY 1, 2, 3""".stripMargin,

    "q19_disjunctive_revenue" ->
      """SELECT p_brand,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity BETWEEN 20 AND 30)
        |GROUP BY 1""".stripMargin
  )
}
