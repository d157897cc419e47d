package graft.queries

import graft.core.Tables.table
import graft.functions.Distances
import graft.operators.NeighborJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface (SURVEY §2.1-§2.6) exercised on the driver
  * testdata, each with a DuckDB oracle. Aggregated doubles are rounded in
  * BOTH engines so IEEE summation-order differences can't flip the hash.
  *
  * Every query ends with a deterministic ORDER BY and aliases every computed
  * column identically in Spark and SQL (driver compares by column name).
  */
object BaseQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1/A1/A4: scan → filter → grouped agg (partial agg map-side for free).
    "q1_agg" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // P1/P2: selective filter + projection, pushed to the parquet scan.
    "q6_filter" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1996-01-01").cast("timestamp")
          && col("l_discount").between(0.03, 0.07)
          && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
    }),

    // J: two broadcast hash joins (dims are tiny at any SF) + agg.
    "q2_join" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val n = broadcast(table(s, dir, "nation"))
      val r = broadcast(table(s, dir, "region"))
      c.join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_customers"),
          round(avg("c_acctbal"), 2).as("avg_acctbal"))
        .orderBy("r_name")
    }),

    // O1: group-wise top-k via window (k-means keep_pts/popup split shape,
    // SURVEY §2.5). Deterministic tiebreak on the key.
    "q3_topk" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      table(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_orderpriority", "rn")
    }),

    // Anti join: orders with no high-quantity line.
    "q4_anti" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val l = table(s, dir, "lineitem").where(col("l_quantity") >= 45)
      o.join(l, col("o_orderkey") === col("l_orderkey"), "left_anti")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    }),

    // U1: bag-semantics union (reference noise ∪ clusters, DBSCAN.py:204).
    "q5_union" -> ((s, dir) => {
      val c = table(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val sp = table(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      c.unionAll(sp).groupBy("nationkey")
        .agg(count(lit(1)).as("n")).orderBy("nationkey")
    }),

    // Semi join: orders having a big-quantity line.
    "q7_semi" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val l = table(s, dir, "lineitem").where(col("l_quantity") >= 50)
      o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus")
    }),

    // Rollup (hierarchical grouping sets — beyond-reference relational op).
    "q8_rollup" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // Set difference: small parts that are not premium-priced.
    "q9_except" -> ((s, dir) => {
      val p = table(s, dir, "part")
      p.where(col("p_size") <= 10).select("p_partkey")
        .except(p.where(col("p_retailprice") > 1500).select("p_partkey"))
        .orderBy("p_partkey")
    }),

    // Frame window: per-supplier running revenue over ship dates.
    "q10_running" -> ((s, dir) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, dir, "lineitem")
        .where(col("l_suppkey") <= 5)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          round(sum(col("l_extendedprice")).over(w), 2).as("running_rev"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    }),

    // TPC-H Q5 shape — the heaviest classic relational pattern: two fact
    // tables (lineitem, orders) shuffle-joined on their keys, three
    // dimensions broadcast, the local-supplier condition (c_nationkey =
    // s_nationkey) riding the supplier equi-join, a date-range filter
    // pushed to the orders scan, and revenue integerized to
    // cents·(100−disc%) BEFORE the sum so the aggregate is exact across
    // engines and summation orders.
    "q11_region_revenue" -> ((s, dir) => {
      val li = table(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_suppkey"),
        (floor(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - floor(col("l_discount") * 100).cast("long")))
          .as("rev"))
      val o = table(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val c = table(s, dir, "customer").select("c_custkey", "c_nationkey")
      val sup = table(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val n = broadcast(table(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey"))
      val r = broadcast(table(s, dir, "region")
        .where(col("r_name") === "ASIA").select("r_regionkey"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_items"),
          sum("rev").cast("long").as("revenue_c2"))
        .orderBy(col("revenue_c2").desc, col("n_name"))
    }),

    // TPC-H Q17 shape — the correlated aggregate subquery, decorrelated:
    // "line items under 20% of their part's average quantity". The
    // per-part average becomes a keyed aggregate joined back to the fact
    // table on the SAME key: at gate SF the agg side broadcasts (the
    // fact scan never shuffles — one exchange total, the agg's own);
    // past the broadcast threshold it becomes a sort-merge join where
    // both sides hash-partition on l_partkey, the co-located layout a
    // bucketed table serves for free. The 0.2·avg threshold is compared
    // in exact integers (qty·5·cnt < Σqty in centi-units), so no float
    // ever decides membership.
    "q12_small_qty" -> ((s, dir) => {
      val li = table(s, dir, "lineitem").select(col("l_partkey"),
        floor(col("l_quantity") * 100).cast("long").as("q_c"),
        floor(col("l_extendedprice") * 100).cast("long").as("price_c"))
      val avgq = li.groupBy("l_partkey")
        .agg(sum("q_c").as("sum_qc"), count(lit(1)).as("cnt"))
      li.join(avgq, "l_partkey")
        .where(col("q_c") * 5 * col("cnt") < col("sum_qc"))
        .agg(count(lit(1)).as("n_items"),
          sum("price_c").cast("long").as("revenue_c"))
    }),

    // TPC-H Q13 shape — the count-of-counts distribution: orders per
    // customer through a LEFT join (zero-order customers kept), then the
    // histogram of those counts. Both aggregations are keyed and
    // map-side combined; the second one's key domain is the count range,
    // so the plan is two exchanges at any scale. count(o_custkey)
    // counts non-null rows only — the left-join null row of an
    // orderless customer contributes 0, exactly TPC-H's semantics.
    "q13_order_dist" -> ((s, dir) => {
      val c = table(s, dir, "customer").select("c_custkey")
      val o = table(s, dir, "orders").select("o_custkey")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_custkey")).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q14 shape — conditional aggregation over a fact⋈dim join:
    // promo revenue share in one shipdate quarter. Revenue is integerized
    // to cents·(100−disc%) BEFORE both sums, so the only float in the
    // gate is ONE division of two exact longs — bit-equal in any engine
    // and any summation order. part rides a keyed equi-join that AQE
    // broadcasts at gate SF; past the threshold both sides hash-partition
    // on partkey.
    "q14_promo" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("l_partkey"),
          (floor(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - floor(col("l_discount") * 100).cast("long")))
            .as("rev"))
      val p = table(s, dir, "part").select("p_partkey", "p_type")
      li.join(p, col("l_partkey") === col("p_partkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(when(col("p_type") === "PROMO", col("rev")).otherwise(0L))
            .cast("long").as("promo_c2"),
          sum("rev").cast("long").as("total_c2"))
        .select(col("n_items"), col("promo_c2"), col("total_c2"),
          round(col("promo_c2").cast("double") /
            col("total_c2").cast("double"), 6).as("promo_share"))
    }),

    // TPC-H Q15 shape — the top-revenue-supplier scalar subquery: keyed
    // revenue aggregate, global max as a 1-row broadcast, equality join
    // back on the EXACT long revenue (no float ever decides the argmax).
    // The aggregate is map-side combined; the max is O(1) driver state.
    "q15_topsupp" -> ((s, dir) => {
      val rev = table(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-07-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(sum(floor(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - floor(col("l_discount") * 100).cast("long")))
          .cast("long").as("total_rev_c2"))
      val mx = rev.agg(max("total_rev_c2").as("mx"))
      table(s, dir, "supplier")
        .join(rev, col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(mx), col("total_rev_c2") === col("mx"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev_c2"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q18 shape — large-volume orders: per-order quantity sum in
    // exact centi-units with HAVING, joined back to orders + customer.
    // The HAVING aggregate and both joins are keyed on orderkey/custkey;
    // the survivor set is tiny at any SF, so the join-back broadcasts.
    "q18_large" -> ((s, dir) => {
      val big = table(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(floor(col("l_quantity") * 100).cast("long"))
          .cast("long").as("sum_qty_c"))
        .where(col("sum_qty_c") > 25000L)
      table(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(table(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_totalprice"), col("sum_qty_c"))
        .orderBy(col("sum_qty_c").desc, col("o_orderkey"))
    }),

    // TPC-H Q19 shape — disjunctive multi-attribute predicates across a
    // join: three (brand, size-range, quantity-range) arms OR-ed
    // together. Catalyst pushes the per-side conjuncts of the common
    // envelope to both scans; the residual disjunction evaluates inside
    // whole-stage codegen after the keyed join.
    "q19_disjunct" -> ((s, dir) => {
      val li = table(s, dir, "lineitem").select(col("l_partkey"),
        col("l_quantity"),
        (floor(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - floor(col("l_discount") * 100).cast("long")))
          .as("rev"))
      val p = table(s, dir, "part").select("p_partkey", "p_brand", "p_size")
      val arm1 = col("p_brand") === "Brand#12" &&
        col("p_size").between(1, 5) && col("l_quantity").between(1, 11)
      val arm2 = col("p_brand") === "Brand#23" &&
        col("p_size").between(1, 10) && col("l_quantity").between(10, 20)
      val arm3 = col("p_brand") === "Brand#3" &&
        col("p_size").between(1, 15) && col("l_quantity").between(20, 30)
      li.join(p, col("l_partkey") === col("p_partkey"))
        .where(arm1 || arm2 || arm3)
        .agg(count(lit(1)).as("n_items"),
          sum("rev").cast("long").as("revenue_c2"))
    }),

    // TPC-H Q22 shape adapted to the testdata (every customer has
    // orders): above-average-balance, low-activity customers per nation.
    // The "above average" threshold is the classic float trap — avg's
    // partial-combine order differs between engines — so membership is
    // decided by exact integer cross-multiplication instead:
    // bal_c · n > Σbal_c over positive balances. The global (Σ, n) pair
    // is a 1-row broadcast; the order-count side is one keyed left join.
    "q22_balance" -> ((s, dir) => {
      val c = table(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          floor(col("c_acctbal") * 100).cast("long").as("bal_c"))
      val pos = c.where(col("bal_c") > 0)
        .agg(sum("bal_c").as("s"), count(lit(1)).as("n"))
      val nOrd = table(s, dir, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_ord"))
      c.join(nOrd, col("c_custkey") === col("o_custkey"), "left")
        .crossJoin(broadcast(pos))
        .where(col("bal_c") * col("n") > col("s") &&
          coalesce(col("n_ord"), lit(0L)) <= 5)
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"),
          sum("bal_c").cast("long").as("sum_bal_c"))
        .orderBy("c_nationkey")
    }),

    // TPC-H Q16 shape — count-distinct over a join with a NOT-IN
    // exclusion subquery, decorrelated to a broadcast anti-join:
    // distinct suppliers per (brand, size) for mid-size non-Brand#45
    // parts, excluding negative-balance suppliers. countDistinct is
    // two-phase (partial dedup on (brand, size, suppkey) map-side);
    // the exclusion list is a small filtered dimension — broadcast at
    // any SF — and the part join is keyed on partkey.
    "q16_suppcnt" -> ((s, dir) => {
      val bad = table(s, dir, "supplier").where(col("s_acctbal") < 0)
        .select(col("s_suppkey").as("bad_key"))
      val p = table(s, dir, "part")
        .where(col("p_size").between(1, 15) && col("p_brand") =!= "Brand#45")
        .select("p_partkey", "p_brand", "p_size")
      table(s, dir, "lineitem").select("l_partkey", "l_suppkey")
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(broadcast(bad), col("l_suppkey") === col("bad_key"), "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
    }),

    // TPC-H Q20 shape — the nested-IN-subquery chain, decorrelated:
    // suppliers who shipped MORE THAN HALF of some promo part's total
    // 1996 volume. Both quantity aggregates are keyed on partkey (the
    // per-(part, supplier) one reuses the same hash partitioning), the
    // promo filter rides a semi-join, and the >50% threshold compares
    // exact centi-unit longs (ps_q·2 > p_q) so no float ever decides
    // membership. The final supplier lookup is a keyed semi-join.
    "q20_excess" -> ((s, dir) => {
      val li96 = table(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_partkey"), col("l_suppkey"),
          floor(col("l_quantity") * 100).cast("long").as("q_c"))
      val perPS = li96.groupBy("l_partkey", "l_suppkey")
        .agg(sum("q_c").cast("long").as("ps_q"))
      val perP = li96.groupBy("l_partkey")
        .agg(sum("q_c").cast("long").as("p_q"))
      val promo = table(s, dir, "part").where(col("p_type") === "PROMO")
        .select("p_partkey")
      val excess = perPS.join(perP, "l_partkey")
        .join(promo, col("l_partkey") === col("p_partkey"), "left_semi")
        .where(col("ps_q") * 2 > col("p_q"))
        .select("l_suppkey").distinct()
      table(s, dir, "supplier")
        .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    }),

    // Bucketed co-located join — the 100 TB join strategy made concrete:
    // both fact tables are written ONCE per (session, dir) bucketed by
    // the join key into the same bucket count, so the join consumes the
    // bucket layout and plans with NO exchange on either input (the only
    // shuffle left is the final 5-key aggregate) — at corpus scale this
    // is the difference between re-shuffling 100 TB per join and reading
    // co-located buckets. PlanHygieneSpec asserts the exchange-free join
    // shape; the oracle recomputes the aggregate from the raw tables, so
    // the bucketed write→read round-trip is value-checked end to end.
    "bucket_join" -> ((s, dir) => {
      val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val liT = s"graft_li_bkt$tag"
      val odT = s"graft_od_bkt$tag"
      graft.core.QueryCache.shared("base.bucketTables", s, dir) {
        val tmp = java.nio.file.Files.createTempDirectory("graft_bkt_")
          .toString
        def write(df: DataFrame, name: String, key: String): Unit = {
          s.sql(s"DROP TABLE IF EXISTS $name")
          df.write.format("parquet")
            .bucketBy(8, key).sortBy(key)
            .option("path", s"$tmp/$name")
            .mode("overwrite")
            .saveAsTable(name)
        }
        write(table(s, dir, "lineitem").select(col("l_orderkey"),
          floor(col("l_extendedprice") * 100).cast("long").as("price_c")),
          liT, "l_orderkey")
        write(table(s, dir, "orders").select(col("o_orderkey"),
          col("o_orderpriority")), odT, "o_orderkey")
        java.lang.Boolean.TRUE
      }
      s.table(liT)
        .join(s.table(odT), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum("price_c").cast("long").as("revenue_c"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q17 shape — the correlated scalar-average subquery,
    // decorrelated: revenue of the brand's small-quantity lines, where
    // "small" means below 20% of that part's own average quantity. The
    // per-part (Σqty, n) aggregate is keyed on partkey and joins back
    // BROADCAST (post-brand-filter part count is dimension-sized at any
    // corpus scale); the threshold comparison is the integer-exact
    // cross-multiplication 5·q·n < Σqty, so no float ratio ever decides
    // membership — the only float is the final avg_yearly division over
    // exact cent totals, one IEEE expression both engines replay.
    "q17_smallqty" -> ((s, dir) => {
      val pk = table(s, dir, "part").where(col("p_brand") === "Brand#23")
        .select("p_partkey")
      val li = table(s, dir, "lineitem")
        .join(broadcast(pk), col("l_partkey") === col("p_partkey"),
          "left_semi")
        .select(col("l_partkey"),
          col("l_quantity").cast("long").as("q"),
          floor(col("l_extendedprice") * 100).cast("long").as("price_c"))
      val perPart = li.groupBy("l_partkey")
        .agg(sum("q").as("sq"), count(lit(1)).as("n"))
      li.join(broadcast(perPart), "l_partkey")
        .where(col("q") * 5 * col("n") < col("sq"))
        .agg(count(lit(1)).as("n_small"),
          sum("price_c").cast("long").as("revenue_c"))
        .select(col("n_small"), col("revenue_c"),
          round(col("revenue_c") / 100.0 / 7.0, 2).as("avg_yearly"))
    }),

    // TPC-H Q21 shape — EXISTS + NOT EXISTS self-joins on the fact
    // table: count, per supplier, the returned lines in multi-supplier
    // orders where NO other supplier's line was also returned (the
    // "only one to blame" pattern). Both the semi- and the anti-join
    // key on orderkey with a residual suppkey inequality — per-order
    // fanout is bounded by lines-per-order, so the plan scales with
    // the fact table, never quadratically.
    "q21_waiting" -> ((s, dir) => {
      val l1 = table(s, dir, "lineitem")
        .where(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("okey"), col("l_suppkey").as("skey"),
          col("l_linenumber").as("lnum"))
      val others = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
        .distinct()
      val othersReturned = l1.select(col("okey").as("o3"), col("skey").as("s3"))
        .distinct()
      l1.join(others, col("okey") === col("o2") && col("skey") =!= col("s2"),
          "left_semi")
        .join(othersReturned,
          col("okey") === col("o3") && col("skey") =!= col("s3"), "left_anti")
        .groupBy(col("skey"))
        .agg(count(lit(1)).as("numwait"))
        .join(table(s, dir, "supplier"), col("skey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
    }),

    // J1 (the reference's one join, made scalable): grid-blocked ε-neighborhood
    // self-join on (p_size, p_retailprice) points, exact L1 predicate — the
    // DuckDB oracle is the reference-faithful cartesian θ-join.
    "eps_neighbors" -> ((s, dir) => {
      val pts = table(s, dir, "part")
        .select(col("p_partkey"),
          Distances.pack(col("p_size"), col("p_retailprice")).as("pt"))
      NeighborJoin.neighborCounts(pts, "p_partkey", "pt", eps = 5.0)
        .orderBy("p_partkey")
    }),

    // P3: DBSCAN core-point predicate (|N_eps(p)| >= minPts).
    "core_points" -> ((s, dir) => {
      val pts = table(s, dir, "part")
        .select(col("p_partkey"),
          Distances.pack(col("p_size"), col("p_retailprice")).as("pt"))
      NeighborJoin.neighborCounts(pts, "p_partkey", "pt", eps = 5.0)
        .where(col("n_neighbors") >= 10)
        .orderBy("p_partkey")
    }),

    // Z-order clustering key (ZOrder.zkey2): the Morton interleave of
    // (l_partkey, l_suppkey) that the layout pass sorts by, checked
    // value-exactly per 2^12-wide bucket — one codegen'd bit expression,
    // one map-side-combined groupBy; the disk layout built on this key
    // (writeZOrdered) is asserted separately in ZOrderSpec.
    "zorder_key" -> ((s, dir) => {
      val z = graft.operators.ZOrder
        .zkey2(col("l_partkey"), col("l_suppkey"), bits = 16)
      table(s, dir, "lineitem")
        .select(z.as("z"))
        .groupBy(shiftright(col("z"), 12).as("zbucket"))
        .agg(count(lit(1)).as("n_rows"), sum("z").as("sum_z"),
          min("z").as("min_z"), max("z").as("max_z"))
        .orderBy("zbucket")
    }),

    // Hilbert-curve clustering key (ZOrder.hkey2): the layout key that
    // dominates the Morton key for zone-map locality — consecutive keys
    // are always grid neighbors, so both dimensions' min-max spans stay
    // narrow in every bucket. One codegen'd static-call term (the whole
    // quadrant-rotation loop), one map-side-combined groupBy; min_x/max_x
    // surface the per-bucket partkey span the zone maps would record.
    "hilbert_key" -> ((s, dir) => {
      val h = graft.operators.ZOrder
        .hkey2(col("l_partkey"), col("l_suppkey"), bits = 16)
      table(s, dir, "lineitem")
        .select(h.as("h"),
          col("l_partkey").cast("long").bitwiseAND(lit(65535L)).as("x0"))
        .groupBy(shiftright(col("h"), 12).as("hbucket"))
        .agg(count(lit(1)).as("n_rows"), sum("h").as("sum_h"),
          min("h").as("min_h"), max("h").as("max_h"),
          min("x0").as("min_x"), max("x0").as("max_x"))
        .orderBy("hbucket")
    }),

    // Zone-map skipping report: how many file-sized zones a point
    // predicate on l_partkey can PRUNE under (a) the Z-ordered layout
    // (zones = zkey buckets, what writeZOrdered produces) versus (b)
    // natural insertion order (zones = orderkey ranges) — the
    // min/max-statistics audit that justifies paying for clustering
    // before a 100 TB rewrite. Zone maps are metadata-scale aggregates
    // (map-side-combined groupBys over ≤4096 keys); the probe set
    // cross-joins the broadcast zone tables, so the report costs two
    // scans regardless of probe count. All counts and ppm rates are
    // exact integers.
    "skip_stats" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_orderkey")
      val zb = shiftright(graft.operators.ZOrder
        .zkey2(col("l_partkey"), col("l_suppkey"), bits = 16), 12)
      val zonesZ = li.groupBy(zb.as("zone"))
        .agg(min("l_partkey").as("mn"), max("l_partkey").as("mx"))
      val zonesN = li.groupBy(expr("l_orderkey div 64").as("zone"))
        .agg(min("l_partkey").as("mn"), max("l_partkey").as("mx"))
      val probes = s.range(1, 9).select((col("id") * 100).as("p"))
      def skipRate(zones: DataFrame, tag: String): DataFrame =
        probes.crossJoin(broadcast(zones))
          .groupBy("p")
          .agg(count(lit(1)).as(s"n_zones_$tag"),
            sum((col("p") < col("mn") || col("p") > col("mx"))
              .cast("long")).as(s"n_skip_$tag"))
          .withColumn(s"skip_${tag}_ppm",
            expr(s"(1000000 * n_skip_$tag) div n_zones_$tag"))
      skipRate(zonesZ, "z").join(skipRate(zonesN, "nat"), "p")
        .orderBy("p")
    }),

    // EXACT grouped quantiles (the approx_quantile gate's ground truth
    // sibling), routed through Quantiles.grouped — the guard that makes
    // `percentile`'s value→count map agg safe at scale: it HLL-counts the
    // domain first and falls back to the approx_percentile sketch when
    // the domain is unbounded (QuantilesSpec pins both routes).
    // l_quantity ∈ 1..50, so this gate takes the exact path and a 100 TB
    // fact table costs one map-side-combined shuffle of ≤|domain|
    // entries per group, NOT a sort. Determinism: integer values and
    // dyadic fractions (.25/.5/.75) make the lower+(upper−lower)·frac
    // interpolation IEEE-exact in both engines; 6dp rounding is belt and
    // braces.
    "group_quantiles" -> ((s, dir) => {
      val gq = graft.operators.Quantiles.grouped(table(s, dir, "lineitem"),
        "l_returnflag", "l_quantity", Seq(0.25, 0.5, 0.75),
        withCount = true)
      gq.result
        .select(col("l_returnflag"), col("n"),
          round(col("q0"), 6).as("q25"), round(col("q1"), 6).as("q50"),
          round(col("q2"), 6).as("q75"))
        .orderBy("l_returnflag")
    }),

    // Equi-depth histogram done the SCALE-SAFE way: exact quartile
    // boundaries per group (one value→count map aggregate), broadcast
    // back, and every row buckets by three comparisons — fully parallel
    // at any group size. The ntile window that "obviously" computes this
    // funnels each group's ENTIRE partition through one sorting task —
    // the same single-task trap bm25TopK once had. Strict > comparisons
    // against dyadic-interpolated boundaries are IEEE-exact on integer
    // values, so bucket membership can't flip between engines.
    "equidepth_hist" -> ((s, dir) => {
      val li = table(s, dir, "lineitem").select("l_returnflag", "l_quantity")
      val b = li.groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.25)").as("b1"),
          expr("percentile(l_quantity, 0.5)").as("b2"),
          expr("percentile(l_quantity, 0.75)").as("b3"))
      val bucket = (col("l_quantity") > col("b1")).cast("int") +
        (col("l_quantity") > col("b2")).cast("int") +
        (col("l_quantity") > col("b3")).cast("int")
      li.join(broadcast(b), "l_returnflag")
        .groupBy(col("l_returnflag"), bucket.as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min("l_quantity").as("min_q"), max("l_quantity").as("max_q"))
        .orderBy("l_returnflag", "bucket")
    }))

  val oracleSql: Map[String, String] = Map(
    "group_quantiles" ->
      """SELECT l_returnflag, count(*) AS n,
        | round(quantile_cont(l_quantity, 0.25), 6) AS q25,
        | round(quantile_cont(l_quantity, 0.5), 6) AS q50,
        | round(quantile_cont(l_quantity, 0.75), 6) AS q75
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "equidepth_hist" ->
      """WITH b AS (SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS b1,
        |  quantile_cont(l_quantity, 0.5) AS b2,
        |  quantile_cont(l_quantity, 0.75) AS b3
        | FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag,
        |  CAST(l.l_quantity > b.b1 AS INT) + CAST(l.l_quantity > b.b2 AS INT)
        |    + CAST(l.l_quantity > b.b3 AS INT) AS bucket,
        |  count(*) AS n_rows, min(l.l_quantity) AS min_q,
        |  max(l.l_quantity) AS max_q
        |FROM lineitem l JOIN b USING (l_returnflag)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 4) AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q6_filter" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q2_join" ->
      """SELECT r_name, count(*) AS n_customers,
        | round(avg(c_acctbal), 2) AS avg_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q3_topk" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
        | SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) WHERE rn <= 3
        |ORDER BY o_orderpriority, rn""".stripMargin,
    "q4_anti" ->
      """SELECT o_orderpriority, count(*) AS n_orders FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q5_union" ->
      """SELECT nationkey, count(*) AS n FROM (
        | SELECT c_nationkey AS nationkey FROM customer
        | UNION ALL SELECT s_nationkey AS nationkey FROM supplier)
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin,
    "q7_semi" ->
      """SELECT o_orderstatus, count(*) AS n_orders FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity >= 50)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q8_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q9_except" ->
      """SELECT p_partkey FROM part WHERE p_size <= 10
        |EXCEPT SELECT p_partkey FROM part WHERE p_retailprice > 1500
        |ORDER BY p_partkey""".stripMargin,
    "q11_region_revenue" ->
      """SELECT n_name, count(*) AS n_items,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(floor(l_discount * 100) AS BIGINT))) AS BIGINT)
        |    AS revenue_c2
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY n_name ORDER BY revenue_c2 DESC, n_name""".stripMargin,
    "q12_small_qty" ->
      """WITH li AS (SELECT l_partkey,
        |    CAST(floor(l_quantity * 100) AS BIGINT) AS q_c,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_c
        |  FROM lineitem),
        |a AS (SELECT l_partkey, CAST(sum(q_c) AS BIGINT) AS sum_qc,
        |    CAST(count(*) AS BIGINT) AS cnt FROM li GROUP BY l_partkey)
        |SELECT CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(li.price_c) AS BIGINT) AS revenue_c
        |FROM li JOIN a USING (l_partkey)
        |WHERE li.q_c * 5 * a.cnt < a.sum_qc""".stripMargin,
    "q13_order_dist" ->
      """WITH cc AS (SELECT c.c_custkey,
        |    CAST(count(o.o_custkey) AS BIGINT) AS c_count
        |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY c.c_custkey)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM cc GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q10_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  round(sum(l_extendedprice) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS UNBOUNDED PRECEDING), 2) AS running_rev
        |FROM lineitem WHERE l_suppkey <= 5
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "eps_neighbors" ->
      """SELECT a.p_partkey AS p_partkey, count(*) AS n_neighbors
        |FROM part a, part b
        |WHERE abs(CAST(a.p_size AS DOUBLE) - CAST(b.p_size AS DOUBLE))
        |    + abs(a.p_retailprice - b.p_retailprice) < 5.0
        |GROUP BY a.p_partkey ORDER BY p_partkey""".stripMargin,
    "core_points" ->
      """SELECT a.p_partkey AS p_partkey, count(*) AS n_neighbors
        |FROM part a, part b
        |WHERE abs(CAST(a.p_size AS DOUBLE) - CAST(b.p_size AS DOUBLE))
        |    + abs(a.p_retailprice - b.p_retailprice) < 5.0
        |GROUP BY a.p_partkey HAVING count(*) >= 10
        |ORDER BY p_partkey""".stripMargin,
    "q14_promo" ->
      """WITH j AS (SELECT p_type,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(floor(l_discount * 100) AS BIGINT)) AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01')
        |SELECT count(*) AS n_items,
        |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)
        |    AS BIGINT) AS promo_c2,
        |  CAST(sum(rev) AS BIGINT) AS total_c2,
        |  round(CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)
        |      AS DOUBLE) / CAST(sum(rev) AS DOUBLE), 6) AS promo_share
        |FROM j""".stripMargin,
    "q15_topsupp" ->
      """WITH r AS (SELECT l_suppkey,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(floor(l_discount * 100) AS BIGINT)))
        |      AS BIGINT) AS total_rev_c2
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-07-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_rev_c2
        |FROM supplier JOIN r ON s_suppkey = l_suppkey
        |WHERE total_rev_c2 = (SELECT max(total_rev_c2) FROM r)
        |ORDER BY s_suppkey""".stripMargin,
    "q18_large" ->
      """WITH big AS (SELECT l_orderkey,
        |    CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |      AS sum_qty_c
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(floor(l_quantity * 100) AS BIGINT)) > 25000)
        |SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty_c
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY sum_qty_c DESC, o_orderkey""".stripMargin,
    "q19_disjunct" ->
      """SELECT count(*) AS n_items,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(floor(l_discount * 100) AS BIGINT)))
        |    AS BIGINT) AS revenue_c2
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q22_balance" ->
      """WITH c AS (SELECT c_custkey, c_nationkey,
        |    CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_c
        |  FROM customer),
        |pos AS (SELECT CAST(sum(bal_c) AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS n FROM c WHERE bal_c > 0),
        |oc AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_ord
        |  FROM orders GROUP BY o_custkey)
        |SELECT c_nationkey, count(*) AS n_cust,
        |  CAST(sum(bal_c) AS BIGINT) AS sum_bal_c
        |FROM c LEFT JOIN oc ON c_custkey = o_custkey, pos
        |WHERE bal_c * pos.n > pos.s AND coalesce(n_ord, 0) <= 5
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q16_suppcnt" ->
      """SELECT p_brand, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size BETWEEN 1 AND 15 AND p_brand <> 'Brand#45'
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,
    // the raw-table recomputation — the bucketed write→read round-trip
    // must reproduce it exactly
    "bucket_join" ->
      """SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
        |    AS BIGINT) AS revenue_c
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // written in the classic correlated form — DuckDB decorrelates it
    // itself, so the oracle checks the SEMANTICS, not our plan. The
    // threshold is the same integer cross-multiplication; CAST(DOUBLE AS
    // BIGINT) rounds in DuckDB vs truncates in Spark, exact here because
    // l_quantity is integral by construction
    "q17_smallqty" ->
      """WITH pk AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'),
        |li AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_c
        |  FROM lineitem JOIN pk ON l_partkey = p_partkey),
        |pp AS (SELECT l_partkey, CAST(sum(q) AS BIGINT) AS sq,
        |    count(*) AS n FROM li GROUP BY l_partkey),
        |sm AS (SELECT li.price_c FROM li JOIN pp USING (l_partkey)
        |  WHERE li.q * 5 * pp.n < pp.sq)
        |SELECT CAST(count(*) AS BIGINT) AS n_small,
        |  CAST(sum(price_c) AS BIGINT) AS revenue_c,
        |  round(CAST(sum(price_c) AS BIGINT) / 100.0 / 7.0, 2) AS avg_yearly
        |FROM sm""".stripMargin,
    "q20_excess" ->
      """WITH li AS (SELECT l_partkey, l_suppkey,
        |    CAST(floor(l_quantity * 100) AS BIGINT) AS q_c
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'),
        |ps AS (SELECT l_partkey, l_suppkey,
        |    CAST(sum(q_c) AS BIGINT) AS ps_q FROM li
        |  GROUP BY l_partkey, l_suppkey),
        |p AS (SELECT l_partkey, CAST(sum(q_c) AS BIGINT) AS p_q FROM li
        |  GROUP BY l_partkey)
        |SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT ps.l_suppkey FROM ps JOIN p USING (l_partkey)
        |  WHERE ps.ps_q * 2 > p.p_q
        |    AND ps.l_partkey IN
        |      (SELECT p_partkey FROM part WHERE p_type = 'PROMO'))
        |ORDER BY s_suppkey""".stripMargin,
    "q21_waiting" ->
      """SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM lineitem l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s_suppkey, s_name
        |ORDER BY numwait DESC, s_suppkey""".stripMargin,
    // same shift/mask/or interleave terms, generated from one definition
    "zorder_key" ->
      s"""WITH z AS (SELECT
         |  ${graft.operators.ZOrder.sqlZkey2("l_partkey", "l_suppkey", 16)}
         |    AS z FROM lineitem)
         |SELECT z >> 12 AS zbucket, count(*) AS n_rows,
         |  CAST(sum(z) AS BIGINT) AS sum_z, min(z) AS min_z, max(z) AS max_z
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,
    // same quadrant-rotation walk, unrolled as a recursive CTE carrying
    // every lineitem row through the 16 bit levels (s halves per step;
    // the finished rows are the s = 0 generation)
    "hilbert_key" -> {
      val cte = graft.operators.ZOrder.sqlHilbertCte(
        "h",
        "(SELECT l_partkey, l_suppkey, " +
          "CAST(l_partkey AS BIGINT) & 65535 AS x0 FROM lineitem)",
        "l_partkey", "l_suppkey", bits = 16, carry = Seq("x0"))
      s"""WITH RECURSIVE $cte
         |SELECT d >> 12 AS hbucket, count(*) AS n_rows,
         |  CAST(sum(d) AS BIGINT) AS sum_h, min(d) AS min_h,
         |  max(d) AS max_h, min(x0) AS min_x, max(x0) AS max_x
         |FROM h WHERE s = 0 GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // same two zone maps and probe set; skip = probe outside [mn, mx]
    "skip_stats" ->
      s"""WITH zz AS (SELECT
         |    (${graft.operators.ZOrder.sqlZkey2("l_partkey", "l_suppkey", 16)})
         |      >> 12 AS zone,
         |    min(l_partkey) AS mn, max(l_partkey) AS mx
         |  FROM lineitem GROUP BY 1),
         |zn AS (SELECT l_orderkey // 64 AS zone,
         |    min(l_partkey) AS mn, max(l_partkey) AS mx
         |  FROM lineitem GROUP BY 1),
         |probes AS (SELECT (t.r + 1) * 100 AS p
         |  FROM (SELECT unnest(range(0, 8)) AS r) t),
         |sz AS (SELECT p, CAST(count(*) AS BIGINT) AS n_zones_z,
         |    CAST(sum(CASE WHEN p < mn OR p > mx THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_skip_z
         |  FROM probes, zz GROUP BY p),
         |sn AS (SELECT p, CAST(count(*) AS BIGINT) AS n_zones_nat,
         |    CAST(sum(CASE WHEN p < mn OR p > mx THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_skip_nat
         |  FROM probes, zn GROUP BY p)
         |SELECT sz.p, n_zones_z, n_skip_z,
         |  CAST((1000000 * n_skip_z) // n_zones_z AS BIGINT) AS skip_z_ppm,
         |  n_zones_nat, n_skip_nat,
         |  CAST((1000000 * n_skip_nat) // n_zones_nat AS BIGINT)
         |    AS skip_nat_ppm
         |FROM sz JOIN sn ON sz.p = sn.p ORDER BY sz.p""".stripMargin)
}
