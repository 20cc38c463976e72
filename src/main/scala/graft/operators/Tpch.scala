package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second TPC-H batch (Q4, Q9, Q11, Q12, Q15, Q16, Q17, Q19, Q20, Q21,
  * Q22 shapes), adapted to the generator's reduced schema: no `partsupp`
  * table (lineitem is the part↔supplier link; `p_retailprice` stands in
  * for supply cost), no commit/receipt dates (lateness = shipped >N days
  * after `o_orderdate`), no `l_shipmode`/`c_phone` (`l_returnflag` /
  * `c_mktsegment` are the category stand-ins). The join/agg SHAPE of each
  * query — semi/anti correlation, correlated per-group threshold,
  * fraction-of-total filter, disjunctive bracket pushdown — is the TPC-H
  * one, which is what matters for plan quality at scale.
  *
  * Oracle-parity discipline (see Q scaladoc): money math stays in
  * DECIMAL(12,2) products until one final cast to double; every sort
  * carries a unique key; count sums cast to BIGINT on the DuckDB side.
  *
  * First TPC-H batch (Q1, Q3, Q5, Q6, Q7, Q8, Q10, Q13, Q14, Q18) lives
  * in [[ScaleOps]] / [[Pipeline]].
  */
object Tpch {

  /** Decimal-exact revenue term: extendedprice × (1 − discount). */
  private def rev: Column =
    col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1) - col("l_discount").cast("decimal(12,2)"))

  val defs: Seq[Q] = Seq(

    // TPC-H Q4 (order priority checking), lateness adapted to shipdate:
    // orders in a quarter having ANY lineitem shipped >30 days after the
    // order date. The EXISTS is a LEFT SEMI join — equi on orderkey with
    // the date comparison as a residual condition — so each order is
    // emitted once no matter how many late lines it has, and the probe
    // side never duplicates. The date-range filter pushes to the orders
    // scan before the join.
    Q("q4_priority_late",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= '1996-07-01' AND o.o_orderdate < '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .where(col("o_orderdate") >= "1996-07-01"
          && col("o_orderdate") < "1996-10-01")
        .join(Tables.lineitem(s, d).select("l_orderkey", "l_shipdate"),
          col("o_orderkey") === col("l_orderkey")
            && col("l_shipdate") >
              col("o_orderdate") + expr("INTERVAL 30 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // TPC-H Q9 (product type profit), supply cost adapted to
    // p_retailprice: profit = revenue − retailprice×quantity, summed per
    // (supplier nation, order year) over parts matching a name token.
    // Every dim broadcasts; the 60k-row fact shuffles once for the final
    // (nation × year) aggregate. The DECIMAL spine keeps the mixed-scale
    // subtraction exact on both engines until the single final cast.
    Q("q9_product_profit",
      """SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
        |FROM (
        |  SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
        |    CAST(l.l_extendedprice AS DECIMAL(12,2))
        |      * (1 - CAST(l.l_discount AS DECIMAL(12,2)))
        |    - CAST(p.p_retailprice AS DECIMAL(12,2))
        |      * CAST(l.l_quantity AS DECIMAL(12,2)) AS amount
        |  FROM part p, supplier s, lineitem l, orders o, nation n
        |  WHERE s.s_suppkey = l.l_suppkey AND p.p_partkey = l.l_partkey
        |    AND o.o_orderkey = l.l_orderkey
        |    AND s.s_nationkey = n.n_nationkey
        |    AND p.p_name LIKE '%red%')
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin) { (s, d) =>
      val amount = rev -
        col("p_retailprice").cast("decimal(12,2)") *
          col("l_quantity").cast("decimal(12,2)")
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).where(col("p_name").like("%red%"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(sum(amount).cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // TPC-H Q11 (important stock), partsupp adapted to lineitem revenue:
    // per-part revenue through NATION_1 suppliers, keeping parts whose
    // value exceeds a fraction of the total. Both the per-part and the
    // grand-total aggregates are DECIMAL-exact; the one-row total
    // broadcasts back (scalar-subquery shape), so the fraction filter
    // costs no second pass over the fact.
    Q("q11_important_parts",
      """WITH val AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |        * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS v
        |  FROM lineitem l, supplier s, nation n
        |  WHERE l.l_suppkey = s.s_suppkey
        |    AND s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_1'
        |  GROUP BY l_partkey)
        |SELECT l_partkey, CAST(v AS DOUBLE) AS part_value
        |FROM val
        |WHERE CAST(v AS DOUBLE) >
        |  (SELECT CAST(sum(v) AS DOUBLE) * 0.001 FROM val)
        |ORDER BY part_value DESC, l_partkey""".stripMargin) { (s, d) =>
      val suppN1 = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
            .where(col("n_name") === "NATION_1")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val valPer = Tables.lineitem(s, d)
        .join(broadcast(suppN1), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(rev).as("v"))
      val total = valPer.agg(
        (sum(col("v")).cast("double") * lit(0.001)).as("threshold"))
      valPer.crossJoin(broadcast(total))
        .where(col("v").cast("double") > col("threshold"))
        .select(col("l_partkey"), col("v").cast("double").as("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey"))
    },

    // TPC-H Q12 (shipping modes / priority), l_shipmode adapted to
    // l_returnflag: per flag, how many lines belong to URGENT/HIGH vs
    // other orders in a ship year. One broadcast-joined fact pass, one
    // tiny aggregate; the date filter pushes to the lineitem scan.
    Q("q12_priority_lines",
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders, lineitem
        |WHERE o_orderkey = l_orderkey
        |  AND l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, d)
        .where(col("l_shipdate") >= "1997-01-01"
          && col("l_shipdate") < "1998-01-01")
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_returnflag")
    },

    // TPC-H Q15 (top supplier): quarterly revenue per supplier, keeping
    // the max-revenue supplier(s). The revenue frame is ~|suppliers|
    // rows, so its max broadcasts back as a one-row scalar; equality on
    // doubles is safe because both engines derive them from the SAME
    // exact DECIMAL sums.
    Q("q15_top_supplier",
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |         * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier, revenue
        |WHERE s_suppkey = l_suppkey
        |  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val revenue = Tables.lineitem(s, d)
        .where(col("l_shipdate") >= "1996-01-01"
          && col("l_shipdate") < "1996-04-01")
        .groupBy(col("l_suppkey"))
        .agg(sum(rev).cast("double").as("total_revenue"))
      val top = revenue.agg(max(col("total_revenue")).as("max_rev"))
      revenue.crossJoin(broadcast(top))
        .where(col("total_revenue") === col("max_rev"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    },

    // TPC-H Q16 (part/supplier relationship counts), partsupp adapted to
    // the lineitem link: distinct suppliers per (brand, type, size) class
    // over a size IN-list. The part filters push to the dim scan before
    // the broadcast; count(DISTINCT) shuffles once on the group keys with
    // a partial distinct under AQE.
    Q("q16_part_supplier_cnt",
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey
        |  AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) {
      (s, d) =>
      Tables.lineitem(s, d).select("l_partkey", "l_suppkey")
        .join(broadcast(Tables.part(s, d)
            .where(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO"
              && col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },

    // TPC-H Q17 (small-quantity-order revenue): lineitems of one brand
    // whose quantity is below 20% of that part's corpus-wide average.
    // The correlated per-part threshold becomes a part-keyed aggregate
    // (one row per part) broadcast back to the fact — the classic
    // decorrelation; no row pays more than one hash probe. avg() of
    // integral-valued doubles is order-insensitive (exact sums), so the
    // 0.2× threshold is bit-identical on both engines.
    Q("q17_small_qty_revenue",
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
        |            AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
        |  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = p_partkey)""".stripMargin) {
      (s, d) =>
      val thresholds = Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("t_partkey"))
        .agg((lit(0.2) * avg(col("l_quantity"))).as("qty_lim"))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
            .where(col("p_brand") === "Brand#23")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(thresholds), col("l_partkey") === col("t_partkey"))
        .where(col("l_quantity") < col("qty_lim"))
        .agg((sum(col("l_extendedprice").cast("decimal(12,2)"))
          .cast("double") / 7.0).as("avg_yearly"))
    },

    // TPC-H Q19 (discounted revenue, disjunctive brackets): three
    // brand/size/quantity OR-arms over the part join. The part-side
    // conjuncts of each arm stay on the broadcast dim; quantity bounds
    // that hold across ALL arms (1..30) push to the fact scan, so the
    // scan prunes before the join even though the full predicate is
    // disjunctive.
    Q("q19_bracket_revenue",
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |         * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
        |         AS revenue
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey AND (
        |     (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |      AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
        |      AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |      AND l_quantity BETWEEN 20 AND 30))""".stripMargin) { (s, d) =>
      val arm1 = col("p_brand") === "Brand#12" &&
        col("p_size").between(1, 5) && col("l_quantity").between(1, 11)
      val arm2 = col("p_brand") === "Brand#2" &&
        col("p_size").between(1, 10) && col("l_quantity").between(10, 20)
      val arm3 = col("p_brand") === "Brand#3" &&
        col("p_size").between(1, 15) && col("l_quantity").between(20, 30)
      Tables.lineitem(s, d)
        // cross-arm quantity envelope: prunes the fact scan under the OR
        .where(col("l_quantity").between(1, 30))
        .join(broadcast(Tables.part(s, d)
            .where(col("p_brand").isin("Brand#12", "Brand#2", "Brand#3"))),
          col("l_partkey") === col("p_partkey"))
        .where(arm1 || arm2 || arm3)
        .agg(sum(rev).cast("double").as("revenue"))
    },

    // TPC-H Q20 (potential part promotion), partsupp adapted: suppliers
    // who shipped >450 total units of SMALL-type parts in 1997. The
    // HAVING threshold runs on the ~|suppliers|-row aggregate; the
    // supplier dim joins via LEFT SEMI so the output carries no
    // duplicate suppliers.
    Q("q20_small_part_suppliers",
      """SELECT s_suppkey, s_name
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem, part
        |  WHERE l_partkey = p_partkey AND p_type = 'SMALL'
        |    AND l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
        |  GROUP BY l_suppkey
        |  HAVING sum(l_quantity) > 450)
        |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val qualified = Tables.lineitem(s, d)
        .where(col("l_shipdate") >= "1997-01-01"
          && col("l_shipdate") < "1998-01-01")
        .join(broadcast(Tables.part(s, d).where(col("p_type") === "SMALL")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("tot_qty"))
        .where(col("tot_qty") > 450)
      Tables.supplier(s, d)
        .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    },

    // TPC-H Q21 (suppliers who kept orders waiting), lateness adapted to
    // shipdate: late lines (>60 days after order date, finished orders)
    // on multi-supplier orders where this supplier was the ONLY late
    // one. The `late` frame is computed once and reused for both the
    // anti correlation and the outer rows; both EXISTS arms are
    // orderkey-equi semi/anti joins with the suppkey inequality as a
    // residual — no quadratic pair blowup.
    Q("q21_waiting_supplier",
      """WITH late AS (
        |  SELECT l.l_orderkey, l.l_suppkey
        |  FROM lineitem l, orders o
        |  WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |SELECT s_name, count(*) AS numwait
        |FROM late l1, supplier s
        |WHERE s.s_suppkey = l1.l_suppkey
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin) { (s, d) =>
      val late = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).where(col("o_orderstatus") === "F")
            .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey")
            && col("l_shipdate") >
              col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
      val others = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
      val lateOthers = late
        .select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
      late
        .join(others,
          col("l_orderkey") === col("k2") && col("l_suppkey") =!= col("s2"),
          "left_semi")
        .join(lateOthers,
          col("l_orderkey") === col("k3") && col("l_suppkey") =!= col("s3"),
          "left_anti")
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    },

    // TPC-H Q22 (global sales opportunity), phone-code adapted to market
    // segment and "never ordered" adapted to "no order since 2000"
    // (every sf0.01 customer has SOME order): above-average-balance
    // customers gone quiet, per segment. The average is exact-decimal-
    // sum / count — one broadcast scalar — and the recency test is an
    // orderkey-equi LEFT ANTI join with the date filter pushed to the
    // orders scan.
    Q("q22_quiet_customers",
      """SELECT c_mktsegment, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
        |    AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2)))
        |                               AS DOUBLE) / count(*)
        |                   FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= '2000-01-01')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      val avgBal = Tables.customer(s, d)
        .where(col("c_acctbal") > 0)
        .agg((sum(col("c_acctbal").cast("decimal(12,2)")).cast("double")
          / count(lit(1))).as("avg_bal"))
      Tables.customer(s, d)
        .crossJoin(broadcast(avgBal))
        .where(col("c_acctbal") > col("avg_bal"))
        .join(Tables.orders(s, d)
            .where(col("o_orderdate") >= "2000-01-01")
            .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast("decimal(12,2)")).cast("double")
            .as("totacctbal"))
        .orderBy("c_mktsegment")
    },

    // TPC-H Q2 (minimum-cost supplier), partsupp adapted to the lineitem
    // link: supply cost of (part, supplier) = the cheapest extended
    // price that supplier ever shipped the part at (exact DECIMAL min).
    // The correlated per-part min over EUROPE suppliers decorrelates
    // into a part-keyed aggregate joined back on (part, cost) equality —
    // safe on DECIMAL. The Spark plan pushes BOTH dim filters below the
    // cost aggregate (part semi-join + supplier semi-join on the fact
    // scan), which the SQL form leaves to the optimizer: the per-part
    // min over a filtered part set equals the unfiltered min for those
    // parts, so the early prune is semantics-preserving.
    Q("q2_min_cost_supplier",
      """WITH cost AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(l_extendedprice AS DECIMAL(12,2))) AS sc
        |  FROM lineitem l, supplier s, nation n, region r
        |  WHERE l.l_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
        |    AND n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
        |  GROUP BY 1, 2),
        |best AS (SELECT l_partkey AS bp, min(sc) AS mc FROM cost GROUP BY 1)
        |SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type,
        |  c.l_suppkey AS s_suppkey, CAST(c.sc AS DOUBLE) AS supply_cost
        |FROM cost c, best b, part p, supplier s, nation n
        |WHERE c.l_partkey = b.bp AND c.sc = b.mc
        |  AND p.p_partkey = c.l_partkey AND s.s_suppkey = c.l_suppkey
        |  AND s.s_nationkey = n.n_nationkey
        |  AND p.p_size IN (5, 15, 25, 35, 45) AND p.p_type = 'STANDARD'
        |ORDER BY s_acctbal DESC, p_partkey, s_suppkey
        |LIMIT 100""".stripMargin) { (s, d) =>
      val euNations = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)
            .where(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val suppEu = Tables.supplier(s, d)
        .join(broadcast(euNations),
          col("s_nationkey") === col("n_nationkey"))
      val partsSel = Tables.part(s, d)
        .where(col("p_size").isin(5, 15, 25, 35, 45)
          && col("p_type") === "STANDARD")
      val cost = Tables.lineitem(s, d)
        .join(broadcast(partsSel.select("p_partkey")),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .join(broadcast(suppEu.select("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(min(col("l_extendedprice").cast("decimal(12,2)")).as("sc"))
      val best = cost.groupBy(col("l_partkey").as("bp"))
        .agg(min(col("sc")).as("mc"))
      cost
        .join(best, col("l_partkey") === col("bp") && col("sc") === col("mc"))
        .join(broadcast(partsSel), col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppEu), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_type"),
          col("l_suppkey").as("s_suppkey"),
          col("sc").cast("double").as("supply_cost"))
        .orderBy(col("s_acctbal").desc, col("p_partkey"), col("s_suppkey"))
        .limit(100)
    },
  )
}
