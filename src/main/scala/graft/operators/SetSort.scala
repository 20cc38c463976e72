package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Sorts / limits / top-k and set operations (SURVEY.md §2.2). */
object SetSort {

  val defs: Seq[Q] = Seq(

    // Global sort: range-partitioned SortExec (sampling-based partition
    // bounds) — the scalable total order; mixed directions + explicit nulls.
    Q("sort_multi_key",
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_totalprice DESC, o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_totalprice").desc, col("o_orderkey").asc)
    },

    // ORDER BY + LIMIT: TakeOrderedAndProject — per-partition top-k heaps,
    // only k rows cross the wire; never a full sort at any scale.
    Q("sort_topk_limit",
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    },

    Q("set_union_all",
      """SELECT c_custkey FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION ALL
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      c.where(col("c_mktsegment") === "BUILDING").select("c_custkey")
        .unionAll(c.where(col("c_acctbal") > 5000.0).select("c_custkey"))
        .orderBy("c_custkey")
    },

    Q("set_union_distinct",
      """SELECT c_custkey FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      c.where(col("c_mktsegment") === "BUILDING").select("c_custkey")
        .union(c.where(col("c_acctbal") > 5000.0).select("c_custkey"))
        .distinct()
        .orderBy("c_custkey")
    },

    // Nations having both customers and suppliers.
    Q("set_intersect",
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    },

    // Nations with customers but no suppliers.
    Q("set_except",
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .except(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    },

    // Multiset intersection: per-nation min(customer count, supplier
    // count) copies survive — the bag semantics `set_intersect` discards.
    Q("set_intersect_all",
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT ALL
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .intersectAll(
          Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    },

    // Multiset difference: customer copies minus supplier copies per key.
    Q("set_except_all",
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT ALL
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .exceptAll(
          Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    },
  )
}
