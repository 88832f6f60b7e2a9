package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational workloads over the TPC-H-ish test tables.
  *
  * The reference has no general join operator — it emulates joins with
  * repartition tricks (SURVEY.md §2.4). These queries exercise the real
  * join surface our engine gets from Spark, shaped the way a 100 TB
  * deployment would want them:
  *  - dimension tables (region/nation/customer/supplier/part) broadcast —
  *    they stay small even at SF100k while fact tables grow;
  *  - aggregations are declarative so Catalyst plans partial aggregation
  *    before the shuffle;
  *  - top-k is orderBy+limit, which plans as TakeOrderedAndProject (the
  *    two-phase bounded-PQ algorithm the reference hand-codes in
  *    FindMaxPageRankNodes.java:52-114).
  *
  * All floating aggregates are rounded so results are stable across
  * engines/summation orders (the DuckDB oracle hash-compares values).
  */
object RelationalOps {

  /** TPC-H Q1-style pricing summary over lineitem — scan + filter + agg. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        count(lit(1)).as("count_order"))

  /** Revenue per (region, nation) — broadcast-joined dimension chain. */
  def revenueByNation(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val sup = Tables.supplier(s, dir)
    val nat = Tables.nation(s, dir)
    val reg = Tables.region(s, dir)
    li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Revenue ROLLUP over (region, nation): per-nation rows, per-region
    * subtotals (n_name NULL) and the grand total (both NULL) from ONE
    * aggregation — Catalyst expands the grouping sets without re-scanning
    * lineitem per level. `lvl` (grouping_id analogue via grouping()) keeps
    * subtotal rows distinguishable from genuinely-NULL group keys. */
  def revenueRollup(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val sup = Tables.supplier(s, dir)
    val nat = Tables.nation(s, dir)
    val reg = Tables.region(s, dir)
    li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === reg("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"),
        (grouping(col("r_name")) * 2 + grouping(col("n_name"))).as("lvl"))
  }

  /** Top customers by order value — join + agg + deterministic top-k. */
  def topCustomers(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .agg(round(sum(col("o_totalprice")), 2).as("total_spent"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("total_spent").desc, col("c_custkey").asc)
      .limit(k)
  }

  /** Customers having at least one order (left-semi join) per segment. */
  def segmentsWithOrders(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
  }

  /** Customers with no orders (left-anti join). */
  def customersWithoutOrders(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }
}
