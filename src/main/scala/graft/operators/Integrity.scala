package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Referential-integrity / data-contract AUDIT over the relational star —
  * the Great-Expectations-style pre-flight a warehouse runs before
  * publishing a snapshot: primary keys actually unique, every foreign key
  * actually lands. The reference engine's ingest enforces these contracts
  * transactionally (`Upsert` PK anti-joins; the migration checks); this
  * operator is the BATCH verification of the same contracts over tables
  * that arrived by any other path.
  *
  * Scale shape: every check is either one partial-aggregated
  * `count − countDistinct(pk)` scan or one keyed LEFT ANTI join counted —
  * no windows, no broadcast requirement (anti-joins co-partition on the
  * key; Catalyst broadcasts the dimension side when it fits). Seven
  * checks = seven independent bounded jobs unioned as 1-row legs.
  */
object Integrity {

  private def pkLeg(name: String, t: DataFrame, pk: Column): DataFrame =
    t.agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) - countDistinct(pk)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_rows"), col("n_violations"))

  private def fkLeg(name: String, child: DataFrame, parent: DataFrame,
                    childKey: String, parentKey: String): DataFrame = {
    val orphans = child
      .join(parent.select(col(parentKey)),
            col(childKey) === col(parentKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    child.agg(count(lit(1)).as("n_rows"))
      .crossJoin(orphans) // both 1-row control relations
      .select(lit(name).as("check_name"), col("n_rows"),
              col("n_violations"))
  }

  /** q188 — one row per contract: total rows, violating rows. A clean
    * snapshot reads all-zero violations; the audit's value is that the
    * zeros are PROVEN, not assumed (IntegritySpec corrupts a copy and
    * watches every class fire). */
  def q188IntegrityAudit(spark: SparkSession, dir: String): DataFrame = {
    val cust = graft.Tables.customer(spark, dir)
    val ord = graft.Tables.orders(spark, dir)
    val li = graft.Tables.lineitem(spark, dir)
    val legs = Seq(
      pkLeg("customer_pk_unique", cust, col("c_custkey")),
      pkLeg("orders_pk_unique", ord, col("o_orderkey")),
      // composite PK flattened to a delimited string (both engines):
      pkLeg("lineitem_pk_unique", li,
            concat_ws("|", col("l_orderkey"), col("l_linenumber"))),
      fkLeg("orders_fk_customer", ord, cust, "o_custkey", "c_custkey"),
      fkLeg("lineitem_fk_orders", li, ord, "l_orderkey", "o_orderkey"),
      fkLeg("lineitem_fk_part", li,
            graft.Tables.part(spark, dir), "l_partkey", "p_partkey"),
      fkLeg("lineitem_fk_supplier", li,
            graft.Tables.supplier(spark, dir), "l_suppkey", "s_suppkey"))
    legs.reduce(_.union(_)).orderBy(col("check_name"))
  }

  val integrityAuditOracle: String =
    """SELECT * FROM (
      |  SELECT 'customer_pk_unique' AS check_name,
      |    (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_rows,
      |    (SELECT CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT)
      |     FROM customer) AS n_violations
      |  UNION ALL
      |  SELECT 'orders_pk_unique',
      |    (SELECT CAST(count(*) AS BIGINT) FROM orders),
      |    (SELECT CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
      |     FROM orders)
      |  UNION ALL
      |  SELECT 'lineitem_pk_unique',
      |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
      |    (SELECT CAST(count(*) - count(DISTINCT
      |       l_orderkey || '|' || l_linenumber) AS BIGINT) FROM lineitem)
      |  UNION ALL
      |  SELECT 'orders_fk_customer',
      |    (SELECT CAST(count(*) AS BIGINT) FROM orders),
      |    (SELECT CAST(count(*) AS BIGINT) FROM orders o
      |     WHERE NOT EXISTS (SELECT 1 FROM customer c
      |                       WHERE c.c_custkey = o.o_custkey))
      |  UNION ALL
      |  SELECT 'lineitem_fk_orders',
      |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
      |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
      |     WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                       WHERE o.o_orderkey = l.l_orderkey))
      |  UNION ALL
      |  SELECT 'lineitem_fk_part',
      |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
      |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
      |     WHERE NOT EXISTS (SELECT 1 FROM part p
      |                       WHERE p.p_partkey = l.l_partkey))
      |  UNION ALL
      |  SELECT 'lineitem_fk_supplier',
      |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
      |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
      |     WHERE NOT EXISTS (SELECT 1 FROM supplier s
      |                       WHERE s.s_suppkey = l.l_suppkey)))
      |ORDER BY check_name""".stripMargin
}
