package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's relational operator inventory (SURVEY.md §2) re-expressed
  * as Spark-first DataFrame programs over the driver's synthetic tables.
  *
  * Conventions shared with the DuckDB oracles in [[graft.SparkEntry.oracleSql]]:
  *   - money/quantity aggregates go through exact `DecimalType(18,6)`
  *     arithmetic and are cast to double only at the end, so results are
  *     bit-identical regardless of partial-aggregation order (critical: a
  *     1000-executor sum must equal a single-threaded oracle sum);
  *   - every multi-row result carries a total deterministic ORDER BY ending
  *     in a unique key;
  *   - `events.ts` is microsecond-truncated (see [[graft.Tables.load]]).
  */
object Relational {

  /** Exact intermediate type for double aggregation (order-independent). */
  private[operators] def dec(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Final double rendering of an exact decimal aggregate. The interposed
    * DECIMAL(38,4) matters for oracle parity: DuckDB's int128→double cast at
    * high scale is not correctly rounded, but at scale 4 the scaled integer
    * fits a double exactly on both engines (all source values carry ≤4
    * fractional digits, so no rounding occurs). */
  private[operators] def asMoney(c: Column): Column =
    c.cast(DecimalType(38, 4)).cast("double")

  // -------------------------------------------------------------------------
  // Aggregations (SURVEY §2.4)
  // -------------------------------------------------------------------------

  /** A-family pricing summary (grouped sum/count — the shape of the
    * reference's per-chain aggregates, cf. chainweb-data
    * exec/Chainweb/Gaps.hs:190-195). Map-side partial aggregation makes this
    * a single shuffle of |groups| rows — scale-safe. */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") < lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        asMoney(sum(dec(col("l_quantity")))).as("sum_qty"),
        asMoney(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        asMoney(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Min/max height per chain (A1 — Gaps.hs:190-195, FillEvents.hs:121-122):
    * `groupBy(chainid).agg(min(height))` analog. */
  def q02MinMaxPerType(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(min(col("event_id")).as("min_id"),
           max(col("event_id")).as("max_id"),
           count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** Global max height (A2 — Server.hs:396-406). One-row global agg:
    * partial max per partition, tiny final reduce. */
  def q03GlobalStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .agg(max(col("event_id")).as("max_id"),
           max(col("user_id")).as("max_user"),
           count(lit(1)).as("n"))

  /** Filtered count in a height/time range (A3 — BackfillTransfers.hs:151-152).
    * Predicates push to parquet (PushedFilters), so only matching row groups
    * are read. */
  def q04FilteredCount(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase" &&
              col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
              col("ts") <  lit("2024-01-20 00:00:00").cast("timestamp"))
      .agg(count(lit(1)).as("n"))

  /** Estimated/metadata row count (A4 — Server.hs:633-641 uses
    * pg_class.reltuples; parquet footer counts give the same O(metadata)
    * semantics — Spark's count(*) over parquet never reads data pages). */
  def q15MetaCount(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).agg(count(lit(1)).as("n"))

  /** Cumulative supply prefix-sum (A5 — Coins.hs:118-158): running total
    * over a global key order, via the distributed two-phase prefix sum
    * ([[PrefixSum]]) — bucketed partials + broadcast offsets + per-bucket
    * windows. No single-partition window anywhere, so the same program
    * holds when the input is a fact table, not a dimension
    * (ScaleSpec asserts the plan has no `Exchange SinglePartition`). */
  def q21CumulativeSupply(spark: SparkSession, dir: String): DataFrame =
    PrefixSum.withRunningSum(
        Tables.part(spark, dir).select(col("p_partkey"), col("p_retailprice")),
        "p_partkey", dec(col("p_retailprice")), "cum")
      .select(col("p_partkey"), asMoney(col("cum")).as("cum_supply"))
      .orderBy(col("p_partkey"))

  /** Rich list top-K (A6/J6 — RichList.hs:95-103): sum balances per account,
    * take top 100. groupBy+orderBy+limit = partial agg, shuffle of |accounts|,
    * then a global top-K (Spark's TakeOrderedAndProject — no full sort). */
  def q20RichList(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(asMoney(sum(dec(col("o_totalprice")))).as("balance"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("balance").desc, col("o_custkey"))
      .limit(100)

  /** Ordered+deduped collect (A7 — Queries.hs:134-135
    * `array_agg(... ORDER BY ...)`): rendered as a canonical string so the
    * result is engine-comparable. */
  def q22CollectSorted(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(concat_ws(",", array_sort(collect_set(col("event_type")))).as("types"),
           count(lit(1)).as("n"))
      .orderBy(col("user_id"))

  // -------------------------------------------------------------------------
  // Windows (SURVEY §2.5)
  // -------------------------------------------------------------------------

  /** Gap detection via lead (W1 — Gaps.hs:159-167): missing-range discovery.
    * Partitioned by the chain analog so the window parallelizes across
    * partitions (the reference's PARTITION BY chainid has the same effect
    * in Postgres). */
  def q05GapLead(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"))
      .withColumn("next_id", lead(col("event_id"), 1).over(w))
      .filter(col("next_id") - col("event_id") > 50)
      .select(col("user_id"), col("event_id").as("gap_start"),
              col("next_id").as("gap_end"))
      .orderBy(col("user_id"), col("gap_start"))
  }

  /** Latest-row-per-key (W4 — RichList.hs:110-120 `max(txid) GROUP BY
    * rowkey` + join): row_number window, one shuffle on the key. */
  def q06LatestPerKey(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
              col("event_type").as("last_type"), col("value").as("last_value"))
      .orderBy(col("user_id"))
  }

  // -------------------------------------------------------------------------
  // Sorts / limits / pagination (SURVEY §2.6)
  // -------------------------------------------------------------------------

  /** Keyset resume predicate (O2 — BoundedScan.hs:256-280 `cursorCmp`):
    * strictly-after-cursor row-value comparison with DESC columns. The
    * composite predicate pushes to parquet as a leading-column range filter,
    * so deep pages never rescan earlier pages — the reference's whole reason
    * for keyset over OFFSET. */
  def q07KeysetPage(spark: SparkSession, dir: String): DataFrame = {
    val (u0, id0) = (7L, 500L)
    Tables.events(spark, dir)
      .filter(col("user_id") < u0 ||
              (col("user_id") === u0 && col("event_id") < id0))
      .orderBy(col("user_id").desc, col("event_id").desc)
      .limit(25)
      .select(col("user_id"), col("event_id"), col("event_type"))
  }

  /** Classic OFFSET/LIMIT fallback (O3 — BoundedScan.hs:232-245). */
  def q08OffsetLimit(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .orderBy(col("event_id").desc)
      .offset(50)
      .limit(20)
      .select(col("event_id"), col("user_id"), col("event_type"))

  /** Recent-items top-N (O4 — Server.hs:621-631 `ORDER BY height DESC LIMIT
    * 10`): TakeOrderedAndProject, no global sort. */
  def q09TopRecent(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .orderBy(col("event_id").desc)
      .limit(10)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  /** Successful-first ordering (O5 — Server.hs:449-460 `ORDER BY (goodresult
    * IS NOT NULL) DESC, height DESC LIMIT 50`). */
  def q10SuccessFirst(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(when(col("o_orderstatus") === "F", 1).otherwise(0).desc,
               col("o_orderkey").desc)
      .limit(50)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))

  /** Range chunking (O8 — lib/ChainwebData/Backfill.hs:19-48): split
    * [lo,hi] into ≤120-unit request windows per chain. `sequence`+`explode`
    * keeps the fan-out distributed (one row per chunk, generated on
    * executors — no driver loop). */
  def q24RangeChunks(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(min(col("event_id")).as("lo"), max(col("event_id")).as("hi"))
      .select(col("event_type"), col("hi"),
              explode(sequence(col("lo"), col("hi"), lit(120L))).as("chunk_lo"))
      .select(col("event_type"), col("chunk_lo"),
              least(col("chunk_lo") + 119L, col("hi")).as("chunk_hi"))
      .orderBy(col("event_type"), col("chunk_lo"))

  // -------------------------------------------------------------------------
  // Joins (SURVEY §2.3)
  // -------------------------------------------------------------------------

  /** FK decoration join (J1 — Queries.hs:221-228, tx→blocks): fact ⋈ dim.
    * The dim side (orders per key range) is broadcast when under the
    * threshold; at 100 TB the same shape becomes a sort-merge join on the
    * (already co-partitioned) key — we leave strategy choice to Catalyst/AQE
    * and only hint when the dim is provably small. */
  def q11FkJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"), col("o_orderdate"))
    li.filter(col("l_quantity") > 45)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
              col("o_orderdate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Adjacent-row enrichment with branch priority (J3/U2 —
    * Queries.hs:291-339): the reference's correlated `LATERAL (… UNION ALL …
    * LIMIT 1)` finding the event at `idx-1`, rewritten as two left
    * equi-joins + `coalesce` priority — set-based, no per-row subquery. */
  def q12AdjacentCoalesce(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"),
              get_json_object(col("props"), "$.k").as("c_k"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"),
              get_json_object(col("props"), "$.k").as("v_k"))
    ev.filter(col("event_type") === "purchase")
      .join(clicks, col("c_id") === col("event_id") - 1, "left")
      .join(views, col("v_id") === col("event_id") - 1, "left")
      .select(col("event_id"), col("user_id"),
              coalesce(col("c_k"), col("v_k"), lit("-")).as("prior_k"))
      .orderBy(col("event_id"))
  }

  /** Iterative ancestor chain (J2 — Queries.hs:112-137 `WITH RECURSIVE`
    * continuation history): Spark has no recursive CTE; pact chains are
    * short, so a bounded self-join loop to fixpoint is faithful
    * (SURVEY §7.3.1). Each iteration is one equi-join on the edge key. */
  def q23ContinuationChain(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val lagW = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    // Materialize the edge relation once and cut the frontier's lineage per
    // iteration — otherwise the unioned final plan re-derives the window
    // d times and re-joins the whole prefix chain per level (the classic
    // iterative-fixpoint blowup, SURVEY §7.3.1).
    val edges = ev
      .select(col("user_id"), col("event_id"))
      .withColumn("parent_id", lag(col("event_id"), 1).over(lagW))
      .filter(col("parent_id").isNotNull)
      .select(col("event_id").as("id"), col("parent_id"))
      .localCheckpoint()
    val seeds = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("seed_event_id"), col("event_id").as("cur"))
    val maxDepth = 3
    var frontier = seeds
    var out: DataFrame = null
    for (d <- 1 to maxDepth) {
      frontier = frontier
        .join(edges, col("cur") === col("id"))
        .select(col("seed_event_id"), col("parent_id").as("cur"))
        // lazy: the plan barrier exists immediately (no fixpoint blowup);
        // the blocks materialize inside the one final job instead of one
        // eager job per level
        .localCheckpoint(eager = false)
      val level = frontier.select(col("seed_event_id"), lit(d).as("depth"),
                                  col("cur").as("ancestor_id"))
      out = if (out == null) level else out.unionAll(level)
    }
    out.orderBy(col("seed_event_id"), col("depth"))
  }

  /** Star-schema rollup (TPC-H Q5 shape): revenue per nation through a
    * 5-way join. The three dimension legs broadcast; only the
    * lineitem⋈orders leg shuffles — with AQE picking broadcast for any
    * side under threshold. This is the multi-join plan Catalyst's
    * reordering + broadcast selection exists for. */
  def q50StarRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA" && col("o_orderstatus") === "F")
      .groupBy(col("n_name"))
      .agg(asMoney(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))))
             .as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))

  /** Anti-join blocklist filter — semi/anti joins are absent from the
    * reference but core to training-data curation ("drop everything that
    * hit the contamination scan"). left_anti keeps the scan pruned and
    * shuffles only the small blocklist side under broadcast. */
  def q51AntiBlocklist(spark: SparkSession, dir: String): DataFrame = {
    val blocked = Corpus.q45Contamination(spark, dir).select(col("doc_id"))
    Tables.documents(spark, dir)
      .join(broadcast(blocked), Seq("doc_id"), "left_anti")
      .groupBy(col("lang")).agg(count(lit(1)).as("n_clean"))
      .orderBy(col("lang"))
  }

  // -------------------------------------------------------------------------
  // Set ops (SURVEY §2.7)
  // -------------------------------------------------------------------------

  /** UNION ALL of two indexed scans (U1 — Queries.hs:251-270 account
    * history): two pruned scans unioned, preserving duplicate semantics
    * (a self-transfer appears twice in the reference; same here when both
    * predicates match). */
  def q13UnionTwoScans(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
              col("l_partkey"), col("l_quantity"))
    li.filter(col("l_suppkey") === 3)
      .unionAll(li.filter(col("l_partkey") === 42))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
               col("l_partkey"))
  }

  // -------------------------------------------------------------------------
  // Filters / predicates / lookups (SURVEY §2.2, §2.8)
  // -------------------------------------------------------------------------

  /** Existence check (P9 — BackfillTransfers.hs:45-57). */
  def q14Exists(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === "signup")
      .agg((count(lit(1)) > 0).cast("int").as("has_rows"))

  /** LIKE substring search (P3/F1 — Queries.hs:153-160 code search):
    * `COALESCE(code,'') LIKE '%q%'`. */
  def q16LikeSearch(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(coalesce(col("text"), lit("")).contains("merge join"))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** Composite search predicate (P4 — Queries.hs:171-188 event search):
    * AND of optional OR'd LIKEs + range guards. */
  def q17SearchPredicate(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter((col("event_type").like("%sign%") || col("props").like("%\"k\": 7%")) &&
              col("value") >= 10 && col("value") < 500 &&
              col("user_id") < 10)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))

  /** JSON path extraction + group (F5/F6 — Queries.hs:309-328 `params->>N`):
    * `get_json_object` is codegen'd; at ingest scale we'd materialize the
    * parsed column once (the reference materializes paramtext the same way). */
  def q18JsonGroup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k_val"),
              dec(col("value")).as("v"))
      .groupBy(col("k_val"))
      .agg(count(lit(1)).as("n"), asMoney(sum(col("v"))).as("sum_value"))
      .orderBy(col("k_val"))

  /** Point lookup by unique key (P7 — Server.hs:408-425 requestkey lookup).
    * At scale this is served by clustering + min/max row-group skipping on
    * the key column (SURVEY §4). */
  def q19PointLookup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_id") === 777)
      .select(col("event_id"), col("user_id"), col("event_type"), col("props"))
}
