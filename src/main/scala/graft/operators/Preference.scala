package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Preference-data analytics — the pairwise-comparison layer of an
  * RLHF / preference-tuning pipeline. A preference dataset is a set of
  * (winner, loser) judgments; before any reward model trains on it, the
  * standard QC questions are (a) what latent strength per group do the
  * judgments imply (Bradley–Terry), and (b) how internally consistent are
  * they (transitivity / cyclic-triad census). Both run here over a
  * deterministic synthetic judgment set: documents pair up adjacent in an
  * md5 pseudo-shuffle and the higher q35 quality score wins — a
  * cross-engine-reproducible stand-in for human labels that exercises the
  * exact aggregation + fitting machinery real preference data needs.
  *
  * Scale shape: the corpus is scanned computing the inline quality score
  * (TextOps.sQColumn — the q214 join-free discipline), paired through the
  * two-phase global rank (PrefixSum.globalRankBy — the q191/q214
  * scale-measured primitive) and one keyed pair aggregate; everything
  * downstream operates on the |sources|² win matrix (≤ 400 rows at ANY
  * corpus size — a control-plane relation). The Bradley–Terry fit is
  * |S|²-sized work and runs driver-side in exact BigInt arithmetic
  * (the q227 driver-iteration discipline), mirrored by an unrolled
  * generated-CTE replay on the oracle side.
  */
object Preference {

  /** Fixed Bradley–Terry minorization–maximization iteration count
    * (Hunter, Annals of Statistics 2004, the MM form of Bradley & Terry
    * 1952). 8 rounds from a uniform start is well past stabilization on
    * a ≤ 10⁶-ppm integer lattice. */
  val BtIters = 8

  /** Decisive cross-source pair judgments: documents pair up ADJACENT IN
    * A DETERMINISTIC md5 PSEUDO-SHUFFLE (rank by the first 15 md5 nibbles
    * of doc_id via the two-phase global-rank primitive, then
    * pair = (rank−1) DIV 2) — the dense cross-source tournament a real
    * preference-collection round produces. Pairing by raw doc_id
    * adjacency would marry each source to one fixed neighbor under the
    * fixture's mod-|S| striping: a disconnected league of 2-player
    * components with a block-diagonal BT fit and zero triads. Odd-tail
    * pairs, same-source pairs, and quality ties are dropped (only
    * decisive cross-source judgments count). */
  private def decisions(spark: SparkSession, dir: String): DataFrame = {
    val t = TextOps.tokens(col("text"))
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        TextOps.sQColumn(col("text"), t).as("sq"))
      // 15 hex nibbles = 60 bits, inside long; lexicographic hex ==
      // numeric order at fixed length, so the oracle can sort the string
      .withColumn("hk",
        conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long"))
    PrefixSum.globalRankBy(scored, "hk", asc = true, "rk")
      .select(expr("(rk - 1) DIV 2").as("pair"), col("rk"),
        col("source"), col("sq"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("c"),
        expr("min_by(struct(source, sq), rk)").as("a"),
        expr("max_by(struct(source, sq), rk)").as("b"))
      .filter(col("c") === 2 && col("a.source") =!= col("b.source") &&
        col("a.sq") =!= col("b.sq"))
      .select(
        when(col("a.sq") > col("b.sq"), col("a.source"))
          .otherwise(col("b.source")).as("winner"),
        when(col("a.sq") > col("b.sq"), col("b.source"))
          .otherwise(col("a.source")).as("loser"))
  }

  /** The directed win matrix (winner, loser, n) — the ≤ |S|²-row relation
    * every preference statistic reads (graft-visible for the spec's plan
    * and census pins). */
  private[graft] def winMatrix(spark: SparkSession, dir: String): DataFrame =
    decisions(spark, dir)
      .groupBy(col("winner"), col("loser"))
      .agg(count(lit(1)).as("n"))

  /** q262 — Bradley–Terry strength per source from the pairwise quality
    * judgments: wins/losses/games and the fitted strength in ppm
    * (normalized so the strengths sum to |S|·10⁶). The whole fit is
    * integer arithmetic — every division an explicit floor on both
    * engines (BigInt here, HUGEINT `//` in the oracle) — so the two
    * engines walk bit-identical lattices; no learning-rate, no floats,
    * no convergence tolerance. */
  def q262BtStrength(spark: SparkSession, dir: String): DataFrame = {
    val g = winMatrix(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), BigInt(r.getLong(2))))
    val players = g.flatMap(e => Seq(e._1, e._2)).distinct.sorted.toSeq
    val wins = players.map(s =>
      s -> g.filter(_._1 == s).map(_._3).foldLeft(BigInt(0))(_ + _)).toMap
    val losses = players.map(s =>
      s -> g.filter(_._2 == s).map(_._3).foldLeft(BigInt(0))(_ + _)).toMap
    // symmetric games matrix N(s, t) = n(s→t) + n(t→s)
    val nMat: Map[(String, String), BigInt] =
      (g.map(e => (e._1, e._2) -> e._3) ++ g.map(e => (e._2, e._1) -> e._3))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val E6 = BigInt(1000000)
    val E12 = E6 * E6
    val one = BigInt(1)
    var p: Map[String, BigInt] = players.map(_ -> E6).toMap
    for (_ <- 1 to BtIters) {
      // MM update: p_s ← W_s / Σ_t N_st/(p_s + p_t), then mean-1e6
      // renormalization — each division floored exactly like the oracle
      val denom = players.map { s =>
        s -> players.flatMap(t => nMat.get((s, t))
          .map(nn => nn * E12 / (p(s) + p(t)).max(one)))
          .foldLeft(BigInt(0))(_ + _)
      }.toMap
      val praw = players.map(s => s -> wins(s) * E12 / denom(s).max(one)).toMap
      val tot = praw.values.foldLeft(BigInt(0))(_ + _).max(one)
      p = players.map(s => s -> praw(s) * players.size * E6 / tot).toMap
    }
    import spark.implicits._
    players.map(s => (s, wins(s).toLong, losses(s).toLong,
        (wins(s) + losses(s)).toLong, p(s).toLong))
      .toDF("source", "wins", "losses", "games", "bt_ppm")
      .orderBy(col("source"))
  }

  /** q265 — preference-consistency audit: the cyclic-triad census of the
    * majority-preference tournament (a → b iff a beats b strictly more
    * often than b beats a). A rock-paper-scissors triad is a judgment set
    * no Bradley–Terry model can fit — the cyclic share is the standard
    * label-noise readout run on preference data before reward-model
    * training (Kendall's intransitivity census). One row:
    * players, majority edges, complete triads, cyclic, transitive,
    * consistency in ppm. */
  def q265PrefCycles(spark: SparkSession, dir: String): DataFrame = {
    // four downstream actions (players/edges/triads/cycles) — checkpoint
    // the ≤|S|² matrix so the corpus pipeline runs once, not four times
    val g = winMatrix(spark, dir).localCheckpoint()
    val rev = g.select(col("loser").as("winner"), col("winner").as("loser"),
      col("n").as("rn"))
    // strict majority edge a→b (absent reverse counts as 0)
    val e = g.join(rev, Seq("winner", "loser"), "left")
      .filter(col("n") > coalesce(col("rn"), lit(0L)))
      .select(col("winner").as("a"), col("loser").as("b"))
    // undirected decisive pairs, canonical a < b (strictness ⇒ at most
    // one direction survives per pair)
    val u = e.select(least(col("a"), col("b")).as("a"),
      greatest(col("a"), col("b")).as("b"))
    val nPlayers = e.select(explode(array(col("a"), col("b"))).as("s"))
      .agg(countDistinct(col("s"))).first().getLong(0)
    val nEdges = e.count()
    // complete triads: a < b < c with all three pairs decisive
    val triads = u.as("u1")
      .join(u.as("u2"), col("u2.a") === col("u1.b"))
      .join(u.as("u3"), col("u3.a") === col("u1.a") &&
        col("u3.b") === col("u2.b"))
      .count()
    // directed 3-cycles, anchored at the smallest vertex so each counts once
    val cyc = e.as("e1")
      .join(e.as("e2"), col("e2.a") === col("e1.b"))
      .join(e.as("e3"), col("e3.a") === col("e2.b") &&
        col("e3.b") === col("e1.a"))
      .filter(col("e1.a") < col("e1.b") && col("e1.a") < col("e2.b"))
      .count()
    import spark.implicits._
    Seq((nPlayers, nEdges, triads, cyc, triads - cyc,
        1000000L * (triads - cyc) / math.max(triads, 1L)))
      .toDF("n_players", "n_edges", "n_triads", "n_cyclic", "n_transitive",
        "consistency_ppm")
  }

  // ---------------------------------------------------------------------
  // Oracles
  // ---------------------------------------------------------------------

  /** Shared decision/win-matrix CTE chain (quality scores via
    * [[TextOps.qualityOracle]] — the q214-proven cross-engine sq). */
  private def winMatrixSql: String =
    s"""qual AS (
       |  SELECT doc_id, CAST(round(quality * 1000000.0) AS BIGINT) AS sq
       |  FROM (${TextOps.qualityOracle})),
       |s AS (
       |  SELECT d.doc_id, d.source, q.sq,
       |    row_number() OVER (ORDER BY substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15),
       |                       d.doc_id) AS rk
       |  FROM documents d JOIN qual q USING (doc_id)),
       |pr AS (
       |  SELECT (rk - 1) // 2 AS pair, count(*) AS c,
       |    arg_min(source, rk) AS src_a, arg_min(sq, rk) AS sq_a,
       |    arg_max(source, rk) AS src_b, arg_max(sq, rk) AS sq_b
       |  FROM s GROUP BY 1),
       |dec AS (
       |  SELECT CASE WHEN sq_a > sq_b THEN src_a ELSE src_b END AS winner,
       |         CASE WHEN sq_a > sq_b THEN src_b ELSE src_a END AS loser
       |  FROM pr WHERE c = 2 AND src_a <> src_b AND sq_a <> sq_b),
       |g AS MATERIALIZED (
       |  SELECT winner, loser, CAST(count(*) AS HUGEINT) AS n
       |  FROM dec GROUP BY 1, 2)""".stripMargin

  /** One unrolled MM iteration (den/raw/it CTE triple) — the q227/q242
    * generated-replay discipline: the oracle walks the same integer
    * lattice as the BigInt loop above. */
  private def btIterSql(k: Int): String =
    s"""den$k AS (
       |  SELECT m.a AS source,
       |    sum(m.n * CAST(1000000000000 AS HUGEINT)
       |        // greatest(CAST(1 AS HUGEINT), pa.p + pb.p)) AS denom
       |  FROM nmat m
       |  JOIN it${k - 1} pa ON pa.source = m.a
       |  JOIN it${k - 1} pb ON pb.source = m.b
       |  GROUP BY 1),
       |raw$k AS MATERIALIZED (
       |  SELECT w.source,
       |    w.w * CAST(1000000000000 AS HUGEINT)
       |      // greatest(CAST(1 AS HUGEINT), d.denom) AS praw
       |  FROM wins w JOIN den$k d USING (source)),
       |it$k AS MATERIALIZED (
       |  SELECT source,
       |    praw * (SELECT count(*) FROM players) * 1000000
       |      // greatest(CAST(1 AS HUGEINT), (SELECT sum(praw) FROM raw$k)) AS p
       |  FROM raw$k)""".stripMargin

  val btStrengthOracle: String = {
    val iters = (1 to BtIters).map(btIterSql).mkString(",\n")
    s"""WITH $winMatrixSql,
       |players AS (
       |  SELECT DISTINCT source FROM (
       |    SELECT winner AS source FROM g
       |    UNION ALL SELECT loser FROM g)),
       |wins AS (
       |  SELECT p.source,
       |    COALESCE((SELECT sum(n) FROM g WHERE g.winner = p.source),
       |             CAST(0 AS HUGEINT)) AS w,
       |    COALESCE((SELECT sum(n) FROM g WHERE g.loser = p.source),
       |             CAST(0 AS HUGEINT)) AS l
       |  FROM players p),
       |nmat AS (
       |  SELECT a, b, sum(n) AS n FROM (
       |    SELECT winner AS a, loser AS b, n FROM g
       |    UNION ALL SELECT loser AS a, winner AS b, n FROM g)
       |  GROUP BY 1, 2),
       |it0 AS MATERIALIZED (SELECT source, CAST(1000000 AS HUGEINT) AS p FROM players),
       |$iters
       |SELECT w.source, CAST(w.w AS BIGINT) AS wins, CAST(w.l AS BIGINT) AS losses,
       |  CAST(w.w + w.l AS BIGINT) AS games, CAST(i.p AS BIGINT) AS bt_ppm
       |FROM wins w JOIN it$BtIters i USING (source)
       |ORDER BY source""".stripMargin
  }

  val prefCyclesOracle: String =
    s"""WITH $winMatrixSql,
       |e AS MATERIALIZED (
       |  SELECT g.winner AS a, g.loser AS b FROM g
       |  LEFT JOIN g r ON r.winner = g.loser AND r.loser = g.winner
       |  WHERE g.n > COALESCE(r.n, CAST(0 AS HUGEINT))),
       |u AS MATERIALIZED (SELECT least(a, b) AS a, greatest(a, b) AS b FROM e),
       |tri AS (
       |  SELECT count(*) AS n FROM u u1
       |  JOIN u u2 ON u2.a = u1.b
       |  JOIN u u3 ON u3.a = u1.a AND u3.b = u2.b),
       |cyc AS (
       |  SELECT count(*) AS n FROM e e1
       |  JOIN e e2 ON e2.a = e1.b
       |  JOIN e e3 ON e3.a = e2.b AND e3.b = e1.a
       |  WHERE e1.a < e1.b AND e1.a < e2.b)
       |SELECT
       |  CAST((SELECT count(DISTINCT s) FROM (
       |    SELECT a AS s FROM e UNION ALL SELECT b FROM e)) AS BIGINT)
       |    AS n_players,
       |  CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
       |  CAST(tri.n AS BIGINT) AS n_triads,
       |  CAST(cyc.n AS BIGINT) AS n_cyclic,
       |  CAST(tri.n - cyc.n AS BIGINT) AS n_transitive,
       |  CAST(1000000 * (tri.n - cyc.n) // greatest(tri.n, 1) AS BIGINT)
       |    AS consistency_ppm
       |FROM tri, cyc""".stripMargin
}
