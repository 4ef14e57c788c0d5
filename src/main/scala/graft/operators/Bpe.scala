package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge LEARNING (Sennrich et al., ACL 2016) — the
  * tokenizer-training step of an LLM pipeline, not just tokenization:
  * iteratively find the most frequent adjacent symbol pair in the corpus
  * vocabulary and fuse it, emitting the learned merge table.
  *
  * Classic formulation: the corpus compresses to `(word, count)` rows;
  * each word is a space-separated symbol sequence (initially characters);
  * one round = count adjacent pairs weighted by word count, take the
  * arg-max (count DESC, then pair lexicographic — a total, engine-neutral
  * tiebreak), and merge that pair inside every word.
  *
  * Merging is expressed as bounded repeated string replacement on the
  * space-padded symbol string: `replace(' a b ' → ' ab ')` six times.
  * Plain left-to-right non-overlapping replace has identical semantics in
  * Spark and DuckDB, and adjacent matches share their separator space, so
  * one pass can skip every other occurrence of a run — six passes reach
  * the fixpoint for any run up to 2^6 pairs, far beyond the 16-char word
  * cap. Round5Spec machine-checks the fixpoint (a 7th pass changes
  * nothing) rather than trusting this argument.
  *
  * The DuckDB oracle is the SAME algorithm as an 8-step generated CTE
  * chain — an independent from-scratch replay, not a dump of the Spark
  * output.
  *
  * Scale: the iterated state is the vocabulary table (distinct words —
  * millions of narrow rows at 100 TB, not the corpus), pair counting is a
  * partial-aggregated groupBy over 3-column rows, and the only driver
  * materialization is the 1-row arg-max per round (bounded by
  * construction, the sanctioned pattern of ContHistory's fixpoint loop).
  * `localCheckpoint` cuts the 8-deep iterative lineage so no round
  * re-runs its predecessors.
  */
object Bpe {

  /** Rounds learned; the oracle CTE chain is generated for the same K. */
  val K = 8

  /** Max word length kept in the vocabulary (both engines filter alike;
    * the substr-expansion below is generated to this width). */
  val MaxWord = 16

  /** 'word' → 'w o r d': concat_ws skips NULLs and substr past the end is
    * '' in both engines, so nullif(substr(w,i,1),'') expands any length ≤
    * MaxWord without padding artifacts. */
  private def spacedCol(w: Column): Column =
    concat_ws(" ", (1 to MaxWord).map(i => nullif(substring(w, i, 1), lit(""))): _*)

  /** One merge pass: six bounded replaces of ' l r ' with ' lr ' on the
    * space-padded symbol string (see scaladoc for why six). */
  def mergePass(spaced: Column, l: String, r: String): Column = {
    val pat = s" $l $r "
    val rep = s" $l$r "
    val padded = concat(lit(" "), spaced, lit(" "))
    trim((1 to 6).foldLeft(padded)((c, _) => replace(c, lit(pat), lit(rep))))
  }

  /** The K-round learning loop: returns the merge table AND the final
    * word → symbol-sequence vocabulary (the trained tokenizer — applying
    * BPE to a known word IS looking up its final segmentation). */
  def learn(spark: SparkSession, dir: String): (Seq[(Int, String, String, Long)], DataFrame) = {
    val (merges, snaps) = learnWithSnapshots(spark, dir, Set(K))
    (merges, snaps(K))
  }

  /** [[learn]] exposing the vocabulary AFTER each round in `at` — the
    * q217 sweep reads the k-merge operating points without re-learning. */
  def learnWithSnapshots(spark: SparkSession, dir: String, at: Set[Int])
      : (Seq[(Int, String, String, Long)], Map[Int, DataFrame]) = {
    var vocab = Tables.documents(spark, dir)
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")).between(1, MaxWord))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("w"), spacedCol(col("w")).as("spaced"), col("cnt"))
      .localCheckpoint()

    val snaps = Map.newBuilder[Int, DataFrame]
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (it <- 1 to K) {
      val top = vocab
        .select(col("cnt"), split(col("spaced"), " ").as("s"))
        .filter(size(col("s")) >= 2) // sequence(1,0) would count DOWN
        .select(col("cnt"), explode(transform(sequence(lit(1), size(col("s")) - 1),
          i => struct(element_at(col("s"), i).as("l"),
                      element_at(col("s"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect() // 1 row/round — bounded by construction
      require(top.nonEmpty, s"BPE round $it: vocabulary ran out of pairs")
      val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      merges += ((it, l, r, c))
      vocab = vocab
        .select(col("w"), mergePass(col("spaced"), l, r).as("spaced"), col("cnt"))
        .localCheckpoint()
      if (at(it)) snaps += it -> vocab
    }
    (merges.result(), snaps.result())
  }

  /** q146 — the learned merge table: (iter, left_sym, right_sym,
    * pair_count) for K rounds over the document vocabulary. */
  def q146BpeMerges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    learn(spark, dir)._1.toDF("iter", "left_sym", "right_sym", "pair_count")
      .orderBy(col("iter"))
  }

  /** q147 — APPLY the trained tokenizer: every corpus word occurrence is
    * looked up in the final segmentation and the per-source subword token
    * economics reported (total whitespace words, total subword tokens,
    * total chars — chars/subtokens is the compression the 8 merges buy).
    *
    * Scale: the corpus never holds symbol arrays — the vocabulary (already
    * ≪ corpus; symbol counts, not symbols) broadcasts to an equi-join on
    * the word, then one partial-aggregated groupBy(source). Past broadcast
    * size the same plan degrades to a shuffled equi-join on `w`, still
    * narrow rows. */
  def q147BpeApply(spark: SparkSession, dir: String): DataFrame = {
    val seg = learn(spark, dir)._2
      .select(col("w"), size(split(col("spaced"), " ")).cast("long").as("n_syms"))
    Tables.documents(spark, dir)
      .select(col("source"), explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")).between(1, MaxWord))
      .join(broadcast(seg), Seq("w"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_syms")).as("total_subtokens"),
        sum(length(col("w")).cast("long")).as("total_chars"))
      .orderBy(col("source"))
  }

  /** The generated K-step CTE chain shared by both oracles: learns the
    * merges AND carries the evolving word → spaced segmentation. */
  private val oracleChain: String = {
    val spaced = (1 to MaxWord).map(i => s"nullif(substr(w,$i,1),'')")
      .mkString("concat_ws(' ', ", ", ", ")")
    val head =
      s"""toks AS (
        |  SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w FROM documents),
        |wc AS (
        |  SELECT w, count(*) AS cnt FROM toks
        |  WHERE length(w) BETWEEN 1 AND $MaxWord GROUP BY w),
        |v0 AS (SELECT w, $spaced AS spaced, cnt FROM wc)""".stripMargin
    val rep6 = {
      val one = (s: String) => s"replace($s, ' '||l||' '||r||' ', ' '||l||r||' ')"
      (1 to 6).foldLeft("' ' || spaced || ' '")((s, _) => one(s))
    }
    val steps = (1 to K).map { i =>
      val p = i - 1
      s"""s$i AS (SELECT string_split(spaced, ' ') AS s, cnt FROM v$p),
        |j$i AS (SELECT s, cnt, unnest(range(1, len(s))) AS j FROM s$i),
        |p$i AS (SELECT s[j] AS l, s[j+1] AS r, CAST(sum(cnt) AS BIGINT) AS c
        |        FROM j$i GROUP BY 1, 2),
        |m$i AS (SELECT l, r, c FROM p$i ORDER BY c DESC, l, r LIMIT 1),
        |v$i AS (SELECT w, trim($rep6) AS spaced, cnt FROM v$p, m$i)""".stripMargin
    }
    "WITH " + (head +: steps).mkString(",\n")
  }

  /** The independent from-scratch replay (see object scaladoc). */
  val bpeMergesOracle: String = {
    val union = (1 to K)
      .map(i => s"SELECT $i AS it, l, r, c FROM m$i")
      .mkString("\nUNION ALL ")
    oracleChain + "\n" +
      s"""SELECT CAST(it AS INT) AS iter, l AS left_sym, r AS right_sym,
        |       c AS pair_count
        |FROM ($union) ORDER BY iter""".stripMargin
  }

  /** q147's oracle: re-learn the segmentation, then re-tokenize the corpus
    * against it. */
  val bpeApplyOracle: String =
    oracleChain + ",\n" +
      s"""toks2 AS (
        |  SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS w
        |  FROM documents),
        |app AS (
        |  SELECT t.source, t.w, len(string_split(v.spaced, ' ')) AS n_syms
        |  FROM toks2 t JOIN v$K v ON t.w = v.w
        |  WHERE length(t.w) BETWEEN 1 AND $MaxWord)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(n_syms) AS BIGINT) AS total_subtokens,
        |  CAST(sum(length(w)) AS BIGINT) AS total_chars
        |FROM app GROUP BY source ORDER BY source""".stripMargin

  // -------------------------------------------------------------------------
  // q217 — VOCABULARY-SIZE sweep: corpus subtoken economics at k = 2, 4,
  // and 8 merges — the "how much compression does each merge buy"
  // operating curve a tokenizer-budget decision reads (vocab size trades
  // embedding-table memory against sequence length; the curve's knee is
  // the standard pick). The q176/q184 sweep discipline applied to
  // tokenizer TRAINING: all three operating points come from ONE learning
  // run ([[learnWithSnapshots]] — the k-merge vocabulary is a prefix of
  // the K-merge run by construction).
  //
  // Scale: identical to q147 per leg — the segmentation vocabulary
  // broadcasts to an equi-join on the word, one aggregate per leg; the
  // corpus word relation materializes once for the three legs.
  // -------------------------------------------------------------------------

  /** q217's operating points (all ≤ [[K]]). */
  val SweepMerges = Seq(2, 4, 8)

  /** q217 — per merge count: words, subtokens, chars, chars-per-subtoken
    * ppm (the compression readout; 1e6 = one char per subtoken). */
  def q217BpeVocabSweep(spark: SparkSession, dir: String): DataFrame = {
    val snaps = learnWithSnapshots(spark, dir, SweepMerges.toSet)._2
    val words = Tables.documents(spark, dir)
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")).between(1, MaxWord))
      .localCheckpoint() // three sweep legs consume it
    val legs = SweepMerges.map { k =>
      val seg = snaps(k).select(col("w"),
        size(split(col("spaced"), " ")).cast("long").as("n_syms"))
      words.join(broadcast(seg), Seq("w"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_syms")).as("total_subtokens"),
          sum(length(col("w")).cast("long")).as("total_chars"))
        .select(lit(k.toLong).as("k_merges"), col("n_words"),
          col("total_subtokens"), col("total_chars"),
          expr("(1000000 * total_chars) DIV total_subtokens")
            .as("chars_per_subtoken_ppm"))
    }
    legs.reduce(_.unionByName(_)).orderBy(col("k_merges"))
  }

  /** q217's oracle: the SAME generated CTE chain exposes every
    * intermediate vocabulary — each sweep leg re-tokenizes against v2/v4/
    * v8 independently. */
  val bpeVocabSweepOracle: String = {
    val legs = SweepMerges.map { k =>
      s"""SELECT CAST($k AS BIGINT) AS k_merges, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(len(string_split(v.spaced, ' '))) AS BIGINT) AS total_subtokens,
         |  CAST(sum(length(t.w)) AS BIGINT) AS total_chars,
         |  (1000000 * CAST(sum(length(t.w)) AS BIGINT))
         |    // CAST(sum(len(string_split(v.spaced, ' '))) AS BIGINT)
         |    AS chars_per_subtoken_ppm
         |FROM toks t JOIN v$k v ON t.w = v.w
         |WHERE length(t.w) BETWEEN 1 AND $MaxWord""".stripMargin
    }.mkString("\nUNION ALL\n")
    oracleChain + s"\nSELECT * FROM (\n$legs\n) ORDER BY k_merges"
  }
}
