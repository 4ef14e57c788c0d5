package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 optimization pins: the codegen'd sorted-merge verify kernel
  * (graft_min_mass) must equal the declarative form it replaced in
  * [[graft.operators.SimJoin]]'s weighted verify stage — on random
  * multisets including the edge shapes (empty side, disjoint, identical,
  * single-element). */
class Round14Spec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("round14-spec").getOrCreate()

  test("graft_min_mass over sorted (terms, tfs) == brute-force Σ least(tf_a, tf_b)") {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val vocab = (0 until 30).map(i => s"w$i")
    def randomTf(): Map[String, Long] =
      rnd.shuffle(vocab).take(rnd.nextInt(vocab.size + 1))
        .map(t => t -> (1L + rnd.nextInt(9))).toMap
    val cases = Seq(
      (Map.empty[String, Long], Map.empty[String, Long]),
      (Map("a" -> 3L), Map.empty[String, Long]),
      (Map("a" -> 3L), Map("a" -> 5L)),
      (Map("a" -> 3L, "b" -> 1L), Map("c" -> 2L))) ++
      (1 to 200).map(_ => (randomTf(), randomTf()))
    val expected = cases.map { case (ma, mb) =>
      ma.keySet.intersect(mb.keySet).toSeq.map(k => math.min(ma(k), mb(k))).sum
    }
    val df = cases.map { case (ma, mb) =>
      val ea = ma.toSeq.sortBy(_._1)
      val eb = mb.toSeq.sortBy(_._1)
      (ea.map(_._1), ea.map(_._2), eb.map(_._1), eb.map(_._2))
    }.toDF("tsa", "fsa", "tsb", "fsb")
    val got = df.select(call_function("graft_min_mass",
      col("tsa"), col("fsa"), col("tsb"), col("fsb"))).as[Long].collect()
    assert(got.toSeq === expected)
  }

  test("sort_array struct order matches the kernel's term merge order " +
       "(non-ASCII + prefix terms)") {
    // the leaf sorts (term, tf) structs; the kernel merges by
    // UTF8String.compareTo — pin that both orders agree on tricky strings
    graft.functions.VectorFunctions.ensureRegistered(spark)
    import spark.implicits._
    val terms = Seq("a", "ab", "A", "z", "Z", "ä", "é", "~", "0", "aa")
    val tfs = terms.indices.map(i => (i + 1).toLong)
    val df = Seq((terms, tfs)).toDF("t", "f")
      .select(sort_array(arrays_zip(col("t"), col("f"))).as("e"))
      .select(transform(col("e"), _.getField("t")).as("ts"),
              transform(col("e"), _.getField("f")).as("fs"))
    val self = df.select(call_function("graft_min_mass",
      col("ts"), col("fs"), col("ts"), col("fs"))).as[Long].head()
    assert(self === tfs.sum) // every term matches itself exactly once
  }
}
