package graft

import org.apache.spark.sql.SparkSession

/** CLI dispatcher mirroring the reference's subcommands
  * (chainweb-data exec/Main.hs:51-105: listen, server, fill, richlist,
  * check-schema — the deprecated/variant fills share the `fill`
  * machinery here). A chainweb-data operator maps 1:1:
  *
  *   graft listen  <dropZone> <tableDir> <checkpoint>   — streaming ingest
  *   graft serve   <dataDir> <port> [tableDir]          — query API
  *   graft fill    <tableDir> (chain=genesis)*          — gap repair plan
  *   graft richlist <tableDir> <outDir>                 — maintenance pass
  *   graft check-schema <tableDir>                      — schema contract
  */
object Main {

  private def session(): SparkSession = SparkSession.builder()
    .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  def main(args: Array[String]): Unit = args.toList match {
    case "listen" :: zone :: tables :: ckpt :: Nil =>
      val q = streaming.Listen.stream(session(), zone, tables, ckpt)
      q.awaitTermination()

    case "serve" :: dataDir :: port :: rest =>
      val api = new server.Api(session(), dataDir, port.toInt, rest.headOption)
      api.start()
      println(s"serving on :${api.boundPort}")
      Thread.currentThread.join()

    case "fill" :: tables :: genesis =>
      val g = genesis.map { kv =>
        val Array(c, h) = kv.split("="); c.toLong -> h.toLong
      }.toMap
      val spark = session()
      val plan = plans.Gaps.plan(
        spark.read.parquet(s"$tables/blocks"), "chainid", "height", g)
      plan.foreach(r => println(s"${r.chainId}\t${r.lo}\t${r.hi}"))
      spark.stop()

    case "richlist" :: tables :: out :: Nil =>
      val spark = session()
      val rep = plans.Maintenance.run(spark, tables, out, genesis = Map.empty)
      println(s"richlist=${rep.richlistRows} supply=${rep.totalSupply}")
      spark.stop()

    case "check-schema" :: tables :: Nil =>
      val spark = session()
      val bad = ingest.Schemas.check(spark, tables)
      bad.foreach { case (t, why) => System.err.println(s"$t: $why") }
      spark.stop()
      if (bad.nonEmpty) sys.exit(1)

    case other =>
      System.err.println(
        s"""unknown command: ${other.mkString(" ")}
           |usage: listen|serve|fill|richlist|check-schema (see scaladoc)""".stripMargin)
      sys.exit(2)
  }
}
