package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import java.util.Base64

import org.apache.spark.sql.SparkSession

/** Ordered, checksummed table migrations — the reference's migration
  * machinery (chainweb-data lib/ChainwebDb/Migration.hs:55-138) beside the
  * [[Schemas]] contract check:
  *   - steps are named `<order>_<name>` and must be strictly ordered with
  *     no duplicate order;
  *   - the applied ledger must be a PREFIX of the declared steps, matching
  *     by (order, name) and base64(MD5(body)) checksum (matchSteps'
  *     three rules);
  *   - `run` applies the missing suffix in order and appends to the ledger;
  *     `check` only verifies and reports the missing names.
  *
  * The ledger is a JSON-lines file in the table directory (the analog of
  * beam-migrate's `schema_migrations` table); step bodies are arbitrary
  * `SparkSession => Unit` actions (DDL, rewrites, backfills).
  */
object Migrations {

  final case class Step(name: String, body: String, action: SparkSession => Unit) {
    val (order, baseName) = Migrations.parseName(name)
    def checksum: String = Migrations.md5b64(body)
  }

  final case class Applied(name: String, checksum: String)

  /** `<order>_<rest>` (Migration.hs parseScriptName). */
  def parseName(name: String): (String, String) = {
    val i = name.indexOf('_')
    require(i > 0, s"migration name must be <order>_<name>: $name")
    (name.substring(0, i), name.substring(i + 1))
  }

  def md5b64(body: String): String =
    Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("MD5").digest(body.getBytes(StandardCharsets.UTF_8)))

  private def ledgerPath(tableDir: String) = Paths.get(s"$tableDir/_migrations.jsonl")

  def ledger(tableDir: String): Seq[Applied] = {
    val p = ledgerPath(tableDir)
    if (!Files.exists(p)) Seq.empty
    else Files.readAllLines(p, StandardCharsets.UTF_8).toArray(Array.empty[String])
      .toSeq.filter(_.nonEmpty).map { line =>
        val name = """"name":"([^"]*)"""".r.findFirstMatchIn(line).get.group(1)
        val sum = """"checksum":"([^"]*)"""".r.findFirstMatchIn(line).get.group(1)
        Applied(name, sum)
      }
  }

  /** The three matchSteps rules; returns the missing suffix or an error. */
  def matchSteps(steps: Seq[Step], applied: Seq[Applied]): Either[String, Seq[Step]] = {
    val dup = steps.groupBy(_.order).collectFirst { case (o, ss) if ss.size > 1 =>
      s"Duplicate step order: $o for steps ${ss.map(_.name).mkString(", ")}" }
    if (dup.isDefined) return Left(dup.get)
    val ordered = steps.sortBy(_.order)
    if (applied.size > ordered.size)
      return Left(s"Unexpected migrations found: ${applied.drop(ordered.size).map(_.name).mkString(", ")}")
    ordered.zip(applied).foreach { case (s, a) =>
      if (s.name != a.name)
        return Left(s"Steps out of order: wanted ${s.name} but found ${a.name}")
      if (s.checksum != a.checksum)
        return Left(s"Checksum mismatch on ${s.name}: wanted ${s.checksum}, ledger has ${a.checksum}")
    }
    Right(ordered.drop(applied.size))
  }

  /** Verify only (the `migrate --check` action): Left = inconsistency,
    * Right = names still to run. */
  def check(tableDir: String, steps: Seq[Step]): Either[String, Seq[String]] =
    matchSteps(steps, ledger(tableDir)).map(_.map(_.name))

  /** The default step list the `migrate` CLI runs — the analog of the
    * reference's numbered migration scripts (its `1.0.0_*.sql` series
    * creates the tables). One real step: materialize every canonical
    * table as an empty parquet relation when absent. The body is the
    * canonical DDL text, so the checksum pins the schema: evolving
    * [[Flatten]]'s output after this step was applied surfaces as the
    * reference's checksum-mismatch error — schema changes must arrive as
    * NEW steps, never edits to applied ones. Declaring the body requires
    * deriving the schemas, hence the SparkSession argument. */
  def defaultSteps(spark: SparkSession, tables: String): Seq[Step] = {
    val schemas = Schemas.expected(spark).toSeq.sortBy(_._1)
    val ddl = schemas.map { case (n, s) => s"CREATE TABLE $n (${s.toDDL})" }
      .mkString(";\n")
    Seq(Step("1.0_create_tables", ddl, { sp =>
      schemas.foreach { case (name, schema) =>
        val path = java.nio.file.Paths.get(s"$tables/$name")
        if (!java.nio.file.Files.exists(path))
          sp.createDataFrame(sp.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                             schema)
            .write.parquet(path.toString)
      }
    }))
  }

  /** Apply the missing suffix in order, appending each applied step to the
    * ledger (RunMigrations). */
  def run(spark: SparkSession, tableDir: String, steps: Seq[Step]): Either[String, Seq[String]] =
    matchSteps(steps, ledger(tableDir)).map { missing =>
      missing.foreach { s =>
        s.action(spark)
        Files.writeString(ledgerPath(tableDir),
          s"""{"name":"${s.name}","checksum":"${s.checksum}"}\n""",
          StandardCharsets.UTF_8,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      }
      missing.map(_.name)
    }
}
