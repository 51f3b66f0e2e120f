package graft.etl

import java.util.Properties
import java.io.FileInputStream
import scala.jdk.CollectionConverters._

/** One ETL job: *(name, extract, write)* — the reference's job triple
  * (`LoaderBean.kt:9-15`, `application.properties:12-21`) re-expressed
  * for a Spark engine.
  *
  *  - `extract` is a Spark SQL statement evaluated natively over the
  *    registered source tables (the reference ships it verbatim to the
  *    source RDBMS, `EtlMain.kt:106-108`; we ARE the engine).
  *  - `write` names a target table/path instead of an INSERT statement:
  *    the reference's named-parameter INSERT + unused-binding tolerance
  *    (`DatabaseBean.kt:46`) becomes an explicit projection onto the
  *    target columns before the write. `fromProps` still accepts a full
  *    `INSERT INTO t (cols) VALUES (...)` statement (the reference's
  *    literal layout, `application.properties:18-21`) and parses the
  *    table + column list out of it.
  *  - `mode = "ddl"` jobs execute `write` as a statement exactly once,
  *    before any rows flow — fixing reference quirk Q4 where DDL rode
  *    the per-row insert path (`application.properties:12-15` job 0 ran
  *    its CREATE TABLE once per extracted row, SURVEY.md §2.1).
  *    `fromProps` infers it when `write` starts with a DDL verb.
  */
final case class EtlJob(
    name: String,
    extract: String,
    write: String,
    mode: String = "append",
    targetColumns: Seq[String] = Nil)

object EtlJob {

  private val DdlVerb = "(?is)^\\s*(create|drop|alter|truncate)\\b.*".r
  private val InsertStmt =
    "(?is)^\\s*insert\\s+into\\s+([\\w.]+)\\s*\\(([^)]*)\\)\\s*values\\b.*".r
  private val InsertNoCols =
    "(?is)^\\s*insert\\s+into\\s+([\\w.]+)\\s*values\\b.*".r
  private val InsertOther = "(?is)^\\s*insert\\b.*".r

  /** True when `write` is a DDL statement rather than a target name. */
  def isDdl(write: String): Boolean = DdlVerb.matches(write)

  /** Parse jobs from a java-properties file mirroring the reference's
    * `loader.jobs[i].{name,extract,write}` layout
    * (`application.properties:12-21`). */
  def fromProperties(path: String): Seq[EtlJob] = {
    val props = new Properties()
    val in = new FileInputStream(path)
    try props.load(in) finally in.close()
    fromProps(props)
  }

  def fromProps(props: Properties): Seq[EtlJob] = {
    val jobKeys = props.stringPropertyNames().asScala
      .flatMap { k =>
        "^loader\\.jobs\\[(\\d+)\\]\\.name$".r.findFirstMatchIn(k).map(_.group(1).toInt)
      }.toSeq.sorted
    jobKeys.map { i =>
      def p(field: String, default: String = null): String =
        Option(props.getProperty(s"loader.jobs[$i].$field")).getOrElse {
          if (default != null) default
          else throw new IllegalArgumentException(s"loader.jobs[$i].$field missing")
        }
      val rawWrite = p("write")
      val explicitCols = Option(props.getProperty(s"loader.jobs[$i].columns"))
        .map(_.split(",").map(_.trim).toSeq).getOrElse(Nil)
      rawWrite match {
        case w if isDdl(w) =>
          // reference job 0 shape: the write IS the setup statement
          EtlJob(p("name"), p("extract"), w, mode = p("mode", "ddl"))
        case InsertStmt(table, cols) =>
          // reference job 1 shape: full INSERT statement — the target
          // table and column list are parsed out; the named bindings
          // (:ID etc., DatabaseBean.kt:46) become the projection
          EtlJob(p("name"), p("extract"), table, mode = p("mode", "append"),
            targetColumns =
              if (explicitCols.nonEmpty) explicitCols
              else cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        case InsertNoCols(table) =>
          // column-list-less INSERT: all extracted columns flow through
          EtlJob(p("name"), p("extract"), table, mode = p("mode", "append"),
            targetColumns = explicitCols)
        case w if InsertOther.matches(w) =>
          // an INSERT we can't parse must not silently become a
          // table/path name (jdbc would fail cryptically; file formats
          // would create a garbage directory named after the statement)
          throw new IllegalArgumentException(
            s"loader.jobs[$i].write looks like an INSERT statement but " +
              s"could not be parsed (expected INSERT INTO <table> " +
              s"[(cols)] VALUES ...): $w")
        case w =>
          EtlJob(p("name"), p("extract"), w, mode = p("mode", "append"),
            targetColumns = explicitCols)
      }
    }
  }
}
