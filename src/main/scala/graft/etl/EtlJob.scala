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
  *    target columns before the write.
  *  - `ddl` jobs run setup once, fixing reference quirk Q4 (DDL executed
  *    per extracted row, SURVEY.md §2.1).
  */
final case class EtlJob(
    name: String,
    extract: String,
    write: String,
    mode: String = "append",
    targetColumns: Seq[String] = Nil)

object EtlJob {

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
      EtlJob(
        name = p("name"),
        extract = p("extract"),
        write = p("write"),
        mode = p("mode", "append"),
        targetColumns = Option(props.getProperty(s"loader.jobs[$i].columns"))
          .map(_.split(",").map(_.trim).toSeq).getOrElse(Nil))
    }
  }
}
