package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.etl._

class EtlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("normalizeUppercase uppercases and rejects duplicates") {
    val df = Seq((1, "a")).toDF("id", "name")
    assert(SchemaTools.normalizeUppercase(df).columns.sameElements(Array("ID", "NAME")))
    val dup = Seq((1, 2)).toDF("id", "ID")
    val e = intercept[IllegalArgumentException](SchemaTools.normalizeUppercase(dup))
    assert(e.getMessage.contains("appeared twice"))
  }

  test("projectToTarget drops extra columns case-insensitively, keeps order") {
    val df = Seq((1, "x", "drop")).toDF("ID", "NAME", "EXTRA")
    val out = SchemaTools.projectToTarget(df, Seq("name", "id"))
    assert(out.columns.sameElements(Array("NAME", "ID")))
    val e = intercept[IllegalArgumentException](
      SchemaTools.projectToTarget(df, Seq("missing")))
    assert(e.getMessage.contains("missing"))
  }

  test("generator is deterministic and respects reference value domains") {
    val a = Generator.addresses(spark, 100).collect()
    val b = Generator.addresses(spark, 100).repartition(7).collect()
    assert(a.sortBy(_.getInt(0)).sameElements(b.sortBy(_.getInt(0))))
    assert(a.length == 100)
    val states = a.map(_.getAs[String]("state")).toSet
    assert(states.subsetOf(Set("CA", "NY", "TX", "FL", "IL")))
    val zips = a.map(_.getAs[String]("postal_code").toInt)
    assert(zips.forall(z => z >= 10000 && z <= 99999))
  }

  test("job config parses the reference properties layout") {
    val props = new java.util.Properties()
    props.setProperty("loader.jobs[0].name", "tableCreate")
    props.setProperty("loader.jobs[0].extract", "select 1")
    props.setProperty("loader.jobs[0].write", "setup")
    props.setProperty("loader.jobs[1].name", "addrx")
    props.setProperty("loader.jobs[1].extract", "SELECT * FROM addresses WHERE id < 13422")
    props.setProperty("loader.jobs[1].write", "addrx")
    props.setProperty("loader.jobs[1].columns", "id, city")
    val jobs = EtlJob.fromProps(props)
    assert(jobs.map(_.name) == Seq("tableCreate", "addrx"))
    assert(jobs(1).targetColumns == Seq("id", "city"))
  }

  test("runner end-to-end: demo copy job balances sent == written") {
    val work = Files.createTempDirectory("graft_etl").toString
    Generator.addresses(spark, 20000).write.mode("overwrite")
      .parquet(s"$work/addresses")
    EtlRunner.registerSource(spark, "addresses", s"$work/addresses")
    val job = EtlJob(
      name = "addrx",
      extract = "SELECT id, street_address, city, state, postal_code, country " +
        "FROM addresses WHERE id < 13422",
      write = "addrx", mode = "overwrite")
    val r = new EtlRunner(spark).runJob(job, work)
    assert(r.rowsSent == 13421)
    assert(r.rowsWritten == 13421)
    assert(r.balanced)
    val readBack = spark.read.parquet(s"$work/addrx")
    assert(readBack.count() == 13421)
    assert(readBack.columns.forall(c => c == c.toUpperCase))
  }
}
