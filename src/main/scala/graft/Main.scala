package graft

import graft.etl.{EtlJob, EtlRunner, Generator}

/** CLI dispatch — the reference's entry point shape (`EtlMain.kt:22-40`):
  * `import` seeds synthetic data; anything else runs the configured ETL
  * jobs sequentially.
  *
  * Usage:
  *   graft.Main import <outDir> [nRows]
  *   graft.Main run <jobs.properties> <sourceDir> <targetDir>
  *   graft.Main demo <workDir>        — the reference's two demo jobs
  *                                      (tableCreate + addrx) end-to-end
  */
object Main {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("graft-etl")
    val exit = args.toList match {
      case "import" :: outDir :: rest =>
        val n = rest.headOption.map(_.toLong).getOrElse(10000L)
        Generator.addresses(spark, n).write.mode("overwrite")
          .parquet(s"$outDir/addresses")
        println(s"Inserted $n addresses")  // logs the real count (fixes reference quirk Q1)
        0
      case "run" :: propsPath :: sourceDir :: targetDir :: Nil =>
        Tables.all.foreach { t =>
          val p = new java.io.File(s"$sourceDir/$t.parquet")
          if (p.exists()) EtlRunner.registerSource(spark, t, p.getPath)
        }
        val results = new EtlRunner(spark).runAll(EtlJob.fromProperties(propsPath), targetDir)
        if (results.forall(_.balanced)) 0 else 1
      case "demo" :: workDir :: Nil =>
        // the reference demo (application.properties:12-21): seed
        // addresses, then copy id < 13422 with a 6-column projection.
        Generator.addresses(spark, 20000L).write.mode("overwrite")
          .parquet(s"$workDir/addresses")
        EtlRunner.registerSource(spark, "addresses", s"$workDir/addresses")
        val job = EtlJob(
          name = "addrx",
          extract = """SELECT id, street_address, city, state, postal_code, country
                      |FROM addresses WHERE id < 13422""".stripMargin,
          write = "addrx", mode = "overwrite")
        val r = new EtlRunner(spark).runAll(Seq(job), workDir)
        if (r.forall(x => x.balanced && x.rowsWritten == 13421)) 0 else 1
      case other =>
        System.err.println(s"unknown args: ${other.mkString(" ")}")
        2
    }
    spark.stop()
    if (exit != 0) sys.exit(exit)
  }
}
