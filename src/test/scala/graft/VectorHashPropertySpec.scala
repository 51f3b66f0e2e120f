package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorFunctions}

/** Round-15 generative pins (VERDICT r14 #4): the remaining codegen
  * vector/hash expressions checked against INDEPENDENT driver-side
  * references on random inputs — not against their own composed
  * DataFrame twins, which share failure modes with the expressions.
  * Same recipe as the r13/r14 layout/hash pins: raw ScalaCheck `Gen`
  * with fixed seeds, 15 cases per family, evaluated through a real
  * DataFrame projection so the CODEGEN path is what's exercised.
  *
  * Covered here: `SrpSignatures` (fused LSH signature pass),
  * `CellDists` (fused coarse-centroid scorer), `PqCodes` /
  * `PqCodesResidual` (fused PQ encoders incl. the ADC residual-
  * correction math), and the `Fingerprint64`/`Mix64` chain the dedup
  * family's oracles rest on.
  */
class VectorHashPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 15): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1500L + i)))

  private def vecGen(dim: Int): Gen[Seq[Double]] =
    Gen.listOfN(dim, Gen.chooseNum(-3.0, 3.0)).map(_.toSeq)

  // ---- SrpSignatures ----

  /** Independent reference: bit b of signature t is set iff
    * v · plane(t,b) > 0, accumulated in index order; a vector whose
    * length differs from the plane dim yields ALL-ZERO signatures. */
  private def srpRef(v: Seq[Double], planes: Seq[Seq[Seq[Double]]]): Seq[Long] =
    planes.map { table =>
      if (v.length != table.head.length) 0L
      else table.zipWithIndex.foldLeft(0L) { case (acc, (plane, b)) =>
        var s = 0.0; var i = 0
        while (i < plane.length) { s += v(i) * plane(i); i += 1 }
        if (s > 0.0) acc | (1L << b) else acc
      }
    }

  test("SrpSignatures equals the driver bit-by-bit reference at random " +
    "plane matrices, vectors, and dims (wrong-length → all-zero)") {
    val gen = for {
      nTables <- Gen.chooseNum(1, 4)
      nBits   <- Gen.chooseNum(1, 10)
      dim     <- Gen.chooseNum(1, 6)
      planes  <- Gen.listOfN(nTables,
                   Gen.listOfN(nBits, vecGen(dim).map(_.toSeq)))
      nVec    <- Gen.chooseNum(1, 8)
      // mostly the right dim; sometimes off by one (the all-zero path)
      vecs    <- Gen.listOfN(nVec, Gen.frequency(
                   4 -> vecGen(dim),
                   1 -> vecGen(math.max(1, dim - 1)),
                   1 -> vecGen(dim + 1)))
    } yield (planes.map(_.map(_.toSeq).toSeq).toSeq, vecs.toSeq)
    samples(gen).foreach { case (planes, vecs) =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "v")
      val got = df.select(col("id"),
          VectorFunctions.srp_signatures(col("v"), planes).as("s"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
      vecs.zipWithIndex.foreach { case (v, i) =>
        assert(got(i) == srpRef(v, planes),
          s"srp mismatch at vec $i (dim ${v.length}, planes " +
            s"${planes.size}x${planes.head.size}x${planes.head.head.size})")
      }
    }
  }

  // ---- CellDists ----

  /** Independent reference: element c = ‖cen_c‖² − 2·(v·cen_c), sums in
    * index order; wrong-length vector → every element null. */
  private def cellRef(v: Seq[Double], cents: Seq[Seq[Double]]): Seq[Option[Double]] =
    if (v.length != cents.head.length) cents.map(_ => None)
    else cents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += v(i) * c(i); i += 1 }
      Some(c.map(x => x * x).sum - 2.0 * s)
    }

  test("CellDists equals the driver norms²−2·dot reference bit-for-bit " +
    "at random centroid matrices (wrong-length → all-null elements)") {
    val gen = for {
      nCells <- Gen.chooseNum(1, 6)
      dim    <- Gen.chooseNum(1, 5)
      cents  <- Gen.listOfN(nCells, vecGen(dim))
      nVec   <- Gen.chooseNum(1, 8)
      vecs   <- Gen.listOfN(nVec, Gen.frequency(
                  4 -> vecGen(dim), 1 -> vecGen(dim + 1)))
    } yield (cents.map(_.toSeq).toSeq, vecs.toSeq)
    samples(gen).foreach { case (cents, vecs) =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "v")
      val got = df.select(col("id"),
          VectorFunctions.cell_dists(col("v"), cents).as("d"))
        .collect().map { r =>
          r.getInt(0) -> r.getSeq[Any](1)
            .map(x => Option(x).map(_.asInstanceOf[Double]))
        }.toMap
      vecs.zipWithIndex.foreach { case (v, i) =>
        // exact equality: the reference replays the same IEEE order
        assert(got(i) == cellRef(v, cents), s"cell_dists mismatch at vec $i")
      }
    }
  }

  // ---- PqCodes / PqCodesResidual ----

  /** Independent reference for both PQ encoders: per-subspace argmin of
    * ‖cb‖² − 2·v_sub·cb (+ 2·coarse_sub·cb when a residual cell is
    * given), first-minimum tie-break; subspace j null when the vector
    * is too short for its slice, ALL subspaces null when the residual
    * cell is absent/invalid. */
  private def pqRef(v: Seq[Double], cbs: Seq[Seq[Seq[Double]]], dsub: Int,
                    residual: Option[(Seq[Seq[Double]], Int)]): Seq[Option[Int]] =
    cbs.zipWithIndex.map { case (book, j) =>
      val cellOk = residual.forall { case (coarse, cell) =>
        cell >= 0 && cell < coarse.length }
      if ((j + 1) * dsub <= v.length && cellOk) {
        var best = Double.MaxValue; var bi = -1
        book.zipWithIndex.foreach { case (cb, c) =>
          var s = 0.0; var i = 0
          while (i < dsub) { s += v(j * dsub + i) * cb(i); i += 1 }
          var d = cb.map(x => x * x).sum - 2.0 * s
          residual.foreach { case (coarse, cell) =>
            d += 2.0 * (0 until dsub)
              .map(i => coarse(cell)(j * dsub + i) * cb(i)).sum }
          if (d < best) { best = d; bi = c }
        }
        if (bi >= 0) Some(bi) else None
      } else None
    }

  private def pqCaseGen = for {
    m    <- Gen.chooseNum(1, 4)
    dsub <- Gen.chooseNum(1, 3)
    ksub <- Gen.chooseNum(1, 5)
    cbs  <- Gen.listOfN(m, Gen.listOfN(ksub, vecGen(dsub)))
    nVec <- Gen.chooseNum(1, 6)
    // right-sized, short (partial subspaces), and long (tail ignored)
    vecs <- Gen.listOfN(nVec, Gen.oneOf(
              vecGen(m * dsub),
              Gen.chooseNum(0, m * dsub - 1).flatMap(vecGen),
              vecGen(m * dsub + 2)))
  } yield (m, dsub, ksub, cbs.map(_.map(_.toSeq).toSeq).toSeq, vecs.toSeq)

  private def collectCodes(df: org.apache.spark.sql.DataFrame): Map[Int, Seq[Option[Int]]] =
    df.collect().map { r =>
      r.getInt(0) -> r.getSeq[Any](1)
        .map(x => Option(x).map(_.asInstanceOf[Int]))
    }.toMap

  test("PqCodes equals the driver per-subspace argmin reference at " +
    "random codebooks (short vector → null codes, long tail ignored)") {
    samples(pqCaseGen).foreach { case (m, dsub, _, cbs, vecs) =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "v")
      val got = collectCodes(df.select(col("id"),
        VectorFunctions.pq_codes(col("v"), cbs, m * dsub).as("c")))
      vecs.zipWithIndex.foreach { case (v, i) =>
        assert(got(i) == pqRef(v, cbs, dsub, None),
          s"pq_codes mismatch at vec $i (m=$m dsub=$dsub len=${v.length})")
      }
    }
  }

  test("PqCodesResidual equals the driver argmin-with-ADC-correction " +
    "reference; a NULL cell yields all-null codes") {
    val gen = for {
      base   <- pqCaseGen
      nCells <- Gen.chooseNum(1, 4)
      coarse <- Gen.listOfN(nCells, vecGen(base._1 * base._2))
      cells  <- Gen.listOfN(base._5.length,
                  Gen.option(Gen.chooseNum(0, nCells - 1)))
    } yield (base, coarse.map(_.toSeq).toSeq, cells.toSeq)
    samples(gen).foreach { case ((m, dsub, _, cbs, vecs), coarse, cells) =>
      val df = vecs.zip(cells).zipWithIndex
        .map { case ((v, cell), i) => (i, v, cell) }.toDF("id", "v", "cell")
      val got = collectCodes(df.select(col("id"),
        VectorFunctions.pq_codes_residual(col("v"), col("cell"),
          cbs, coarse, m * dsub).as("c")))
      vecs.zip(cells).zipWithIndex.foreach { case ((v, cell), i) =>
        val want = pqRef(v, cbs, dsub, Some((coarse, cell.getOrElse(-1))))
        assert(got(i) == want,
          s"pq_codes_residual mismatch at vec $i cell=$cell")
      }
    }
  }

  // ---- Fingerprint64 / Mix64 ----

  /** Independent references: the Karp–Rabin fold over UTF-8 bytes and
    * the published murmur3 fmix64 finalizer. */
  private def fpRef(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + (b & 0xffL))
  private def mixRef(v: Long): Long = {
    var h = v
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33; h
  }

  test("Fingerprint64 and mix64∘fingerprint64 equal the driver UTF-8 " +
    "fold + fmix64 references on random multilingual strings") {
    // multi-byte classes on purpose: 2-byte (é/ß), 3-byte (CJK), and
    // 4-byte surrogate-pair (𝄞/😀) code points all stress the BYTE-level
    // fold against a reference computed from a plain String
    val token = Gen.oneOf(Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("é", "ß", "中", "文", "𝄞", "😀", " ", "\n", "'", "\\"))
    val gen = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, token))
      .map(_.mkString)
    val strs = samples(gen).distinct
    val df = strs.zipWithIndex.map { case (s, i) => (i, s) }.toDF("id", "s")
    val got = df.select(col("id"),
        TextFunctions.fingerprint64(col("s")).as("fp"),
        TextFunctions.mix64(TextFunctions.fingerprint64(col("s"))).as("mx"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    strs.zipWithIndex.foreach { case (s, i) =>
      val fp = fpRef(s)
      assert(got(i) == (fp, mixRef(fp)),
        s"fingerprint/mix mismatch on ${s.take(20).replaceAll("\\s", "_")}")
    }
  }

  test("Mix64 equals the driver fmix64 reference on random longs " +
    "(including the avalanche edge values)") {
    val gen = Gen.oneOf(Gen.chooseNum(Long.MinValue, Long.MaxValue),
      Gen.oneOf(0L, 1L, -1L, Long.MinValue, Long.MaxValue))
    val vals = samples(gen).distinct
    val df = vals.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "v")
    val got = df.select(col("id"), TextFunctions.mix64(col("v")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    vals.zipWithIndex.foreach { case (v, i) =>
      assert(got(i) == mixRef(v), s"mix64 mismatch on $v")
    }
  }
}
