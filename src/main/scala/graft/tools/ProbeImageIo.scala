package graft.tools

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.concurrent.{Callable, Executors, TimeUnit}
import javax.imageio.ImageIO
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}

/** Round-17 probe (VERDICT r16 #5): the m-family ANTI-scales — 32 cores
  * run 2-5x SLOWER than 8 on the decode-bound queries. Hypothesis: the
  * JDK's `ImageIO.read(InputStream)` / `ImageIO.write(_, _, OutputStream)`
  * convenience overloads default to FILE-cached image streams
  * (`ImageIO.getUseCache` is true), so every decode/encode creates and
  * deletes a temp FILE (`File.createTempFile` → shared SecureRandom lock
  * + /tmp inode churn) — a per-call cost that CONTENDS across threads,
  * so more cores make it worse. This probe times pure-JVM parallel
  * decode+encode at several thread counts under (a) the default
  * file-cache path and (b) explicit MemoryCache image streams, no Spark
  * involved, so the mechanism is isolated from scheduling noise.
  */
object ProbeImageIo {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("PROBE_N", "2000").toInt
    // one payload pool, built single-threaded up front (default path —
    // build cost is not under test)
    val payloads = (0 until 64).map { i =>
      graft.multimodal.Multimodal.encodeImage(i.toLong, 8 + i % 24, 8 + (i * 3) % 24, "jpg")
    }.toArray

    def decodeDefault(b: Array[Byte]): Int = {
      val img = ImageIO.read(new ByteArrayInputStream(b))
      img.getWidth
    }
    def decodeMem(b: Array[Byte]): Int = {
      // ImageIO.read(ImageInputStream) closes the stream itself
      val img = ImageIO.read(
        new MemoryCacheImageInputStream(new ByteArrayInputStream(b)))
      img.getWidth
    }
    def encodeDefault(b: Array[Byte]): Int = {
      val img = ImageIO.read(new ByteArrayInputStream(b))
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.size()
    }
    def encodeMem(b: Array[Byte]): Int = {
      val img = ImageIO.read(
        new MemoryCacheImageInputStream(new ByteArrayInputStream(b)))
      val bos = new ByteArrayOutputStream()
      val ios = new MemoryCacheImageOutputStream(bos)
      try ImageIO.write(img, "png", ios) finally ios.close()
      bos.size()
    }

    def time(threads: Int, f: Array[Byte] => Int): Double = {
      val pool = Executors.newFixedThreadPool(threads)
      val t0 = System.nanoTime()
      val futs = (0 until threads).map { t =>
        pool.submit(new Callable[Long] {
          override def call(): Long = {
            var acc = 0L
            var i = 0
            while (i < n / threads) {
              acc += f(payloads((t * 31 + i) % payloads.length))
              i += 1
            }
            acc
          }
        })
      }
      futs.foreach(_.get())
      pool.shutdown(); pool.awaitTermination(1, TimeUnit.MINUTES)
      (System.nanoTime() - t0) / 1e9
    }

    // warmup JIT on both paths
    time(4, decodeDefault); time(4, decodeMem)
    time(4, encodeDefault); time(4, encodeMem)
    println(f"${"threads"}%8s ${"dec-file"}%9s ${"dec-mem"}%9s ${"enc-file"}%9s ${"enc-mem"}%9s   ($n ops each)")
    for (threads <- Seq(1, 8, 32)) {
      val df = time(threads, decodeDefault)
      val dm = time(threads, decodeMem)
      val ef = time(threads, encodeDefault)
      val em = time(threads, encodeMem)
      println(f"$threads%8d $df%8.2fs $dm%8.2fs $ef%8.2fs $em%8.2fs")
    }
  }
}
