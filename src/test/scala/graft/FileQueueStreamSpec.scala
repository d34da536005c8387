package graft

import graft.streaming.FileQueue
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** T2 — the streaming file queue end-to-end: files are picked up in
  * order, processed exactly once within the checkpointed run, and
  * archived out of the source dir (cleanSource=archive = K5). */
class FileQueueStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("T2: file-queue stream processes all rows and archives consumed files") {
    val base = Files.createTempDirectory("graft_stream_").toString
    val src = s"$base/bronze/new"; val arch = s"$base/silver/processed"; val ckpt = s"$base/ckpt"
    new java.io.File(src).mkdirs()
    Files.write(java.nio.file.Paths.get(src, "d1.json"),
      """{"doc_id":1,"text":"a","lang":"en","source":"s1","n_chars":1}
        |{"doc_id":2,"text":"b","lang":"en","source":"s1","n_chars":1}""".stripMargin.getBytes)
    Files.write(java.nio.file.Paths.get(src, "d2.json"),
      """{"doc_id":3,"text":"c","lang":"fr","source":"s2","n_chars":1}""".stripMargin.getBytes)

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    // ProcessingTime (not AvailableNow): the source cleaner archives a
    // batch's files when a LATER batch commits, so the stream must stay
    // up past the data batch for the move to happen.
    val q = FileQueue.start(spark, src, graft.sources.Bronze.documentSchema, arch, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(200)) {
      (batch, _) => batch.collect().foreach(r => seen.add(r.getAs[Long]("doc_id")))
    }
    try {
      def archivedCount(): Int = {
        val d = new java.io.File(arch)
        if (!d.exists()) 0
        else {
          // sourceArchiveDir preserves the source path under the archive root
          var n = 0
          java.nio.file.Files.walk(d.toPath).forEach(p =>
            if (p.toString.endsWith(".json")) n += 1)
          n
        }
      }
      var tries = 0
      while (seen.size < 3 && tries < 120) { Thread.sleep(500); tries += 1 }
      assert(seen.toArray.map(_.asInstanceOf[Long]).sorted.toSeq == Seq(1L, 2L, 3L))
      // The source commits (and archives) batch N's files when batch N+1
      // starts — feed one more file to trigger the next batch.
      Files.write(java.nio.file.Paths.get(src, "d3.json"),
        """{"doc_id":4,"text":"d","lang":"de","source":"s3","n_chars":1}""".getBytes)
      tries = 0
      while (archivedCount() < 2 && tries < 120) { Thread.sleep(500); tries += 1 }
      assert(archivedCount() >= 2, "the first batch's files should be moved to the archive")
    } finally q.stop()
  }
}
