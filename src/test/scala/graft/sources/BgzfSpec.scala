package graft.sources

import graft.SparkSpec

import java.nio.file.{Files, Paths}

/** Cross-validates the two independent BGZF member-boundary mechanisms:
  * the raw-byte scanner (Bgzf.nextMemberStart, used for un-indexed
  * splits) against the BSIZE-hop enumeration (BamIndex.build). */
class BgzfSpec extends SparkSpec {

  test("nextMemberStart lands on a true member boundary from any offset") {
    val dir = Files.createTempDirectory("bgzf")
    val src = Paths.get(resource("mito/sample_split.bam").stripPrefix("file:"))
    val bam = dir.resolve("s.bam")
    Files.copy(src, bam)
    BamIndex.build(bam.toString)
    val boundaries = BamIndex.read(bam.toString).map(_.offset).toSet
    val fileLen = Files.size(bam)
    val ch = new SeekableFile(bam.toString, new org.apache.hadoop.conf.Configuration())
    try {
      val probes = (0L until fileLen by 977L) ++ // arbitrary stride
        boundaries.take(50).map(_ + 1) ++        // just past real boundaries
        boundaries.take(50)                      // exactly on boundaries
      probes.foreach { off =>
        val next = Bgzf.nextMemberStart(ch, off, fileLen)
        assert(next == fileLen || boundaries.contains(next),
          s"offset $off -> $next is not a member boundary")
        // minimality: no boundary exists in [off, next)
        assert(!boundaries.exists(b => b >= off && b < next),
          s"offset $off skipped a boundary before $next")
      }
      // a boundary maps to itself
      boundaries.take(50).foreach { b =>
        assert(Bgzf.nextMemberStart(ch, b, fileLen) === b)
      }
    } finally ch.close()
  }

  test("BgzfInputStream serves bytes identical to whole-file gunzip") {
    val path = resource("mito/sample_split.bam").stripPrefix("file:")
    val viaGzip = {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.BufferedInputStream(Files.newInputStream(Paths.get(path))))
      val out = new java.io.ByteArrayOutputStream()
      in.transferTo(out); in.close(); out.toByteArray
    }
    val ch = new SeekableFile(path, new org.apache.hadoop.conf.Configuration())
    try {
      val s = new BgzfInputStream(ch, 0L)
      val out = new java.io.ByteArrayOutputStream()
      s.transferTo(out); s.close()
      assert(java.util.Arrays.equals(out.toByteArray, viaGzip))
    } finally ch.close()
  }
}
