package graft

import graft.text.Chunking
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkTestBase {
  import spark.implicits._

  private def chunksOf(tokens: Seq[String], size: Int, stride: Int): Seq[Seq[String]] =
    Seq(Tuple1(tokens)).toDF("t")
      .select(Chunking.chunks(col("t"), size, stride).as("c"))
      .collect()(0).getSeq[Seq[String]](0)

  test("overlapping windows cover every token; tail clamps short") {
    val t = (1 to 10).map(i => s"t$i")
    val c = chunksOf(t, 4, 3)
    assert(c === Seq(
      Seq("t1", "t2", "t3", "t4"),
      Seq("t4", "t5", "t6", "t7"),
      Seq("t7", "t8", "t9", "t10")))
    assert(c.flatten.toSet === t.toSet, "no token may be lost")
    // the last chunk is the FIRST reaching the end — no degenerate tail
    // chunk fully contained in its predecessor
    assert(chunksOf((1 to 49).map(_.toString), 64, 48).size === 1)
  }

  test("stride == size means disjoint chunks; empty docs yield no chunks") {
    assert(chunksOf((1 to 6).map(_.toString), 3, 3) ===
      Seq(Seq("1", "2", "3"), Seq("4", "5", "6")))
    assert(chunksOf(Nil, 4, 3) === Nil)
    assert(chunksOf(Seq("solo"), 64, 48) === Seq(Seq("solo")),
      "a doc shorter than one chunk is one short chunk")
  }

  test("invalid size/stride combinations are rejected eagerly") {
    intercept[IllegalArgumentException](Chunking.chunks(col("t"), 4, 5))
    intercept[IllegalArgumentException](Chunking.chunks(col("t"), 0, 0))
  }

  test("CDC: an early insertion re-syncs — downstream chunk fingerprints survive") {
    val base = (1 to 200).map(i => s"w$i") // aperiodic: every token unique
    val edited = "INSERTED" +: base // one token prepended
    val df = Seq((1L, base), (2L, edited)).toDF("doc_id", "tokens")
    val chunks = Chunking.cdcChunks(df, "doc_id", "tokens")
      .collect().map(r => (r.getLong(0), r.getString(4))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val shared = chunks(1L).intersect(chunks(2L))
    // content-defined boundaries re-align at the next content boundary
    assert(shared.nonEmpty, "CDC must re-sync after a prepended token")
    assert(shared.size >= chunks(1L).size / 2,
      s"most chunks must survive the edit: ${shared.size} of ${chunks(1L).size}")
    // sanity vs fixed-size: the same edit breaks EVERY 8-token fixed chunk
    val fixedA = base.grouped(8).map(_.mkString(" ")).toSet
    val fixedB = edited.grouped(8).map(_.mkString(" ")).toSet
    assert(fixedA.intersect(fixedB).isEmpty)
  }
}
