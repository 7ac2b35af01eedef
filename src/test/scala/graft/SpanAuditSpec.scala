package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the duplicated-span audit (q78) on a crafted corpus
  * where the right answer is computable by hand — the oracle gate
  * verifies engine-equality on the generated corpus, but only a
  * known-overlap fixture proves the MEANING: a 9-token passage shared
  * verbatim by two docs must yield exactly 5 duplicated 5-gram
  * positions merging to 9 covered tokens, and boundary 5-grams
  * (straddling unique context and the shared passage) must NOT count.
  * Also pins the unigram-LM score's (q79) ordering on the same
  * fixture: docs containing twice-occurring tokens score a higher
  * mean corpus frequency than an all-hapax doc.
  */
class SpanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // doc 1: all-unique tokens; docs 2 and 3: unique 5-token prefix +
  // shared 9-token passage + unique 5-token suffix. Distinct alphabets
  // keep every cross-doc 5-gram outside the passage unique.
  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("graft-span").toString
    val shared = (1 to 9).map(i => s"s$i").mkString(" ")
    def doc(id: Long, text: String) =
      (id, text, "en", "fixture", text.length.toLong)
    import spark.implicits._
    Seq(
        doc(1L, (1 to 20).map(i => s"a$i").mkString(" ")),
        doc(2L, (1 to 5).map(i => s"b$i").mkString(" ") + " " + shared + " " +
          (1 to 5).map(i => s"c$i").mkString(" ")),
        doc(3L, (1 to 5).map(i => s"d$i").mkString(" ") + " " + shared + " " +
          (1 to 5).map(i => s"e$i").mkString(" ")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q78: shared 9-token passage → 5 dup positions merging to 9 covered tokens") {
    val rows = SparkEntry.queries("q78_duplicated_spans")(spark, fixtureDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(rows(1L) === ((0L, 0L, 0.0)), "unique doc must report zero coverage")
    // 9-token passage: 5-grams at passage offsets 1..5 are cross-doc
    // duplicated; the merged interval covers 5 + 4·1 = 9 tokens of the
    // 19-token doc. Boundary 5-grams (b…s / s…c) are doc-unique.
    for (id <- Seq(2L, 3L)) {
      val (nPos, covered, frac) = rows(id)
      assert(nPos === 5L, s"doc $id dup positions")
      assert(covered === 9L, s"doc $id covered tokens")
      assert(frac === math.floor(9.0 * 1000000.0 / 19.0) / 1000000.0)
    }
  }

  test("q79: docs with repeated-token mass outscore an all-hapax doc") {
    val rows = SparkEntry.queries("q79_unigram_lm_score")(spark, fixtureDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(rows(1L)._1 === 20L)
    assert(rows(2L)._1 === 19L)
    // every doc-1 token is corpus-hapax; docs 2/3 carry the shared
    // passage whose tokens occur twice — strictly higher mean frequency
    assert(rows(2L)._2 > rows(1L)._2)
    assert(rows(3L)._2 > rows(1L)._2)
    assert(rows(2L)._2 === rows(3L)._2, "symmetric docs must score identically")
    rows.values.foreach { case (_, ppm) =>
      assert(ppm > 0L && ppm <= 1000000L)
    }
  }
}
