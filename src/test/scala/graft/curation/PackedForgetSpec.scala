package graft.curation

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Curation.forgetFromPackedCorpus]] — the packed-corpus half of the
  * right-to-be-forgotten propagation (the ANN-index half lives in
  * AnnIndexSpec): exact removal, untouched strata byte-stable, the
  * manifest-gate invariant across the forget, and crash healing.
  */
class PackedForgetSpec extends SparkSpec {
  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  private def corpus(base: String) = {
    val d = Seq(
      (1L, words("a", 25), "en", "s"), (2L, words("b", 7), "en", "s"),
      (3L, words("c", 13), "fr", "s"), (4L, words("d", 4), "fr", "s"),
      (5L, words("e", 9), "de", "s"))
      .toDF("doc_id", "text", "lang", "source")
    Curation.writePackedCorpus(d, base, seqTokens = 10)
    d
  }

  test("forget removes exactly the ids' segments and refreshes the manifest") {
    val base = Files.createTempDirectory("packed_forget").toString
    corpus(base)
    val preSegs = spark.read.parquet(s"$base/segments")
    val doc1Segs = preSegs.filter(col("doc_id") === 1L).count()
    assert(doc1Segs == 3L) // 25 tokens at L=10

    // record untouched strata file state (de and fr have no doc 1)
    def files(lang: String) =
      Option(new java.io.File(s"$base/segments/lang=$lang").listFiles())
        .map(_.filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified)).toSet).getOrElse(Set.empty)
    val frBefore = files("fr"); val deBefore = files("de")

    val removed = Curation.forgetFromPackedCorpus(spark, base,
      Seq(1L).toDF("doc_id"))
    assert(removed == doc1Segs)

    // the loader serves the post-forget corpus without complaint,
    // and the forgotten doc is gone
    val (manifest, segs) = Curation.readPackedCorpus(spark, base)
    assert(segs.filter(col("doc_id") === 1L).isEmpty)
    val en = manifest.filter(col("lang") === "en")
      .select("sequences", "segments", "tokens").head()
    // doc 2 (7 tokens) is all that remains of en
    assert(en.getLong(1) >= 1L && en.getLong(2) == 7L)

    // strata without forgotten docs were not rewritten
    assert(files("fr") == frBefore && files("de") == deBefore)
  }

  test("a reader mid-forget refuses; re-running forget heals a crash") {
    val base = Files.createTempDirectory("packed_forget_crash").toString
    corpus(base)
    // simulate the crash window: stratum data already swapped (here:
    // stranded under backup with live missing), manifest still stale
    val segDir = new java.io.File(s"$base/segments")
    val en = new java.io.File(segDir, "lang=en")
    val bak = new java.io.File(segDir, ".forget_bak")
    assert(bak.mkdirs())
    assert(en.renameTo(new java.io.File(bak, "lang=en")))

    // the manifest-gate catches it: en's rows are invisible, counts
    // mismatch, the loader must not serve
    intercept[IllegalArgumentException] {
      Curation.readPackedCorpus(spark, base)
    }

    // re-running forget heals: restore the stranded stratum, apply the
    // deletion, rewrite the manifest — then the loader serves again
    val removed = Curation.forgetFromPackedCorpus(spark, base,
      Seq(3L).toDF("doc_id"))
    assert(removed == 2L) // 13 tokens at L=10 -> 2 segments
    val (_, segs) = Curation.readPackedCorpus(spark, base)
    assert(segs.filter(col("doc_id") === 3L).isEmpty)
    assert(segs.filter(col("doc_id") === 1L).count() == 3L,
      "the stranded stratum must be restored whole")
  }

  test("forget of an absent id is a no-op; missing manifest is refused") {
    val base = Files.createTempDirectory("packed_forget_noop").toString
    corpus(base)
    val preSegs = spark.read.parquet(s"$base/segments").count()
    assert(Curation.forgetFromPackedCorpus(spark, base,
      Seq(999L).toDF("doc_id")) == 0L)
    assert(spark.read.parquet(s"$base/segments").count() == preSegs)
    Curation.readPackedCorpus(spark, base) // still serves

    val bare = Files.createTempDirectory("packed_forget_bare").toString
    intercept[IllegalArgumentException] {
      Curation.forgetFromPackedCorpus(spark, bare, Seq(1L).toDF("doc_id"))
    }
  }
}
