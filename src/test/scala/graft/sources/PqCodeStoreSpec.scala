package graft.sources

import graft.SparkSpec
import graft.ops.{IvfIndex, PqIndex, VectorOps}
import org.apache.spark.sql.functions._

/** The persisted PQ code-table artifact (r17 — VERDICT r16 item 1: encode
  * once at ingest, never per query): write-once semantics, exact recipe
  * parity with the direct pqEncode/ivfPqEncode derivation (codes ≡
  * recompute, the PairStore-style proof that lets every consumer's oracle
  * keep replaying the encode from codebook literals), nibble-packing
  * round-trip including the sign-bit corner, and the top-k consumers
  * producing identical results over either path.
  */
class PqCodeStoreSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  // The committed production artifacts for the fixture dataset — the spec
  // exercises the real models, not toy stand-ins.
  private lazy val books = PqIndex.loadIfPresent(sfDir, 16, 16, 4)
    .getOrElse(fail("committed PQ codebook artifact missing for sf0.001"))
  private lazy val cents = IvfIndex.loadIfPresent(sfDir, 64, 4)
    .getOrElse(fail("committed k=64 IVF artifact missing for sf0.001"))
  private lazy val resBooks = PqIndex.loadIfPresent(sfDir, 16, 16, 4, "res64x4")
    .getOrElse(fail("committed residual PQ codebook artifact missing for sf0.001"))

  test("packed code word round-trips every nibble, including bit 63") {
    // 16 nibbles of value 15 = the all-ones word (-1L): bit 63 is code_15's
    // high bit, and the logical-shift unpack must still read 15 from it.
    val allOnes = spark.range(1).select(lit(-1L).as("code"))
    val decoded = allOnes.select((0 until 16).map(i => VectorOps.pqCodeAt(col("code"), i).as(s"c$i")): _*)
      .collect().head
    (0 until 16).foreach(i => assert(decoded.getInt(i) === 15, s"nibble $i"))
    // And a mixed word: code_i = i.
    val mixed = spark.range(1)
      .select((0 until 16).map(i => shiftleft(lit(i.toLong), 4 * i).as(s"n$i")): _*)
      .select((0 until 16).map(i => col(s"n$i")).reduce(_.bitwiseOR(_)).as("code"))
      .select((0 until 16).map(i => VectorOps.pqCodeAt(col("code"), i).as(s"c$i")): _*)
      .collect().head
    (0 until 16).foreach(i => assert(mixed.getInt(i) === i, s"nibble $i"))
  }

  test("ensureRawCodes writes once and reuses the committed layout") {
    val path = new org.apache.hadoop.fs.Path(
      PqCodeStore.codesPath(spark, sfDir, PqCodeStore.rawVariant(16, 16, 4, books))).toUri.getPath
    val first = PqCodeStore.ensureRawCodes(spark, sfDir, books, 16, 16, 4)
    assert(first.count() === emb.count())
    val success = new java.io.File(path, "_SUCCESS")
    assert(success.exists())
    val stamp = success.lastModified()
    PqCodeStore.forgetForTest(spark, sfDir, PqCodeStore.rawVariant(16, 16, 4, books))
    val second = PqCodeStore.ensureRawCodes(spark, sfDir, books, 16, 16, 4)
    assert(second.count() === first.count())
    assert(success.lastModified() === stamp,
      "re-ensuring must not rewrite the committed artifact")
  }

  test("raw artifact content equals the direct pqEncode recompute, bit for bit") {
    val art = PqCodeStore.ensureRawCodes(spark, sfDir, books, 16, 16, 4)
    assert(art.columns.toSeq === Seq("vec_id", "code"))
    val direct = VectorOps.pqEncode(emb, "vec_id", "embedding", books)
    assert(art.except(direct).count() === 0 && direct.except(art).count() === 0)
  }

  test("IVF artifact content (raw and residual) equals the direct ivfPqEncode recompute") {
    for (residual <- Seq(false, true)) {
      val bb = if (residual) resBooks else books
      val art = PqCodeStore.ensureIvfCodes(spark, sfDir, cents, 64, 4, bb, 16, 16, 4, residual)
      assert(art.columns.toSeq === Seq("vec_id", "cell", "code"))
      val direct = VectorOps.ivfPqEncode(emb, "vec_id", "embedding", cents, bb, residual)
      withClue(s"residual=$residual: ") {
        assert(art.except(direct).count() === 0 && direct.except(art).count() === 0)
      }
    }
  }

  test("top-k consumers produce identical results over artifact and in-flight paths") {
    val queries = emb.where(col("vec_id") < 8)
    val viaArtifact = VectorOps.pqTopKCoded(
      PqCodeStore.ensureRawCodes(spark, sfDir, books, 16, 16, 4),
      emb, queries, "vec_id", "embedding", 5, books, rerank = 20)
    val inFlight = VectorOps.pqTopK(emb, queries, "vec_id", "embedding", 5, books, rerank = 20)
    assert(viaArtifact.except(inFlight).count() === 0 &&
      inFlight.except(viaArtifact).count() === 0)
    val ivfArtifact = VectorOps.ivfPqTopKCoded(
      PqCodeStore.ensureIvfCodes(spark, sfDir, cents, 64, 4, books, 16, 16, 4, residual = false),
      emb, queries, "vec_id", "embedding", 5, cents, nProbe = 16, books, rerank = 20)
    val ivfInFlight = VectorOps.ivfPqTopK(emb, queries, "vec_id", "embedding", 5,
      cents, nProbe = 16, books, rerank = 20)
    assert(ivfArtifact.except(ivfInFlight).count() === 0 &&
      ivfInFlight.except(ivfArtifact).count() === 0)
  }
}
