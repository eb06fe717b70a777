package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MinHashImpl

/** Manku WWW'07 permuted-table SimHash retrieval, driven end to end at
  * realistic bucket occupancy: table-key equality alone must retrieve every
  * planted Hamming ≤ (tableBlocks - tableKeep) pair (pigeonhole: flip ≤ d
  * of 64 bits split into B blocks; some keep-combination of B - d blocks is
  * untouched). */
class SimhashTablesSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("planted ≤3-bit flips are all retrieved by table-key equality at 20k docs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.gf

    val n = 20000
    val rnd = new scala.util.Random(7)
    val baseHashes = Array.fill(n)(rnd.nextLong())
    // plant 500 flipped copies: ids n..n+499 flip ≤3 distinct bits of base i
    val planted = (0 until 500).map { i =>
      val bits = Seq(rnd.nextInt(64), rnd.nextInt(64), rnd.nextInt(64)).distinct
      val flipped = bits.foldLeft(baseHashes(i))((h, b) => h ^ (1L << b))
      (n + i, flipped)
    }
    val all = baseHashes.zipWithIndex.map { case (h, i) => (i, h) } ++ planted
    val df = all.toSeq.toDF("id", "sh")

    val keys = df.select(col("id"), col("sh"),
      explode(gf.simhash_table_keys(col("sh"), 6, 3)).as("tk"))
    val pairs = keys.alias("a")
      .join(keys.alias("b"), col("a.tk") === col("b.tk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        gf.hamming_dist(col("a.sh"), col("b.sh")).as("ham"))
      .distinct()
      .where(col("ham") <= 3)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)))
      .toSet

    // completeness: every planted (i, n+i) pair retrieved
    (0 until 500).foreach { i =>
      assert(pairs.contains((i, n + i)), s"planted pair ($i, ${n + i}) missed")
    }
    // no false positives by construction of the ham filter; bucket sizes
    // stay tiny: 20 keys per doc over ~2^32-key tables
    val bucketMax = keys.groupBy(col("tk")).count().agg(max("count")).head().getLong(0)
    assert(bucketMax <= 16, s"pathological table bucket: $bucketMax members")
  }

  test("kernel pigeonhole: every ≤3-flip shares ≥1 of the C(6,3) table keys") {
    val rnd = new scala.util.Random(13)
    (0 until 200).foreach { _ =>
      val h = rnd.nextLong()
      val d = 1 + rnd.nextInt(3)
      val flipped = (0 until d).map(_ => rnd.nextInt(64))
        .foldLeft(h)((x, b) => x ^ (1L << b))
      val ka = MinHashImpl.simhashTableKeys(h, 6, 3).toSet
      val kb = MinHashImpl.simhashTableKeys(flipped, 6, 3).toSet
      assert(ka.intersect(kb).nonEmpty)
    }
  }
}
