package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Trigram-profile + script-rule language id across the full fixture
  * language set. */
class LangIdSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("every held-out sentence classifies to its own language") {
    import spark.implicits._
    val d = LangProfiles.heldOut.zipWithIndex
      .map { case ((l, t), i) => (i.toLong, l, t) }
      .toDF("doc_id", "expected", "text")
    val got = LangId.langIdTrigram(d)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val misses = LangProfiles.heldOut.zipWithIndex.collect {
      case ((l, _), i) if got(i.toLong) != l => s"$l -> ${got(i.toLong)}"
    }
    assert(misses.isEmpty, s"misclassified: ${misses.mkString(", ")}")
  }

  test("script rules fire before the Latin vote; precedence ja over zh") {
    import spark.implicits._
    // kanji+kana mix must be ja (kana checked first), pure hanzi zh
    val d = Seq(
      (1L, "東京の朝は しずかです"),
      (2L, "北京的早晨很安静")).toDF("doc_id", "text")
    val got = LangId.langIdTrigram(d)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "ja" && got(2L) == "zh", s"got $got")
  }

  test("garbage and empty text fall through to und") {
    import spark.implicits._
    val d = Seq(
      (1L, "zzq xvj qqp wkz jjx vvq bbk"),
      (2L, ""),
      (3L, "xy")).toDF("doc_id", "text")
    val got = LangId.langIdTrigram(d)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "und", 2L -> "und", 3L -> "und"), s"got $got")
  }

  test("profile table is bounded and deterministic") {
    import spark.implicits._
    val d = Seq((1L, "x")).toDF("doc_id", "text")
    val p1 = LangId.profileTable(d, 200).collect().map(r => (r.getString(0), r.getString(1))).toSet
    val p2 = LangId.profileTable(d, 200).collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(p1 == p2)
    val perLang = p1.groupBy(_._1).map { case (l, g) => l -> g.size }
    assert(perLang.values.forall(_ <= 200))
    assert(perLang.keySet == LangProfiles.profileText.map(_._1).toSet)
  }
}
