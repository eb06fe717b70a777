package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BoundedTopKSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  /** Random (bkey, nkp, id, sim) rows with one deliberately hot key. */
  private def fixture(seed: Int, n: Int, hotShare: Double) = {
    import spark.implicits._
    val r = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      val bkey = if (r.nextDouble() < hotShare) 7L else r.nextInt(40).toLong
      (bkey, r.nextLong(), i.toLong, r.nextLong())
    }
    // many input partitions → partial buffers really merge across tasks
    rows.toDF("bkey", "nkp", "id", "sim").repartition(8)
  }

  private def viaAggregate(df: org.apache.spark.sql.DataFrame, cap: Int) =
    df.groupBy(col("bkey"))
      .agg(gf.bounded_topk(col("nkp"), col("id"), col("sim"), cap).as("r"))
      .select(
        col("bkey"), col("r.ms.id").as("ids"),
        col("r.ms.simhash").as("sims"),
        greatest(col("r.total") - cap, lit(0L)).as("dropped"))

  private def viaWindow(df: org.apache.spark.sql.DataFrame, cap: Int) = {
    val wB = Window.partitionBy(col("bkey")).orderBy(col("nkp"), col("id"))
    val wBu = Window.partitionBy(col("bkey"))
    df.withColumn("krank", row_number().over(wB))
      .withColumn("kcnt", count(lit(1)).over(wBu))
      .where(col("krank") <= cap)
      .groupBy(col("bkey"))
      .agg(
        sort_array(collect_list(struct(col("krank"), col("id"), col("sim")))).as("ms"),
        max(greatest(col("kcnt") - cap, lit(0))).cast("long").as("dropped"))
      .select(
        col("bkey"), col("ms.id").as("ids"), col("ms.sim").as("sims"), col("dropped"))
  }

  test("bit-identical to the window rank formulation, incl. hot-key drops") {
    for ((seed, n, hot) <- Seq((1, 2000, 0.5), (2, 500, 0.0), (3, 3000, 0.9))) {
      val df = fixture(seed, n, hot)
      val cap = 16
      val a = viaAggregate(df, cap).collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2), r.getLong(3)))
        .sortBy(_._1)
      val w = viaWindow(df, cap).collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2), r.getLong(3)))
        .sortBy(_._1)
      assert(a.toSeq == w.toSeq, s"seed=$seed mismatch")
    }
  }

  test("groups smaller than cap keep every member, zero dropped") {
    import spark.implicits._
    val df = Seq((1L, 5L, 1L, 9L), (1L, 3L, 2L, 8L), (2L, 1L, 3L, 7L))
      .toDF("bkey", "nkp", "id", "sim")
    val out = viaAggregate(df, 16).collect().map(r =>
      (r.getLong(0), r.getSeq[Long](1), r.getLong(3))).sortBy(_._1)
    // bkey 1: member (nkp=3,id=2) sorts before (nkp=5,id=1)
    assert(out.toSeq == Seq((1L, Seq(2L, 1L), 0L), (2L, Seq(3L), 0L)))
  }

  test("plan: partial (map-side) aggregation — two ObjectHashAggregate passes") {
    val df = fixture(4, 200, 0.3)
    val plan = viaAggregate(df, 8).queryExecution.executedPlan.toString()
    val nAgg = "ObjectHashAggregate".r.findAllIn(plan).length
    assert(nAgg >= 2, s"expected partial+final ObjectHashAggregate:\n$plan")
    assert(plan.contains("bounded_topk"), plan)
  }

  test("SQL call with INT columns implicit-casts instead of crashing (ADVICE r2)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq((1, 10, 100), (1, 20, 200), (1, 30, 300)).toDF("g", "i", "s")
      .createOrReplaceTempView("btk_int_in")
    // i and s are INT columns; without declared inputTypes this threw
    // ClassCastException at execution time
    val r = spark.sql(
      "SELECT bounded_topk(CAST(g AS LONG), i, s, 2) AS r FROM btk_int_in GROUP BY g")
      .selectExpr("r.total AS total", "size(r.ms) AS kept").head()
    assert(r.getLong(0) == 3L && r.getInt(1) == 2)
  }

  test("serde roundtrip preserves members and total") {
    val agg = BoundedTopK(null, null, null, cap = 4)
    val buf = agg.createAggregationBuffer()
    for (i <- 0 until 10) buf.add(nkp = 10L - i, id = i.toLong, sim = i.toLong)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.total == 10L)
    val kept = back.heap.toArray(new Array[Array[Long]](back.heap.size))
      .map(m => (m(0), m(1))).sorted.toSeq
    // smallest 4 nkp values survive: nkp 1..4 (i = 9..6)
    assert(kept == Seq((1L, 9L), (2L, 8L), (3L, 7L), (4L, 6L)))
  }
}
