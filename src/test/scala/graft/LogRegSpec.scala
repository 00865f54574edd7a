package graft

import org.apache.spark.sql.functions._

import graft.operators.LogReg

/** Pins the distributed logistic-regression trainer: exact first-step
  * gradient arithmetic, convergence on a separable toy, and the
  * corpus teacher-recovery query (golden-pinned for cross-session
  * drift; this spec pins WHY the numbers are what they are).
  */
class LogRegSpec extends SparkSpec {

  import spark.implicits._

  test("first GD step from zero matches the hand-computed gradient") {
    // w=0,b=0 -> p=0.5 exactly; err = +-0.5 exactly (float dot of a
    // zero literal is exact), so one step is exact arithmetic:
    // g/n = (-0.25, 0.25), bias grad 0, loss = ln 2
    val toy = Seq((1L, Seq(1f, 0f), 1.0), (2L, Seq(0f, 1f), 0.0))
      .toDF("vec_id", "embedding", "y")
    val m = LogReg.fit(toy, col("y"), iters = 1, lr = 1.0, l2 = 0.0)
    assert(m.w.toSeq === Seq(0.25, -0.25))
    assert(m.b === 0.0)
    assert(math.abs(m.losses.head - math.log(2)) < 1e-12)
  }

  test("separable blobs: loss decreases monotonically to accuracy 1.0") {
    val pts = (0 until 40).map { i =>
      val y = i % 2
      val off = if (y == 1) 2f else -2f
      // deterministic jitter, linearly separable by the first dim
      (i.toLong, Seq(off + (i % 5) * 0.1f, (i % 7) * 0.1f - 0.3f), y.toDouble)
    }
    val df = pts.toDF("vec_id", "embedding", "y")
    val m = LogReg.fit(df, col("y"), iters = 40, lr = 2.0)
    assert(m.losses.zip(m.losses.tail).forall { case (a, b) => b < a },
      "full-batch GD loss must decrease every round at this rate")
    val acc = LogReg.score(df, m)
      .select(avg(((col("prob") >= 0.5).cast("double") === col("y"))
        .cast("double"))).head().getDouble(0)
    assert(acc === 1.0)
  }

  test("corpus teacher recovery: both classes learned, loss well under ln 2") {
    val out = graft.queries.TrainingQueries.logregEval(spark, sfDir)
      .collect().map(r => r.getBoolean(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out.keySet === Set(true, false))
    val (nT, posT, avgT, loss) = out(true)
    val (nF, posF, avgF, _) = out(false)
    assert(loss < 0.55, s"final loss $loss should be well under ln 2")
    assert(avgT > 0.55 && avgF < 0.45,
      s"mean probabilities must separate: $avgT vs $avgF")
    assert(posT > nT / 2 && posF < nF / 2)
  }

  test("trained weights are input-layout independent (the bake contract)") {
    // ModelOracle's baked weights are valid only if layoutKey training
    // is a pure function of the data — pin bit-exactly across
    // adversarial input layouts (see LloydKMeansSpec's twin)
    import org.apache.spark.sql.functions.col
    val emb = Tables(spark, sfDir, "embeddings")
    val y = graft.queries.TrainingQueries.teacherLabel
    val a = LogReg.fit(emb.repartition(7), y, iters = 3, lr = 10.0,
      layoutKey = Some("vec_id"))
    val b = LogReg.fit(
      emb.repartition(3, col("label")).sortWithinPartitions("label"),
      y, iters = 3, lr = 10.0, layoutKey = Some("vec_id"))
    assert(a.w.toSeq == b.w.toSeq && a.b == b.b &&
      a.losses == b.losses,
      "weights depend on the input layout — the baked oracle would " +
        "break under a different session geometry")
  }
}
