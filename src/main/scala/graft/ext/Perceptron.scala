package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Integer-exact batch perceptron — the trainable linear filter a
  * curation pipeline puts in front of expensive downstream stages
  * (fastText-style quality gating, language routing, boilerplate
  * triage). Floating-point SGD classifiers are order-dependent and
  * cannot be oracle-checked; the ROUND-SYNCHRONOUS batch variant is
  * deterministic: each round scores every row against the current
  * weights, aggregates ONE update from all misclassified rows, and
  * applies it — so training is a fixed unrollable recurrence over
  * BIGINT arithmetic (the PageRank/KMeans/Bpe discipline), and
  * `train`/`predict` replay exactly in SQL (q_perceptron /
  * q_perceptron_score).
  *
  * Semantics per round r (features x BIGINT, label y ∈ {−1, +1},
  * margin m = w·x with w₀ = 0): every row with y·m ≤ 0 (including the
  * all-zero start) contributes y·x to Δw; w ← w + Δw. This is the
  * classic batch (gradient-descent) perceptron; fixed `rounds` keeps
  * it oracle-expressible and is how production quality filters train
  * anyway (epoch-bounded).
  *
  * Scale shape: weights are dim+1 driver-side longs (the documented
  * bounded collect — the BPE-argmax budget, not data); each round is
  * ONE corpus scan with the weights folded in as literals (no join at
  * all: the margin is a codegen'd linear expression) and ONE
  * partial-aggregated sum of dim+1 columns — map-side combine
  * collapses every partition to one row, so the exchange is
  * executors × (dim+1) longs per round regardless of corpus size.
  * Nothing shuffles; at 100 TB the cost is `rounds` scans, which a
  * cached/columnar feature frame amortizes.
  *
  * Overflow is GUARDED, not hoped away: from one upfront max(|x|)
  * pass and the row count, the driver bounds every margin and every
  * update each round (|m| ≤ Σⱼ|wⱼ|·maxⱼ, |Δwⱼ| ≤ n·maxⱼ) and raises
  * loudly before a BIGINT could wrap (the PageRank.guardedNarrow
  * posture) — at |x| ≤ 10⁶ and a few dozen features this admits
  * corpora far beyond 10⁹ rows before tripping.
  */
object Perceptron {

  /** Trained weights, index-aligned with the feature columns; w(0) is
    * the bias (the implicit all-ones feature). */
  final case class Model(xCols: Seq[String], w: Array[Long]) {

    /** Margin expression w·(1, x) over a frame carrying `xCols`. */
    private[ext] def marginCol: Column =
      xCols.zipWithIndex.foldLeft(lit(w(0))) { case (acc, (c, j)) =>
        acc + lit(w(j + 1)) * col(c)
      }

    /** (idCol, margin, pred): BIGINT margin and its sign as the
      * predicted label (0 margin predicts −1 — the training rule's
      * "misclassified at zero" convention, so predict∘train is
      * consistent with the last round's classification).
      *
      * Inference data is NOT the training data: its feature magnitudes
      * were never covered by training's overflow bounds, so this face
      * re-checks |w|·max|x| against BIGINT from its own upfront
      * max-abs pass and raises loudly instead of wrapping (the
      * training-side guard's posture). One extra aggregate per predict
      * call — the price of never serving a wrapped margin. */
    def predict(features: DataFrame, idCol: String): DataFrame = {
      val aggs = xCols.map(c => max(abs(col(c).cast("long"))).as(c))
      val mx = features.agg(aggs.head, aggs.tail: _*).head()
      val bound =
        try xCols.indices.map(j => Math.multiplyExact(math.abs(w(j + 1)),
            if (mx.isNullAt(j)) 0L else mx.getLong(j)))
          .foldLeft(math.abs(w(0)))(Math.addExact)
        catch {
          case _: ArithmeticException => throw new ArithmeticException(
            "perceptron margin bound exceeds BIGINT on this data — " +
              "rescale features")
        }
      require(bound < Long.MaxValue / 2,
        "perceptron margin bound exceeds BIGINT on this data — " +
          "rescale features")
      features.select(col(idCol),
        marginCol.as("margin"),
        when(marginCol > 0, lit(1)).otherwise(lit(-1)).as("pred"))
    }
  }

  /** Train `rounds` batch-perceptron rounds over BIGINT feature
    * columns `xCols` and a label column `yCol` ∈ {−1, +1}. Returns
    * the final weights; see [[Model.predict]] for inference. */
  def train(features: DataFrame, yCol: String, xCols: Seq[String],
      rounds: Int): Model = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    require(xCols.nonEmpty, "at least one feature column")
    val f = select(features, yCol, xCols).localCheckpoint()
    // ONE bounds pass for the whole run — the frame is fixed across
    // rounds (re-deriving it per round would double every round's
    // aggregate count for nothing; the per-round guard only needs the
    // current weights against these constants)
    val (n, maxAbs) = bounds(f, xCols, allowEmpty = false)
    var w = Array.fill(xCols.size + 1)(0L)
    (1 to rounds).foreach { _ =>
      w = step(f, xCols, w, n, maxAbs)
    }
    Model(xCols, w)
  }

  /** AVERAGED batch perceptron (Freund–Schapire voting collapsed to
    * its practical form, Collins 2002): the returned weights are the
    * SUM of the weight vectors after each round, Σᵣ wᵣ — a positive
    * scaling (×rounds) of the true average, so every margin sign and
    * every margin ORDERING is identical to the averaged classifier
    * while staying BIGINT-exact (no division, no rationals — the
    * integer-µ discipline). Averaging is the variance-reduction step
    * production linear trainers ship by default: the final-round
    * weights oscillate on non-separable data (each round's bulk update
    * can overshoot), while the average damps the oscillation without
    * touching the update rule — and because it is a pure fold over the
    * same recurrence, it hash-gates (q_perceptron_avg) exactly like
    * the final-round face.
    *
    * Same scale shape as [[train]] (rounds corpus scans, dim+1-long
    * driver state, bounds checked before any pass); the accumulator
    * adds dim+1 `addExact`s per round — overflow raises loudly. */
  def trainAveraged(features: DataFrame, yCol: String, xCols: Seq[String],
      rounds: Int): Model = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    require(xCols.nonEmpty, "at least one feature column")
    val f = select(features, yCol, xCols).localCheckpoint()
    val (n, maxAbs) = bounds(f, xCols, allowEmpty = false)
    var w = Array.fill(xCols.size + 1)(0L)
    val acc = Array.fill(xCols.size + 1)(0L)
    (1 to rounds).foreach { _ =>
      w = step(f, xCols, w, n, maxAbs)
      try (0 until acc.length).foreach(j =>
        acc(j) = Math.addExact(acc(j), w(j)))
      catch {
        case _: ArithmeticException => throw new ArithmeticException(
          "averaged-perceptron accumulator exceeds BIGINT — rescale " +
            "features or reduce rounds")
      }
    }
    Model(xCols, acc)
  }

  /** ONE batch-perceptron round from the given starting weights — the
    * unit [[train]] iterates and [[graft.streaming.PerceptronStream]]
    * applies per micro-batch (online mini-batch learning): score every
    * row against `w`, aggregate one update from the misclassified
    * rows, return w + Δw. Bounds (margin AND update) are re-checked
    * against THIS frame's max|x| before the pass that could wrap.
    * `allowEmpty` makes an empty frame a no-op (streaming micro-
    * batches can be empty; a training corpus must not be). */
  def round(features: DataFrame, yCol: String, xCols: Seq[String],
      w0: Array[Long], allowEmpty: Boolean = true): Array[Long] = {
    require(xCols.nonEmpty, "at least one feature column")
    require(w0.length == xCols.size + 1,
      s"weights length ${w0.length} != ${xCols.size + 1} (bias + features)")
    val f = select(features, yCol, xCols)
    val (n, maxAbs) = bounds(f, xCols, allowEmpty)
    if (n == 0L) w0.clone() else step(f, xCols, w0, n, maxAbs)
  }

  private def select(features: DataFrame, yCol: String,
      xCols: Seq[String]): DataFrame =
    features.select(
      (col(yCol).cast("long").as("y") +:
        xCols.map(c => col(c).cast("long").as(c))): _*)

  /** One pass: row count, label-domain check, max|x| per feature —
    * everything the per-round overflow guard needs. n = 0 only when
    * `allowEmpty`. */
  private def bounds(f: DataFrame, xCols: Seq[String],
      allowEmpty: Boolean): (Long, Seq[Long]) = {
    val boundAggs = Seq(count(lit(1)).as("n"),
      count(when(col("y") =!= 1L && col("y") =!= -1L, 1)).as("bad")) ++
      xCols.map(c => max(abs(col(c))).as(c))
    val boundsRow = f.agg(boundAggs.head, boundAggs.tail: _*).head()
    val n = boundsRow.getLong(0)
    if (n == 0L) {
      require(allowEmpty, "Perceptron needs a non-empty feature frame")
      return (0L, Seq.empty)
    }
    require(boundsRow.getLong(1) == 0L,
      s"${boundsRow.getLong(1)} row(s) carry a label outside {-1, +1}")
    (n, 1L +: xCols.indices.map { j =>
      if (boundsRow.isNullAt(j + 2)) 0L else boundsRow.getLong(j + 2)
    })
  }

  /** One guarded update pass over a pre-selected frame with known
    * bounds: margin bound |m| ≤ Σ|wⱼ|·max|xⱼ| and update bound
    * |Δwⱼ| ≤ n·max|xⱼ| are both checked BEFORE the pass that could
    * wrap. */
  private def step(f: DataFrame, xCols: Seq[String], w0: Array[Long],
      n: Long, maxAbs: Seq[Long]): Array[Long] = {
    val Lim = Long.MaxValue / 4
    val mBound =
      try w0.indices.map(j => Math.multiplyExact(math.abs(w0(j)), maxAbs(j)))
        .foldLeft(0L)(Math.addExact)
      catch {
        case _: ArithmeticException => throw new ArithmeticException(
          "perceptron margin bound exceeds BIGINT — rescale features")
      }
    require(mBound < Lim && maxAbs.forall(m => m == 0L || m < Lim / n),
      "perceptron bounds exceed BIGINT — rescale features or shard")
    val model = Model(xCols, w0.clone())
    val mis = col("y") * model.marginCol <= 0
    val updAggs = sum(when(mis, col("y"))).as("d0") +:
      xCols.map(c => sum(when(mis, col("y") * col(c))).as(c))
    val upd = f.agg(updAggs.head, updAggs.tail: _*).head()
    val w = w0.clone()
    (0 until w.length).foreach { j =>
      if (!upd.isNullAt(j)) w(j) += upd.getLong(j)
    }
    w
  }
}
