package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A5/A6/A7 — linear fitting: closed-form OLS, fit uncertainties, and an
  * iterative Robust Chauvenet Rejection (RCR) fit
  * (ref continuum.py:63-109; RCR per Maples et al. 2018, ApJS 238:2, the
  * published algorithm behind the reference's native `rcr` C++ bindings —
  * reimplemented from the paper, not the library).
  *
  * Scale design: calibration windows are tens of rows (ref continuum.py:119
  * requires only ≥4), so the reject–refit loop runs on driver-local arrays
  * collected from a tiny, column-pruned slice. For fits over unbounded data
  * [[olsAgg]] provides the one-pass distributed closed form (sums are
  * map-side partial aggregates; a single reduce produces the parameters).
  */
object RobustFit {

  final case class Fit(intercept: Double, slope: Double)
  final case class FitErr(interceptSd: Double, slopeSd: Double)
  final case class RcrResult(fit: Fit, err: FitErr, keptIndices: Array[Int])

  /** A5 — closed-form OLS on local arrays (scipy.linregress analog,
    * ref continuum.py:82-83): slope = Σ(x−x̄)(y−ȳ)/Σ(x−x̄)²,
    * intercept = ȳ − slope·x̄.
    */
  def ols(x: Array[Double], y: Array[Double]): Fit = {
    require(x.length == y.length && x.length >= 2, "OLS needs >= 2 points")
    val n = x.length
    var sx = 0.0; var sy = 0.0
    var i = 0
    while (i < n) { sx += x(i); sy += y(i); i += 1 }
    val mx = sx / n; val my = sy / n
    var sxx = 0.0; var sxy = 0.0
    i = 0
    while (i < n) {
      val dx = x(i) - mx
      sxx += dx * dx; sxy += dx * (y(i) - my)
      i += 1
    }
    val m = sxy / sxx
    Fit(my - m * mx, m)
  }

  /** A6 — fit uncertainties (ref continuum.py:104-107):
    * σ² = Σ(y−mx−b)²/(n−2); m_sd = √(σ²/Σ(x−x̄)²);
    * b_sd = √(σ²·(1/n + x̄²/Σ(x−x̄)²)).
    */
  def fitUncertainty(x: Array[Double], y: Array[Double], fit: Fit): FitErr = {
    val n = x.length
    require(n > 2, "uncertainty needs > 2 points")
    var mx = 0.0
    var i = 0
    while (i < n) { mx += x(i); i += 1 }
    mx /= n
    var ss = 0.0; var sxx = 0.0
    i = 0
    while (i < n) {
      val r = y(i) - fit.slope * x(i) - fit.intercept
      val dx = x(i) - mx
      ss += r * r; sxx += dx * dx
      i += 1
    }
    val sigma2 = ss / (n - 2)
    FitErr(
      interceptSd = math.sqrt(sigma2 * (1.0 / n + mx * mx / sxx)),
      slopeSd = math.sqrt(sigma2 / sxx))
  }

  /** Distributed A5+A6 in one aggregation pass: returns columns
    * (n, slope, intercept, slope_sd, intercept_sd) per group. The five sums
    * are partial-aggregated map-side; the closed form runs on the combined
    * scalars — no second pass, no collect.
    */
  def olsAgg(df: DataFrame, groupCols: Seq[Column], x: Column, y: Column): DataFrame = {
    val agged = df.groupBy(groupCols: _*).agg(
      count(lit(1)).cast("double").as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum(x * x).as("sxx"), sum(x * y).as("sxy"),
      sum(y * y).as("syy"))
    val n = col("n"); val sx = col("sx"); val sy = col("sy")
    val sxxC = col("sxx") - sx * sx / n
    val sxyC = col("sxy") - sx * sy / n
    val syyC = col("syy") - sy * sy / n
    val slope = sxyC / sxxC
    val intercept = sy / n - slope * sx / n
    val sigma2 = (syyC - slope * sxyC) / (n - lit(2.0))
    agged.select(groupCols ++ Seq(
      n.as("n"), slope.as("slope"), intercept.as("intercept"),
      sqrt(sigma2 / sxxC).as("slope_sd"),
      sqrt(sigma2 * (lit(1.0) / n + (sx / n) * (sx / n) / sxxC)).as("intercept_sd")): _*)
  }

  // --- RCR (Maples et al. 2018) -------------------------------------------

  /** erfc via the Numerical Recipes rational approximation (|err| < 1.2e-7). */
  private def erfc(z: Double): Double = {
    val x = math.abs(z)
    val t = 1.0 / (1.0 + 0.5 * x)
    val ans = t * math.exp(-x * x - 1.26551223 + t * (1.00002368 + t * (0.37409196 +
      t * (0.09678418 + t * (-0.18628806 + t * (0.27886807 + t * (-1.13520398 +
      t * (1.48851587 + t * (-0.82215223 + t * 0.17087277)))))))))
    if (z >= 0.0) ans else 2.0 - ans
  }

  /** Chauvenet rejection threshold in sigma units: the deviation at which the
    * expected count of more-extreme points falls below 1/2, i.e. the t with
    * n·erfc(t/√2) = 0.5 (Chauvenet's criterion; Maples et al. 2018 §2).
    * Solved by bisection — erfc is monotone and n is tiny.
    */
  def chauvenetThreshold(n: Int): Double = {
    val target = 0.5 / n
    var lo = 0.0; var hi = 40.0
    var k = 0
    while (k < 200) {
      val mid = (lo + hi) / 2
      if (erfc(mid / math.sqrt(2.0)) > target) lo = mid else hi = mid
      k += 1
    }
    (lo + hi) / 2
  }

  /** Linear-interpolated percentile (numpy default), p in [0,1]. */
  private def percentile(sorted: Array[Double], p: Double): Double = {
    val n = sorted.length
    if (n == 1) return sorted(0)
    val pos = p * (n - 1)
    val i = math.floor(pos).toInt
    val frac = pos - i
    if (i + 1 >= n) sorted(n - 1) else sorted(i) * (1 - frac) + sorted(i + 1) * frac
  }

  /** A7 — RCR robust linear fit (ref continuum.py:72-109): seed with OLS,
    * then bulk-reject via Chauvenet's criterion with a robust scale estimate
    * (median of residuals as μ, 68.3rd percentile of |residual − μ| as σ —
    * the "median + deviation technique" of the paper's SS_MEDIAN_DL mode),
    * refit, repeat to fixpoint.
    *
    * The reference centers x by its mean before fitting
    * (ref continuum.py:78) — callers pass x already centered to match. Note
    * the reference seeds the RCR model with `[slope, intercept]` where the
    * model reads `[intercept, slope]` (ref continuum.py:83 vs :64) — a
    * swapped-seed quirk that only perturbs the first iteration's guess; the
    * refit makes it irrelevant, so it is not reproduced.
    */
  /** A7 at scale — the distributed reject–refit loop for windows too large
    * to collect: each iteration is ONE Spark job (the five OLS sums, the
    * median and the 68.3rd-percentile deviation as exact `percentile`
    * aggregates), then a survivor filter; the loop re-plans on the filtered
    * frame. Calibration windows are tiny, so [[rcrLinearFit]] on collected
    * arrays is the default; this form exists for fits over unbounded data
    * (e.g. a whole observation's drift) where collecting is not an option.
    *
    * Same algorithm as [[rcrLinearFit]]; sums aggregate in partition order,
    * so results can differ from the local form in the last ulps (tests
    * compare at 1e-9).
    */
  def rcrFitDistributed(
      df: DataFrame,
      x: Column,
      y: Column,
      maxIter: Int = 50): (Fit, FitErr, Long) = {
    var cur = df.select(x.cast("double").as("__x"), y.cast("double").as("__y"))
    var n = cur.count()
    require(n >= 4, "RCR needs >= 4 points")
    var iter = 0
    var changed = true
    var fit = Fit(0.0, 0.0)
    while (changed && iter < maxIter && n > 3) {
      val s = cur.agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
        sum(col("__x") * col("__x")).as("sxx"),
        sum(col("__x") * col("__y")).as("sxy")).head()
      val (nn, sx, sy, sxx, sxy) =
        (s.getDouble(0), s.getDouble(1), s.getDouble(2), s.getDouble(3), s.getDouble(4))
      val slope = (sxy - sx * sy / nn) / (sxx - sx * sx / nn)
      val intercept = sy / nn - slope * sx / nn
      fit = Fit(intercept, slope)
      val res = col("__y") - (lit(intercept) + lit(slope) * col("__x"))
      val withRes = cur.withColumn("__r", res)
      // DSL columns, never string-interpolated SQL: a NaN/Infinity median
      // interpolated into expr() text would be an unresolvable identifier
      // and throw AnalysisException instead of flowing through the math.
      val q = withRes.agg(
        org.apache.spark.sql.functions.percentile(col("__r"), lit(0.5)).as("mu"))
        .head().getDouble(0)
      val sigma = withRes
        .agg(org.apache.spark.sql.functions.percentile(
          abs(col("__r") - lit(q)), lit(0.683)).as("sigma"))
        .head().getDouble(0)
      if (sigma <= 0.0) changed = false
      else {
        val thr = chauvenetThreshold(n.toInt) * sigma
        val kept = withRes.filter(abs(col("__r") - lit(q)) <= lit(thr)).select(col("__x"), col("__y"))
        // localCheckpoint truncates the per-iteration lineage: without it
        // every iteration re-evaluates the whole reject chain from the
        // source (O(iterations²) work) and the plan grows unboundedly.
        val keptMat = kept.localCheckpoint()
        val keptN = keptMat.count()
        if (keptN == n || keptN < 4) changed = false
        else { cur = keptMat; n = keptN }
      }
      iter += 1
    }
    // final refit + uncertainties in one aggregation pass
    val f = olsAgg(cur, Seq(lit(1).as("__g")), col("__x"), col("__y")).head()
    val result = Fit(f.getAs[Double]("intercept"), f.getAs[Double]("slope"))
    (result, FitErr(f.getAs[Double]("intercept_sd"), f.getAs[Double]("slope_sd")), n)
  }

  def rcrLinearFit(x: Array[Double], y: Array[Double], maxIter: Int = 50): RcrResult = {
    require(x.length == y.length && x.length >= 4, "RCR needs >= 4 points")
    var idx = Array.range(0, x.length)
    var fit = ols(x, y)
    var iter = 0
    var changed = true
    while (changed && iter < maxIter && idx.length > 3) {
      val xs = idx.map(x); val ys = idx.map(y)
      fit = ols(xs, ys)
      val res = new Array[Double](idx.length)
      var i = 0
      while (i < idx.length) {
        res(i) = ys(i) - (fit.intercept + fit.slope * xs(i)); i += 1
      }
      val sortedRes = res.clone(); java.util.Arrays.sort(sortedRes)
      val mu = percentile(sortedRes, 0.5)
      val devs = res.map(r => math.abs(r - mu))
      val sortedDevs = devs.clone(); java.util.Arrays.sort(sortedDevs)
      val sigma = percentile(sortedDevs, 0.683)
      if (sigma <= 0.0) changed = false
      else {
        val thr = chauvenetThreshold(idx.length) * sigma
        val keep = idx.indices.filter(i => devs(i) <= thr)
        if (keep.length == idx.length || keep.length < 4) changed = false
        else idx = keep.map(idx).toArray
      }
      iter += 1
    }
    val xs = idx.map(x); val ys = idx.map(y)
    fit = ols(xs, ys)
    RcrResult(fit, fitUncertainty(xs, ys, fit), idx)
  }
}
