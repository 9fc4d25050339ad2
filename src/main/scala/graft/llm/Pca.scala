package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PCA over the embedding column — the missing dimensionality-
  * reduction member of the embedding toolbox (truncate-renorm keeps
  * the FIRST dims; PCA keeps the most-variant DIRECTIONS, the right
  * prefix when dims are correlated — the usual pre-step before IVF /
  * PQ at lower d).
  *
  * Scale shape: the d×d covariance needs exactly ONE pass — each
  * partition folds its vectors into a local (n, Σv, Σvvᵀ) buffer of
  * d + d² doubles (d = 64 → 33 KB) with a tight while-loop, and the
  * driver combines ≤ #partitions such buffers. No explode, no
  * shuffle, input read once; this is the treeAggregate shape MLlib's
  * own covariance uses, spelled as mapPartitions because the fold is
  * genuinely imperative. The d×d eigensolve (breeze eigSym, on
  * Spark's own classpath) is driver-side on a 33 KB matrix —
  * data-size independent. Projection broadcasts the d×k basis.
  *
  * The verdict oracle follows the sketch-twin pattern
  * (`ts_sketch_stats`): the entry emits per-dimension EXACT integer
  * variance moments (from ×1e3-quantized values — float→double
  * widening and one IEEE multiply+floor are bit-identical in any
  * engine) that DuckDB replays verbatim, plus a global `pca_ok`
  * boolean claiming the eigenbasis properties (orthonormal within
  * 1e-6, PSD spectrum, top-k explained variance ≥ the best k RAW
  * dimensions' variance — the optimality property that makes PCA
  * PCA); the oracle emits literal TRUE, so any broken eigensolve
  * hash-mismatches. int64 headroom for the verdict moments: var_num
  * = n·Σxq² − (Σxq)², and n·Σxq² grows like n²·mean(xq²) — worst
  * case (every |x| at 2 → xq² = 4e6) bounds n at ~1.5e6 vectors; for
  * unit-norm 64-dim embeddings (mean xq² ≈ 1.6e4 per dim) at ~2.4e7.
  * Past that, ANSI mode faults the multiply loudly (this project
  * always runs ANSI); the remedy is coarsening the quantization
  * (×100 buys 10⁴× rows) — the covariance/eigenbasis path itself is
  * double-precision and unaffected. */
object Pca {

  /** One-pass raw moments: (n, Σv, Σvvᵀ row-major). */
  def moments(emb: DataFrame, dim: Int): (Long, Array[Double], Array[Double]) = {
    import emb.sparkSession.implicits._
    val parts = emb.select(col("embedding"))
      .where(col("embedding").isNotNull)
      .as[Array[Float]]
      .mapPartitions { it =>
        val sum = new Array[Double](dim)
        val gram = new Array[Double](dim * dim)
        var n = 0L
        it.foreach { v =>
          require(v.length == dim, s"embedding dim ${v.length} != $dim")
          n += 1
          var i = 0
          while (i < dim) {
            val vi = v(i).toDouble
            sum(i) += vi
            var j = 0
            while (j < dim) { gram(i * dim + j) += vi * v(j).toDouble; j += 1 }
            i += 1
          }
        }
        if (n == 0L) Iterator.empty
        else Iterator.single((n, sum, gram))
      }.collect()
    val sum = new Array[Double](dim)
    val gram = new Array[Double](dim * dim)
    var n = 0L
    parts.foreach { case (pn, ps, pg) =>
      n += pn
      var i = 0
      while (i < dim) { sum(i) += ps(i); i += 1 }
      i = 0
      while (i < dim * dim) { gram(i) += pg(i); i += 1 }
    }
    (n, sum, gram)
  }

  /** Covariance eigenbasis: eigenvalues DESCENDING and the matching
    * column eigenvectors (row-major k×d), from one [[moments]] pass. */
  def eigenBasis(emb: DataFrame, dim: Int, k: Int)
      : (Long, Array[Double], Array[Array[Double]]) = {
    val m = moments(emb, dim)
    eigenFromMoments(m, dim, k)
  }

  private def eigenFromMoments(m: (Long, Array[Double], Array[Double]),
      dim: Int, k: Int): (Long, Array[Double], Array[Array[Double]]) = {
    val (n, sum, gram) = m
    require(n > 1, s"PCA needs > 1 vector, got $n")
    val cov = new Array[Double](dim * dim)
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < dim) {
        cov(i * dim + j) =
          gram(i * dim + j) / n - (sum(i) / n) * (sum(j) / n)
        j += 1
      }
      i += 1
    }
    // breeze DenseMatrix is column-major; cov is symmetric so the
    // row-major buffer reads back identically
    val es = breeze.linalg.eigSym(
      new breeze.linalg.DenseMatrix(dim, dim, cov))
    // breeze returns eigenvalues ASCENDING — take the top k reversed
    val order = (dim - 1) to (dim - k) by -1
    val evals = order.map(es.eigenvalues(_)).toArray
    val evecs = order.map(c =>
      Array.tabulate(dim)(r => es.eigenvectors(r, c))).toArray
    (n, evals, evecs)
  }

  /** (vec_id, pc ARRAY<DOUBLE>) — each embedding projected onto the
    * top-k eigenbasis (one broadcast d×k matrix, one narrow map). */
  def project(emb: DataFrame, dim: Int, k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (_, _, evecs) = eigenBasis(emb, dim, k)
    val basis = spark.sparkContext.broadcast(evecs)
    emb.select(col("vec_id"), col("embedding"))
      .where(col("embedding").isNotNull)
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val b = basis.value
        (id, Array.tabulate(b.length) { c =>
          var s = 0.0; var i = 0
          while (i < v.length) { s += b(c)(i) * v(i).toDouble; i += 1 }
          s
        })
      }.toDF("vec_id", "pc")
  }

  /** The verdict entry: per-dimension exact integer variance moments
    * (oracle-replayed) + the global eigenbasis verdict. Output
    * (dim, n, var_num, pca_ok) — 64 rows. */
  def varianceWithVerdict(emb: DataFrame, dim: Int = 64, k: Int = 8)
      : DataFrame = {
    val m = moments(emb, dim)
    val (_, evals, evecs) = eigenFromMoments(m, dim, k)
    // orthonormal: VᵀV = I within 1e-6 (eigensolver precision)
    val orthoOk = (0 until k).forall { a =>
      (0 until k).forall { b =>
        val dot = (0 until dim).map(i => evecs(a)(i) * evecs(b)(i)).sum
        math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-6
      }
    }
    val scale = math.max(evals.head.abs, 1e-12)
    val psdOk = evals.forall(_ > -1e-8 * scale)
    val orderOk = evals.sliding(2).forall(p => p(0) >= p(1) - 1e-12 * scale)
    // optimality: top-k eigen variance >= the best k raw dims' —
    // both read off the same covariance diagonal / spectrum
    val (n2, msum, mgram) = m
    val diag = Array.tabulate(dim)(i =>
      mgram(i * dim + i) / n2 - (msum(i) / n2) * (msum(i) / n2))
    val topDiag = diag.sorted.reverse.take(k).sum
    val explainedOk = evals.take(k).sum >= topDiag - 1e-9 * scale * k
    val ok = orthoOk && psdOk && orderOk && explainedOk
    emb.where(col("embedding").isNotNull)
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"),
        expr("CAST(floor(CAST(x AS double) * 1000) AS BIGINT)").as("xq"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("xq")).as("sx"),
        sum(col("xq") * col("xq")).as("sxx"))
      .select(col("dim"), col("n"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("var_num"),
        lit(ok).as("pca_ok"))
  }
}
