package graft.queries

import java.io.File
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.pipeline.DemoCache

/** Logistic quality scorer TRAINED on weak labels, replacing q77's
  * hand-calibrated constants with learned weights (q84) — the q31
  * LangModel lifecycle applied to quality scoring:
  *
  *  - weak labels come from the existing heuristics (the fixed-weight
  *    q77 gate: `quality_score_e6 >= QualityMinE6`) — no human labels,
  *    the C4/Gopher-style distant supervision;
  *  - features are the four q77 signals the codegen
  *    [[graft.functions.QualityFeatures]] byte walk already produces
  *    (stopword ratio, mean token length, repeated-bigram ratio, doc
  *    length), normalized to O(1) scale;
  *  - training is batch gradient descent on a BOUNDED deterministic
  *    sample (md5(doc_id) order, [[QualityModelStore.SampleCap]] docs —
  *    the LangModel/IVF-centroid discipline: the driver holds a few MB
  *    regardless of corpus size; at 100 TB the sample is the first
  *    SampleCap of a hash order, i.e. uniform);
  *  - the trained model is a train-once driver artifact, durable across
  *    JVMs under [[DemoCache]] (`qualmodel/<sf>`), deterministic
  *    bit-for-bit (fixed init, fixed iteration count, sample sorted by
  *    md5 then doc_id);
  *  - SCORING is pure column algebra over the codegen feature struct —
  *    a dot product of literals with four columns, fully inside
  *    whole-stage codegen, no UDF, scan-only at any scale.
  */
@SerialVersionUID(1L)
final case class QualityModel(w: Array[Double], b: Double)
    extends Serializable {

  /** Trained score as a column expression over the `q_*` helper columns
    * produced by [[CurationOps.withQualityScore]]. Logistic is monotone
    * in the linear term, so for ranking/AUC the margin suffices. The
    * basis matches training ([[QualityModelStore.featureCols]]). */
  def scoreCol: Column = {
    val x = QualityModelStore.featureCols
    x.zip(w.toSeq).map { case (c, wi) => c * lit(wi) }
      .reduce(_ + _) + lit(b)
  }
}

object QualityModelStore {
  /** Driver-side training-sample bound: 100k docs × 4 doubles ≈ 3 MB. */
  val SampleCap = 100000
  private val Iterations = 8000
  private val LearnRate = 1.0
  private val models = scala.collection.mutable.Map.empty[String, QualityModel]

  /** The O(1)-scale feature basis, over [[CurationOps.withQualityScore]]
    * columns: stopword ratio, DISTANCE of mean token length from the
    * natural-text ~5 chars (the raw length is not monotone in quality —
    * both 1-char and 20-char means are degenerate), repeated-bigram
    * ratio, capped doc length. The weak-label concept (the fixed gate)
    * is linear in exactly this basis, so a logistic fit can recover it. */
  private[queries] def featureCols: Seq[Column] = Seq(
    col("q_stop_e6") / 1e6,
    abs(col("q_toklen_e6") - lit(5000000L)) / 1e6,
    col("q_dup2_e6") / 1e6,
    least(col("q_n"), lit(100L)) / 100.0)

  /** Train (or reload) the model for this corpus — the LangModelStore
    * lifecycle: deterministic training, serialized once, memoized per
    * JVM and durable across JVMs. */
  def ensure(s: SparkSession, d: String): QualityModel = synchronized {
    models.getOrElseUpdate(d, {
      val root = DemoCache.root(s"qualmodel/${new File(d).getName}")
      val bin = new File(root, "model.bin")
      DemoCache.cached(root, d) {
        root.mkdirs()
        val out = new java.io.ObjectOutputStream(new java.io.FileOutputStream(bin))
        try out.writeObject(trainOn(Tables.load(s, d, "documents")))
        finally out.close()
      }
      val in = new java.io.ObjectInputStream(new java.io.FileInputStream(bin))
      try in.readObject().asInstanceOf[QualityModel] finally in.close()
    })
  }

  /** Extract (features, weak label) rows for `docs` and train. The
    * sample is the first [[SampleCap]] docs in (md5(doc_id), doc_id)
    * order — a deterministic uniform subsample at any corpus size. */
  def trainOn(docs: DataFrame): QualityModel = {
    val withF = CurationOps.withQualityScore(docs)
    val fCols = featureCols.zipWithIndex.map { case (c, i) => c.as(s"x$i") }
    val f = withF
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .limit(SampleCap)
      .select(fCols :+
        (col("quality_score_e6") >= CurationOps.QualityMinE6).cast("int").as("y"): _*)
      .collect()
      .map(r => (Array(r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)), r.getInt(4).toDouble))
    train(f)
  }

  /** Plain batch-GD logistic regression with BALANCED class weights
    * (each class contributes half the loss — the weak-positive rate is
    * ~98%, and an unweighted fit mostly learns the bias): zero init,
    * fixed step count — a pure function of the sample, so retrains are
    * bit-identical (asserted in CurationSpec). */
  def train(sample: Array[(Array[Double], Double)]): QualityModel = {
    val dim = 4
    val w = Array.fill(dim)(0.0)
    var b = 0.0
    val nPos = sample.count(_._2 == 1.0).toDouble
    val nNeg = sample.length - nPos
    // degenerate single-class sample: every weight stays 0 except the
    // bias, which saturates toward the one class — scoring still ranks
    // (constant), and aucOf reports degenerate=1 downstream
    val cPos = if (nPos > 0) 0.5 / nPos else 0.0
    val cNeg = if (nNeg > 0) 0.5 / nNeg else 0.0
    for (_ <- 1 to Iterations) {
      val gw = Array.fill(dim)(0.0)
      var gb = 0.0
      sample.foreach { case (x, y) =>
        var z = b
        var j = 0
        while (j < dim) { z += w(j) * x(j); j += 1 }
        val err = (1.0 / (1.0 + math.exp(-z)) - y) * (if (y == 1.0) cPos else cNeg)
        j = 0
        while (j < dim) { gw(j) += err * x(j); j += 1 }
        gb += err
      }
      var j = 0
      while (j < dim) { w(j) -= LearnRate * gw(j); j += 1 }
      b -= LearnRate * gb
    }
    QualityModel(w, b)
  }
}
