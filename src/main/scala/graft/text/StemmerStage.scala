package graft.text

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

/** ML-pipeline stage applying the Porter stemmer to a token-array column —
  * the engine's stand-in for the reference's external Snowball stage
  * (reference feature/Utils.scala:200-204, spark-stemming jar absent
  * offline). Stateless; per-token work runs through the codegen'd
  * [[graft.expressions.PorterStem]] expression. DefaultParamsWritable so a
  * PipelineModel containing this stage save/loads like any stock stage.
  */
class StemmerStage(override val uid: String)
    extends Transformer with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("graftStemmer"))

  final val inputCol = new Param[String](this, "inputCol", "input token column")
  final val outputCol = new Param[String](this, "outputCol", "output token column")
  /** "porter" (classic 1980) or "snowball" (Porter2 English — what the
    * reference's spark-stemming stage ran). */
  final val algorithm = new Param[String](this, "algorithm",
    "stemming algorithm: porter | snowball",
    (v: String) => v == "porter" || v == "snowball")
  setDefault(algorithm, "porter")
  def setInputCol(v: String): this.type = set(inputCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def setAlgorithm(v: String): this.type = set(algorithm, v)

  override def transform(ds: Dataset[_]): DataFrame =
    ds.withColumn($(outputCol),
      if ($(algorithm) == "snowball") TextOps.snowballTokens(col($(inputCol)))
      else TextOps.stemTokens(col($(inputCol))))

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+
      StructField($(outputCol), ArrayType(StringType, containsNull = true)))

  override def copy(extra: ParamMap): StemmerStage = defaultCopy(extra)
}

object StemmerStage extends DefaultParamsReadable[StemmerStage] {
  override def load(path: String): StemmerStage = super.load(path)
}
