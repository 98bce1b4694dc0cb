package graft.core

/** Engine-side data model, mirroring the reference's schema system
  * (lintdb/schema/Schema.h:13-101, DataTypes.h:29-40) re-expressed as plain
  * Scala. A [[GSchema]] is persisted as JSON with the index and validated on
  * ingest; tensor columns map to Spark `array<array<float>>`.
  */
object GDataType extends Enumeration {
  /** reference: lintdb/schema/DataTypes.h:29-40. FLOAT16/TENSOR_FLOAT16
    * (DataTypes.h:34-35) are accepted in schema JSON and folded into their
    * f32 twins at resolution time (Spark has no half type — lossy, noted);
    * the schema keeps the declared name, so it round-trips unchanged. */
  val INTEGER, FLOAT, TEXT, DATETIME, TENSOR, QUANTIZED_TENSOR, COLBERT = Value

  private val fold16 = Map("FLOAT16" -> FLOAT, "TENSOR_FLOAT16" -> TENSOR)

  /** withName plus the f16 -> f32 folding; all type dispatch goes through
    * [[GField.dtype]], which calls this. */
  def resolve(name: String): Value = fold16.getOrElse(name, withName(name))
}

object FieldRole extends Enumeration {
  /** reference: lintdb/schema/Schema.h:13 (FieldType enum); role dispatch in
    * DocProcessor.cpp:72-101. */
  val Indexed, Context, Stored, Colbert = Value
}

object QuantizerKind extends Enumeration {
  /** reference: lintdb/quantizers/Quantizer.h (QuantizerType). SQ8 is a
    * graft extension beyond the reference's codec set — the faiss
    * ScalarQuantizer QT_8bit design (public knowledge): 4x smaller than
    * NONE at near-lossless quality, between BINARIZER (16x) and NONE. */
  val NONE, BINARIZER, PRODUCT_ENCODER, SQ8 = Value
}

/** reference: lintdb/schema/Schema.h:15-23. */
final case class FieldParameters(
    dimensions: Int = 0,
    analyzer: String = "",
    quantization: String = QuantizerKind.NONE.toString,
    numCentroids: Int = 0,
    numIterations: Int = 10,
    numSubquantizers: Int = 16,
    nbits: Int = 1) {
  def quantizerKind: QuantizerKind.Value = QuantizerKind.withName(quantization)
}

/** reference: lintdb/schema/Schema.h:28-51. */
final case class GField(
    name: String,
    dataType: String,
    roles: Seq[String],
    parameters: FieldParameters = FieldParameters()) {
  def dtype: GDataType.Value = GDataType.resolve(dataType)
  def roleSet: Set[FieldRole.Value] = roles.map(FieldRole.withName).toSet
  def isTensor: Boolean =
    dtype == GDataType.TENSOR || dtype == GDataType.QUANTIZED_TENSOR
  def hasRole(r: FieldRole.Value): Boolean = roleSet.contains(r)
  /** Colbert role implies inverted + context storage (reference:
    * DocProcessor.cpp:74-101). */
  def needsPostings: Boolean = hasRole(FieldRole.Indexed) || hasRole(FieldRole.Colbert)
  def needsContext: Boolean = hasRole(FieldRole.Context) || hasRole(FieldRole.Colbert)
  def needsStored: Boolean = hasRole(FieldRole.Stored)
}

object GField {
  def colbert(name: String, dimensions: Int, numCentroids: Int,
      quantization: QuantizerKind.Value = QuantizerKind.NONE,
      numIterations: Int = 10, nbits: Int = 1, numSubquantizers: Int = 16): GField =
    GField(name, GDataType.TENSOR.toString, Seq(FieldRole.Colbert.toString),
      FieldParameters(dimensions = dimensions, numCentroids = numCentroids,
        quantization = quantization.toString, numIterations = numIterations,
        nbits = nbits, numSubquantizers = numSubquantizers))

  def indexed(name: String, dataType: GDataType.Value): GField =
    GField(name, dataType.toString, Seq(FieldRole.Indexed.toString))

  def stored(name: String, dataType: GDataType.Value): GField =
    GField(name, dataType.toString, Seq(FieldRole.Stored.toString))

  def indexedStored(name: String, dataType: GDataType.Value): GField =
    GField(name, dataType.toString,
      Seq(FieldRole.Indexed.toString, FieldRole.Stored.toString))
}

/** reference: lintdb/schema/Schema.h:89-101. Fixed, explicit, validated on
  * ingest — unknown field or type mismatch throws (DocProcessor.cpp:47-52). */
final case class GSchema(fields: Seq[GField]) {
  require(fields.map(_.name).distinct.size == fields.size, "duplicate field names")
  // indexing pre-quantized codes is not a working path in the reference
  // either (DocProcessor::quantizeField does std::get<Tensor> on the
  // QuantizedTensor variant -> bad_variant_access, DocProcessor.cpp:208-222);
  // reject it up front instead of failing mid-ingest
  fields.filter(f => f.dtype == GDataType.QUANTIZED_TENSOR && f.needsPostings)
    .foreach(f => throw new IllegalArgumentException(
      s"field ${f.name}: QUANTIZED_TENSOR supports only Stored/Context roles"))
  def field(name: String): GField =
    fields.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"unknown field: $name"))
  def tensorFields: Seq[GField] = fields.filter(f => f.isTensor && f.needsPostings)
  /** TENSOR fields with only the Context role: stored in the context table
    * for scoring but never posted/inverted (reference: DocProcessor.cpp:72-101
    * stores Context-role fields in the context column family). */
  def contextOnlyTensorFields: Seq[GField] =
    fields.filter(f => f.isTensor && f.needsContext && !f.needsPostings)
  def scalarIndexed: Seq[GField] = fields.filter(f => !f.isTensor && f.hasRole(FieldRole.Indexed))
  def storedFields: Seq[GField] = fields.filter(_.needsStored)
}

/** name <-> small int field id, persisted with the index (reference:
  * lintdb/schema/FieldMapper.h:13-94). */
final case class FieldMapper(nameToId: Map[String, Int]) {
  def id(name: String): Int =
    nameToId.getOrElse(name, throw new IllegalArgumentException(s"unknown field: $name"))
  def name(id: Int): String = nameToId.collectFirst { case (n, i) if i == id => n }
    .getOrElse(throw new IllegalArgumentException(s"unknown field id: $id"))
}

object FieldMapper {
  def fromSchema(schema: GSchema): FieldMapper =
    FieldMapper(schema.fields.map(_.name).zipWithIndex.toMap)
}
