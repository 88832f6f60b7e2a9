package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** d-gap + VInt postings codec as native Catalyst expressions.
  *
  * Wire format: Hadoop `WritableUtils.writeVLong` of (docid gap, tf) pairs
  * in docid-ascending order — byte-identical to the reference's packed
  * postings (reference/assignment3/src/main/BuildInvertedIndexCompressed
  * .java:125-126). The former Scala-UDF route paid an Encoder round trip
  * per term row (ArrayData -> Seq[Row] -> bytes); these expressions read
  * the Tungsten struct array directly and stay inside whole-stage codegen.
  */
object PostingsCodec {

  /** Encode docid-ascending (docid, tf) struct postings to packed bytes. */
  def encode(postings: ArrayData): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    val n = postings.numElements()
    var prev = 0L
    var i = 0
    while (i < n) {
      if (postings.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_postings_encode: null postings element at index $i")
      val r = postings.getStruct(i, 2)
      if (r.isNullAt(0) || r.isNullAt(1))
        throw new IllegalArgumentException(
          s"graft_postings_encode: null docid/tf at postings element $i")
      val docid = r.getLong(0)
      org.apache.hadoop.io.WritableUtils.writeVLong(out, docid - prev)
      org.apache.hadoop.io.WritableUtils.writeVLong(out, r.getLong(1))
      prev = docid
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  /** Decode packed bytes back to (docid, tf) structs (gaps re-summed). */
  def decode(bytes: Array[Byte]): ArrayData = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var prev = 0L
    while (in.available() > 0) {
      val gap = org.apache.hadoop.io.WritableUtils.readVLong(in)
      val tf = org.apache.hadoop.io.WritableUtils.readVLong(in)
      prev += gap
      buf += new GenericInternalRow(Array[Any](prev, tf))
    }
    new GenericArrayData(buf.toArray[InternalRow])
  }

  /** Output schema of [[PostingsDecode]]: tuple-style names so downstream
    * `p._1`/`p._2` access matches the former UDF's Encoder-derived schema. */
  val decodedType: ArrayType = ArrayType(
    StructType(Seq(
      StructField("_1", LongType, nullable = false),
      StructField("_2", LongType, nullable = false))),
    containsNull = false)
}

/** `graft_postings_encode(postings)` — array<struct<bigint,bigint>> to
  * d-gap+VInt packed binary. */
case class PostingsEncode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull=true arrays are ACCEPTED at analysis time: a postings
    // array round-tripped through parquet is element-nullable by default
    // even when no element is null, and rejecting it would break
    // re-encoding a persisted index. Elements and fields that are
    // actually null raise a descriptive error inside encode() instead of
    // an NPE.
    case ArrayType(StructType(fields), _)
        if fields.length == 2 && fields.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_postings_encode requires array<struct<bigint,bigint>>, got " +
        child.dataType.simpleString)
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_postings_encode"

  override protected def nullSafeEval(input: Any): Any =
    PostingsCodec.encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PostingsCodec.encode($c);")

  override protected def withNewChildInternal(newChild: Expression): PostingsEncode =
    copy(child = newChild)
}

/** `graft_postings_decode(packed)` — inverse of [[PostingsEncode]]. */
case class PostingsDecode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_postings_decode requires binary, got ${child.dataType.simpleString}")
  }
  override def dataType: DataType = PostingsCodec.decodedType
  override def prettyName: String = "graft_postings_decode"

  override protected def nullSafeEval(input: Any): Any =
    PostingsCodec.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PostingsCodec.decode($c);")

  override protected def withNewChildInternal(newChild: Expression): PostingsDecode =
    copy(child = newChild)
}
