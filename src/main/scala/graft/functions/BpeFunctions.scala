package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding APPLICATION — the inference half of the BPE
  * lifecycle whose mining half is `TextAnalysis.bpePairs`. Classic
  * algorithm (Sennrich et al. 2016, public): a word starts as characters;
  * the lowest-rank adjacent pair in the merge list merges, repeatedly,
  * until no listed pair remains. Tokenization is inherently sequential
  * per word, so it is a native Catalyst expression rather than a
  * composition of built-ins: null handling from `UnaryExpression`,
  * interpreted evaluation (`CodegenFallback`, same trade-off as
  * [[GeoFunctions.WkbPointDecode]] — one virtual call per row, acceptable
  * off the hot aggregate path).
  *
  * The merge list rides in the expression as a PLAN-TIME artifact —
  * real tokenizers are small (32k merges ≈ hundreds of KB), so encode is
  * map-side with zero joins and zero shuffles at any corpus size.
  */
object BpeFunctions {

  case class BpeEncode(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(StringType)
    override def prettyName: String = "bpe_encode"

    @transient private lazy val rank: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    override protected def nullSafeEval(input: Any): Any = {
      val words = input.asInstanceOf[UTF8String].toString.split(' ')
      val out = ArrayBuffer.empty[Any]
      words.foreach { w =>
        if (w.nonEmpty) encodeWord(w).foreach(t => out += UTF8String.fromString(t))
      }
      new GenericArrayData(out.toArray)
    }

    /** Greedy lowest-rank merge loop; earliest occurrence breaks rank
      * ties (the standard implementation's left-to-right scan order).
      */
    private def encodeWord(w: String): Seq[String] = {
      val parts = ArrayBuffer.empty[String]
      w.foreach(c => parts += c.toString)
      var done = parts.length < 2
      while (!done) {
        var bestIdx = -1
        var bestRank = Int.MaxValue
        var i = 0
        while (i < parts.length - 1) {
          rank.get((parts(i), parts(i + 1))) match {
            case Some(r) if r < bestRank => bestRank = r; bestIdx = i
            case _                       => ()
          }
          i += 1
        }
        if (bestIdx < 0) done = true
        else {
          parts(bestIdx) = parts(bestIdx) + parts(bestIdx + 1)
          parts.remove(bestIdx + 1)
          done = parts.length < 2
        }
      }
      parts.toSeq
    }

    override protected def withNewChildInternal(newChild: Expression): BpeEncode =
      copy(child = newChild)
  }

  /** Tokenize `text` with the ordered `merges` list → `array<string>`. */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    CatalystBridge.column(BpeEncode(CatalystBridge.expression(text), merges))
}
