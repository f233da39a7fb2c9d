package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the training-data pipeline operators
  * (tokenization, shingling, hashing). Everything is built from codegen'd
  * built-ins — no UDFs — so whole-stage codegen spans the hot path and the
  * same semantics are expressible in the DuckDB oracle SQL.
  *
  * Hash convention: deterministic cross-engine hashes are derived from md5
  * hex substrings (`conv(hex,16,10)` in Spark ≡ `('0x'||hex)::BIGINT` in
  * DuckDB); Spark's native murmur/xxhash are NOT portable to other engines.
  */
object TextFunctions {

  /** Whitespace tokenization (single-space corpus; trim first). */
  def words(text: Column): Column = split(trim(text), " ")

  /** n-word shingles, 1 per starting position; empty array when the doc is
    * shorter than n (guard needed: Spark's `sequence(1,0)` DESCENDS).
    * Round 16: native kernel ([[TextExpressions.WordShingles]]) — the
    * higher-order transform/element_at/concat_ws chain paid a lambda
    * dispatch per output shingle on the map-side hot path of every
    * dedup/text query; values, empty/null semantics and the array type
    * (containsNull) are replicated exactly and pinned by a differential
    * property (TextExpressionsSpec).
    */
  def wordShingles(ws: Column, n: Int): Column =
    TextExpressions.wordShinglesFast(ws, n)

  /** First 24 bits of md5 as a BIGINT — the portable word hash.
    * Round 16: computed by the native [[HashExpressions.Md5HexLong]]
    * kernel — bit-identical to `conv(substring(md5(w), 1, 6), 16, 10)`
    * (differential property in HashExpressionsSpec), no hex-string
    * round-trip.
    */
  def wordCode24(w: Column): Column = HashExpressions.md5HexLong(w, 1, 6)

  /** First 16 bits of md5 — per-token hash for simhash (same kernel). */
  def wordCode16(w: Column): Column = HashExpressions.md5HexLong(w, 1, 4)

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "in", "to", "is")

  def stopwordCount(ws: Column): Column =
    size(filter(ws, w => w.isin(Stopwords: _*)))

  /** Total characters across tokens (word-length sum). */
  def wordCharSum(ws: Column): Column =
    aggregate(ws, lit(0), (acc, w) => acc + length(w))

  /** F9: display-label formatting — snake_case / space-separated identifier
    * → 'Title Case' label (reference `script/import_hub_main.py:150,187`:
    * `' '.join(label.capitalize() for label in name.replace('_',' ').split())`).
    */
  def labelize(name: Column): Column = initcap(regexp_replace(name, "_", " "))
}
