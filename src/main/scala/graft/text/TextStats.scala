package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-document text-quality operators for corpus filtering at scale.
  * Everything is a pure column expression (no UDFs, no shuffles): these
  * run map-side over arbitrarily large corpora.
  */
object TextStats {

  /** Words whose presence signals English text (tiny demo lexicon). */
  val EnglishMarkers: Seq[String] = Seq("the", "a", "of", "to", "and", "in", "is", "it")

  /** NULL for empty token arrays instead of dividing by zero: Spark 4's
    * ANSI mode turns x/0 into a DIVIDE_BY_ZERO error, while the DuckDB
    * oracle yields NULL — a document whose text has no word characters
    * (all punctuation/whitespace) must not crash the whole corpus scan.
    * CaseWhen short-circuits, so the division never evaluates on the
    * empty branch.
    */
  private def guarded(tokens: Column, ratio: Column): Column =
    when(size(tokens) === 0, lit(null).cast("double")).otherwise(ratio)

  /** Fraction of tokens that are English marker words (exact int/int
    * division); NULL for token-less documents. n-gram-free language-ID
    * heuristic.
    */
  def englishRatio(tokens: Column): Column =
    guarded(tokens,
      size(filter(tokens, t => t.isInCollection(EnglishMarkers))) / size(tokens))

  /** 'en' / 'und' decision at a ratio threshold. */
  def langId(tokens: Column, threshold: Double = 0.05): Column =
    when(englishRatio(tokens) >= threshold, lit("en")).otherwise(lit("und"))

  /** Type-token ratio: distinct tokens / total tokens; NULL when empty. */
  def distinctRatio(tokens: Column): Column =
    guarded(tokens, size(array_distinct(tokens)) / size(tokens))

  /** Mean token length in characters; NULL when empty. */
  def avgWordLen(tokens: Column): Column =
    guarded(tokens, length(concat_ws("", tokens)) / size(tokens))

  /** 0–3 quality score from simple heuristics (length band, lexical
    * diversity, word-length band) — the shape of a pretraining-data
    * quality filter.
    */
  def qualityScore(tokens: Column): Column =
    (when(size(tokens).between(20, 500), 1).otherwise(0)
      + when(distinctRatio(tokens) > 0.3, 1).otherwise(0)
      + when(avgWordLen(tokens).between(3.0, 9.0), 1).otherwise(0))

  /** Normalized-text md5 fingerprint (tokenize → rejoin → hash). */
  def fingerprint(tokens: Column): Column =
    md5(concat_ws(" ", tokens))

  /** Whitespace token count (the "word count" a naive pipeline reports). */
  def whitespaceTokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => t =!= lit("")))

  /** BPE-ish subword-unit count: letter runs, single digits, and single
    * non-alphanumeric marks each count as one unit — the cheap
    * regex-only estimator of LLM token counts (digits and punctuation
    * tokenize per character in BPE vocabularies, words mostly don't).
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0)))

  /** Deflate compression ratio per document — the quality signal regex
    * heuristics can't fake: highly repetitive/templated text compresses
    * far below ~0.4, high-entropy gibberish sits near 1.0 (the
    * Gopher-family "compression filter"). The ONLY non-column-expression
    * operator in this file, because it needs a real codec: a
    * `java.util.zip.Deflater` is allocated once per PARTITION and reset
    * per row (the same native-context-per-partition shape as the
    * multimodal decoders). No DuckDB zlib exists, so the catalog row is
    * rows-only; `ChunkingSpec`-style unit tests pin the semantics.
    */
  def compressionRatio(df: org.apache.spark.sql.DataFrame,
                       idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
        val buf = new Array[Byte](64 * 1024)
        rows.map { case (id, text) =>
          val bytes = Option(text).getOrElse("").getBytes("UTF-8")
          deflater.reset()
          deflater.setInput(bytes)
          deflater.finish()
          var compressed = 0L
          while (!deflater.finished()) compressed += deflater.deflate(buf)
          val ratio = if (bytes.length == 0) None
                      else Some(compressed.toDouble / bytes.length)
          (id, bytes.length, compressed, ratio)
        }
      }
      .toDF(idCol, "n_bytes", "n_compressed", "compression_ratio")
  }
}
