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

  /** Bound-style deflate diagnostics that a zlib-less engine can verify
    * exactly (the q86/q87 pattern): instead of emitting the raw ratio —
    * impossible to oracle without the codec, and implementation-
    * dependent in its low decimals — emit booleans whose truth is
    * deflate physics with wide measured margins, plus the exact byte
    * length as the anchor column both engines compute.
    *
    * Per doc (≥ 20 chars), four texts are deflated with one shared
    * per-partition `Deflater`: the doc itself, a ~2100-char repetition
    * of its first 3 chars, a 2048-char md5-chain pseudo-random hex
    * string, and the doc doubled. Bounds (measured on zlib 6 across
    * sf0.001/0.01/0.1 — margins in parens, 0 violations anywhere):
    *  - doc_ratio_sane: 0.1 < ratio < 1.5, NULL for docs under 64
    *                    bytes (measured 0.38–1.13 at ≥ 64 B; below
    *                    that, zlib framing — ~2 B header + 4 B adler +
    *                    ~5 B block overhead — can push a short
    *                    high-entropy doc past 1.5, so the bound is
    *                    only claimed where payload dominates framing)
    *  - rep_tiny:       rep ratio < 0.05     (measured 0.0124, 4×)
    *  - rep_lt_doc:     rep < doc            (30× gap)
    *  - rnd_in_band:    0.35 < rnd < 0.8     (measured 0.557–0.567;
    *                    hex entropy bounds any deflate to ~0.52–0.60)
    *  - dbl_lt_doc:     deflate(t‖t)/2|t| < deflate(t)/|t| — the second
    *                    copy back-references the first (docs ≪ the 32 KB
    *                    window), typical gap 2×
    * The cross-class ordering (repetition ≪ natural < 1) is what the
    * regex repetition family (q69) can't fake — a real codec signal,
    * now inside the oracle gate.
    */
  def compressionBounds(df: org.apache.spark.sql.DataFrame,
                        idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .where(length(col(textCol)) >= 20)
      .as[(Long, String)]
      .mapPartitions { rows =>
        val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
        val buf = new Array[Byte](64 * 1024)
        val md = java.security.MessageDigest.getInstance("MD5")
        def ratio(s: String): Double = {
          val bytes = s.getBytes("UTF-8")
          deflater.reset(); deflater.setInput(bytes); deflater.finish()
          var c = 0L
          while (!deflater.finished()) c += deflater.deflate(buf)
          c.toDouble / bytes.length
        }
        rows.map { case (id, text) =>
          val doc = ratio(text)
          val rep = ratio((if (text.length >= 3) text.substring(0, 3) else "abc") * 700)
          val rnd = ratio((1 to 64).map { i =>
            md.digest((text + i).getBytes("UTF-8")).map("%02x".format(_)).mkString
          }.mkString)
          val dbl = ratio(text + text)
          val nBytes = text.getBytes("UTF-8").length.toLong
          (id, nBytes,
            if (nBytes >= 64) Some(doc > 0.1 && doc < 1.5) else None,
            rep < 0.05,
            rep < doc,
            rnd > 0.35 && rnd < 0.8,
            dbl < doc)
        }
      }
      .toDF(idCol, "n_bytes", "doc_ratio_sane", "rep_tiny", "rep_lt_doc",
        "rnd_in_band", "dbl_lt_doc")
  }
}
