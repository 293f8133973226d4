package graft.queries

import graft.{QueryDef, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column coverage: binary payloads with stubbed decode (see
  * graft.multimodal.Multimodal — no codec libraries in this environment;
  * the stubs are deterministic functions of the bytes so the DuckDB
  * oracle can mirror them bit-for-bit, while the Spark-side plumbing —
  * binary columns, metadata structs, generator fan-out — is real.
  */
object MultimodalQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- q46: video frame sampling — one payload row fans out to N
    // frame rows with a per-frame deterministic feature (generator shape).
    QueryDef("q46_frame_sample", Some("""
      SELECT doc_id, CAST(t.range AS INTEGER) AS frame,
             md5(text || '#' || CAST(t.range AS VARCHAR)) AS feature
      FROM documents, range(0, 3) t
      ORDER BY doc_id, frame"""),
      (s, dir) =>
        Multimodal.sampleFrames(
            Tables.read(s, dir, "documents")
              .select(col("doc_id"), Multimodal.payload(col("text")).as("payload")),
            "doc_id", "payload", 3)
          .orderBy("doc_id", "frame")),

    // ---- q48: stub image decode + resize planning over binary payloads
    // (metadata struct flattened for the oracle compare).
    QueryDef("q48_image_meta", Some("""
      WITH m AS (SELECT doc_id, md5(text) AS h,
                        CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes
                 FROM documents),
      n AS (SELECT doc_id, n_bytes,
              ascii(substr(h,1,1)) - 48 - CASE WHEN ascii(substr(h,1,1)) >= 97 THEN 39 ELSE 0 END AS n1,
              ascii(substr(h,2,1)) - 48 - CASE WHEN ascii(substr(h,2,1)) >= 97 THEN 39 ELSE 0 END AS n2,
              ascii(substr(h,3,1)) - 48 - CASE WHEN ascii(substr(h,3,1)) >= 97 THEN 39 ELSE 0 END AS n3,
              ascii(substr(h,4,1)) - 48 - CASE WHEN ascii(substr(h,4,1)) >= 97 THEN 39 ELSE 0 END AS n4
            FROM m),
      d AS (SELECT doc_id, n_bytes, 'fake/rgb8' AS format,
                   CAST(((n1*16 + n2) % 64) + 1 AS INTEGER) AS width,
                   CAST(((n3*16 + n4) % 64) + 1 AS INTEGER) AS height
            FROM n)
      SELECT doc_id, n_bytes, format, width, height,
             CAST(GREATEST(FLOOR(width * CASE WHEN GREATEST(width, height) > 32
                    THEN 32 / GREATEST(width, height) ELSE 1.0 END), 1) AS INTEGER) AS rs_width,
             CAST(GREATEST(FLOOR(height * CASE WHEN GREATEST(width, height) > 32
                    THEN 32 / GREATEST(width, height) ELSE 1.0 END), 1) AS INTEGER) AS rs_height
      FROM d ORDER BY doc_id"""),
      (s, dir) => {
        val meta = Multimodal.fakeImageMeta(Multimodal.payload(col("text")))
        val rs = Multimodal.resizedMeta(col("meta"), 32)
        Tables.read(s, dir, "documents")
          .withColumn("meta", meta)
          .withColumn("rs", rs)
          .select(col("doc_id"),
            col("meta.n_bytes").as("n_bytes"), col("meta.format").as("format"),
            col("meta.width").as("width"), col("meta.height").as("height"),
            col("rs.width").as("rs_width"), col("rs.height").as("rs_height"))
          .orderBy("doc_id")
      })
  )
}
