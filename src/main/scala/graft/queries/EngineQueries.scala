package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._
import graft.ops.{CohortFilter, Multimodal}
import graft.query.QueryEngine
import graft.sources.Tables

/** Whole-lifecycle queries: the full SURVEY.md §3.1 cohort analysis driven
  * by a serialized QuerySpec (parse → cohort resolution → windowed scan →
  * semi-join → KPI/delta aggregation), and the multimodal-column pipeline.
  */
object EngineQueries {

  type Q = (SparkSession, String) => DataFrame

  /** The QuerySpec under test — built, serialized to JSON, and re-parsed on
    * every run, so the query exercises the spec round-trip too.
    */
  private def spec: QuerySpec = QuerySpec.fromJson(QuerySpec(
    subjectSelection = ByAttributes(Seq(
      CohortFilter.NumericRange("c_acctbal", 1000.0, 9000.0),
      CohortFilter.CategoricalIn("c_mktsegment", Seq("BUILDING", "MACHINERY")))),
    controlSelection = AllUsers,
    startDate = "2024-01-03",
    endDate = "2024-01-20").toJson)

  private def runEngine(s: SparkSession, dir: String): QueryEngine.ResultBundle = {
    val subjects = Tables.customer(s, dir).withColumnRenamed("c_custkey", "user_id")
    QueryEngine.run(spec, subjects, Tables.events(s, dir), "user_id", "ts", "value")
  }

  /** Genuine RIFF/WAVE byte headers synthesized from doc_id — shared by
    * the audio gates. All multi-byte fields little-endian; a "fact" chunk
    * interposed between "fmt " and "data" forces the chunk walk; the data
    * chunk declares its size with no body (headers-only corpus, like the
    * image gate).
    */
  private def syntheticWavMedia(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.Column
    // Byte i of a non-negative long, as a 2-hex-char string (LE when
    // concatenated low byte first). Long/long division → double in
    // Column algebra; values < 2^32 are exact in double, truncate-cast.
    def byteAt(x: Column, i: Int): Column =
      lpad(hex(pmod((x / lit(math.pow(256, i).toLong)).cast("long"),
        lit(256L))), 2, "0")
    def le16(x: Column): Column = concat(byteAt(x, 0), byteAt(x, 1))
    def le32(x: Column): Column =
      concat(byteAt(x, 0), byteAt(x, 1), byteAt(x, 2), byteAt(x, 3))
    val ch = pmod(col("doc_id"), lit(2L)) + 1
    val rate = element_at(
      array(lit(8000L), lit(16000L), lit(22050L), lit(44100L)),
      (pmod(col("doc_id"), lit(4L)) + 1).cast("int"))
    val bits = (pmod(col("doc_id"), lit(3L)) + 1) * 8
    val blockAlign = ch * (bits / lit(8)).cast("long")
    val frames = pmod(col("doc_id"), lit(9973L)) + 1
    val dataBytes = frames * blockAlign
    val byteRate = rate * blockAlign
    val wavHex = concat(
      lit("52494646"), le32(lit(48L)), lit("57415645"),  // RIFF size WAVE
      lit("666D7420"), le32(lit(16L)),                   // "fmt " len 16
      le16(lit(1L)), le16(ch), le32(rate), le32(byteRate),
      le16(blockAlign), le16(bits),
      lit("66616374"), le32(lit(4L)), le32(frames),      // "fact" len 4
      lit("64617461"), le32(dataBytes))                  // "data" size, no body
    docs.select(col("doc_id").as("media_id"), unhex(wavHex).as("payload"))
  }

  /** Synthesize bit-exact minimal MP4s (ISO-BMFF): an `ftyp` box (brand
    * varies by doc) and a `moov` containing an mvhd v0 with per-doc
    * timescale and duration. Box sizes and all integer fields are
    * big-endian (`hex()` is naturally BE), the mirror-image of the WAV
    * synthesis above — together they pin both endiannesses end to end.
    */
  private def syntheticMp4Media(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.Column
    def be32(x: Column): Column = lpad(hex(x.cast("long")), 8, "0")
    def zeros(nBytes: Int): Column = lit("00" * nBytes)
    // 4cc hex: isom, mp42, avc1, 3gp4
    val brand = element_at(array(lit("69736F6D"), lit("6D703432"),
      lit("61766331"), lit("33677034")),
      pmod(col("doc_id"), lit(4L)).cast("int") + 1)
    val timescale = element_at(array(lit(600L), lit(1000L), lit(90000L),
      lit(44100L)), pmod(col("doc_id") * 7, lit(4L)).cast("int") + 1)
    val units = pmod(col("doc_id"), lit(100000L)) + 1000L
    val mvhd = concat(be32(lit(108L)), lit("6D766864"), // size 'mvhd'
      zeros(4),                        // version 0 + flags
      be32(lit(0L)), be32(lit(0L)),    // creation, modification
      be32(timescale), be32(units),
      lit("00010000"), lit("0100"), zeros(2), // rate 1.0, volume, reserved
      zeros(8), zeros(36), zeros(24),  // reserved2, matrix, pre_defined
      be32(lit(1L)))                   // next_track_ID
    val mp4Hex = concat(
      be32(lit(16L)), lit("66747970"), brand, be32(lit(0L)), // ftyp
      be32(lit(116L)), lit("6D6F6F76"), mvhd)                // moov
    docs.select(col("doc_id").as("media_id"), unhex(mp4Hex).as("payload"))
  }

  def defs: Map[String, Q] = Map(
    "cohort_analysis_e2e" -> { (s, dir) =>
      runEngine(s, dir).kpis.select(
        round(col("subj_avg"), 4).as("subj_avg"),
        col("subj_min"), col("subj_max"), col("subj_rows"),
        round(col("ctrl_avg"), 4).as("ctrl_avg"),
        round(col("ctrl_std"), 4).as("ctrl_std"), col("ctrl_rows"),
        round(col("delta_avg"), 4).as("delta_avg"))
    },

    "cohort_tod_ranges" -> { (s, dir) =>
      runEngine(s, dir).todKpis.select(col("range_label"),
        round(col("avg_value"), 4).as("avg_value"),
        col("min_value"), col("max_value"), col("n"))
    },

    // Dashboard multi-feature KPI table: one row per feature series.
    "cohort_multi_feature" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val subjects = Tables.customer(s, dir).withColumnRenamed("c_custkey", "user_id")
      val features = Seq("click", "view", "purchase")
        .map(t => t -> ev.filter(col("event_type") === t)).toMap
      QueryEngine.runFeatures(spec, subjects, features, "user_id", "ts", "value")
        .select(col("feature"),
          round(col("subj_avg"), 4).as("subj_avg"),
          col("subj_min"), col("subj_max"), col("subj_rows"),
          round(col("ctrl_avg"), 4).as("ctrl_avg"), col("ctrl_rows"),
          round(col("delta_avg"), 4).as("delta_avg"))
    },

    "mm_image_metadata" -> { (s, dir) =>
      val media = Tables.documents(s, dir).select(
        col("doc_id").as("media_id"),
        encode(col("text"), "utf-8").as("payload"),
        lit("image/fake").as("mime"))
      Multimodal.decodeImageMeta(media)
    },

    // REAL header decode proof: payloads are genuine JPEG/PNG byte headers
    // synthesized from doc_id (big-endian dimension fields, JFIF APP0
    // segment to force the JPEG segment walk, PNG signature + IHDR), parsed
    // by Multimodal.parseImageHeader. The oracle derives the expected
    // dimensions arithmetically — a wrong parse offset or endianness flips
    // the hash.
    "mm_image_header_real" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      def hex4(c: org.apache.spark.sql.Column) = lpad(hex(c.cast("int")), 4, "0")
      def hex8(c: org.apache.spark.sql.Column) = lpad(hex(c.cast("int")), 8, "0")
      val jW = pmod(col("doc_id"), lit(4000)) + 1
      val jH = pmod(col("doc_id") * 7, lit(4000)) + 1
      val pW = pmod(col("doc_id"), lit(1024)) + 1
      val pH = pmod(col("doc_id") * 7, lit(1024)) + 1
      // PNG color type by doc_id%5 → channels 1/3/1/2/4.
      val colorType = element_at(
        array(lit("00"), lit("02"), lit("03"), lit("04"), lit("06")),
        (pmod(col("doc_id"), lit(5)) + 1).cast("int"))
      val jpegHex = concat(
        lit("FFD8"),                                 // SOI
        lit("FFE000104A46494600010100000100010000"), // APP0 JFIF, len 16
        lit("FFC0001108"), hex4(jH), hex4(jW),       // SOF0 len 17, precision 8, h, w
        lit("03011100021101031101"),                 // 3 components
        lit("FFD9"))                                 // EOI
      val pngHex = concat(
        lit("89504E470D0A1A0A"),           // signature
        lit("0000000D49484452"),           // IHDR length 13 + type
        hex8(pW), hex8(pH),
        lit("08"), colorType,              // bit depth 8, color type
        lit("000000"),                     // compression/filter/interlace
        lit("00000000"))                   // CRC (not validated by the parser)
      val media = docs.select(col("doc_id").as("media_id"),
        unhex(when(pmod(col("doc_id"), lit(2)) === 0, jpegHex).otherwise(pngHex))
          .as("payload"),
        when(pmod(col("doc_id"), lit(2)) === 0, "image/jpeg")
          .otherwise("image/png").as("mime"))
      Multimodal.decodeImageMeta(media)
    },

    // REAL WAV header decode proof: payloads are genuine RIFF/WAVE byte
    // headers synthesized from doc_id (all multi-byte fields little-endian,
    // a "fact" chunk interposed between "fmt " and "data" to force the
    // chunk walk), parsed by Multimodal.parseWavHeader via the native
    // AudioHeader expression. The oracle derives every field arithmetically
    // — a wrong offset or endianness flips the hash.
    "mm_audio_header_real" -> { (s, dir) =>
      Multimodal.decodeAudioMeta(syntheticWavMedia(Tables.documents(s, dir)))
    },

    // Segment planning over the same synthesized clips: [200 ms, 100 ms)
    // overlapping windows, byte ranges frame-aligned — explode without
    // decode; integer arithmetic end to end.
    "mm_audio_segments" -> { (s, dir) =>
      Multimodal.audioSegments(syntheticWavMedia(Tables.documents(s, dir)),
        segMs = 200L, strideMs = 100L)
    },

    "mm_frame_sample" -> { (s, dir) =>
      val media = Tables.documents(s, dir).filter(col("doc_id") < 50).select(
        col("doc_id").as("media_id"),
        encode(col("text"), "utf-8").as("payload"))
      Multimodal.frameSample(media, fps = 30, everyNthFrame = 10)
    },

    // Real ISO-BMFF box walk on bit-exact synthesized MP4 headers: ftyp
    // brand + moov/mvhd timescale/duration, all big-endian — a wrong
    // offset, endianness, or box-descent flips the hash.
    "mm_video_header_real" -> { (s, dir) =>
      Multimodal.decodeVideoMeta(syntheticMp4Media(Tables.documents(s, dir)))
    },

    // Overlapping byte-window chunking (audio-window / long-payload prep);
    // the corpus is ASCII so the oracle can slice characters.
    "mm_chunk" -> { (s, dir) =>
      val media = Tables.documents(s, dir).filter(col("doc_id") < 100).select(
        col("doc_id").as("media_id"),
        encode(col("text"), "utf-8").as("payload"))
      Multimodal.chunk(media, chunkBytes = 64, overlapBytes = 16)
        .withColumn("chunk_text", decode(col("chunk"), "utf-8"))
        .drop("chunk")
    }
  )

  private val subjCte =
    """subj AS (SELECT c_custkey AS user_id FROM customer
      |  WHERE (c_acctbal BETWEEN 1000.0 AND 9000.0 OR c_acctbal IS NULL)
      |    AND (c_mktsegment IN ('BUILDING','MACHINERY') OR c_mktsegment IS NULL)),
      |win AS (SELECT user_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events
      |  WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-03' AND DATE '2024-01-20'),
      |sw AS (SELECT * FROM win WHERE user_id IN (SELECT user_id FROM subj))""".stripMargin

  def oracles: Map[String, String] = Map(
    "cohort_analysis_e2e" ->
      s"""WITH $subjCte,
         |s AS (SELECT avg(value) AS a, min(value) AS mn, max(value) AS mx,
         |  count(*) AS n FROM sw),
         |c AS (SELECT avg(value) AS a, stddev_samp(value) AS sd, count(*) AS n
         |  FROM win WHERE user_id IN (SELECT c_custkey FROM customer))
         |SELECT round(s.a, 4) AS subj_avg, s.mn AS subj_min, s.mx AS subj_max,
         |  s.n AS subj_rows, round(c.a, 4) AS ctrl_avg, round(c.sd, 4) AS ctrl_std,
         |  c.n AS ctrl_rows, round(s.a - c.a, 4) AS delta_avg
         |FROM s, c""".stripMargin,

    "cohort_tod_ranges" ->
      s"""WITH $subjCte,
         |tagged AS (
         |  SELECT 'Workout' AS range_label, value FROM sw
         |    WHERE strftime(ts, '%H:%M:%S') BETWEEN '06:45:00' AND '09:30:00'
         |  UNION ALL
         |  SELECT 'Afternoon', value FROM sw
         |    WHERE strftime(ts, '%H:%M:%S') BETWEEN '12:30:00' AND '16:00:00'
         |  UNION ALL
         |  SELECT 'Sleep', value FROM sw
         |    WHERE strftime(ts, '%H:%M:%S') >= '20:00:00'
         |       OR strftime(ts, '%H:%M:%S') <= '04:45:00')
         |SELECT range_label, round(avg(value), 4) AS avg_value,
         |  min(value) AS min_value, max(value) AS max_value, count(*) AS n
         |FROM tagged GROUP BY range_label""".stripMargin,

    "cohort_multi_feature" ->
      """WITH subj AS (SELECT c_custkey AS user_id FROM customer
        |  WHERE (c_acctbal BETWEEN 1000.0 AND 9000.0 OR c_acctbal IS NULL)
        |    AND (c_mktsegment IN ('BUILDING','MACHINERY') OR c_mktsegment IS NULL)),
        |win AS (SELECT user_id, event_type, value FROM events
        |  WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-03' AND DATE '2024-01-20'
        |    AND event_type IN ('click', 'view', 'purchase')),
        |subjwin AS (SELECT * FROM win WHERE user_id IN (SELECT user_id FROM subj)),
        |ctrlwin AS (SELECT * FROM win WHERE user_id IN (SELECT c_custkey FROM customer)),
        |s AS (SELECT event_type AS feature, avg(value) AS sa, min(value) AS smn,
        |    max(value) AS smx, count(*) AS sn FROM subjwin GROUP BY 1),
        |c AS (SELECT event_type AS feature, avg(value) AS ca, count(*) AS cn
        |  FROM ctrlwin GROUP BY 1)
        |SELECT s.feature, round(s.sa, 4) AS subj_avg, s.smn AS subj_min,
        |  s.smx AS subj_max, s.sn AS subj_rows, round(c.ca, 4) AS ctrl_avg,
        |  c.cn AS ctrl_rows, round(s.sa - c.ca, 4) AS delta_avg
        |FROM s JOIN c ON s.feature = c.feature""".stripMargin,

    "mm_image_metadata" ->
      """SELECT doc_id AS media_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(64 + octet_length(encode(text)) % 512 AS INTEGER) AS width,
        |  CAST(64 + (octet_length(encode(text)) // 7) % 512 AS INTEGER) AS height,
        |  3 AS channels
        |FROM documents""".stripMargin,

    "mm_image_header_real" ->
      """SELECT doc_id AS media_id,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 41 ELSE 33 END AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 4000 + 1
        |       ELSE doc_id % 1024 + 1 END AS INTEGER) AS width,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN (doc_id * 7) % 4000 + 1
        |       ELSE (doc_id * 7) % 1024 + 1 END AS INTEGER) AS height,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 3
        |       ELSE ([1,3,1,2,4])[CAST(doc_id % 5 AS INTEGER) + 1]
        |       END AS INTEGER) AS channels
        |FROM documents""".stripMargin,

    "mm_audio_header_real" ->
      """SELECT doc_id AS media_id,
        |  CAST(56 AS BIGINT) AS n_bytes,
        |  CAST(doc_id % 2 + 1 AS INTEGER) AS channels,
        |  CAST(([8000, 16000, 22050, 44100])[CAST(doc_id % 4 AS INTEGER) + 1]
        |    AS INTEGER) AS sample_rate,
        |  CAST((doc_id % 3 + 1) * 8 AS INTEGER) AS bits,
        |  CAST((doc_id % 2 + 1) * (doc_id % 3 + 1) AS INTEGER) AS block_align,
        |  CAST((doc_id % 9973 + 1) * (doc_id % 2 + 1) * (doc_id % 3 + 1)
        |    AS BIGINT) AS data_bytes,
        |  CAST(((doc_id % 9973 + 1) * 1000)
        |    // ([8000, 16000, 22050, 44100])[CAST(doc_id % 4 AS INTEGER) + 1]
        |    AS BIGINT) AS duration_ms
        |FROM documents""".stripMargin,

    "mm_video_header_real" ->
      """SELECT doc_id AS media_id,
        |  CAST(132 AS BIGINT) AS n_bytes,
        |  (['isom', 'mp42', 'avc1', '3gp4'])[CAST(doc_id % 4 AS INTEGER) + 1]
        |    AS major_brand,
        |  CAST(([600, 1000, 90000, 44100])[CAST((doc_id * 7) % 4 AS INTEGER) + 1]
        |    AS BIGINT) AS timescale,
        |  CAST(doc_id % 100000 + 1000 AS BIGINT) AS duration_units,
        |  CAST(((doc_id % 100000 + 1000) * 1000)
        |    // ([600, 1000, 90000, 44100])[CAST((doc_id * 7) % 4 AS INTEGER) + 1]
        |    AS BIGINT) AS duration_ms
        |FROM documents""".stripMargin,

    "mm_audio_segments" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |    doc_id % 2 + 1 AS ch,
        |    ([8000, 16000, 22050, 44100])[CAST(doc_id % 4 AS INTEGER) + 1]
        |      AS rate,
        |    (doc_id % 2 + 1) * (doc_id % 3 + 1) AS ba,
        |    doc_id % 9973 + 1 AS frames
        |  FROM documents),
        |d AS (SELECT *, (frames * 1000) // rate AS dur FROM m)
        |SELECT media_id, CAST(s // 100 AS INTEGER) AS seg_idx,
        |  CAST(s AS BIGINT) AS start_ms,
        |  CAST(least(s + 200, dur) AS BIGINT) AS end_ms,
        |  CAST((s * rate // 1000) * ba AS BIGINT) AS byte_start,
        |  CAST((least(s + 200, dur) * rate // 1000 - s * rate // 1000) * ba
        |    AS BIGINT) AS byte_len
        |FROM d, unnest(range(0, dur, 100)) AS t(s)
        |WHERE dur > 0""".stripMargin,

    "mm_frame_sample" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |    octet_length(encode(text)) % 1000 + 1 AS n_frames
        |  FROM documents WHERE doc_id < 50)
        |SELECT media_id, CAST(f AS INTEGER) AS frame_idx,
        |  CAST(f AS DOUBLE) / 30 AS ts_sec
        |FROM m, unnest(range(0, n_frames, 10)) AS t(f)""".stripMargin,

    "mm_chunk" ->
      """WITH m AS (SELECT doc_id AS media_id, text,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents WHERE doc_id < 100)
        |SELECT media_id, CAST(s // 48 AS INTEGER) AS chunk_idx,
        |  CAST(s AS BIGINT) AS chunk_start,
        |  CAST(least(64, n - s) AS BIGINT) AS chunk_len,
        |  substring(text, CAST(s + 1 AS INTEGER), 64) AS chunk_text
        |FROM m, unnest(range(0, greatest(n, 1), 48)) AS t(s)""".stripMargin
  )
}
