package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.syntax._
import graft.io.Tables

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, plus a
  * decode/feature-extract stage as a partition-wise batch operator.
  *
  * The container has no image/audio codec LIBRARIES, so the decode
  * stages (m2/m4) carry their own pure-JVM codec for a real format:
  * each asset payload is a genuine P5 (binary PGM) image and
  * [[parsePgmHeader]] is an actual parser of that format — magic,
  * comment lines, ASCII header integers, raw raster (the round-1..10
  * fake-decode stub is retired). Everything around it — the
  * binary+struct schema, the `mapPartitions` batch shape (one codec
  * init per partition, streamed rows), the partitioning story — is the
  * real 100 TB plumbing: payload bytes never hit the driver, and the
  * decode stage is a narrow map (no shuffle). Swapping PGM for
  * JPEG/FLAC means replacing the parser body, nothing else.
  */
object Binary {

  /** The asset table: payload as binary + typed metadata struct.
    * (Payload here is the document text's UTF-8 bytes standing in for
    * image bytes; at production scale this column is the raw media.) */
  def assets(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      $"doc_id".as("asset_id"),
      encode($"text", "UTF-8").as("payload"),
      struct(
        $"source".as("origin"),
        lit("image/fake").as("mime"),
        octet_length(encode($"text", "UTF-8")).as("n_bytes")).as("meta"))

  /** PGM (P5) asset builder for the decode/resize stages (m2/m4): each
    * document becomes a REAL binary image — a P5 header (magic,
    * comment line, ASCII dims, maxval) followed by width·height raw
    * 8-bit pixels taken from the text's bytes (truncated / space-
    * padded). Dimensions derive deterministically from (text length,
    * doc_id), both in [8,32], so the DuckDB oracle can restate the
    * expected decode output relationally over `documents`. The
    * payload is built as ONE codegen projection — no UDF, no driver
    * round-trip — and the comment line is deliberate: the decoder's
    * comment handling gets exercised on every row. */
  def pgmAssets(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      $"doc_id".as("asset_id"),
      expr(
        """encode(concat(
             'P5\n# graft synthetic asset\n',
             8 + length(text) % 25, ' ', 8 + doc_id % 25, '\n255\n',
             rpad(substr(text, 1, (8 + length(text) % 25) * (8 + doc_id % 25)),
                  (8 + length(text) % 25) * (8 + doc_id % 25), ' ')),
           'UTF-8')""").as("payload"))

  /** Parsed P5 header: dimensions, maxval, and where the raster
    * starts. */
  final case class PgmHeader(width: Int, height: Int, maxval: Int,
      rasterOffset: Int)

  /** REAL P5 (binary PGM) header parser — replaces the round-1..10
    * `fakeDecode` stub (the last `???` in src/main). Walks the actual
    * byte format: "P5" magic, whitespace, '#' comment lines, three
    * ASCII integers (width, height, maxval), one whitespace byte, then
    * width·height raw pixels. Malformed input fails loudly — a codec
    * that guesses is worse than none. */
  private[graft] def parsePgmHeader(b: Array[Byte]): PgmHeader = {
    require(b.length >= 2 && b(0) == 'P' && b(1) == '5',
      "payload is not a P5 PGM (bad magic)")
    var i = 2
    def skipWsAndComments(): Unit = {
      var go = true
      while (go) {
        while (i < b.length &&
          (b(i) == ' ' || b(i) == '\n' || b(i) == '\r' || b(i) == '\t')) i += 1
        if (i < b.length && b(i) == '#') {
          while (i < b.length && b(i) != '\n') i += 1
        } else go = false
      }
    }
    def headerInt(): Int = {
      skipWsAndComments()
      var v = 0; var any = false
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0'); i += 1; any = true
      }
      require(any, s"malformed PGM header: expected integer at byte $i")
      v
    }
    val w = headerInt(); val h = headerInt(); val maxval = headerInt()
    i += 1 // the format mandates exactly one whitespace byte before the raster
    require(maxval > 0 && maxval < 256, s"unsupported PGM maxval $maxval")
    require(b.length - i >= w * h,
      s"truncated PGM raster: ${b.length - i} bytes < $w*$h")
    PgmHeader(w, h, maxval, i)
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("maxval", IntegerType),
    StructField("n_pixels", IntegerType),
    StructField("sum_px", LongType),
    StructField("min_px", IntegerType),
    StructField("max_px", IntegerType)))

  /** M-2 — partition-wise decode/feature-extract over the binary
    * column: parse each payload as a real P5 PGM and emit per-image
    * pixel statistics (dims, maxval, sum/min/max over the raster).
    * The mapPartitions batch shape is the production seam — codec
    * state initializes once per partition, payload bytes never leave
    * the executor, and the stage is a narrow map (no shuffle). The
    * stub decode of rounds 1–10 is gone: this decodes actual image
    * bytes, and the oracle recomputes the same statistics from the
    * deterministic fixture derivation. */
  def m2DecodeFeatures(s: SparkSession, dir: String): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(featureSchema))
    pgmAssets(s, dir)
      .mapPartitions { it =>
        // per-partition codec init point (the parser is stateless; a
        // libjpeg-style handle would be created HERE, once)
        it.map { r =>
          val b = r.getAs[Array[Byte]]("payload")
          val hd = parsePgmHeader(b)
          var sum = 0L; var mn = 255; var mx = 0; var p = 0
          val n = hd.width * hd.height
          while (p < n) {
            val v = b(hd.rasterOffset + p) & 0xff
            sum += v; if (v < mn) mn = v; if (v > mx) mx = v; p += 1
          }
          Row(r.getAs[Long]("asset_id"), hd.width, hd.height, hd.maxval,
            n, sum, mn, mx)
        }
      }(enc).toDF().orderBy($"asset_id")
  }

  /** Frame geometry for M-3: payload is treated as fixed 32-byte
    * "frames"; every 4th frame is sampled. */
  val FrameBytes = 32
  val SampleStride = 4

  /** M-3 — frame sampling over the binary column (the video/audio
    * "take every k-th frame" stage): slice the payload into fixed-size
    * frames with Spark's binary substring, sample every k-th, and emit
    * a digest + length per sampled frame. Pure generate+projection —
    * payload bytes never leave the executor and never hit the driver.
    * Digest is md5 over the frame's HEX (hex of a byte-aligned slice ==
    * slice of the hex string, which is what the oracle — lacking blob
    * substring — computes). */
  def m3FrameSample(s: SparkSession, dir: String): DataFrame =
    assets(s, dir)
      .select($"asset_id", $"payload", $"meta.n_bytes".as("n_bytes"))
      .select($"asset_id", $"payload", $"n_bytes",
        explode(sequence(lit(0),
          greatest(ceil($"n_bytes" / lit(FrameBytes.toDouble)).cast("int") - 1, lit(0)),
          lit(SampleStride))).as("frame_idx"))
      .select($"asset_id", $"frame_idx",
        md5(hex(expr(s"substring(payload, frame_idx * $FrameBytes + 1, $FrameBytes)")))
          .as("frame_md5"),
        least(lit(FrameBytes), $"n_bytes" - $"frame_idx" * FrameBytes).as("frame_bytes"))
      .orderBy($"asset_id", $"frame_idx")

  /** Resize stride for M-4: keep every 2nd pixel in each dimension. */
  val ResizeStride = 2

  val resizeSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("in_w", IntegerType),
    StructField("in_h", IntegerType),
    StructField("out_w", IntegerType),
    StructField("out_h", IntegerType),
    StructField("out_bytes", IntegerType),
    StructField("out_md5", StringType)))

  /** M-4 — REAL nearest-neighbor image resize over the binary column
    * (completing the decode / feature-extract / RESIZE / frame-sample
    * multimodal quartet; the entry key keeps its historical
    * `m4_resize_stub` name from when this WAS a byte-stride stub):
    * decode the P5 payload, keep every [[ResizeStride]]-th pixel in
    * each dimension (ceil(w/2) × ceil(h/2) output), re-encode the
    * result as a P5 image, and emit the audit row (in/out dims, out
    * byte count, md5 of the resized image) a pipeline materializes
    * next to the resized blobs. Same mapPartitions codec seam as m2 —
    * digest state initializes once per partition, payload bytes never
    * leave the executor, narrow map. The oracle rebuilds the exact
    * resized P5 bytes (header + subsampled raster) relationally and
    * must match the md5, so the whole decode→subsample→re-encode
    * kernel is value-gated, not just shape-gated. */
  def m4ResizeStub(s: SparkSession, dir: String): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(resizeSchema))
    pgmAssets(s, dir)
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5") // once per partition
        it.map { r =>
          val b = r.getAs[Array[Byte]]("payload")
          val hd = parsePgmHeader(b)
          val ow = (hd.width + ResizeStride - 1) / ResizeStride
          val oh = (hd.height + ResizeStride - 1) / ResizeStride
          val header = s"P5\n$ow $oh\n${hd.maxval}\n".getBytes("US-ASCII")
          val px = new Array[Byte](ow * oh)
          var i = 0; var k = 0
          while (i < oh) {
            var j = 0
            while (j < ow) {
              px(k) = b(hd.rasterOffset +
                (i * ResizeStride) * hd.width + j * ResizeStride)
              k += 1; j += 1
            }
            i += 1
          }
          md.reset(); md.update(header); md.update(px)
          val digest = md.digest().map(x => f"$x%02x").mkString
          Row(r.getAs[Long]("asset_id"), hd.width, hd.height, ow, oh,
            header.length + px.length, digest)
        }
      }(enc).toDF().orderBy($"asset_id")
  }

  /** M-1 — binary metadata projection (oracle-checkable part: byte
    * length and content hash are portable; the fake decode output is
    * checked by [[m2DecodeFeatures]]'s spec instead). */
  def m1BinaryMeta(s: SparkSession, dir: String): DataFrame =
    assets(s, dir).select(
      $"asset_id", $"meta.origin".as("origin"), $"meta.n_bytes".as("n_bytes"),
      md5($"payload").as("content_md5"))
      .orderBy($"asset_id")

  /** M-5 — exact dedup of binary assets by content digest (d1's media
    * counterpart, the first pass of every multimodal ingest). One
    * shuffle on the payload md5; within a digest group every copy is
    * byte-identical, so keeper choice (min asset id) and reclaimable
    * bytes ((n-1)·size) are deterministic. At 100 TB the digest is
    * computed at INGEST and carried as a column — this operator then
    * never rereads payload bytes, and the groupBy shuffles 16-byte
    * digests + metadata, not media. Emits every group (singletons
    * included) so the gate is non-trivial at every SF; the planted
    * duplicate assets surface as n_copies > 1. */
  def m5AssetDedup(s: SparkSession, dir: String): DataFrame =
    assets(s, dir)
      .select($"asset_id", md5($"payload").as("digest"),
        $"meta.n_bytes".as("n_bytes"))
      .groupBy($"digest")
      .agg(count(lit(1)).as("n_copies"),
        min($"asset_id").as("keeper"),
        ((count(lit(1)) - 1) * min($"n_bytes")).cast("bigint").as("dup_bytes"))
      .orderBy($"digest")

  /** M-6 — `binaryFile` source: Spark's native whole-file media reader
    * (path, modificationTime, length, content), the ingest edge for
    * image/audio corpora. A deterministic 20-file fixture (the 20
    * smallest doc ids' text bytes — fixture GENERATION collects 20
    * rows; the read path is the real distributed source) is read back
    * with `pathGlobFilter`; output = (file name, byte length, content
    * md5). At 100 TB this source partitions by FILES (one task per
    * group of files, `maxPartitionBytes`-sized) and payload bytes stay
    * executor-side — the same property m2/m3 assert for the decode
    * stages downstream. Oracle = the expected values stated
    * relationally over `documents` (same bytes, same names). */
  def m6BinaryFileSource(s: SparkSession, dir: String): DataFrame = {
    // fresh fixture dir per invocation (the mt5-mt8 idiom): a fixed
    // shared path would let concurrent runs — or a prior run on a
    // different dataset — overwrite files under this run's lazy scan
    graft.pipeline.Pipeline.sweepOldWorkDirs()
    val work = java.nio.file.Files.createTempDirectory("graft_m6_").toFile
    Tables.documents(s, dir).filter($"doc_id" < 20)
      .select($"doc_id", $"text").collect() // 20-row fixture gen only
      .foreach { r =>
        java.nio.file.Files.write(
          new java.io.File(work, f"doc_${r.getLong(0)}%06d.bin").toPath,
          r.getString(1).getBytes("UTF-8"))
      }
    s.read.format("binaryFile").option("pathGlobFilter", "*.bin")
      .load(work.getAbsolutePath)
      .select(substring_index($"path", "/", -1).as("fname"),
        $"length".as("n_bytes"), md5($"content").as("content_md5"))
      .orderBy($"fname")
  }

  /** Perceptual-hash width for M-7 (one mean-threshold bit per payload
    * segment — the aHash construction). */
  val PhashBits = 16

  /** M-7 — perceptual-hash NEAR-dup of media assets (m5 is the exact
    * -digest counterpart): an aHash-style fingerprint — payload split
    * into [[PhashBits]] segments, bit j set iff segment j's byte mean ≥
    * the whole-payload mean (integer cross-multiplied, no division) —
    * then assets grouped by fingerprint; re-encoded/trailing-metadata
    * variants of the same image land in one bucket where the exact md5
    * (m5) splits them. The payload stands in as ASCII text, so byte
    * values are `ascii()` char codes on BOTH engines (documented stub
    * seam: a real build hashes decoded luma pixels in the same
    * expression shape). All integer algebra inside one narrow
    * projection; the grouping is one window over the 16-bit hash. At
    * 100 TB the fingerprint is computed at ingest next to the digest
    * (m1) and near-dup candidates are a hash-equality shuffle, never a
    * byte comparison. */
  def m7PerceptualNearDup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The whole aHash — segment sums, payload mean, cross-multiplied
    // bit tests — runs as ONE native kernel call per asset
    // (functions/Quant.phashAscii, pinned value-identical to the
    // nested transform/aggregate spelling in CodegenKernelsSpec). The
    // r12 lambda form evaluated an interpreted ascii(substring(...))
    // closure per CHARACTER — O(payload) lambda dispatches per asset
    // on a corpus-sized projection (r13 codegen audit).
    graft.functions.NativeFunctions.register(s)
    val h = Tables.documents(s, dir)
      .select($"doc_id".as("asset_id"),
        call_function("phash_ascii", $"text", lit(PhashBits)).as("phash"))
    val w = Window.partitionBy($"phash")
    h.select($"asset_id", $"phash",
        count(lit(1)).over(w).as("n_same"),
        min($"asset_id").over(w).as("keeper"))
      .withColumn("is_dup", ($"asset_id" =!= $"keeper").cast("int"))
      .orderBy($"asset_id")
  }

  /** M-8 — multimodal MANIFEST coverage audit: before any ANN or
    * embedding-gated stage runs, every document must have its vector
    * (and every vector its document — orphan vectors mean the upstream
    * embed job wrote rows the corpus later purged). One full-outer
    * join on the id, conditional counts fused into one aggregate; at
    * 100 TB this is the cheapest join in the pipeline (two id+source
    * columns) and the report that decides whether s1–s11 are even
    * runnable. The d10-purge / p3-ingest pair is what keeps these
    * counts at zero in steady state. */
  def m8ManifestAudit(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select($"doc_id")
    val vecs = Tables.embeddings(s, dir).select($"vec_id")
    docs.join(vecs, docs("doc_id") === vecs("vec_id"), "full_outer")
      .agg(
        count(lit(1)).as("n_entities"),
        sum(($"doc_id".isNotNull && $"vec_id".isNotNull).cast("bigint")).as("n_paired"),
        sum($"vec_id".isNull.cast("bigint")).as("n_docs_without_vec"),
        sum($"doc_id".isNull.cast("bigint")).as("n_vecs_without_doc"))
  }

  val oracles: Map[String, String] = Map(
    "m8_manifest_audit" ->
      """SELECT count(*) AS n_entities,
                CAST(sum(CASE WHEN d.doc_id IS NOT NULL AND e.vec_id IS NOT NULL
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_paired,
                CAST(sum(CASE WHEN e.vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_docs_without_vec,
                CAST(sum(CASE WHEN d.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_vecs_without_doc
         FROM documents d FULL OUTER JOIN embeddings e ON d.doc_id = e.vec_id""",
    "m7_perceptual_neardup" ->
      s"""WITH d AS (SELECT doc_id AS asset_id, text, length(text) AS n,
                            CAST(ceil(length(text) / $PhashBits.0) AS INT) AS seg_len
                     FROM documents),
          segs AS (SELECT asset_id, n,
                     [struct_pack(
                        sb := greatest(least((j + 1) * seg_len, n) - j * seg_len, 0),
                        ss := CASE WHEN j * seg_len < n THEN
                                list_sum([ord(substr(text, k + 1, 1))
                                          for k in range(j * seg_len,
                                                         least((j + 1) * seg_len, n))])
                              ELSE 0 END)
                      for j in range(0, $PhashBits)] AS sg
                   FROM d),
          t AS (SELECT asset_id, n, sg,
                       list_sum([x.ss for x in sg]) AS total FROM segs),
          h AS (SELECT asset_id,
                       CAST(list_sum([CASE WHEN sg[j + 1].sb > 0
                                            AND sg[j + 1].ss * n >= total * sg[j + 1].sb
                                           THEN 1 << j ELSE 0 END
                                      for j in range(0, $PhashBits)]) AS BIGINT) AS phash
                FROM t)
          SELECT asset_id, phash,
                 count(*) OVER (PARTITION BY phash) AS n_same,
                 min(asset_id) OVER (PARTITION BY phash) AS keeper,
                 CAST(CASE WHEN asset_id <> min(asset_id) OVER (PARTITION BY phash)
                           THEN 1 ELSE 0 END AS INT) AS is_dup
          FROM h ORDER BY asset_id""",
    "m6_binaryfile_source" ->
      """SELECT 'doc_' || lpad(CAST(doc_id AS VARCHAR), 6, '0') || '.bin' AS fname,
                CAST(strlen(text) AS BIGINT) AS n_bytes,
                md5(text) AS content_md5
         FROM documents WHERE doc_id < 20 ORDER BY fname""",
    "m5_asset_dedup" ->
      """SELECT md5(text) AS digest, count(*) AS n_copies,
                CAST(min(doc_id) AS BIGINT) AS keeper,
                CAST((count(*) - 1) * min(octet_length(encode(text))) AS BIGINT)
                  AS dup_bytes
         FROM documents GROUP BY digest ORDER BY digest""",
    // m4: the oracle REBUILDS the resized P5 image byte-for-byte —
    // same deterministic fixture derivation as the Scala builder
    // (w = 8 + len%25, h = 8 + doc_id%25, pixels = space-padded text),
    // nearest-neighbor subsample at stride 2, header re-encoded with
    // chr(10) newlines — and must land on the same md5, so the whole
    // decode→subsample→re-encode kernel is value-gated.
    "m4_resize_stub" ->
      s"""WITH a AS (SELECT doc_id AS asset_id, text, length(text) AS n
                     FROM documents),
          d AS (SELECT asset_id, 8 + n % 25 AS w, 8 + asset_id % 25 AS h, text
                FROM a),
          px AS (SELECT asset_id, w, h,
                        rpad(substr(text, 1, w * h), CAST(w * h AS INT), ' ') AS ps,
                        (w + ${ResizeStride - 1}) // $ResizeStride AS ow,
                        (h + ${ResizeStride - 1}) // $ResizeStride AS oh
                 FROM d),
          r AS (SELECT asset_id, w, h, ow, oh,
                       'P5' || chr(10) || ow || ' ' || oh || chr(10) ||
                       '255' || chr(10) ||
                       list_aggregate(
                         [substr(ps, (k // ow) * $ResizeStride * w +
                                     (k % ow) * $ResizeStride + 1, 1)
                          for k in range(0, ow * oh)],
                         'string_agg', '') AS outp
                FROM px)
          SELECT asset_id, CAST(w AS INT) AS in_w, CAST(h AS INT) AS in_h,
                 CAST(ow AS INT) AS out_w, CAST(oh AS INT) AS out_h,
                 CAST(strlen(outp) AS INT) AS out_bytes,
                 md5(outp) AS out_md5
          FROM r ORDER BY asset_id""",
    "m1_binary_meta" ->
      """SELECT doc_id AS asset_id, source AS origin,
                CAST(octet_length(encode(text)) AS INT) AS n_bytes,
                md5(text) AS content_md5
         FROM documents ORDER BY asset_id""",
    // m2: the oracle recomputes the REAL decode output — dims from the
    // deterministic fixture derivation, pixel stats from the same
    // space-padded text raster the P5 builder encodes — so the whole
    // build→parse→stat mapPartitions path is hash-gated end to end.
    "m2_decode_features" ->
      """WITH a AS (SELECT doc_id AS asset_id, text, length(text) AS n
                    FROM documents),
         d AS (SELECT asset_id, 8 + n % 25 AS w, 8 + asset_id % 25 AS h, text
               FROM a),
         px AS (SELECT asset_id, w, h,
                       rpad(substr(text, 1, w * h), CAST(w * h AS INT), ' ') AS ps
                FROM d),
         v AS (SELECT asset_id, w, h,
                      [ord(substr(ps, k + 1, 1)) for k in range(0, w * h)] AS vals
               FROM px)
         SELECT asset_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
                CAST(255 AS INT) AS maxval, CAST(w * h AS INT) AS n_pixels,
                CAST(list_sum(vals) AS BIGINT) AS sum_px,
                CAST(list_min(vals) AS INT) AS min_px,
                CAST(list_max(vals) AS INT) AS max_px
         FROM v ORDER BY asset_id""",
    "m3_frame_sample" ->
      s"""WITH a AS (
            SELECT doc_id AS asset_id, hex(encode(text)) AS hx,
                   CAST(octet_length(encode(text)) AS INT) AS n_bytes
            FROM documents),
          idx AS (
            SELECT asset_id, hx, n_bytes,
                   unnest(range(0, greatest(CAST(ceil(n_bytes / $FrameBytes.0) AS INT), 1),
                                $SampleStride)) AS frame_idx
            FROM a)
          SELECT asset_id, CAST(frame_idx AS INT) AS frame_idx,
                 md5(substr(hx, CAST(frame_idx * ${FrameBytes * 2} + 1 AS BIGINT),
                            ${FrameBytes * 2})) AS frame_md5,
                 CAST(least($FrameBytes, n_bytes - frame_idx * $FrameBytes) AS INT) AS frame_bytes
          FROM idx ORDER BY asset_id, frame_idx""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m5_asset_dedup" -> m5AssetDedup _,
    "m6_binaryfile_source" -> m6BinaryFileSource _,
    "m7_perceptual_neardup" -> m7PerceptualNearDup _,
    "m8_manifest_audit" -> m8ManifestAudit _,
    "m1_binary_meta" -> m1BinaryMeta _,
    "m2_decode_features" -> m2DecodeFeatures _,
    "m3_frame_sample" -> m3FrameSample _,
    "m4_resize_stub" -> m4ResizeStub _,
  )
}
