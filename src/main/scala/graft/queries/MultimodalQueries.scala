package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal.ImageCodec

/** Oracle-checked slice of the multimodal surface (SURVEY LLM-extension):
  * media travels as opaque `binary` columns + typed metadata, and every
  * metadata derivation (hashing, sizing, slicing, transport encoding) is
  * columnar and codegen'd — the payload is never interpreted driver-side.
  * The codec boundary itself (decode/resize/frame-sample) lives in
  * `graft.multimodal` behind `mapPartitions`; here the relational part of
  * the contract gets a DuckDB oracle over bytes derived from `documents`.
  */
object MultimodalQueries {

  /** m06's deterministic fake-PCM frame energies (5 + doc_id % 5 frames
    * of `frameLen` samples; every 7th (frame + doc) is silent) — shared
    * by the energy stats (m06) and the fingerprint dedup (m09) so the
    * "decoder" is one definition. % is sign-of-dividend on purpose
    * (DuckDB parity for signed ids; see m06's comment).
    */
  private def fakeFrameEnergies(frameLen: Int): org.apache.spark.sql.Column = {
    val nFrames = (lit(5) + (col("doc_id") % 5L).cast("int")).cast("int")
    transform(sequence(lit(0), nFrames - 1), f => {
      val silent = (f.cast("long") + col("doc_id")) % 7L === 0L
      val energy = aggregate(
        sequence(lit(0), lit(frameLen - 1)),
        lit(0L),
        (acc, i) => {
          val g = f.cast("long") * frameLen + i.cast("long")
          val v = (col("doc_id") * 7919L + g * 31L) % 256L - 128L
          acc + v * v
        })
      when(silent, lit(0L)).otherwise(energy)
    })
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Binary-column metadata: content addressing (md5), byte sizing, head
    // slice via hex transport encoding — the dedup/partition keys of a
    // binary media lake, computed without decoding payloads.
    "m01" -> { (s, dir) =>
      val bin = col("text").cast("binary")
      Tables.load(s, dir, "documents")
        .select(
          col("doc_id"),
          md5(bin).as("content_md5"),
          length(bin).as("n_bytes"),
          substring(hex(bin), 1, 24).as("head_hex"))
    },

    // Storage-layout planning for a binary media lake: blobs binned into
    // power-of-two size classes (class = bit length of the byte count —
    // exact integer math, no float log2). The per-class histogram is what
    // sizes row groups / picks small-file compaction targets before a
    // 100 TB media ingest; one scan, one tiny aggregate.
    "m02" -> { (s, dir) =>
      val payload = col("text").cast("binary")
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), length(payload).as("n_bytes"))
        .withColumn("size_class", length(bin(col("n_bytes"))))
        .groupBy(col("size_class"))
        .agg(count(lit(1)).as("n_blobs"),
          sum(col("n_bytes")).as("total_bytes"),
          min(col("n_bytes")).as("min_bytes"),
          max(col("n_bytes")).as("max_bytes"))
    },

    // Real-codec proof: per document, synthesize a deterministic grayscale
    // pattern, encode it as an actual PNG (javax.imageio), decode the PNG
    // back, and report decoded dimensions + exact pixel sum. The oracle
    // recomputes the pattern arithmetically in SQL — a fake decoder cannot
    // reproduce the sums, so a hash match certifies the PNG round trip is
    // bit-exact. Distributed via mapPartitions; integer outputs avoid any
    // float-rounding parity concerns.
    "m03" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val w = 8 + (id % 5).toInt
            val h = 8 + (id % 7).toInt
            val px = Array.tabulate(w * h)(k => ((id * 31 + k.toLong * 7) % 256).toFloat)
            val png = ImageCodec.encodePng(px, w, h)
            val (dw, dh, dec) = ImageCodec.decode(png)
            var sum = 0L
            var i = 0
            while (i < dec.length) { sum += dec(i).toLong; i += 1 }
            (id, dw, dh, sum)
          }
        }
        .toDF("doc_id", "width", "height", "sum_px")
    },

    // Perceptual-hash image dedup: the canonical multimodal near-dup pass.
    // Each document synthesizes a deterministic 8x8 grayscale image (one of
    // 50 distinct "visuals" via doc_id % 50), round-trips it through the
    // REAL PNG codec, computes an average-hash (threshold each decoded
    // pixel at the image mean -> 64-bit signature, rendered as a bitstring
    // to stay overflow-free in both engines), and exact-dedups on the hash
    // — the groupBy clusters re-encoded/recompressed copies that byte-level
    // m01 hashing cannot catch. The oracle recomputes the aHash
    // arithmetically from the pattern definition, so a hash match
    // certifies decode + threshold + packing end to end. One scan +
    // mapPartitions codec stage + one hash aggregation: the 100 TB
    // image-dedup shape (the shuffle carries one 64-char key per image).
    "m04" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val seed = id % 50
            val px = Array.tabulate(64)(k => ((seed * 31 + k.toLong * 7) % 256).toFloat)
            val png = ImageCodec.encodePng(px, 8, 8)
            val (_, _, dec) = ImageCodec.decode(png)
            var sum = 0.0
            var i = 0
            while (i < 64) { sum += dec(i); i += 1 }
            val mean = sum / 64.0
            val sb = new java.lang.StringBuilder(64)
            i = 0
            while (i < 64) { sb.append(if (dec(i) >= mean) '1' else '0'); i += 1 }
            (id, sb.toString)
          }
        }
        .toDF("doc_id", "phash")
        .groupBy(col("phash"))
        .agg(count(lit(1)).as("n_images"), min(col("doc_id")).as("rep_doc"))
    },

    // Frame sampling + thumbnail pooling — the video half of the multimodal
    // contract. Each document synthesizes a deterministic "video" of
    // 4 + doc_id % 5 PNG frames; every SECOND frame is decoded through the
    // real codec (stride-2 sampling — the untouched frames' decode cost is
    // what sampling saves at 100 TB), then 2×2 sum-pooled to a 4×4
    // thumbnail (the resize step, integer-exact by summing instead of
    // averaging). Emitted per sampled frame: decoded dims, pixel sum, and a
    // position-weighted pool checksum — the oracle recomputes both
    // arithmetically, so a hash match certifies decode + sample + pool end
    // to end. One scan + mapPartitions, output rows ≈ 3× input: the
    // flatMap multiplies rows only by the sampled-frame count.
    "m05" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.flatMap { id =>
            val nFrames = 4 + (id % 5).toInt
            (0 until nFrames by 2).map { f =>
              val px = Array.tabulate(64)(k =>
                ((id * 31 + f * 13 + k.toLong * 7) % 256).toFloat)
              val png = ImageCodec.encodePng(px, 8, 8)
              val (dw, dh, dec) = ImageCodec.decode(png)
              var sum = 0L
              var checksum = 0L
              var i = 0
              while (i < 16) {
                val r = (i / 4) * 2
                val c = (i % 4) * 2
                val pooled = dec(r * 8 + c).toLong + dec(r * 8 + c + 1).toLong +
                  dec((r + 1) * 8 + c).toLong + dec((r + 1) * 8 + c + 1).toLong
                sum += pooled
                checksum += pooled * (i + 1)
                i += 1
              }
              (id, f, dw, dh, sum, checksum)
            }
          }
        }
        .toDF("doc_id", "frame_idx", "width", "height", "sum_px", "pool_checksum")
    },

    // Audio feature extraction — framing, per-frame energy, silence
    // detection — over a DETERMINISTIC FAKE PCM decode (the container has
    // no audio codec; the brief's stub contract: fake the decode, make
    // the Spark-side shape real). Each "clip" is 5–9 frames of 160
    // samples; sample g of doc d is ((d*7919 + g*31) % 256) - 128, with
    // every frame where (frame + d) % 7 == 0 silent (all-zero) so the
    // silence path is non-trivial. Unlike m03/m05 (real image codec →
    // mapPartitions), the fake decode is pure arithmetic, so the whole
    // operator stays in column HOFs: map-side, whole-stage codegen, no
    // UDF, no shuffle — swapping in a real codec later only replaces the
    // sample lambda. All-integer math → the oracle recomputes every
    // energy exactly.
    "m06" -> { (s, dir) =>
      val frameLen = 160
      // % (sign-of-dividend), NOT pmod: DuckDB's % is sign-of-dividend,
      // so the oracle and the engine diverge on negative doc_id under
      // pmod (pmod >= 0 always) — both in the fake-sample values AND in
      // the frame count 5 + doc_id % 5. All test doc_ids are >= 0, where
      // the two agree; % keeps the parity for any future signed ids. The
      // silent gate is mod-convention-independent (x % 7 == 0 iff
      // pmod(x, 7) == 0), and 5 + doc_id % 5 stays >= 1 for any sign.
      val frames = fakeFrameEnergies(frameLen)
      Tables.loadSpread(s, dir, "documents")
        .select(col("doc_id"), frames.as("fe"))
        .select(col("doc_id"),
          size(col("fe")).as("n_frames"),
          aggregate(col("fe"), lit(0L), (a, e) => a + e).as("total_energy"),
          size(filter(col("fe"), e => e === 0L)).as("n_silent"),
          array_max(col("fe")).as("peak_energy"))
    },

    // Scene-change detection over a synthetic video: per-frame luma
    // energy from a deterministic integer hash (the codec STUB — a real
    // decoder replaces only the energy lambda, exactly m06's contract),
    // a scene cut wherever the frame-to-frame energy delta exceeds the
    // threshold. Same scale posture as m05/m06: pure integer column
    // HOFs, map-side, zero shuffle, no UDF — the CPU-floor class that a
    // 1000-executor cluster parallelizes away. Sign-of-dividend % on
    // both sides (the m06 lesson); the nFrames=1 guard matters because
    // Spark's sequence(1, 0) yields a DESCENDING [1, 0], not the empty
    // list DuckDB's range(1, 1) gives.
    "m07" -> { (s, dir) =>
      val threshold = 400L
      val nFrames = (lit(8) + (col("doc_id") % 8L).cast("int")).cast("int")
      // the f*f term de-linearizes the fake signal: a linear ramp makes
      // every frame delta one of two constants (the mod-wraparound pair),
      // which would leave the threshold untested across its range
      def energy(f: org.apache.spark.sql.Column) = {
        val fl = f.cast("long")
        (col("doc_id") * 131L + fl * fl * 7919L + fl * 31L) % 1000L
      }
      val frameIdx = when(nFrames > 1, sequence(lit(1), nFrames - 1))
        .otherwise(array().cast("array<int>"))
      val deltas = transform(frameIdx, f => abs(energy(f) - energy(f - 1)))
      val changes = filter(frameIdx,
        f => abs(energy(f) - energy(f - 1)) > threshold)
      Tables.loadSpread(s, dir, "documents")
        .select(col("doc_id"), nFrames.as("n_frames"),
          deltas.as("deltas"), changes.as("changes"))
        .select(col("doc_id"), col("n_frames"),
          size(col("changes")).as("n_scene_changes"),
          // try_element_at, not element_at: ANSI mode (Spark 4 default)
          // makes element_at THROW on the empty no-changes array
          coalesce(try_element_at(col("changes"), lit(1)), lit(-1))
            .as("first_change"),
          aggregate(col("deltas"), lit(0L), (a, d) => a + d).as("total_delta"),
          coalesce(array_max(col("deltas")), lit(0L)).as("max_delta"))
    },

    // Acoustic-fingerprint dedup (the chromaprint FAMILY shape): the
    // fingerprint is the energy-delta SIGN pattern across consecutive
    // frames (bit f set iff energy[f+1] > energy[f]) — robust to gain
    // changes in a real decoder, here computed over m06's shared fake-PCM
    // energies so swapping in a real codec replaces ONE definition for
    // both queries. Census per (n_frames, fingerprint): the hash-agg
    // collapse is m04's audio sibling; everything is map-side integer
    // HOFs above the scan and the shuffle carries (int, long) keys only.
    "m09" -> { (s, dir) =>
      val fe = fakeFrameEnergies(160)
      // m07's descending-sequence guard: a 1-frame doc (reachable for
      // signed doc_ids, where 5 + id % 5 can be 1) makes
      // sequence(0, -1) the DESCENDING [0, -1] and element_at(fe, 1±1)
      // ANSI-throws — a 1-frame fingerprint is the empty delta pattern,
      // fp = 0, which the oracle's LEFT-join sum mirrors
      val fp = aggregate(
        transform(
          when(size(col("fe")) >= 2, sequence(lit(0), size(col("fe")) - 2))
            .otherwise(array().cast("array<int>")), f =>
          when(element_at(col("fe"), f + 2) > element_at(col("fe"), f + 1),
            // column shift amount: the sql function form (the Scala
            // shiftleft overload takes a literal Int only)
            call_function("shiftleft", lit(1L), f)).otherwise(lit(0L))),
        lit(0L), (a, b) => a + b)
      Tables.loadSpread(s, dir, "documents")
        .select(col("doc_id"), fe.as("fe"))
        .select(col("doc_id"), size(col("fe")).as("n_frames"), fp.as("fp"))
        .groupBy(col("n_frames"), col("fp"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("rep_doc"))
    },

    // Perceptual NEAR-dup: m04's exact-aHash collapse followed by d08's
    // banded-Hamming candidate pattern — but over the DISTINCT hashes,
    // which is the production shape: exact-dedup first shrinks the join
    // domain to unique fingerprints (bounded by hash variety, NOT corpus
    // rows — the codec map stays linear, the quadratic-ish band join runs
    // on the collapsed set), then 4×16-bit bands generate candidates and
    // bit_count(xor) verifies Hamming ≤ 6. The image differs from m04's
    // by one "hot" pixel (+37 at position doc_id % 64), so same-seed
    // variants land a few bits apart — real near-dups, not just re-finds
    // of exact matches. Hash packs as ONE long (bit k = pixel ≥ mean);
    // the oracle rebuilds it arithmetically with an explicit min-long
    // literal for bit 63 (DuckDB's 1<<63 overflow-checks where the JVM
    // wraps).
    "m08" -> { (s, dir) =>
      import s.implicits._
      val hashed = Tables.load(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val seed = id % 50
            val hot = (id % 64).toInt
            val px = Array.tabulate(64) { k =>
              ((seed * 31 + k.toLong * 7 +
                (if (k == hot) 37L else 0L)) % 256).toFloat
            }
            val png = ImageCodec.encodePng(px, 8, 8)
            val (_, _, dec) = ImageCodec.decode(png)
            var sum = 0.0
            var i = 0
            while (i < 64) { sum += dec(i); i += 1 }
            val mean = sum / 64.0
            var h = 0L
            i = 0
            while (i < 64) { if (dec(i) >= mean) h |= 1L << i; i += 1 }
            (id, h)
          }
        }
        .toDF("doc_id", "phash")
      val uniq = hashed.groupBy(col("phash"))
        .agg(count(lit(1)).as("n_images"), min(col("doc_id")).as("rep_doc"))
      val bands = array((0 until 4).map(b =>
        struct(lit(b).as("band_i"),
          shiftrightunsigned(col("phash"), b * 16)
            .bitwiseAND(lit(0xFFFFL)).as("band_v"))): _*)
      val banded = uniq
        .select(col("phash"), col("n_images"), col("rep_doc"),
          explode(bands).as("bd"))
        .select(col("phash"), col("n_images"), col("rep_doc"),
          col("bd.band_i").as("band_i"), col("bd.band_v").as("band_v"))
      banded.as("a").join(banded.as("b"),
          col("a.band_i") === col("b.band_i") &&
            col("a.band_v") === col("b.band_v") &&
            col("a.phash") < col("b.phash"))
        .select(col("a.phash").as("pa"), col("b.phash").as("pb"),
          col("a.rep_doc").as("rep_a"), col("b.rep_doc").as("rep_b"),
          col("a.n_images").as("n_a"), col("b.n_images").as("n_b"))
        .distinct()
        .withColumn("hamming", bit_count(col("pa").bitwiseXOR(col("pb"))))
        .filter(col("hamming") <= 6)
        .select(col("rep_a"), col("rep_b"), col("n_a"), col("n_b"),
          col("hamming"))
    })

  val oracle: Map[String, String] = Map(
    "m01" ->
      """SELECT doc_id,
        | md5(text) AS content_md5,
        | octet_length(encode(text))::INT AS n_bytes,
        | substring(hex(encode(text)), 1, 24) AS head_hex
        |FROM documents""".stripMargin,

    "m02" ->
      """WITH b AS (
        |  SELECT doc_id, octet_length(encode(text))::INT AS n_bytes
        |  FROM documents)
        |SELECT length(bin(n_bytes))::INT AS size_class,
        | count(1)::BIGINT AS n_blobs,
        | sum(n_bytes)::BIGINT AS total_bytes,
        | min(n_bytes) AS min_bytes,
        | max(n_bytes) AS max_bytes
        |FROM b GROUP BY 1""".stripMargin,

    "m03" ->
      """WITH px AS (
        |  SELECT doc_id,
        |    (8 + doc_id % 5)::INT AS width,
        |    (8 + doc_id % 7)::INT AS height,
        |    unnest(range(0, (8 + doc_id % 5) * (8 + doc_id % 7))) AS k
        |  FROM documents)
        |SELECT doc_id, width, height,
        |  sum((doc_id * 31 + k * 7) % 256)::BIGINT AS sum_px
        |FROM px GROUP BY 1, 2, 3""".stripMargin,

    "m04" ->
      """WITH px AS (
        |  SELECT doc_id, doc_id % 50 AS seed, unnest(range(0, 64)) AS k
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, k, ((seed * 31 + k * 7) % 256) AS v FROM px),
        |m AS (
        |  SELECT doc_id, sum(v)::DOUBLE / 64 AS mean FROM p GROUP BY doc_id),
        |h AS (
        |  SELECT p.doc_id,
        |    string_agg(CASE WHEN v >= mean THEN '1' ELSE '0' END, ''
        |               ORDER BY k) AS phash
        |  FROM p JOIN m ON p.doc_id = m.doc_id GROUP BY p.doc_id)
        |SELECT phash, count(*)::BIGINT AS n_images,
        |       min(doc_id)::BIGINT AS rep_doc
        |FROM h GROUP BY phash""".stripMargin,

    // pool weight w(k) = block index of pixel k (row-major 4×4 blocks of
    // the 2×2 pooling) + 1 — so sum(v·w) equals the Spark side's
    // Σ pooled(i)·(i+1) without materializing the pooled array.
    "m05" ->
      """WITH fr AS (
        |  SELECT doc_id, unnest(range(0, 4 + doc_id % 5, 2)) AS frame_idx
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, frame_idx, unnest(range(0, 64)) AS k FROM fr),
        |v AS (
        |  SELECT doc_id, frame_idx, k,
        |    (doc_id * 31 + frame_idx * 13 + k * 7) % 256 AS v,
        |    ((k // 16) * 4 + (k % 8) // 2 + 1) AS w
        |  FROM px)
        |SELECT doc_id, frame_idx::INT AS frame_idx,
        |  8::INT AS width, 8::INT AS height,
        |  sum(v)::BIGINT AS sum_px,
        |  sum(v * w)::BIGINT AS pool_checksum
        |FROM v GROUP BY 1, 2""".stripMargin,

    "m06" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    list_transform(range(5 + doc_id % 5), f ->
        |      CASE WHEN (f + doc_id) % 7 = 0 THEN 0
        |           ELSE list_sum(list_transform(range(160), i ->
        |             ((doc_id * 7919 + (f * 160 + i) * 31) % 256 - 128)
        |             * ((doc_id * 7919 + (f * 160 + i) * 31) % 256 - 128)))
        |      END) AS fe
        |  FROM documents)
        |SELECT doc_id,
        |  len(fe)::INT AS n_frames,
        |  list_sum(fe)::BIGINT AS total_energy,
        |  len(list_filter(fe, e -> e = 0))::INT AS n_silent,
        |  list_max(fe)::BIGINT AS peak_energy
        |FROM f""".stripMargin,

    // DuckDB range(1, n) is EXCLUSIVE-end (empty when n <= 1), matching
    // the Spark side's guarded sequence; range elements are BIGINT, so
    // first_change casts ::INT to Spark's int frame indices
    "m07" ->
      """WITH d AS (
        |  SELECT doc_id, (8 + doc_id % 8)::INT AS n_frames,
        |    list_transform(range(1, 8 + doc_id % 8), f ->
        |      abs((doc_id * 131 + f * f * 7919 + f * 31) % 1000
        |          - (doc_id * 131 + (f-1) * (f-1) * 7919 + (f-1) * 31)
        |            % 1000)) AS deltas,
        |    list_filter(range(1, 8 + doc_id % 8), f ->
        |      abs((doc_id * 131 + f * f * 7919 + f * 31) % 1000
        |          - (doc_id * 131 + (f-1) * (f-1) * 7919 + (f-1) * 31)
        |            % 1000) > 400) AS changes
        |  FROM documents)
        |SELECT doc_id, n_frames,
        |  len(changes)::INT AS n_scene_changes,
        |  coalesce(changes[1], -1)::INT AS first_change,
        |  coalesce(list_sum(deltas), 0)::BIGINT AS total_delta,
        |  coalesce(list_max(deltas), 0)::BIGINT AS max_delta
        |FROM d""".stripMargin,

    "m09" ->
      """WITH fr AS (
        |  SELECT doc_id, (5 + doc_id % 5)::INT AS n_frames,
        |    unnest(range(0, 5 + doc_id % 5)) AS f
        |  FROM documents),
        |e AS (
        |  SELECT doc_id, n_frames, f,
        |    CASE WHEN (f + doc_id) % 7 = 0 THEN 0 ELSE (
        |      SELECT sum(((doc_id*7919 + (f*160 + i)*31) % 256 - 128)
        |               * ((doc_id*7919 + (f*160 + i)*31) % 256 - 128))
        |      FROM range(0, 160) t(i)) END AS energy
        |  FROM fr),
        |d AS (
        |  SELECT a.doc_id, a.n_frames,
        |    sum(CASE WHEN b.energy > a.energy
        |             THEN (1::BIGINT << a.f::INT) ELSE 0 END)::BIGINT AS fp
        |  FROM e a LEFT JOIN e b ON b.doc_id = a.doc_id AND b.f = a.f + 1
        |  GROUP BY 1, 2)
        |SELECT n_frames, fp, count(*)::BIGINT AS n_docs,
        |  min(doc_id)::BIGINT AS rep_doc
        |FROM d GROUP BY 1, 2""".stripMargin,

    "m08" ->
      """WITH px AS (
        |  SELECT doc_id, doc_id % 50 AS seed, doc_id % 64 AS hot,
        |    unnest(range(0, 64)) AS k
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, k,
        |    ((seed * 31 + k * 7 + CASE WHEN k = hot THEN 37 ELSE 0 END) % 256)
        |      AS v
        |  FROM px),
        |m AS (SELECT doc_id, sum(v)::DOUBLE / 64 AS mean FROM p GROUP BY doc_id),
        |h AS (
        |  SELECT p.doc_id,
        |    sum(CASE WHEN v < mean THEN 0
        |             WHEN k = 63 THEN (-9223372036854775807::BIGINT) - 1
        |             ELSE (1::BIGINT << k::INT) END)::BIGINT AS phash
        |  FROM p JOIN m ON p.doc_id = m.doc_id GROUP BY p.doc_id),
        |u AS (
        |  SELECT phash, count(*)::BIGINT AS n_images,
        |    min(doc_id)::BIGINT AS rep_doc
        |  FROM h GROUP BY phash),
        |b AS (SELECT phash, n_images, rep_doc, unnest(range(0, 4)) AS band_i
        |      FROM u),
        |bb AS (
        |  SELECT phash, n_images, rep_doc, band_i,
        |    (phash >> (band_i * 16)::INT) & 65535 AS band_v
        |  FROM b),
        |pr AS (
        |  SELECT DISTINCT a.phash AS pa, b.phash AS pb,
        |    a.rep_doc AS rep_a, b.rep_doc AS rep_b,
        |    a.n_images AS n_a, b.n_images AS n_b
        |  FROM bb a JOIN bb b
        |    ON a.band_i = b.band_i AND a.band_v = b.band_v
        |      AND a.phash < b.phash)
        |SELECT rep_a, rep_b, n_a, n_b, bit_count(xor(pa, pb))::INT AS hamming
        |FROM pr WHERE bit_count(xor(pa, pb)) <= 6""".stripMargin)
}
