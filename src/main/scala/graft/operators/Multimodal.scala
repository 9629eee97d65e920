package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing — SURVEY.md §2 block G.
  *
  * Pattern: media payloads travel as opaque `binary` columns with a
  * typed metadata struct alongside; decode / feature-extraction runs
  * batched per partition so a real codec (image/audio library) can
  * amortize model/codec init per partition, not per row.
  *
  * The decoder is REAL for the `image` modality: [[MediaDecoder]]
  * parses PPM P6 (the simplest self-describing raster container —
  * `P6 <w> <h> <maxval>` header with `#` comments, then w·h packed
  * RGB triples, public Netpbm format) and mean-pools the pixels into
  * per-channel and 2×2-grid-luma features — header parse, pixel walk
  * and pooling arithmetic all from scratch. Other modalities (the
  * text stand-in corpus) get the deterministic byte-statistics
  * extractor with the same output shape. A production deployment
  * swaps in heavier codecs (JPEG/FLAC via JNI) behind the same
  * per-partition batch seam; the Spark-side plumbing (schema, binary
  * payloads, partition batching, feature output) is identical.
  */
object Multimodal {

  /** A decoded media record: id + fixed-width feature vector. */
  final case class MediaFeatures(
      doc_id: Long, modality: String, n_bytes: Long,
      features: Array[Double])

  /** Batched media decoder. Runs inside `mapPartitions` so a real
    * codec can amortize init per partition, not per row.
    */
  object MediaDecoder {
    val FeatureDim = 8

    /** A decoded PPM P6 raster: dimensions plus packed RGB bytes
      * (row-major, 3 bytes per pixel, maxval ≤ 255).
      */
    final case class PpmImage(width: Int, height: Int, maxval: Int,
                              pixels: Array[Byte])

    /** Parse a PPM P6 / PGM P5 payload (public Netpbm spec): magic,
      * then three whitespace-separated decimal fields (width, height,
      * maxval) with `#`-to-end-of-line comments allowed anywhere in
      * the header, then EXACTLY ONE whitespace byte, then w·h packed
      * RGB triples (P6) or single gray bytes (P5 — expanded to
      * r=g=b on decode, so downstream pooling is channel-uniform and
      * luma equals the gray value exactly). Returns None for
      * anything malformed — wrong magic, maxval outside [1,255]
      * (2-byte samples are out of scope), or a truncated pixel
      * section — never a misread image.
      */
    def decodePpm(payload: Array[Byte]): Option[PpmImage] = {
      var pos = 0
      def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'
      // one header token, skipping whitespace and # comments
      def token(): Option[String] = {
        while (pos < payload.length &&
               (isWs(payload(pos)) || payload(pos) == '#')) {
          if (payload(pos) == '#')
            while (pos < payload.length && payload(pos) != '\n') pos += 1
          else pos += 1
        }
        val start = pos
        while (pos < payload.length && !isWs(payload(pos)) &&
               payload(pos) != '#') pos += 1
        if (pos > start) Some(new String(payload, start, pos - start,
          java.nio.charset.StandardCharsets.US_ASCII)) else None
      }
      def int(s: String): Option[Int] =
        if (s.nonEmpty && s.forall(c => c >= '0' && c <= '9') &&
            s.length <= 9) Some(s.toInt) else None
      for {
        magic <- token() if magic == "P6" || magic == "P5"
        w <- token().flatMap(int) if w > 0
        h <- token().flatMap(int) if h > 0
        mv <- token().flatMap(int) if mv >= 1 && mv <= 255
        // the spec demands a single whitespace byte after maxval
        _ <- if (pos < payload.length && isWs(payload(pos))) Some(())
             else None
        perPx = if (magic == "P6") 3 else 1
        nbytes = w.toLong * h * perPx
        _ <- if (payload.length - (pos + 1) >= nbytes && w.toLong * h * 3 <= Int.MaxValue)
               Some(()) else None
      } yield {
        val stored = java.util.Arrays.copyOfRange(
          payload, pos + 1, pos + 1 + nbytes.toInt)
        val pixels =
          if (perPx == 3) stored
          else { // P5: gray v -> (v, v, v)
            val out = new Array[Byte](stored.length * 3)
            var k = 0
            while (k < stored.length) {
              out(3 * k) = stored(k); out(3 * k + 1) = stored(k)
              out(3 * k + 2) = stored(k)
              k += 1
            }
            out
          }
        PpmImage(w, h, mv, pixels)
      }
    }

    /** Mean-pool a decoded raster: global per-channel means plus the
      * top-left and bottom-right corner-cell luma means of a 2×2
      * spatial grid (the tiny-embedding shape a real resize-then-pool
      * pipeline emits; two opposite corners carry the gradient signal
      * and only those two are accumulated — the other two cells were
      * dead per-pixel work, round-7 advice). Sums are exact longs;
      * luma is the integer Rec.601-ish (r+2g+b)/4 so every feature is
      * a ratio of integers both engines reproduce.
      */
    def poolFeatures(img: PpmImage): Array[Double] = {
      val n = img.width.toLong * img.height
      val chan = new Array[Long](3)
      var lumaTL = 0L; var nTL = 0L
      var lumaBR = 0L; var nBR = 0L
      var i = 0
      var p = 0
      while (p < n) {
        val r = img.pixels(i) & 0xFF
        val g = img.pixels(i + 1) & 0xFF
        val b = img.pixels(i + 2) & 0xFF
        chan(0) += r; chan(1) += g; chan(2) += b
        val x = (p % img.width).toInt; val y = (p / img.width).toInt
        val top = 2 * y < img.height
        val left = 2 * x < img.width
        if (top && left) { lumaTL += (r + 2 * g + b) / 4; nTL += 1 }
        else if (!top && !left) { lumaBR += (r + 2 * g + b) / 4; nBR += 1 }
        i += 3; p += 1
      }
      Array[Double](
        img.width.toDouble, img.height.toDouble,
        chan(0).toDouble / n, chan(1).toDouble / n, chan(2).toDouble / n,
        if (nTL > 0) lumaTL.toDouble / nTL else 0.0,
        if (nBR > 0) lumaBR.toDouble / nBR else 0.0,
        img.maxval.toDouble)
    }

    /** 64-bit difference hash (dHash) of a decoded raster — the
      * standard perceptual image fingerprint (average-pool the luma
      * onto a 9×8 grid, one bit per horizontally-adjacent cell pair:
      * right cell brighter than left). All integer math: cell sums
      * are exact longs and the mean comparison is done by
      * cross-multiplication (sumR·cntL > sumL·cntR), so the hash is
      * deterministic on any partitioning AND exactly invariant under
      * a uniform brightness shift — adding c to every channel adds c
      * to the integer luma (r+2g+b+4c)/4 = luma + c, which cancels in
      * the cross-multiplied compare (spec-pinned). Cells that receive
      * no pixels (width < 9) compare 0 vs 0 → bit 0.
      */
    def dHash(img: PpmImage): Long = {
      val gw = 9; val gh = 8
      val sums = Array.ofDim[Long](gh, gw)
      val cnts = Array.ofDim[Long](gh, gw)
      val n = img.width.toLong * img.height
      var p = 0L; var i = 0
      while (p < n) {
        val r = img.pixels(i) & 0xFF
        val g = img.pixels(i + 1) & 0xFF
        val b = img.pixels(i + 2) & 0xFF
        val x = (p % img.width).toInt; val y = (p / img.width).toInt
        val gx = (x.toLong * gw / img.width).toInt
        val gy = (y.toLong * gh / img.height).toInt
        sums(gy)(gx) += (r + 2 * g + b) / 4
        cnts(gy)(gx) += 1
        i += 3; p += 1
      }
      var h = 0L; var bit = 0
      var gy = 0
      while (gy < gh) {
        var gx = 0
        while (gx < gw - 1) {
          if (sums(gy)(gx + 1) * cnts(gy)(gx) >
              sums(gy)(gx) * cnts(gy)(gx + 1)) h |= 1L << bit
          bit += 1; gx += 1
        }
        gy += 1
      }
      h
    }

    /** 63-bit DCT perceptual hash (pHash) of a decoded raster — the
      * frequency-domain fingerprint that survives RESCALING, which
      * [[dHash]]'s fixed 9×8 gradient grid does not: pool the luma
      * onto a 32×32 grid, 2-D DCT-II, keep the 8×8 low-frequency
      * block minus DC, one bit per coefficient (above the median).
      * All arithmetic is integer, so the hash is deterministic on
      * any partitioning and engine:
      *
      *  - grid cells are fixed-point luma means `(sum·256) div cnt`
      *    over the pixel range `[gx·w/32, max(+1, (gx+1)·w/32))` —
      *    box pooling when w ≥ 32, nearest-neighbor replication when
      *    w < 32. Because `floor((s + c·n)/n) = floor(s/n) + c`, a
      *    uniform brightness shift +c moves every cell by exactly
      *    256·c.
      *  - cells are centered as `g = q·1024 − Σq`, which cancels that
      *    uniform 256·c EXACTLY (the DC-rejection step done in
      *    integers, where a float DCT's "AC coefficients unchanged"
      *    only holds to rounding) — so brightness-shift invariance
      *    is bit-exact, same as dHash's cross-multiplied compare.
      *  - the DCT uses a cosine table quantized to 2^14 with Long
      *    accumulation (|g| ≤ 6.7e7, first pass ≤ 3.5e13, rescaled
      *    by /2^14 before the second pass keeps |F| ≤ 1.1e15 — no
      *    overflow, no floats).
      *
      * Rescale robustness is EXACT where it can be: for w ≤ 16 the
      * NN-replication pooling makes the 32×32 grid of the image
      * identical to the grid of its integer-factor nearest-neighbor
      * upscale (both sides stay in the replication regime — cell gx
      * of the 2× upscale reads pixel gx → orig(gx/2); cell gx of the
      * original reads pixel floor(gx/2) — the same byte), so
      * pHash(img) == pHash(upscale_NN(img)) bit-for-bit. (For
      * 16 < w < 32 the 2× upscale crosses into box pooling whose
      * cell boundaries need not align to pixel-pair boundaries, so
      * only near-collision is expected there, not exactness.) dHash's
      * 9-column boundaries land on different pixels and drift
      * (spec-measured). Bit i = (v·8+u)−1 over u,v ∈ [0,8)², (0,0)
      * excluded: 63 bits, bit 63 always 0 — the hamming-band pairing
      * kernel is width-agnostic.
      */
    def pHash(img: PpmImage): Long =
      pHashWindow(img, 0, 0, img.width, img.height)

    /** [[pHash]] of a pixel WINDOW `[wx, wx+ww) × [wy, wy+wh)` — the
      * tiled-hash primitive (r19, crop tolerance): the pooling grid is
      * laid over the window with the same integer arithmetic pHash
      * lays it over a whole image, so the hash of a window is
      * BIT-IDENTICAL to the whole-image pHash of the standalone crop
      * of those pixels (cell gx of both reads byte-for-byte the same
      * pixels; everything downstream of the grid is shared). That
      * exactness is what lets a tile family detect a border crop: if
      * an upload is a crop whose window matches one of the original's
      * tiles, tile hash vs whole hash collide at hamming 0 —
      * misaligned-by-a-pixel crops degrade to near-collision, which
      * the hamming band pairing still catches.
      */
    def pHashWindow(img: PpmImage, wx: Int, wy: Int,
                    ww: Int, wh: Int): Long = {
      val G = 32
      val q = new Array[Long](G * G)
      var totalQ = 0L
      var gy = 0
      while (gy < G) {
        val y0 = wy + gy * wh / G
        val y1 = math.max(y0 + 1, wy + (gy + 1) * wh / G)
        var gx = 0
        while (gx < G) {
          val x0 = wx + gx * ww / G
          val x1 = math.max(x0 + 1, wx + (gx + 1) * ww / G)
          var s = 0L; var c = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            val row = y.toLong * img.width
            while (x < x1) {
              val i = ((row + x) * 3).toInt
              val r = img.pixels(i) & 0xFF
              val g = img.pixels(i + 1) & 0xFF
              val b = img.pixels(i + 2) & 0xFF
              s += (r + 2 * g + b) / 4
              c += 1
              x += 1
            }
            y += 1
          }
          val v = s * 256 / c
          q(gy * G + gx) = v
          totalQ += v
          gx += 1
        }
        gy += 1
      }
      // centered grid: +c brightness moved every q by exactly 256c,
      // so g is bit-identical under the shift
      val g = new Array[Long](G * G)
      var i = 0
      while (i < G * G) { g(i) = q(i) * (G * G) - totalQ; i += 1 }
      // quantized DCT basis: C(u,x) = round(cos(pi(2x+1)u/2G) * 2^14)
      val cos = Array.tabulate(8, G)((u, x) =>
        math.round(math.cos(math.Pi * (2 * x + 1) * u / (2.0 * G)) * 16384))
      // pass 1 over rows (only the first 8 u's are ever read),
      // rescaled by 2^14 to keep pass 2 inside Long
      val t = Array.ofDim[Long](8, G)
      var u = 0
      while (u < 8) {
        var y = 0
        while (y < G) {
          var acc = 0L
          var x = 0
          while (x < G) { acc += g(y * G + x) * cos(u)(x); x += 1 }
          t(u)(y) = acc / 16384
          y += 1
        }
        u += 1
      }
      val f = new Array[Long](64)
      u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var acc = 0L
          var y = 0
          while (y < G) { acc += t(u)(y) * cos(v)(y); y += 1 }
          f(v * 8 + u) = acc
          v += 1
        }
        u += 1
      }
      val ac = f.drop(1)
      val med = ac.sorted.apply(31) // exact median of 63 Longs
      var h = 0L
      i = 0
      while (i < 63) { if (ac(i) > med) h |= 1L << i; i += 1 }
      h
    }

    /** Re-encode a decoded raster as its 2× nearest-neighbor upscale
      * (pixel (x,y) = source (x/2, y/2)) — the rendition a thumbnail
      * pipeline writes next to the original. A real encode seam: the
      * output is a full P6 payload that goes back through
      * [[decodePpm]] downstream, so rendition dedup exercises
      * decode → transform → encode → re-decode end to end.
      */
    def encodePpmUpscale2x(img: PpmImage): Array[Byte] = {
      val w2 = img.width * 2; val h2 = img.height * 2
      val header = s"P6\n$w2 $h2\n${img.maxval}\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val out = new Array[Byte](header.length + w2 * h2 * 3)
      System.arraycopy(header, 0, out, 0, header.length)
      var p = 0
      while (p < w2 * h2) {
        val sx = (p % w2) / 2; val sy = (p / w2) / 2
        val si = (sy * img.width + sx) * 3
        val di = header.length + p * 3
        out(di) = img.pixels(si)
        out(di + 1) = img.pixels(si + 1)
        out(di + 2) = img.pixels(si + 2)
        p += 1
      }
      out
    }

    /** The crop-tolerant tile family of an image (r19, VERDICT #6 —
      * q133's documented gap: a rescale preserves the whole-frame
      * pHash grid, a CROP shifts it wholesale, so every bit can flip):
      * the whole-frame pHash (variant 0) plus nine 75%-window pHashes
      * at the 3×3 offsets of the `w/8` grid (variant 1 + oy·3 + ox).
      * A border crop of up to 25% that lands on the eighth-grid —
      * what a thumbnailer or aspect-ratio normalizer produces —
      * matches one tile BIT-FOR-BIT ([[pHashWindow]]'s exactness);
      * off-grid crops land within band-pairing distance of the
      * nearest tile. Ten 8-byte hashes per image: the per-image cost
      * is 10× of q133's, still decode-dominated, and the pairing
      * stays banded (never all-pairs). Images narrower than the
      * eighth grid (w or h < 8) carry only the whole-frame hash.
      */
    def pHashTiles(img: PpmImage): Seq[(Int, Long)] = {
      val whole = (0, pHash(img))
      val (u, v) = (img.width / 8, img.height / 8)
      if (u < 1 || v < 1) Seq(whole)
      else whole +: (for (oy <- 0 until 3; ox <- 0 until 3) yield
        (1 + oy * 3 + ox,
          pHashWindow(img, ox * u, oy * v, 6 * u, 6 * v)))
    }

    /** Re-encode a decoded raster's top-left 75% window (the
      * [[pHashTiles]] variant-1 tile: offset `(0, 0)`, size
      * `(6·w/8, 6·h/8)` — a bottom/right border trim, what an aspect
      * normalizer or letterbox remover produces) as a standalone P6
      * payload — the cropped upload a crop-tolerant dedup must trace
      * back to its original. Same real encode seam as
      * [[encodePpmUpscale2x]]: full bytes, re-decoded downstream.
      */
    def encodePpmCropBorder(img: PpmImage): Array[Byte] = {
      val (u, v) = (img.width / 8, img.height / 8)
      val (x0, y0, w2, h2) = (0, 0, 6 * u, 6 * v)
      val header = s"P6\n$w2 $h2\n${img.maxval}\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val out = new Array[Byte](header.length + w2 * h2 * 3)
      System.arraycopy(header, 0, out, 0, header.length)
      var p = 0
      while (p < w2 * h2) {
        val sx = x0 + p % w2; val sy = y0 + p / w2
        val si = (sy * img.width + sx) * 3
        val di = header.length + p * 3
        out(di) = img.pixels(si)
        out(di + 1) = img.pixels(si + 1)
        out(di + 2) = img.pixels(si + 2)
        p += 1
      }
      out
    }

    /** Deterministic byte statistics for non-image modalities — the
      * same output shape as the image path, over the raw bytes.
      */
    def byteStats(id: Long, payload: Array[Byte]): Array[Double] = {
      val n = payload.length
      val hist = new Array[Long](256)
      payload.foreach(b => hist(b & 0xFF) += 1)
      val nz = hist.count(_ > 0).toDouble
      val mean = if (n > 0) payload.map(b => (b & 0xFF).toLong).sum.toDouble / n else 0.0
      Array[Double](
        n.toDouble, nz, mean,
        hist.max.toDouble,
        if (n > 0) hist(32).toDouble / n else 0.0,      // space density
        if (n > 0) hist('e'.toInt).toDouble / n else 0.0,
        if (nz > 0) n / nz else 0.0,
        (id % 97).toDouble)                              // deterministic salt
    }

    def decodeBatch(rows: Iterator[(Long, String, Array[Byte])]): Iterator[MediaFeatures] = {
      // per-partition "codec init" would happen here, once
      rows.map { case (id, modality, payload) =>
        val features =
          if (modality == "image")
            decodePpm(payload).map(poolFeatures)
              .getOrElse(Array.fill(FeatureDim)(-1.0)) // undecodable marker
          else byteStats(id, payload)
        MediaFeatures(id, modality, payload.length.toLong, features)
      }
    }
  }

  /** Wrap documents as a multimodal table: payload as `binary` +
    * metadata struct — the schema a mixed image/audio/text corpus
    * would use (payload column stays opaque; scans prune it unless
    * the query touches it).
    *
    * Every 5th document becomes an IMAGE shard member: its payload is
    * a synthesized 16×16 PPM P6 raster (header + 768 pixel bytes
    * drawn from the text, dot-padded/truncated to exact length) so
    * the real decode+pool path — header parse, pixel walk, corner
    * pooling — carries a measured per-row cost in the bench and the
    * scale sweeps at EVERY scale factor, instead of only running on
    * spec-planted files (round-7 verdict item 6). The rendering is a
    * pure Column expression: deterministic, engine-reproducible, and
    * linear in the corpus.
    */
  def asMultimodal(documents: DataFrame): DataFrame = {
    val isImg = $"doc_id" % 5 === 0
    // 16×16 RGB = 768 payload bytes; rpad both pads short texts and
    // truncates long ones to the exact pixel-section length (ASCII
    // corpus ⇒ chars == bytes; decodePpm tolerates trailing bytes
    // anyway)
    val ppmPayload = concat(
      encode(lit("P6\n16 16\n255\n"), "UTF-8"),
      encode(rpad($"text", 768, "."), "UTF-8"))
    documents.select(
      $"doc_id",
      when(isImg, "image").otherwise("text").as("modality"),
      when(isImg, ppmPayload).otherwise(encode($"text", "UTF-8"))
        .as("payload"),
      struct($"source", $"n_chars", $"lang").as("meta"))
  }

  /** Sidecar-asset id base for thumbnail renditions: rendition ids
    * are `doc_id + ThumbIdBase`, far above any corpus doc id — the
    * derived-asset id scheme an image store uses for original +
    * rendition files.
    */
  val ThumbIdBase = 1000000000L

  /** Every `ThumbEvery`-th doc (≡ every 7th IMAGE doc — image ids are
    * multiples of 5) carries a thumbnail rendition in
    * [[asMultimodalWithThumbs]].
    */
  val ThumbEvery = 35L

  /** The multimodal corpus WITH its thumbnail sidecar feed: every 7th
    * image doc also carries its 2× nearest-neighbor rendition as a
    * separate asset row (id = doc_id + [[ThumbIdBase]]) — the
    * original + rendition layout a real image pipeline persists, and
    * the twin structure rendition dedup (q133) exists to find. The
    * rendition is produced through the REAL seam — decode the
    * original payload, [[MediaDecoder.encodePpmUpscale2x]], emit full
    * P6 bytes that downstream consumers re-decode — one extra
    * `mapPartitions` over 1/7 of the image shard, linear and
    * partitioning-free.
    */
  def asMultimodalWithThumbs(documents: DataFrame): DataFrame = {
    val base = asMultimodal(documents)
    val spark = base.sparkSession
    import spark.implicits.{newProductEncoder, newStringEncoder}
    val thumbs = base
      .filter($"modality" === "image" && $"doc_id" % ThumbEvery === 0)
      .select($"doc_id", $"payload",
        $"meta.source", $"meta.n_chars", $"meta.lang")
      .as[(Long, Array[Byte], String, Long, String)]
      .mapPartitions(_.flatMap { case (id, payload, src, nc, lang) =>
        MediaDecoder.decodePpm(payload).map { img =>
          (id + ThumbIdBase, "image",
            MediaDecoder.encodePpmUpscale2x(img), src, nc, lang)
        }
      })
      .toDF("doc_id", "modality", "payload", "source", "n_chars", "lang")
      .select($"doc_id", $"modality", $"payload",
        struct($"source", $"n_chars", $"lang").as("meta"))
    base.unionByName(thumbs)
  }

  /** Batched per-partition decode → feature table. `mapPartitions`
    * keeps the codec's per-partition init cost amortized; upstream
    * repartition controls batch size on a real cluster.
    */
  def decodeFeatures(multimodal: DataFrame): Dataset[MediaFeatures] = {
    val spark = multimodal.sparkSession
    import spark.implicits.{newProductEncoder, newProductArrayEncoder}
    multimodal
      .select("doc_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions(MediaDecoder.decodeBatch)
  }

  /** End-to-end: wrap → decode → first three feature components.
    * Feature slots are per-modality (the fixed-width vector is the
    * contract): for `text`, length / distinct bytes / mean byte; for
    * the planted `image` shard, parsed width / height / red-channel
    * mean out of the REAL PPM decode.
    */
  def featurePipeline(documents: DataFrame): DataFrame =
    decodeFeatures(asMultimodal(documents))
      .select($"doc_id", $"modality", $"n_bytes",
        element_at($"features", 1).as("f_len"),
        element_at($"features", 2).as("f_distinct_bytes"),
        element_at($"features", 3).as("f_mean_byte"))
      .orderBy($"doc_id")

  /** Per-image 64-bit dHash table: decode every `image`-modality
    * payload and emit its perceptual fingerprint. Undecodable
    * payloads are DROPPED (flatMap on the decode Option) — a
    * near-dup pair over garbage bytes is meaningless, unlike
    * [[decodeFeatures]] whose -1 marker keeps them visible for
    * data-quality accounting. One `mapPartitions` pass, 1 long out
    * per image — the hash table is the tiny artifact the pairing
    * self-join runs on.
    */
  def imageDHashes(multimodal: DataFrame): DataFrame = {
    val spark = multimodal.sparkSession
    import spark.implicits.newProductEncoder
    multimodal
      .filter($"modality" === "image")
      .select("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        MediaDecoder.decodePpm(payload)
          .map(img => (id, MediaDecoder.dHash(img)))
      })
      .toDF("doc_id", "dhash")
  }

  /** Sidecar-asset id base for cropped renditions (the q137 feed):
    * crop ids are `doc_id + CropIdBase`, disjoint from both corpus
    * ids and the thumbnail range.
    */
  val CropIdBase = 2000000000L

  /** Every `CropEvery`-th doc (≡ every 5th IMAGE doc) carries a
    * central-75% crop rendition in [[asMultimodalWithCrops]].
    */
  val CropEvery = 25L

  /** The multimodal corpus WITH a cropped-upload sidecar feed: every
    * 5th image doc also appears as its 75% border-trim crop under
    * `doc_id + CropIdBase` — the aspect-ratio-normalized or
    * letterbox-stripped re-upload crop-tolerant dedup (q137) exists
    * to trace back. Same real seam as the thumbnail feed: decode,
    * [[MediaDecoder.encodePpmCropBorder]], full P6 bytes re-decoded
    * downstream.
    */
  def asMultimodalWithCrops(documents: DataFrame): DataFrame = {
    val base = asMultimodal(documents)
    val spark = base.sparkSession
    import spark.implicits.{newProductEncoder, newStringEncoder}
    val crops = base
      .filter($"modality" === "image" && $"doc_id" % CropEvery === 0)
      .select($"doc_id", $"payload",
        $"meta.source", $"meta.n_chars", $"meta.lang")
      .as[(Long, Array[Byte], String, Long, String)]
      .mapPartitions(_.flatMap { case (id, payload, src, nc, lang) =>
        MediaDecoder.decodePpm(payload).map { img =>
          (id + CropIdBase, "image",
            MediaDecoder.encodePpmCropBorder(img), src, nc, lang)
        }
      })
      .toDF("doc_id", "modality", "payload", "source", "n_chars", "lang")
      .select($"doc_id", $"modality", $"payload",
        struct($"source", $"n_chars", $"lang").as("meta"))
    base.unionByName(crops)
  }

  /** Per-image tiled pHash table — [[imagePHashes]] widened to the
    * [[MediaDecoder.pHashTiles]] family: (doc_id, variant, phash),
    * ten rows per image off the SAME single decode pass. variant 0 is
    * exactly [[imagePHashes]]'s whole-frame hash, so a whole-vs-whole
    * collision in the tiled pairing carries q133's rendition signal
    * unchanged; variants 1-9 add the crop-window signal.
    */
  def imagePHashTiled(multimodal: DataFrame): DataFrame = {
    val spark = multimodal.sparkSession
    import spark.implicits.newProductEncoder
    multimodal
      .filter($"modality" === "image")
      .select("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        MediaDecoder.decodePpm(payload).toSeq.flatMap(img =>
          // blank-window guard: a perfectly uniform window (border,
          // letterbox, the synthetic shard's dot padding) hashes to
          // exactly 0 — every flat region corpus-wide would collide
          // there, which is structure-free noise the same way the
          // MaxImageBandDf hot buckets are; dropped at the source
          MediaDecoder.pHashTiles(img).collect {
            case (variant, h) if h != 0L => (id, variant, h)
          })
      })
      .toDF("doc_id", "variant", "phash")
  }

  /** Per-image 63-bit DCT pHash table — [[imageDHashes]] with
    * [[MediaDecoder.pHash]] as the fingerprint (same decode pass,
    * same drop-undecodable contract, same 8-bytes-per-image output
    * economics; only the hash function differs).
    */
  def imagePHashes(multimodal: DataFrame): DataFrame = {
    val spark = multimodal.sparkSession
    import spark.implicits.newProductEncoder
    multimodal
      .filter($"modality" === "image")
      .select("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        MediaDecoder.decodePpm(payload)
          .map(img => (id, MediaDecoder.pHash(img)))
      })
      .toDF("doc_id", "phash")
  }

  /** Frame sampling: split each payload into fixed-width frames and
    * keep every `stride`-th one — the video keyframe-sampling access
    * pattern (decode only the frames you keep). The frame generator is
    * a per-row explode over an index sequence, so payloads never
    * concatenate or shuffle whole; each sampled frame is fingerprinted.
    * Payloads here are the UTF-8 text stand-in (ASCII ⇒ char == byte),
    * so frame extraction is an exact substring either engine computes.
    */
  def frameSample(documents: DataFrame, frameChars: Int = 64,
                  stride: Int = 4): DataFrame =
    documents
      .filter(length($"text") > 0)
      .withColumn("n_frames",
        expr(s"CAST(((length(text) - 1) div $frameChars) + 1 AS INT)"))
      .select($"doc_id", $"text",
        explode(sequence(lit(0), $"n_frames" - 1, lit(stride))).as("frame_idx"))
      .withColumn("frame",
        expr(s"substring(text, frame_idx * $frameChars + 1, $frameChars)"))
      .select($"doc_id", $"frame_idx",
        length($"frame").as("frame_len"), md5($"frame").as("frame_md5"))
      .orderBy($"doc_id", $"frame_idx")

  /** Resize-to-fixed-resolution: 1-D average pooling of the payload's
    * byte signal into `buckets` cells (the image-resize analog on the
    * byte stand-in). Bucket assignment is pure integer math
    * ((pos·buckets) div len), sums are exact longs — results identical
    * on any partitioning, any engine. Output is long-form
    * (doc_id, bucket, mean) like the centroid tables.
    */
  def resizePool(documents: DataFrame, buckets: Int = 16): DataFrame =
    documents
      .filter(length($"text") > 0)
      .withColumn("len", length($"text"))
      .select($"doc_id", $"len", posexplode(split($"text", "")).as(Seq("pos", "c")))
      .filter($"c" =!= "")  // guard against a regex-split trailing empty
      .withColumn("bucket", expr(s"(pos * $buckets) div len"))
      .groupBy($"doc_id", $"bucket")
      .agg(sum(ascii($"c").cast("long")).as("sum_b"), count(lit(1)).as("n"))
      .withColumn("mean_b", $"sum_b" * 1.0 / $"n")
      .select($"doc_id", $"bucket", $"sum_b", $"n", $"mean_b")
      .orderBy($"doc_id", $"bucket")
}
