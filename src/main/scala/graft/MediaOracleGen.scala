package graft

import graft.media.Media

/** Prints the byte-length constants for the q_media_derivative oracle
  * (one `(id, kind, n_bytes)` VALUES tuple per derivative of the 50
  * seed-normalized synthetic blobs) — run after any change to
  * [[Media.synthImageJpeg]] or [[Media.imageResize]] and paste the
  * output into [[SparkEntry.mediaDerivativeNBytes]]. No SparkSession:
  * the kernels are plain functions, and the facts must not depend on
  * anything but the seed. */
object MediaOracleGen {
  def tuples: Seq[String] =
    (1 to 50).flatMap { seed =>
      val src = Media.synthImageJpeg(seed.toLong)
      Media.Widths.toSeq.sortBy(_._1).map { case (kind, w) =>
        s"($seed, '$kind', ${Media.imageResize(src, w).length})"
      }
    }

  def main(args: Array[String]): Unit =
    println(tuples.grouped(4).map(_.mkString(", ")).mkString(",\n  "))
}

/** Prints the expected near-dup pairs for the q_media_phash oracle:
  * aHash all 36 fixture blobs (30 seed-normalized block images + 6
  * noisy re-encodes), brute-force every pair's hamming, keep ≤ 3 —
  * the ground truth the banded join must reproduce. Run after any
  * change to [[Media.synthImageBlocksJpeg]], [[Media.addNoiseDots]]
  * or [[Media.aHash64]] and paste into [[SparkEntry.mediaPhashPairs]]. */
object PhashOracleGen {
  def blobs: Seq[(String, Array[Byte])] =
    (1 to 30).flatMap { rank =>
      val base = Media.synthImageBlocksJpeg(rank.toLong)
      Seq(f"img$rank%06d" -> base) ++
        (if (rank % 5 == 0)
          Seq(f"img$rank%06dn" -> Media.addNoiseDots(base, rank.toLong, 3000))
        else Nil)
    }

  def tuples: Seq[String] = {
    val hs = blobs.map { case (id, b) => id -> Media.aHash64(b) }
    for {
      (i1, h1) <- hs; (i2, h2) <- hs
      if i1 < i2
      d = java.lang.Long.bitCount(h1 ^ h2) if d <= 3
    } yield s"('$i1', '$i2', $d)"
  }

  def main(args: Array[String]): Unit =
    println(tuples.mkString(",\n  "))
}

/** Ground-truth pairs for the q_media_audio oracle: fingerprint the 30
  * seed-normalized WAVs + gain-scaled copies of every 5th + 2-segment
  * edits of every 7th, brute-force all pair hammings, keep ≤ 3. Run
  * after any change to [[Media.synthWav]] / [[Media.waveformPeaks]] /
  * [[Media.audioFingerprint64]] and paste into
  * [[SparkEntry.oracleSql]]'s q_media_audio entry. */
object AudioOracleGen {
  def blobs: Seq[(String, Array[Byte])] =
    (1 to 30).flatMap { rank =>
      Seq(f"au$rank%06d" -> Media.synthWav(rank.toLong)) ++
        (if (rank % 5 == 0)
          Seq(f"au$rank%06dg" -> Media.synthWav(rank.toLong, gain = 0.5))
        else Nil) ++
        (if (rank % 7 == 0)
          Seq(f"au$rank%06de" -> Media.synthWav(rank.toLong, flipSegs = 2))
        else Nil)
    }

  def tuples: Seq[String] = {
    val hs = blobs.map { case (id, b) => id -> Media.audioFingerprint64(b) }
    for {
      (i1, h1) <- hs; (i2, h2) <- hs
      if i1 < i2
      d = java.lang.Long.bitCount(h1 ^ h2) if d <= 3
    } yield s"('$i1', '$i2', $d)"
  }

  def main(args: Array[String]): Unit =
    println(tuples.mkString(",\n  "))
}

/** Ground-truth pairs for the q_media_video oracle: 12 seed-normalized
  * 4-frame MJPEG-AVIs + dot-perturbed re-encodes of every 3rd;
  * brute-force per-position frame hammings, pair when ≥ 3 of 4
  * positions are ≤ 3 bits. */
object VideoOracleGen {
  def frames(rank: Long, noisy: Boolean): Seq[Array[Byte]] =
    (0 until 4).map { f =>
      val base = Media.synthImageBlocksJpeg(rank * 100 + f, 64, 48)
      // 120 dots on a 64×48 frame ≈ the same perturbation density as
      // 3000 on the phash fixture's 320×240 canvas
      if (noisy) Media.addNoiseDots(base, rank * 100 + f, 120) else base
    }

  def blobs: Seq[(String, Array[Byte])] =
    (1 to 12).flatMap { rank =>
      Seq(f"vid$rank%04d" ->
        Media.mjpegAviFromJpegs(frames(rank.toLong, noisy = false), 64, 48)) ++
        (if (rank % 3 == 0)
          Seq(f"vid$rank%04dn" ->
            Media.mjpegAviFromJpegs(frames(rank.toLong, noisy = true), 64, 48))
        else Nil)
    }

  def tuples: Seq[String] = {
    val hs = blobs.map { case (id, b) =>
      id -> Media.mjpegFrameDecoder(b, 4).map(Media.aHash64)
    }
    for {
      (i1, f1) <- hs; (i2, f2) <- hs
      if i1 < i2
      n = f1.zip(f2).count { case (a, b) =>
        java.lang.Long.bitCount(a ^ b) <= 3 }
      if n >= 3
    } yield s"('$i1', '$i2', $n)"
  }

  def main(args: Array[String]): Unit =
    println(tuples.mkString(",\n  "))
}
