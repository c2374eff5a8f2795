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
