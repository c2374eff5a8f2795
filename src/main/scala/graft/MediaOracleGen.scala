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
