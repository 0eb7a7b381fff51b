package graft.tools

import graft.ext.Multimodal

/** One-off margin measurement for the round-7 stub-proof JPEG oracles:
  * (a) the mismatched-pair dHash control — hamming between BMP dhash of
  * doc i and of doc i+1e6 — must stay strictly above the self JPEG
  * hamming for every doc at every gate scale; (b) the inverted-field
  * mean-abs-err control must stay above the 60-level tolerance with a
  * wide margin. Run over a superset of every corpus the gates use.
  */
object JpegMarginProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000L
    var minControl = Int.MaxValue; var maxSelf = 0; var worstId = -1L
    var minInvErr = Long.MaxValue; var maxSelfErr = 0L
    var id = 0L
    while (id < n) {
      val hBmp = Multimodal.dhashFromBytes(id, Multimodal.encodeBmp(id))
      val hCtl = Multimodal.dhashFromBytes(id + 1000000L, Multimodal.encodeBmp(id + 1000000L))
      val jpeg = Multimodal.encodeJpeg(id)
      val hJpg = Multimodal.dhashFromImage(id, jpeg)
      val self = java.lang.Long.bitCount(hBmp ^ hJpg)
      val ctl = java.lang.Long.bitCount(hBmp ^ hCtl)
      if (ctl < minControl) { minControl = ctl; worstId = id }
      if (self > maxSelf) maxSelf = self
      // inverted-field error of the decoded JPEG
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
      val w = img.getWidth; val h = img.getHeight
      var errSelf = 0L; var errInv = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y); val i = y * w + x
          val dr = ((rgb >> 16) & 0xff); val dg = ((rgb >> 8) & 0xff); val db = rgb & 0xff
          val er = Multimodal.bmpChannel(id, i, 2)
          val eg = Multimodal.bmpChannel(id, i, 1)
          val eb = Multimodal.bmpChannel(id, i, 0)
          errSelf += math.abs(dr - er) + math.abs(dg - eg) + math.abs(db - eb)
          errInv += math.abs(dr - (255 - er)) + math.abs(dg - (255 - eg)) + math.abs(db - (255 - eb))
          x += 1
        }
        y += 1
      }
      val npx = w.toLong * h * 3
      val selfMilli = errSelf * 1000L / npx
      val invMilli = errInv * 1000L / npx
      if (invMilli < minInvErr) minInvErr = invMilli
      if (selfMilli > maxSelfErr) maxSelfErr = selfMilli
      id += 1
    }
    println(s"n=$n minControlHamming=$minControl (id=$worstId) maxSelfHamming=$maxSelf")
    println(s"maxSelfErrMilli=$maxSelfErr minInvertedErrMilli=$minInvErr tol=60000")
  }
}
