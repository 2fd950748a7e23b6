package graft

import graft.operators.Multimodal

/** Shared test-media builders. `randBmp` gives RANDOM-pixel images
  * (all 64 dHash bits live at 12×10) — unlike the oracle corpus's
  * linear-ramp generator, whose same-dims images are all brightness
  * shifts of each other and therefore mutually near-dup under a
  * difference hash. `bump` perturbs one channel of pixel (0,0): a
  * "re-encode" that can flip at most the couple of difference bits
  * referencing that sample point. */
object TestMedia {
  def randBmp(seed: Long, bump: Boolean = false): Array[Byte] = {
    val (w, h) = (12, 10)
    val b = Multimodal.synthBmp(seed, w, h)
    val stride = (w * 3 + 3) & ~3
    for (y <- 0 until h; x <- 0 until w * 3)
      b(54 + y * stride + x) = (graft.functions.SplitMix64
        .mix(seed * 1000003L + y * 512L + x) & 0xFF).toByte
    if (bump) b(54) = ((b(54) & 0xFF) ^ 0x40).toByte
    b
  }
}
