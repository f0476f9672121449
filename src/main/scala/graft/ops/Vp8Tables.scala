package graft.ops

/** RFC 6386 ("VP8 Data Format and Decoding Guide") trained constant
  * tables — token probabilities (13.5), token-probability update
  * probabilities (13.4), key-frame subblock-mode probabilities (11.5),
  * and the dequantization lookups (14.1). These are spec constants
  * every compliant VP8 implementation ships verbatim; the byte blobs
  * here were extracted from the open-source libwebp's .rodata by
  * scripts/vp8_tables_extract.py (re-runnable) to avoid hand
  * transcription errors in ~3,200 numbers. Spot values are pinned in
  * Vp8Spec, and the whole decoder is validated byte-for-byte against
  * libwebp's decode output on the committed src/test/resources/vp8
  * vectors, which would surface any extraction slip immediately. */
object Vp8Tables {

  private def dec(s: String): Array[Byte] =
    java.util.Base64.getDecoder.decode(s)

  /** Default token probabilities, [4 planes][8 bands][3 ctx][11]. */
  val CoeffProbs: Array[Byte] = dec(
      "gICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICA/Yj+/+TbgICAgIC9gfL/49X/24CA" +
      "gGp+4/zW0f//gICAAWL4/+zi//+AgIC1he7+3er/moCAgE6GyvfGtP/bgICAAbn5//P/gICA" +
      "gIC4lvf/7OCAgICAgE1u2P/s5oCAgICAAWX7//H/gICAgICqi/H87NH//4CAgCV0xPPk////" +
      "gICAAcz+//X/gICAgIDPoPr/7oCAgICAgGZn5//Tq4CAgICAAZj8//D/gICAgICxh/P/6uGA" +
      "gICAgFCB0//C4ICAgICAAQH/gICAgICAgID2Af+AgICAgICAgP+AgICAgICAgICAxiPt38G7" +
      "oqCRmz6DLcbdrLDcnfzdAUQvktCVp92i/9+AAZXx/93g//+AgIC4jer93tz/x4CAgFFjtfKw" +
      "vvnK//+AAYHo/dbF8sT//4BjedL6ycb/yoCAgBdbo/Kqu/fS//+AAcj2/+r/gICAgIBtsvH/" +
      "5/X//4CAgCyCyf3NwP//gICAAYTv+9vR/6WAgIBeiOH72r7//4CAgBZkrvW6of/HgICAAbb5" +
      "/+jrgICAgIB8j/H/4+qAgICAgCNNtfvB0//NgICAAZ33/+zn//+AgIB5jev/4eP//4CAgC1j" +
      "vPvD2f/ggICAAQH7/9X/gICAgIDLAfj//4CAgICAgIkBsf/g/4CAgICA/Qn4+8/Q/8CAgICv" +
      "DeDzwbn5xv//gEkRq92hs+yn/+qAAV/3/dS3//+AgIDvWvT609H//4CAgJtNw/i8w///gICA" +
      "ARjv+9rb/82AgIDJM9v/xLqAgICAgEUuvu/J2v/kgICAAb/7//+AgICAgIDfpfn/1f+AgICA" +
      "gI18+P//gICAgICAARD4//+AgICAgIC+JOb/7P+AgICAgJUB/4CAgICAgICAAeL/gICAgICA" +
      "gID3wP+AgICAgICAgPCA/4CAgICAgICAAYb8//+AgICAgIDVPvr//4CAgICAgDdd/4CAgICA" +
      "gICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAyhjV67q/3KDwr/9+Jrboqbjk" +
      "rv+7gD0uituXsvCq/9iAAXDm+se/95///4CmbeT809f/roCAgCdNouistPWy//+AATTc9sbH" +
      "+dz//4B8Sr/zt8H63f//gBhHgtuaqvO2//+AAbbh+dvw/+CAgICVluL82M3/q4CAgBxsqvK3" +
      "wv7f//+AAVHm/MzL/8CAgIB7ZtH3vMT/6YCAgBRfmfOkrf/LgICAAd74/9jVgICAgICor/b8" +
      "683//4CAgC901//T1P//gICAAXns/dTW//+AgICNVNX8ycr/24CAgCpQoPCiuf/NgICAAQH/" +
      "gICAgICAgID0Af+AgICAgICAgO4B/4CAgICAgICA" +
      "")

  /** Token-probability update probabilities, same shape. */
  val CoeffUpdateProbs: Array[Byte] = dec(
      "////////////////////////////////////////////sPb////////////f8fz/////////" +
      "//n9/f////////////T8///////////q/v7///////////3///////////////b+////////" +
      "///v/f7///////////7//v////////////j+///////////7//7/////////////////////" +
      "//////3+///////////7/v7///////////7//v////////////79//7////////6//7//v//" +
      "//////7/////////////////////////////////////////////////////////2f//////" +
      "///////h/PH9///+/////+r68fr9//3+//////7////////////f/v7//////////+79/v7/" +
      "//////////j+///////////5/v////////////////////////////3////////////3/v//" +
      "//////////////////////////3+///////////8//////////////////////////////7+" +
      "///////////9//////////////////////////////79///////////6//////////////7/" +
      "////////////////////////////////////////////////////////uvv6///////////q" +
      "+/T+//////////v78/3+//7///////3+///////////s/f7///////////v9/f7+////////" +
      "//7+///////////+/v7///////////////////////////7////////////+/v//////////" +
      "//7////////////////////////////+////////////////////////////////////////" +
      "////////////////////////////////////////////////////////////////////////" +
      "////////////////////////////////////////////////+P/////////////6/vz+////" +
      "//////j++f3///////////39///////////2/f3///////////z++/7+//////////78////" +
      "///////4/v3///////////3//v7///////////v+///////////1+/7///////////39/v//" +
      "//////////v9///////////8/f7////////////+//////////////z////////////5//7/" +
      "/////////////v/////////////9///////////6////////////////////////////////" +
      "///////////+////////////////////////////" +
      "")

  /** Key-frame subblock mode probs, [above mode][left mode][9]. */
  val KfBModeProbs: Array[Byte] = dec(
      "53gwWXNxeJhwmLNAfqp2LkZfr0WPUFVSSJtnODoKq9q9EQ2YchoRoyzDFQqteRhQwxo+LEBV" +
      "kEcKJqvVkCIaqi43E4igIc5HPxQIcnLQDAniUSgLYLZUHRAkhrdZiWJlaqWUSLtkgp1vIEtQ" +
      "QmanY0o+KOqAKTUJsvGNGghrSisakkmmMRedQSZpoDM0H3OAaE8MG9n/VxEHV0RHLHIzD7oX" +
      "LykObra3FRHCQi0ZZsW9FxIWWFiTliouLcTNK2G3dVUmI7M9JzXIVxoVK+irOCIzaHJmHV1N" +
      "JxxVqzqlWmJAIhZ0zhciK6ZJazYgGjMBUSsfRBlqFkCrJOFyIhMVZoS8EEx8PhJOX1U5MjAz" +
      "wWUjn9dvWS5vPJQfrNvkFRJvcHFNVbP/JnhyKCoBxPXRChltWCsdjKbVJSuaPT8em0MtRAHR" +
      "ZFAIK5oBMxpHjk5OEP+AIsWrKSgFZtO3BAHdMzIRqNHAFxlSih8kqxumJizlQ1c6qVJzGjuz" +
      "PztatDumXUmaKCgVdI/RIievLw8QtyLfMS23LhEhtwZiDyC3OS4WGIABNhElQSBJcxyAF4DN" +
      "KAMJczPAEgbfVyUJcztNQBUvaDcs2gk2NYLiQFpGzSgpFxo5NjlwuAUpJqbVHiIahZh0CiCG" +
      "JxM13RpyIEn/HwlB6gIPAXZJSyAMM8D/oCszWB8jQ2ZVN7pVOBUXbzvNLSXANyZGfElmASJi" +
      "fWIqWGhVda9SX1Q1WYBkcWUtS097LzOAUasBOREFR2Y5NSkxJiENeTlJGgFVKQpDik1uWi9y" +
      "cxUCCmb/phcGZR0QClWAZcQaORIKZmbVIhQrdRQPJKOARAEaZj1HJSI1H/PARTxHJkl3HN4l" +
      "RC2AIgEvC/WrPhETRpJVNz5GJSslmmSjVaABPwlciBxAIMlVSw8JCUD/uHcQVgYcBUD/GfgB" +
      "OAgRhIn/N3SAOg8UUoc5GnkopDIfiZqFGSPaM2csg4N7HwaeVihAh5TgLbeAFhoRg/CaDgHR" +
      "LRAVW0DeBwHFOBUnmzyKF2bVUwwNNsD/RC8cVRpVVYCAIJKrEgsHP5CrBAT2IxsKkq6rDBqA" +
      "vlAjY7RQfjYtVX4vV7AzKRQgZUuAi3aSdIBVOCkPsOxVJQk+Rx4Rd3b/ERKKZSY8ijdGKxqO" +
      "kiQTHqv/YRsUii09PtsBUbxAICkUdZeOFBWjcBMMPcOAMAQY" +
      "")

  /** DC dequantization lookup, qindex 0..127. */
  val DcQ: Array[Int] = Array(4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17, 18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74, 75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89, 91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114, 116, 118, 122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143, 145, 148, 151, 154, 157)

  /** AC dequantization lookup, qindex 0..127. */
  val AcQ: Array[Int] = Array(4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76, 78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106, 108, 110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140, 143, 146, 149, 152, 155, 158, 161, 164, 167, 170, 173, 177, 181, 185, 189, 193, 197, 201, 205, 209, 213, 217, 221, 225, 229, 234, 239, 245, 249, 254, 259, 264, 269, 274, 279, 284)

  /** Coefficient-position → probability band (13.3). */
  val Bands: Array[Int] = Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

  /** Zigzag scan order (13.3). */
  val Zigzag: Array[Int] = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  /** Extra-bit probabilities for DCT_CAT1..6 tokens (13.2). */
  val Cat1: Array[Int] = Array(159)
  val Cat2: Array[Int] = Array(165, 145)
  val Cat3: Array[Int] = Array(173, 148, 140)
  val Cat4: Array[Int] = Array(176, 155, 140, 135)
  val Cat5: Array[Int] = Array(180, 157, 141, 134, 130)
  val Cat6: Array[Int] = Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129)
}
