#!/usr/bin/env python3
"""Extract RFC 6386's trained VP8 probability/quantizer tables from the
system libwebp's .rodata and emit them as a Scala source file, plus
generate VP8 decode test vectors (real lossy-WebP bytes + the reference
decoder's YUV output) for Vp8Spec.

Provenance: the tables are the spec constants of RFC 6386 ("VP8 Data
Format and Decoding Guide", sections 11.5/13.4/13.5/14.1) — the same
values every compliant implementation ships. They are extracted from
the locally installed open-source libwebp (BSD-licensed) rather than
transcribed by hand purely to avoid transcription errors in ~3,200
numbers; Vp8Spec pins spot values and, far stronger, validates the
whole decoder byte-for-byte against libwebp's own decode output on the
committed vectors.

Table layout in libwebp 7.1.5 .rodata (offsets found by anchor scan,
each confirmed by structure: the all-128 band 0 of coeff type 0, the
all-255 head of the update table, adjacency with kBands/kBModesProba):
  0x100  kAcTable        uint16[128]
  0x200  kDcTable        uint8[128]
  0x280  kBands          uint8[16]   (spec-known, used as a cross-check)
  0x2a0  CoeffsUpdateProba [4][8][3][11]
  0x6c0  kBModesProba    [10][10][9]
  0xa60  CoeffsProba0    [4][8][3][11]
  0x1040 zigzag          uint8[16]   (spec-known, cross-check)
  0x1050 kCat6..kCat1    0-terminated prob runs, descending
"""
import base64, ctypes, os, struct, sys

LIB = "/usr/lib/x86_64-linux-gnu/libwebp.so.7"
OUT_SCALA = os.path.join(os.path.dirname(__file__), "..",
                         "src/main/scala/graft/ops/Vp8Tables.scala")
OUT_VEC = os.path.join(os.path.dirname(__file__), "..",
                       "src/test/resources/vp8")

data = open(LIB, "rb").read()
RO_OFF, RO_SIZE = 0x5A000, 0x7C38
ro = data[RO_OFF:RO_OFF + RO_SIZE]

ac_table = struct.unpack_from("<128H", ro, 0x100)
dc_table = list(ro[0x200:0x280])
bands = list(ro[0x280:0x290])
update_probs = ro[0x2A0:0x2A0 + 1056]
bmode_probs = ro[0x6C0:0x6C0 + 900]
coeff_probs = ro[0xA60:0xA60 + 1056]
zigzag = list(ro[0x1040:0x1050])

# cat extra-bit probs: libwebp stores only cat6..cat3 in .rodata (as
# descending 0-terminated runs at 0x1050); cat2/cat1 are inlined as
# immediate operands in its code, so those two come from the RFC 6386
# §13.2 text directly (Pcat1 = {159}, Pcat2 = {165, 145}) — and the
# end-to-end vector validation would catch a slip in either source.
cats = []
p = 0x1050
for n in (11, 5, 4, 3):
    cats.append(list(ro[p:p + n]))
    assert ro[p + n] == 0, (hex(p), n)
    p += n + 1
cat6, cat5, cat4, cat3 = cats
cat2 = [165, 145]
cat1 = [159]
assert all(v >= 1 for c in (cat1, cat2, cat3, cat4, cat5, cat6) for v in c)

# ---- sanity: spec-known values
assert bands == [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7], bands
assert zigzag == [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]
assert dc_table[:8] == [4, 5, 6, 7, 8, 9, 10, 10] and dc_table[-1] == 157
assert ac_table[:8] == (4, 5, 6, 7, 8, 9, 10, 11) and ac_table[-1] == 284
assert list(coeff_probs[:11]) == [128] * 11          # type0/band0 unused
assert list(coeff_probs[33:39]) == [253, 136, 254, 255, 228, 219]
assert list(update_probs[:11]) == [255] * 11
assert list(bmode_probs[:9]) == [231, 120, 48, 89, 115, 113, 120, 152, 112]
assert all(1 <= b <= 255 for b in bmode_probs)
assert all(1 <= b <= 255 for b in coeff_probs)

ac16 = b"".join(struct.pack(">H", v) for v in ac_table)


def b64(b: bytes) -> str:
    s = base64.b64encode(b).decode()
    return "\n".join('      "%s" +' % s[i:i + 72] for i in range(0, len(s), 72))


scala = f'''package graft.ops

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
object Vp8Tables {{

  private def dec(s: String): Array[Byte] =
    java.util.Base64.getDecoder.decode(s)

  /** Default token probabilities, [4 planes][8 bands][3 ctx][11]. */
  val CoeffProbs: Array[Byte] = dec(
{b64(coeff_probs)}
      "")

  /** Token-probability update probabilities, same shape. */
  val CoeffUpdateProbs: Array[Byte] = dec(
{b64(update_probs)}
      "")

  /** Key-frame subblock mode probs, [above mode][left mode][9]. */
  val KfBModeProbs: Array[Byte] = dec(
{b64(bmode_probs)}
      "")

  /** DC dequantization lookup, qindex 0..127. */
  val DcQ: Array[Int] = Array({", ".join(map(str, dc_table))})

  /** AC dequantization lookup, qindex 0..127. */
  val AcQ: Array[Int] = Array({", ".join(map(str, ac_table))})

  /** Coefficient-position → probability band (13.3). */
  val Bands: Array[Int] = Array({", ".join(map(str, bands))})

  /** Zigzag scan order (13.3). */
  val Zigzag: Array[Int] = Array({", ".join(map(str, zigzag))})

  /** Extra-bit probabilities for DCT_CAT1..6 tokens (13.2). */
  val Cat1: Array[Int] = Array({", ".join(map(str, cat1))})
  val Cat2: Array[Int] = Array({", ".join(map(str, cat2))})
  val Cat3: Array[Int] = Array({", ".join(map(str, cat3))})
  val Cat4: Array[Int] = Array({", ".join(map(str, cat4))})
  val Cat5: Array[Int] = Array({", ".join(map(str, cat5))})
  val Cat6: Array[Int] = Array({", ".join(map(str, cat6))})
}}
'''
os.makedirs(os.path.dirname(OUT_SCALA), exist_ok=True)
open(OUT_SCALA, "w").write(scala)
print("wrote", OUT_SCALA)

# ---------------------------------------------------------------- vectors
lib = ctypes.CDLL(LIB)
lib.WebPEncodeRGB.restype = ctypes.c_size_t
lib.WebPEncodeRGB.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                              ctypes.c_int, ctypes.c_float,
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeYUV.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                              ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                              ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.c_int)]
lib.WebPFree.argtypes = [ctypes.c_void_p]


def gen_image(kind, w, h, seed):
    """Deterministic RGB bytes, no numpy needed."""
    rnd = seed
    out = bytearray(w * h * 3)

    def nxt():
        nonlocal rnd
        rnd = (rnd * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        return (rnd >> 33) & 0xFF

    for y in range(h):
        for x in range(w):
            i = (y * w + x) * 3
            if kind == "flat":
                out[i:i + 3] = bytes(((seed * 37) % 256, (seed * 91) % 256,
                                      (seed * 13) % 256))
            elif kind == "grad":
                out[i:i + 3] = bytes(((x * 255 // max(w - 1, 1)),
                                      (y * 255 // max(h - 1, 1)),
                                      ((x + y) * 7 + seed) % 256))
            elif kind == "noise":
                out[i:i + 3] = bytes((nxt(), nxt(), nxt()))
            elif kind == "blocks":
                v = ((x // 8) * 31 + (y // 8) * 57 + seed) % 256
                out[i:i + 3] = bytes((v, (v * 3) % 256, (255 - v)))
            else:  # smooth: low-frequency-ish pattern
                v = int(127 + 120 * __import__("math").sin(
                    (x * 0.21 + seed) % 6.28) *
                    __import__("math").cos((y * 0.17 + seed * 0.5) % 6.28))
                out[i:i + 3] = bytes((v & 0xFF, (v * 2) & 0xFF, (v // 2) & 0xFF))
    return bytes(out)


os.makedirs(OUT_VEC, exist_ok=True)
cases = [
    ("flat", 16, 16, 1, 75), ("flat", 32, 48, 2, 20),
    ("grad", 64, 64, 3, 80), ("grad", 33, 17, 4, 50),
    ("noise", 48, 32, 5, 10), ("noise", 24, 24, 6, 90),
    ("blocks", 80, 48, 7, 60), ("blocks", 16, 48, 8, 35),
    ("smooth", 96, 64, 9, 70), ("smooth", 40, 56, 10, 45),
    ("grad", 160, 112, 11, 55), ("noise", 17, 13, 12, 40),
    ("smooth", 5, 7, 13, 85), ("blocks", 127, 95, 14, 25),
    ("noise", 64, 64, 15, 1), ("grad", 31, 63, 16, 95),
]
n_ok = 0
for i, (kind, w, h, seed, q) in enumerate(cases):
    rgb = gen_image(kind, w, h, seed)
    outp = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(rgb, w, h, w * 3, float(q), ctypes.byref(outp))
    assert n > 0, (kind, w, h)
    webp = ctypes.string_at(outp, n)
    lib.WebPFree(outp)
    # reference decode (includes the loop filter)
    dw, dh = ctypes.c_int(), ctypes.c_int()
    up, vp = ctypes.POINTER(ctypes.c_uint8)(), ctypes.POINTER(ctypes.c_uint8)()
    ystr, uvstr = ctypes.c_int(), ctypes.c_int()
    yp = lib.WebPDecodeYUV(webp, n, ctypes.byref(dw), ctypes.byref(dh),
                           ctypes.byref(up), ctypes.byref(vp),
                           ctypes.byref(ystr), ctypes.byref(uvstr))
    assert yp and dw.value == w and dh.value == h
    cw, ch = (w + 1) // 2, (h + 1) // 2
    yb = b"".join(ctypes.string_at(
        ctypes.addressof(yp.contents) + r * ystr.value, w) for r in range(h))
    ub = b"".join(ctypes.string_at(
        ctypes.addressof(up.contents) + r * uvstr.value, cw) for r in range(ch))
    vb = b"".join(ctypes.string_at(
        ctypes.addressof(vp.contents) + r * uvstr.value, cw) for r in range(ch))
    lib.WebPFree(yp)
    open(os.path.join(OUT_VEC, "v%02d.webp" % i), "wb").write(webp)
    with open(os.path.join(OUT_VEC, "v%02d.yuv" % i), "wb") as f:
        f.write(struct.pack("<II", w, h))
        f.write(yb); f.write(ub); f.write(vb)
    n_ok += 1
    print("v%02d %s %dx%d q%d: %d webp bytes" % (i, kind, w, h, q, n))
print("wrote", n_ok, "vectors to", OUT_VEC)
