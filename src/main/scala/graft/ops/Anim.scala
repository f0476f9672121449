package graft.ops

/** Shared animation CANVAS COMPOSITOR for the two multi-frame raster
  * containers (animated WebP's ANMF walk, GIF's descriptor walk) —
  * the opt-in alternative to the per-frame-pixels contract
  * ([[Webp.animFrameLumas]], the GIF first-frame decode): each
  * emitted frame is the full canvas AS VIEWED after that frame is
  * blended, with the container's disposal state machine applied
  * between frames. Extension surface: the reference (kairos) has no
  * media path at all; both the per-frame and the composited contract
  * are additions for the training-data pipeline.
  *
  * Compositing runs in LUMA space — the gray pipeline's currency:
  * the canvas holds one BT.601 luma byte per pixel, frames carry a
  * luma plane plus an optional per-pixel alpha plane, and alpha
  * blending is `out = (a·src + (255−a)·dst) / 255` in integer
  * arithmetic. Documented convention: we blend luma directly rather
  * than blending RGB and re-deriving luma (the two differ only in
  * rounding on semi-transparent pixels; the former keeps the canvas
  * one byte per pixel, which is what lets the stage run before any
  * shuffle at 100 TB).
  */
object Anim {

  /** One decoded frame before compositing. `alpha` is per-pixel
    * 0..255 (same w×h raster order), or null for fully opaque.
    * `dispose`: 0 = none, 1 = restore the frame rect to background,
    * 2 = restore it to the canvas state before this frame (GIF
    * "restore to previous"). `noBlend`: overwrite the rect instead of
    * alpha-blending (the WebP ANMF B flag). */
  final case class Frame(x: Int, y: Int, w: Int, h: Int,
      luma: Array[Byte], alpha: Array[Byte],
      noBlend: Boolean, dispose: Int, durationMs: Int)

  /** Composite `frames` (container order) onto a canvasW×canvasH
    * canvas initialized to `bgLuma`, returning every `stride`-th
    * PRESENTED canvas as (frameIndex, canvasCopy). Presentation
    * precedes disposal (a frame's own pixels are always in its
    * emitted canvas); frame rects are clipped to the canvas; the
    * frame index counts ALL frames, emitted or not, so stride
    * sampling matches [[Webp.animFrameLumas]]' numbering. */
  def composite(canvasW: Int, canvasH: Int, bgLuma: Int,
      frames: Seq[Frame], stride: Int): Seq[(Int, Array[Byte])] = {
    if (canvasW <= 0 || canvasH <= 0 || stride < 1) return Nil
    val canvas = new Array[Byte](canvasW * canvasH)
    java.util.Arrays.fill(canvas, bgLuma.toByte)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
    var idx = 0
    frames.foreach { f =>
      // clip the frame rect to the canvas
      val x0 = math.max(0, f.x); val y0 = math.max(0, f.y)
      val x1 = math.min(canvasW, f.x + f.w)
      val y1 = math.min(canvasH, f.y + f.h)
      val prev: Array[Byte] = if (f.dispose == 2 && x1 > x0 && y1 > y0) {
        val save = new Array[Byte]((x1 - x0) * (y1 - y0))
        var y = y0
        while (y < y1) {
          System.arraycopy(canvas, y * canvasW + x0,
            save, (y - y0) * (x1 - x0), x1 - x0)
          y += 1
        }
        save
      } else null
      // blend the frame onto the canvas
      var y = y0
      while (y < y1) {
        val srcRow = (y - f.y) * f.w
        val dstRow = y * canvasW
        var x = x0
        while (x < x1) {
          val s = srcRow + (x - f.x)
          if (f.alpha == null || f.noBlend) canvas(dstRow + x) = f.luma(s)
          else {
            val a = f.alpha(s) & 0xff
            if (a == 255) canvas(dstRow + x) = f.luma(s)
            else if (a > 0) {
              val d = canvas(dstRow + x) & 0xff
              canvas(dstRow + x) =
                ((a * (f.luma(s) & 0xff) + (255 - a) * d) / 255).toByte
            }
          }
          x += 1
        }
        y += 1
      }
      if (idx % stride == 0) out += ((idx, canvas.clone()))
      // disposal: applies AFTER presentation, shapes the next frame's base
      f.dispose match {
        case 1 =>
          var yy = y0
          while (yy < y1) {
            java.util.Arrays.fill(canvas, yy * canvasW + x0,
              yy * canvasW + x1, bgLuma.toByte)
            yy += 1
          }
        case 2 if prev != null =>
          var yy = y0
          while (yy < y1) {
            System.arraycopy(prev, (yy - y0) * (x1 - x0),
              canvas, yy * canvasW + x0, x1 - x0)
            yy += 1
          }
        case _ => ()
      }
      idx += 1
    }
    out.toSeq
  }
}
