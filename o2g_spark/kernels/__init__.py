"""Pure-numpy computational kernels (no Spark imports).

These are the vectorized array-in/array-out functions that the Arrow
pandas UDFs in :mod:`o2g_spark.functions` wrap. Keeping them Spark-free
makes them unit-testable without a JVM and reusable driver-side (e.g.
polygon cover precomputation before broadcast).
"""

# Revision of the MEDIA DECODE ENVELOPE (which payload formats decode
# for real vs take the digest stand-in). Perceptual-signature indexes
# stamp this into their manifests: a payload that was undecodable when
# an index was built (no signature row) but decodes under a newer
# envelope would silently break the "increment == full run restricted
# to new rows" exactness claim — the index readers refuse a revision
# mismatch instead, demanding a rebuild.
#   rev 1: BMP/PNG/GIF/baseline-JPEG/WAV + raw-DIB/MJPEG AVI
#   rev 2: + progressive (SOF2) JPEG — everywhere JPEG decodes
#          (images, MJPEG frames)
CODEC_REV = 2
