"""Image payload kernels: from-scratch codecs + pHash + PSNR.

The graft input table carries images as opaque binary columns
(BASELINE.json:15: bytes/w/h/fmt/phash); these kernels decode/encode them
inside Arrow-batched pandas UDFs. No Pillow in this environment (SURVEY.md
§0) — raw/ppm/png/qdct are implemented from scratch in numpy + stdlib zlib.
"""
