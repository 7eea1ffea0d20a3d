"""Native (C++) host components: libjpeg batch decoder.

Build with ``python -m ssip_tpu.native.build``; everything degrades
gracefully to pure-Python paths when the shared library is absent.
"""
