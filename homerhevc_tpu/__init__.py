"""homerhevc_tpu — a TPU-native HEVC (H.265) encoder framework.

A from-scratch re-design of the capabilities of HomerHEVC
(sdelavega/HomerHEVC): YUV420 8-bit video -> HEVC Main-profile Annex-B
bitstreams with I/P slices, full intra mode search, integer/subpel
motion estimation, DCT/DST transforms, quantization with sign-bit
hiding, deblocking, SAO, CABAC and CBR/VBR rate control.

Architecture: all pixel compute runs as batched JAX/XLA/Pallas programs
over CTU tensors on TPU; the sequential-by-spec entropy stage (CABAC,
headers, bitstream) runs in a native C++ host library pipelined behind
device compute; multi-chip scaling uses GSPMD sharding instead of the
reference's WPP/engine threads.
"""

__version__ = "0.1.0"

from homerhevc_tpu.config import EncoderConfig  # noqa: F401
