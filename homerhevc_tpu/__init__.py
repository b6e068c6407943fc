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

import os as _os

# Persistent XLA compilation cache: the encoder's chunk programs are
# large (20-40 s compiles); caching them makes every tool/bench start
# warm.  Opt out with HEVC_TPU_NO_COMPILE_CACHE=1.
if not _os.environ.get("HEVC_TPU_NO_COMPILE_CACHE"):
    try:
        import jax as _jax
        # respect a cache dir the user set programmatically BEFORE
        # importing this package (env var already wins via the
        # fallback below)
        if _jax.config.jax_compilation_cache_dir is None:
            _cache = _os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                _os.path.expanduser("~/.cache/hevc_tpu_xla"))
            _os.makedirs(_cache, exist_ok=True)
            _jax.config.update("jax_compilation_cache_dir", _cache)
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from homerhevc_tpu.config import EncoderConfig  # noqa: F401
