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


def enable_compile_cache():
    """Turn on the persistent XLA compilation cache (explicit opt-in;
    ADVICE r3: no global JAX config mutation at import time).

    The encoder's chunk programs are large (20-40 s compiles); caching
    them makes every tool/bench start warm.  The CLI, bench.py and the
    profiling tools call this; library users opt in themselves.  A
    cache dir already configured (env var or programmatically) wins.
    """
    import os
    if os.environ.get("HEVC_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax
        if jax.config.jax_compilation_cache_dir is None:
            cache = os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                os.path.expanduser("~/.cache/hevc_tpu_xla"))
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


from homerhevc_tpu.config import EncoderConfig  # noqa: E402,F401
