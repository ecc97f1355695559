"""cniic-tpu: a TPU-native image-codec laboratory in JAX.

A from-scratch rebuild of the capabilities of hkapp/cniic (a Rust CLI of
"naive ideas for image compression"), designed TPU-first:

* dense per-pixel stages (histograms, Hilbert gathers, delta transforms,
  RLE segmented scans, k-means, Huffman code gather + bit packing) run as
  batched JAX/XLA/Pallas programs over whole images resident in HBM;
* the irreducibly sequential entropy-coding stages (LZ dictionary growth,
  lookback match emission, Huffman bit-serial decode) run in a small native
  C library driven through ctypes;
* wire formats are byte-compatible with the reference implementation
  (see `cniic_tpu.wire`), so compressed streams are directly comparable.

Public API:
    from cniic_tpu import codecs
    codec = codecs.from_spec("hilbert(rle(4))")
    payload = codec.encode(img)          # img: uint8[H, W, 3]
    restored = codec.decode(iter_or_bytes)
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache() -> None:
    """Persist XLA compilations across processes.

    First-compile of a shape bucket over the remote-TPU tunnel costs
    minutes; with the persistent cache subsequent runs reuse it. Safe no-op
    when unavailable.
    """
    try:
        import jax

        cache_dir = _os.environ.get(
            "CNIIC_JAX_CACHE", _os.path.expanduser("~/.cache/jax_cniic"))
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


_enable_compilation_cache()
