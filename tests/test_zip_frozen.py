"""Frozen encoder-output digests for the LZ engines.

The zip engines' emitted streams are part of the framework contract: the
match-search structures have been rewritten for speed several times and every
rewrite must keep the output byte-identical (reference zip/dict.rs and
zip/back.rs semantics: greedy longest match, first-strictly-longer winner in
ascending position order). These digests pin mid-sized structured inputs that
exercise the paths the tiny unit vectors in test_zip.py don't: aged
generations, degenerate candidate lists, dictionary growth past promotion.

If an intentional semantic change lands (and PARITY.md documents it), refresh
the digests with the generator in this file's git history.
"""

import hashlib

import numpy as np
import pytest

from cniic_tpu import native


def _digest(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()[:16]


def _streams():
    rng = np.random.default_rng(1234)
    runs = np.repeat(rng.integers(0, 6, 400), rng.integers(1, 60, 400))
    return {
        "runs": runs.astype(np.uint8).tobytes(),
        "rand": np.random.default_rng(99).integers(0, 256, 8192, dtype=np.uint8).tobytes(),
        "periodic11": bytes(range(11)) * 1500,
        "text": b"the quick brown fox jumps over the lazy dog. " * 200,
    }


FROZEN = [
    # (name, input sha, zip-back sha, zip-dict sha)
    ("runs", "ee7c7832c81ed63f", "629990cded74568d", "2fc78b6625cf35dd"),
    ("rand", "ff4ed6b6c8c7f754", "bfbb593315030205", "010994eff8f8b7c4"),
    ("periodic11", "0ea634a77e472f69", "738f014924eced91", "ee2179c48e9100e7"),
    ("text", "e8d2d9bd40420ea7", "1dce74716a07f91f", "37750df59b9b1374"),
]


@pytest.mark.parametrize("name,in_sha,zb_sha,zd_sha", FROZEN)
def test_frozen_encodings(name, in_sha, zb_sha, zd_sha):
    data = _streams()[name]
    assert _digest(data) == in_sha, "test input generation drifted"
    zb = native.zip_back_encode(data)
    zd = native.zip_dict_encode(data)
    assert _digest(zb) == zb_sha
    assert _digest(zd) == zd_sha
    assert native.zip_back_decode(zb) == data
    assert native.zip_dict_decode(zd) == data
