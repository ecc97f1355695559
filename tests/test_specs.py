"""Spec mini-language vectors (reference prs.rs tests + codec grammars)."""

import pytest

from cniic_tpu import specs
from cniic_tpu.codecs import from_spec


def test_matches_fully():
    # prs.rs:233-250
    assert specs.matches_fully("", "a") is None
    assert specs.matches_fully("a", "a") == "a"
    assert specs.matches_fully("a", "b") is None
    assert specs.matches_fully("aa", "a") is None


@pytest.mark.parametrize("bad", ["a", "a(", "a(b", "a(b,", "a(b,)", "()", "(a)", "", "a,b", "a(b,,c)", "a(b)d", "a())", "a()(b,c)"])
def test_fun_call_rejects(bad):
    # prs.rs:260-313 reject table
    assert specs.fun_call(bad) is None


@pytest.mark.parametrize("text,name,args", [
    ("a()", "a", []),
    ("a(b)", "a", ["b"]),
    ("a(b,c)", "a", ["b", "c"]),
    ("hilbert(rle(4))", "hilbert", ["rle(4)"]),
    ("a(b, c(d, e))", "a", ["b", " c(d, e)"]),
])
def test_fun_call_accepts(text, name, args):
    assert specs.fun_call(text) == (name, args)


@pytest.mark.parametrize("spec,name", [
    ("hufman", "Hufman"),
    ("HUFMAN", "Hufman"),
    ("HufMan", "Hufman"),
    ("zip(dict)", "zip-dict"),
    ("zip(back)", "zip-back"),
    ("delta", "delta"),
    ("hilbert(rle)", "hilbert-rle"),
    ("Hilbert(rle)", "hilbert-rle"),
    ("hilbert(rle(4))", "hilbert-rle-approx_4"),
    ("hilbert(rle(2.5))", "hilbert-rle-approx_2.5"),
    ("hilbert(zip)", "hilbert-zip"),
    ("cluster-colors(16)", "cluster-colors_16"),
    ("ccol(16)", "cluster-colors_16"),
    ("c-colors(3)", "cluster-colors_3"),
    ("clustercol(8)", "cluster-colors_8"),
    ("voronoi(64)", "voronoi_64"),
])
def test_codec_specs(spec, name):
    assert from_spec(spec).name == name


@pytest.mark.parametrize("bad", ["nonsense", "zip(gzip)", "hilbert(rle, zip)", "voronoi(x)", "zip()", "hilbert()"])
def test_codec_specs_reject(bad):
    with pytest.raises(specs.ParseError):
        from_spec(bad)


def test_lossless_flags():
    assert from_spec("hufman").is_lossless
    assert from_spec("hilbert(rle)").is_lossless
    assert not from_spec("hilbert(rle(1))").is_lossless
    assert from_spec("hilbert(zip)").is_lossless
    assert not from_spec("ccol(4)").is_lossless
    assert not from_spec("voronoi(4)").is_lossless
