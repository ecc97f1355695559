"""The codec-spec mini-language.

Grammar and error taxonomy follow the reference parser (src/prs.rs):

* ``matches_fully(input, regex)`` anchors the regex to the whole input
  (prs.rs:8-21);
* ``fun_call(input)`` parses ``name(arg, ...)`` with a paren stack so nested
  calls like ``hilbert(rle(4))`` keep their inner call as a single raw
  argument string (prs.rs:24-157);
* alternatives are tried in a fixed order and failures stack into an
  ``AllFailed`` error (prs.rs:177-226).

Accepted spec strings (same as the reference, codec.rs:120-127 order):
    cluster-colors(N) / ccol(N) / c-colors(N)...   clusterc.rs:125
    voronoi(N)                                     clusterc.rs:281
    delta                                          hilbertc.rs:575-582
    hilbert(rle) | hilbert(rle(D)) | hilbert(zip)  hilbertc.rs:337-395
    hufman  (case-insensitive)                     hufc.rs:51-63
    zip(dict) | zip(back)                          zipc.rs:62-81
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class ParseError(Exception):
    pass


@dataclass
class WrongName(ParseError):
    expected: str
    found: str

    def __str__(self) -> str:
        return f"expected name {self.expected!r}, found {self.found!r}"


@dataclass
class WrongNumberOfArguments(ParseError):
    expected: int
    found: int

    def __str__(self) -> str:
        return f"expected {self.expected} argument(s), found {self.found}"


@dataclass
class OtherParseError(ParseError):
    message: str

    def __str__(self) -> str:
        return self.message


@dataclass
class AllFailed(ParseError):
    attempts: list = field(default_factory=list)

    def __str__(self) -> str:
        lines = [f"  {name}: {err}" for name, err in self.attempts]
        return "no codec alternative matched:\n" + "\n".join(lines)


def matches_fully(text: str, regex: str):
    """Return `text` if `regex` (with no capture groups) matches it fully."""
    m = re.fullmatch(regex, text)
    if m is None or m.groups():
        return None
    return text


def expect_name(text: str, name_regex: str) -> str:
    got = matches_fully(text, name_regex)
    if got is None:
        raise WrongName(expected=name_regex, found=text)
    return got


def fun_call(text: str):
    """Parse ``name(arg, ...)``; returns (name, [args]) or None if malformed.

    Nested parentheses inside an argument are kept verbatim; a trailing
    character after the closing paren, empty arguments, a trailing comma,
    unbalanced parens, and a missing name are all rejected — the same accept/
    reject table as prs.rs:24-157 (pinned by its unit tests prs.rs:260-313).
    """
    name = None
    args: list[str] = []
    depth = 0
    last = 0

    for pos, c in enumerate(text):
        if c == "(":
            if depth == 0:
                if name is not None or last != 0 or pos == 0:
                    return None
                name = text[:pos]
                depth = 1
                last = pos + 1
            else:
                depth += 1
        elif c == ")":
            if depth == 0:
                return None
            if depth == 1:
                if pos != len(text) - 1:
                    return None
                if pos == last:
                    if args:
                        return None  # "a(b,)"
                else:
                    args.append(text[last:pos])
                last = pos + 1
            depth -= 1
        elif c == ",":
            if depth == 0:
                return None
            if depth == 1:
                if last == pos:
                    return None  # "a(b,,c)"
                args.append(text[last:pos])
                last = pos + 1

    if depth != 0 or name is None:
        return None
    return name, args


class Alternatives:
    """Ordered try-each combinator with error stacking (prs.rs:177-226)."""

    def __init__(self, text: str) -> None:
        self._text = text
        self._result = None
        self._done = False
        self._errors: list[tuple[str, ParseError]] = []

    def then_try(self, name: str, parse_fn) -> "Alternatives":
        if not self._done:
            try:
                self._result = parse_fn(self._text)
                self._done = True
            except ParseError as e:
                self._errors.append((name, e))
        return self

    def end(self):
        if self._done:
            return self._result
        raise AllFailed(self._errors)
