"""SPARQL tokenizer.

The reference delegates parsing to the Rasqal library
(rasqal_new_query("sparql11"), src/frontend/query.c:347-354); no parser
exists in-tree, so this is a fresh implementation of the SPARQL 1.1
terminal grammar (https://www.w3.org/TR/sparql11-query/#grammar).
"""

from __future__ import annotations

import re
from dataclasses import dataclass


class SparqlSyntaxError(ValueError):
    pass


@dataclass
class Token:
    type: str
    value: str
    pos: int


_TOKEN_RES = [
    ("WS", r"[ \t\r\n]+"),
    ("COMMENT", r"#[^\n]*"),
    ("IRIREF", r"<[^<>\"{}|^`\\\x00-\x20]*>"),
    # triple-quoted strings first
    ("STRING", r'"""(?:[^"\\]|\\.|"(?!""))*"""' + r"|'''(?:[^'\\]|\\.|'(?!''))*'''"
     r'|"(?:[^"\\\n]|\\.)*"' + r"|'(?:[^'\\\n]|\\.)*'"),
    ("VAR", r"[?$][A-Za-z_][A-Za-z_0-9]*"),
    # label cannot end in "." (BLANK_NODE_LABEL): "_:b1." is b1 + dot
    ("BLANK", r"_:[A-Za-z_0-9](?:[A-Za-z_0-9.]*[A-Za-z_0-9])?"),
    ("LANGTAG", r"@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*"),
    ("DOUBLE", r"(?:\d+\.\d*|\.\d+|\d+)[eE][+-]?\d+"),
    ("DECIMAL", r"\d+\.\d*|\.\d+"),
    ("INTEGER", r"\d+"),
    # prefixed name: prefix part optional-empty, local part may not end in '.'
    ("PNAME", r"(?:[A-Za-z][A-Za-z_0-9\-.]*)?:(?:[A-Za-z_0-9%]"
     r"(?:[A-Za-z_0-9\-.%]*[A-Za-z_0-9\-%])?)?"),
    ("IDENT", r"[A-Za-z_][A-Za-z_0-9]*"),
    # bare '?' (not followed by a var name char) is the zero-or-one path
    # modifier; '?x' stays a VAR (matched first)
    ("OP", r"\^\^|\|\||&&|!=|<=|>=|[=<>!+\-*/(){}\[\],;.^|?]"),
]

_MASTER = re.compile("|".join(f"(?P<{n}>{p})" for n, p in _TOKEN_RES))


def tokenize(text: str) -> list[Token]:
    tokens: list[Token] = []
    pos = 0
    n = len(text)
    while pos < n:
        m = _MASTER.match(text, pos)
        if not m:
            raise SparqlSyntaxError(f"unexpected character {text[pos]!r} at {pos}")
        kind = m.lastgroup
        val = m.group()
        if kind not in ("WS", "COMMENT"):
            tokens.append(Token(kind, val, pos))
        pos = m.end()
    tokens.append(Token("EOF", "", n))
    return tokens
