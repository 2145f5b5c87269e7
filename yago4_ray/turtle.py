"""A minimal Turtle parser for the schema/shape rule files.

Supports the subset of Turtle the shape data uses (cf. the reference's
embedded data files loaded at schema.rs:304-309): @prefix, `a`, IRIs,
prefixed names, string literals (plain / @lang / ^^typed), bare
integers, decimals and booleans, object lists (,), predicate lists (;),
nested blank-node property lists [ ... ] and RDF collections ( ... ).

Output is a list of (subject, predicate, object) canonical N-Triples
term strings (yago4_ray.terms conventions). Blank node labels are
seeded per-document (hash of the text) so separately parsed files can't
collide, mirroring the per-file blank-node seeding of schema.rs:319-330.

Driver-side only: shape files are tiny (the reference's full set is
~21k lines); never used in a hot path.
"""

from __future__ import annotations

import hashlib
import re

from . import terms as T

_TOKEN_RE = re.compile(
    r"""
      (?P<comment>\#[^\n]*)
    | (?P<iri><[^>]*>)
    | (?P<longstring>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\")
    | (?P<string>"(?:[^"\\]|\\.)*")
    | (?P<langtag>@[A-Za-z][A-Za-z0-9-]*)
    | (?P<dtype>\^\^)
    | (?P<punct>[;,.\[\]()])
    | (?P<number>[+-]?[0-9]+(?:\.[0-9]+)?)
    | (?P<pname>[A-Za-z_][\w.-]*)?:(?P<local>[\w.-]*)
    | (?P<kw>[A-Za-z_][\w-]*)
    """,
    re.VERBOSE,
)

_NUM_INT_RE = re.compile(r"^[+-]?[0-9]+$")


class TurtleError(ValueError):
    pass


def _tokenize(text: str):
    pos = 0
    n = len(text)
    while pos < n:
        if text[pos].isspace():
            pos += 1
            continue
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise TurtleError(f"Cannot tokenize at {text[pos:pos + 40]!r}")
        pos = m.end()
        if m.lastgroup == "comment":
            continue
        yield m
    yield None


class _Parser:
    def __init__(self, text: str):
        self.tokens = list(_tokenize(text))
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.triples: list[tuple[str, str, str]] = []
        self._blank_seed = hashlib.sha1(text.encode()).hexdigest()[:8]
        self._blank_counter = 0

    # -- token helpers ----------------------------------------------------
    def peek(self):
        return self.tokens[self.i]

    def next(self):
        tok = self.tokens[self.i]
        self.i += 1
        return tok

    def expect_punct(self, ch: str):
        tok = self.next()
        if tok is None or tok.lastgroup != "punct" or tok.group("punct") != ch:
            raise TurtleError(f"Expected {ch!r}, got {tok.group(0) if tok else 'EOF'}")

    def _new_blank(self) -> str:
        self._blank_counter += 1
        return T.blank_node(f"b{self._blank_seed}_{self._blank_counter}")

    # -- grammar ----------------------------------------------------------
    def parse(self) -> list[tuple[str, str, str]]:
        while self.peek() is not None:
            tok = self.peek()
            if tok.lastgroup == "kw" and tok.group("kw") == "PREFIX":
                self.next()
                self._parse_prefix(sparql_style=True)
            elif tok.lastgroup == "langtag" and tok.group(0) == "@prefix":
                self.next()
                self._parse_prefix(sparql_style=False)
            else:
                subject = self._parse_term(as_subject=True)
                self._parse_predicate_object_list(subject)
                self.expect_punct(".")
        return self.triples

    def _parse_prefix(self, sparql_style: bool):
        tok = self.next()
        if tok.lastgroup != "local" and tok.group("local") is None:
            raise TurtleError(f"Bad @prefix at {tok.group(0)}")
        prefix = tok.group("pname") or ""
        iri_tok = self.next()
        if iri_tok.lastgroup != "iri":
            raise TurtleError("@prefix needs an IRI")
        self.prefixes[prefix] = iri_tok.group("iri")[1:-1]
        if not sparql_style:
            self.expect_punct(".")

    def _parse_predicate_object_list(self, subject: str):
        while True:
            predicate = self._parse_predicate()
            while True:
                obj = self._parse_term()
                self.triples.append((subject, predicate, obj))
                tok = self.peek()
                if tok is not None and tok.lastgroup == "punct" and tok.group("punct") == ",":
                    self.next()
                    continue
                break
            tok = self.peek()
            if tok is not None and tok.lastgroup == "punct" and tok.group("punct") == ";":
                self.next()
                # allow trailing ';' before ']' or '.'
                nxt = self.peek()
                if nxt is not None and (
                    nxt.lastgroup == "punct" and nxt.group("punct") in "]."
                ):
                    break
                continue
            break

    def _parse_predicate(self) -> str:
        tok = self.next()
        if tok.lastgroup == "kw" and tok.group("kw") == "a":
            return T.RDF_TYPE
        if tok.lastgroup == "iri":
            return tok.group("iri")
        if tok.group("local") is not None:
            return self._resolve_pname(tok)
        raise TurtleError(f"Bad predicate {tok.group(0)}")

    def _resolve_pname(self, tok) -> str:
        prefix = tok.group("pname") or ""
        if prefix not in self.prefixes:
            raise TurtleError(f"Unknown prefix {prefix!r}")
        return T.iri(self.prefixes[prefix] + tok.group("local"))

    def _parse_term(self, as_subject: bool = False) -> str:
        tok = self.next()
        if tok is None:
            raise TurtleError("Unexpected EOF")
        if tok.lastgroup == "iri":
            return tok.group("iri")
        if tok.group("local") is not None and tok.lastgroup in ("local", "pname"):
            return self._resolve_pname(tok)
        if tok.lastgroup in ("string", "longstring"):
            value = (
                tok.group("longstring")[3:-3]
                if tok.lastgroup == "longstring"
                else tok.group("string")[1:-1]
            )
            nxt = self.peek()
            if nxt is not None and nxt.lastgroup == "langtag":
                self.next()
                return T.lang_string(_unescape_turtle(value), nxt.group(0)[1:])
            if nxt is not None and nxt.lastgroup == "dtype":
                self.next()
                dt = self._parse_term()
                return T.typed_literal(_unescape_turtle(value), T.iri_value(dt))
            return T.string_literal(_unescape_turtle(value))
        if tok.lastgroup == "number":
            text = tok.group("number")
            if _NUM_INT_RE.match(text):
                return T.integer_literal(int(text))
            return T.decimal_literal(text)
        if tok.lastgroup == "kw":
            kw = tok.group("kw")
            if kw in ("true", "false"):
                return T.typed_literal(kw, T.XSD_BOOLEAN)
            raise TurtleError(f"Unexpected keyword {kw!r}")
        if tok.lastgroup == "punct":
            ch = tok.group("punct")
            if ch == "[":
                node = self._new_blank()
                nxt = self.peek()
                if not (nxt is not None and nxt.lastgroup == "punct" and nxt.group("punct") == "]"):
                    self._parse_predicate_object_list(node)
                self.expect_punct("]")
                return node
            if ch == "(":
                return self._parse_collection()
        raise TurtleError(f"Bad term {tok.group(0)}")

    def _parse_collection(self) -> str:
        items = []
        while True:
            tok = self.peek()
            if tok is not None and tok.lastgroup == "punct" and tok.group("punct") == ")":
                self.next()
                break
            items.append(self._parse_term())
        head = T.RDF_NIL
        for item in reversed(items):
            node = self._new_blank()
            self.triples.append((node, T.RDF_FIRST, item))
            self.triples.append((node, T.RDF_REST, head))
            head = node
        return head


_TTL_UNESCAPES = {
    "\\\\": "\\", '\\"': '"', "\\n": "\n", "\\r": "\r", "\\t": "\t",
}
_TTL_UNESCAPE_RE = re.compile(r"\\u[0-9a-fA-F]{4}|\\U[0-9a-fA-F]{8}|\\.")


def _unescape_turtle(value: str) -> str:
    def sub(m):
        s = m.group(0)
        if s.startswith("\\u") or s.startswith("\\U"):
            return chr(int(s[2:], 16))
        return _TTL_UNESCAPES.get(s, s[1])

    return _TTL_UNESCAPE_RE.sub(sub, value)


def parse_turtle(text: str) -> list[tuple[str, str, str]]:
    """Parse a Turtle document → list of canonical (s, p, o) strings."""
    return _Parser(text).parse()
