"""Tokenizer for the jsrt ES2020 subset.

Handles the lexical layer the structural linter (tools/jslint.py)
already understands — strings, template literals with nested ``${}``,
comments, and the regex-vs-division ambiguity (a ``/`` starts a regex
when the previous significant token cannot end an expression) — but
produces a real token stream instead of only checking balance.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

PUNCTUATORS = [
    ">>>=", "...", "===", "!==", "**=", "<<=", ">>=", ">>>", "&&=", "||=",
    "??=", "=>", "++", "--", "**", "==", "!=", "<=", ">=", "&&", "||", "??",
    "?.", "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=", "<<", ">>",
    "{", "}", "(", ")", "[", "]", ";", ",", "<", ">", "+", "-", "*", "/",
    "%", "&", "|", "^", "!", "~", "?", ":", "=", ".",
]

# previous-token classes after which a `/` must be a regex literal
_REGEX_AFTER_PUNCT = {
    p for p in PUNCTUATORS if p not in (")", "]", "}", "++", "--")
}
_REGEX_AFTER_WORDS = {
    "return", "typeof", "case", "in", "of", "new", "delete", "void",
    "instanceof", "do", "else", "yield", "await", "throw",
}

_ESCAPES = {
    "n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f", "v": "\v",
    "0": "\0", "\n": "",
}


@dataclass
class Token:
    type: str   # num str name punct regex template eof
    value: object
    line: int
    nl_before: bool = False  # a newline separates this token from the last
    # template tokens carry structure:
    quasis: list = field(default_factory=list)
    exprs: list = field(default_factory=list)  # list[list[Token]]

    def __repr__(self):  # pragma: no cover - debugging aid
        return f"Token({self.type},{self.value!r},l{self.line})"


class LexError(SyntaxError):
    pass


class Lexer:
    def __init__(self, src: str, name: str = "<js>", line: int = 1):
        self.src = src
        self.name = name
        self.i = 0
        self.n = len(src)
        self.line = line
        self.prev: Optional[Token] = None
        self.nl_pending = False

    def error(self, msg: str) -> LexError:
        return LexError(f"{self.name}:{self.line}: {msg}")

    # ---- helpers -------------------------------------------------------

    def _peek(self, off: int = 0) -> str:
        j = self.i + off
        return self.src[j] if j < self.n else ""

    def _skip_ws(self) -> None:
        while self.i < self.n:
            c = self.src[self.i]
            if c == "\n":
                self.line += 1
                self.nl_pending = True
                self.i += 1
            elif c in " \t\r\f\v":
                self.i += 1
            elif c == "/" and self._peek(1) == "/":
                j = self.src.find("\n", self.i)
                self.i = self.n if j < 0 else j
            elif c == "/" and self._peek(1) == "*":
                j = self.src.find("*/", self.i + 2)
                if j < 0:
                    raise self.error("unterminated block comment")
                self.line += self.src.count("\n", self.i, j)
                self.i = j + 2
            else:
                return

    def _at_regex_position(self) -> bool:
        t = self.prev
        if t is None:
            return True
        if t.type == "punct":
            return t.value in _REGEX_AFTER_PUNCT
        if t.type == "name":
            return t.value in _REGEX_AFTER_WORDS
        return False  # num/str/regex/template end an expression

    # ---- scanners ------------------------------------------------------

    def _string(self) -> Token:
        quote = self.src[self.i]
        start = self.line
        self.i += 1
        out = []
        while self.i < self.n:
            c = self.src[self.i]
            if c == "\\":
                out.append(self._escape())
                continue
            if c == "\n":
                raise self.error("unterminated string")
            self.i += 1
            if c == quote:
                return Token("str", "".join(out), start)
            out.append(c)
        raise LexError(f"{self.name}:{start}: unterminated string")

    def _escape(self) -> str:
        # positioned at the backslash
        self.i += 1
        c = self._peek()
        self.i += 1
        if c == "x":
            h = self.src[self.i:self.i + 2]
            self.i += 2
            return chr(int(h, 16))
        if c == "u":
            if self._peek() == "{":
                j = self.src.find("}", self.i)
                if j < 0:
                    raise self.error("bad \\u{} escape")
                cp = int(self.src[self.i + 1:j], 16)
                self.i = j + 1
                return chr(cp)
            h = self.src[self.i:self.i + 4]
            self.i += 4
            return chr(int(h, 16))
        if c == "\n":
            self.line += 1
            return ""
        return _ESCAPES.get(c, c)

    def _template(self) -> Token:
        start = self.line
        self.i += 1  # past `
        quasis, exprs = [], []
        cur = []
        while True:
            if self.i >= self.n:
                raise LexError(f"{self.name}:{start}: unterminated template")
            c = self.src[self.i]
            if c == "\\":
                cur.append(self._escape())
                continue
            if c == "`":
                self.i += 1
                quasis.append("".join(cur))
                return Token("template", None, start, quasis=quasis, exprs=exprs)
            if c == "$" and self._peek(1) == "{":
                quasis.append("".join(cur))
                cur = []
                self.i += 2
                exprs.append(self._template_expr())
                continue
            if c == "\n":
                self.line += 1
            cur.append(c)
            self.i += 1

    def _template_expr(self) -> list:
        """Tokenize until the `}` matching the `${` we just consumed."""
        toks = []
        depth = 0
        saved_prev = self.prev
        self.prev = None
        while True:
            tok = self._next_raw()
            if tok.type == "eof":
                raise self.error("unterminated ${} in template")
            if tok.type == "punct" and tok.value == "{":
                depth += 1
            elif tok.type == "punct" and tok.value == "}":
                if depth == 0:
                    self.prev = saved_prev
                    toks.append(Token("eof", None, self.line))
                    return toks
                depth -= 1
            toks.append(tok)

    def _regex(self) -> Token:
        start = self.line
        j = self.i + 1
        in_class = False
        while j < self.n:
            c = self.src[j]
            if c == "\\":
                j += 2
                continue
            if c == "\n":
                raise self.error("unterminated regex")
            if c == "[":
                in_class = True
            elif c == "]":
                in_class = False
            elif c == "/" and not in_class:
                break
            j += 1
        else:
            raise self.error("unterminated regex")
        pattern = self.src[self.i + 1:j]
        j += 1
        f0 = j
        while j < self.n and (self.src[j].isalpha()):
            j += 1
        flags = self.src[f0:j]
        self.i = j
        return Token("regex", (pattern, flags), start)

    def _number(self) -> Token:
        j = self.i
        src = self.src
        if src[j] == "0" and j + 1 < self.n and src[j + 1] in "xX":
            j += 2
            while j < self.n and src[j] in "0123456789abcdefABCDEF_":
                j += 1
            val = int(src[self.i + 2:j].replace("_", ""), 16)
            self.i = j
            return Token("num", float(val), self.line)
        if src[j] == "0" and j + 1 < self.n and src[j + 1] in "bB":
            j += 2
            while j < self.n and src[j] in "01_":
                j += 1
            val = int(src[self.i + 2:j].replace("_", ""), 2)
            self.i = j
            return Token("num", float(val), self.line)
        while j < self.n and (src[j].isdigit() or src[j] == "_"):
            j += 1
        if j < self.n and src[j] == ".":
            j += 1
            while j < self.n and (src[j].isdigit() or src[j] == "_"):
                j += 1
        if j < self.n and src[j] in "eE":
            k = j + 1
            if k < self.n and src[k] in "+-":
                k += 1
            if k < self.n and src[k].isdigit():
                j = k
                while j < self.n and src[j].isdigit():
                    j += 1
        text = src[self.i:j].replace("_", "")
        self.i = j
        return Token("num", float(text), self.line)

    # ---- main ----------------------------------------------------------

    def _next_raw(self) -> Token:
        self._skip_ws()
        nl = self.nl_pending
        self.nl_pending = False
        if self.i >= self.n:
            return Token("eof", None, self.line, nl_before=nl)
        c = self.src[self.i]
        if c in "'\"":
            tok = self._string()
        elif c == "`":
            tok = self._template()
        elif c.isdigit() or (c == "." and self._peek(1).isdigit()):
            tok = self._number()
        elif c.isalpha() or c in "_$":
            j = self.i
            while j < self.n and (self.src[j].isalnum() or self.src[j] in "_$"):
                j += 1
            tok = Token("name", self.src[self.i:j], self.line)
            self.i = j
        elif c == "/" and self._at_regex_position():
            tok = self._regex()
        else:
            for p in PUNCTUATORS:
                if self.src.startswith(p, self.i):
                    # `?.3` would be ternary-then-number; not in our subset
                    self.i += len(p)
                    tok = Token("punct", p, self.line)
                    break
            else:
                raise self.error(f"unexpected character {c!r}")
        tok.nl_before = nl
        self.prev = tok
        return tok

    def tokens(self) -> list:
        out = []
        while True:
            t = self._next_raw()
            out.append(t)
            if t.type == "eof":
                return out


def tokenize(src: str, name: str = "<js>") -> list:
    return Lexer(src, name).tokens()
