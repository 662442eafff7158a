"""Structural linter for the first-party frontend JS.

No JavaScript engine of any kind exists in this environment (no node /
deno / quickjs, no embeddable Python JS interpreter, no browser), so the
frontend cannot be *executed* in CI. This is the honest next-best thing:
a small ES-aware lexer that strips strings, template literals (with
nested ``${}`` expressions), comments, and regex literals, then checks
bracket/paren/brace balance and unterminated-literal errors over the
remaining code. It catches the breakage classes that actually happen
when editing vanilla JS by hand — an unclosed brace/paren/backtick, a
string swallowing the rest of the file, a comment eating code — which
string-level contract tests cannot see.

Usage: ``python tools/jslint.py file.js ...`` or import ``lint_js``.
"""

from __future__ import annotations

import sys

# a `/` starts a regex literal (not division) when the previous
# significant token cannot end an expression
_REGEX_PREV_CHARS = set("([{,;=:!&|?+-*%~^<>")
_REGEX_PREV_WORDS = {
    "return", "typeof", "case", "in", "of", "new", "delete", "void",
    "instanceof", "do", "else", "yield", "await", "throw",
}

_OPEN = {"(": ")", "[": "]", "{": "}"}
_CLOSE = {")": "(", "]": "[", "}": "{"}


class _Frame:
    __slots__ = ("kind", "base", "line")

    def __init__(self, kind: str, base: int, line: int):
        self.kind = kind  # "code" (top or ${}-expression) or "tpl"
        self.base = base  # bracket-stack depth at frame entry
        self.line = line


def lint_js(src: str, name: str = "<js>") -> list[str]:
    """Return a list of structural errors (empty = clean)."""
    errors: list[str] = []
    stack: list[tuple[str, int]] = []  # (bracket char, line)
    frames: list[_Frame] = [_Frame("code", 0, 1)]
    line = 1
    prev_sig = ""  # last significant char seen in code
    prev_word = ""  # last completed identifier/keyword
    word = ""
    i, n = 0, len(src)

    def flush_word() -> None:
        nonlocal word, prev_word
        if word:
            prev_word, word = word, ""

    def at_regex_position() -> bool:
        if prev_sig == "" or prev_sig in _REGEX_PREV_CHARS:
            return True
        if prev_sig.isalnum() or prev_sig in "_$":
            # identifier/number just ended: division, unless a keyword
            current = word or prev_word
            return current in _REGEX_PREV_WORDS
        return False

    while i < n:
        c = src[i]
        if c == "\n":
            line += 1
        frame = frames[-1]

        if frame.kind == "tpl":
            if c == "\\":
                i += 2
                continue
            if c == "`":
                frames.pop()
                prev_sig = "`"
                i += 1
                continue
            if c == "$" and i + 1 < n and src[i + 1] == "{":
                stack.append(("{", line))
                frames.append(_Frame("code", len(stack), line))
                prev_sig = "{"
                i += 2
                continue
            i += 1
            continue

        # ---- code ------------------------------------------------------
        if c in " \t\r\n":
            flush_word()
            i += 1
            continue
        if c == "/" and i + 1 < n and src[i + 1] == "/":
            flush_word()
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if c == "/" and i + 1 < n and src[i + 1] == "*":
            flush_word()
            j = src.find("*/", i + 2)
            if j < 0:
                errors.append(f"{name}:{line}: unterminated block comment")
                break
            line += src.count("\n", i, j)
            i = j + 2
            continue
        if c in "'\"":
            flush_word()
            start = line
            j = i + 1
            closed = False
            while j < n:
                if src[j] == "\\":
                    j += 2
                    continue
                if src[j] == "\n" or src[j] == c:
                    closed = src[j] == c
                    break
                j += 1
            if not closed:
                errors.append(f"{name}:{start}: unterminated string")
                if j < n and src[j] == "\n":
                    line += 1
                    i = j + 1
                    continue
                break
            i = j + 1
            prev_sig = c
            continue
        if c == "`":
            flush_word()
            frames.append(_Frame("tpl", len(stack), line))
            i += 1
            continue
        if c == "/" and at_regex_position():
            flush_word()
            start = line
            j = i + 1
            in_class = False
            closed = False
            while j < n:
                ch = src[j]
                if ch == "\\":
                    j += 2
                    continue
                if ch == "\n":
                    break
                if ch == "[":
                    in_class = True
                elif ch == "]":
                    in_class = False
                elif ch == "/" and not in_class:
                    closed = True
                    break
                j += 1
            if not closed:
                errors.append(f"{name}:{start}: unterminated regex")
                i += 1
                continue
            j += 1
            while j < n and src[j].isalpha():
                j += 1
            i = j
            prev_sig = "/"
            continue
        if c in _OPEN:
            flush_word()
            stack.append((c, line))
            prev_sig = c
            i += 1
            continue
        if c in _CLOSE:
            flush_word()
            if not stack or len(stack) < frame.base:
                errors.append(f"{name}:{line}: unmatched '{c}'")
            elif stack[-1][0] != _CLOSE[c]:
                o, ol = stack[-1]
                errors.append(
                    f"{name}:{line}: '{c}' closes '{o}' opened at line {ol}"
                )
                stack.pop()
            else:
                stack.pop()
                if (
                    c == "}"
                    and frame.kind == "code"
                    and len(frames) > 1
                    and len(stack) == frame.base - 1
                ):
                    frames.pop()  # end of a ${...} template expression
            prev_sig = c
            i += 1
            continue
        if c.isalnum() or c in "_$":
            word += c
            prev_sig = c
            i += 1
            continue
        flush_word()
        prev_sig = c
        i += 1

    for b, ln in stack:
        errors.append(f"{name}:{ln}: '{b}' opened here is never closed")
    for f in frames[1:]:
        if f.kind == "tpl":
            errors.append(
                f"{name}:{f.line}: template literal is never closed"
            )
    return errors


def main(argv: list[str]) -> int:
    bad = 0
    for path in argv:
        with open(path) as f:
            errs = lint_js(f.read(), path)
        for e in errs:
            print(e)
        bad += len(errs)
        if not errs:
            print(f"{path}: ok")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
