"""Build-time asset minifier.

Inventory parity with the reference's Flask-Assets jsmin/cssmin bundle step
(reference ``app/app.py:18-33``, run at ``Dockerfile:46``): produces
``script.min.js`` and ``style.min.css`` next to the sources. The minifier
is deliberately conservative (comment stripping + whitespace collapse
outside string/template literals) — correctness over ratio.

Usage: ``python tools/build_assets.py``
"""

from __future__ import annotations

import os
import re
import sys

STATIC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "outline_rag_tpu",
    "serve",
    "static",
)


def minify_css(css: str) -> str:
    css = re.sub(r"/\*.*?\*/", "", css, flags=re.S)
    css = re.sub(r"\s+", " ", css)
    css = re.sub(r"\s*([{}:;,>])\s*", r"\1", css)
    css = css.replace(";}", "}")
    return css.strip()


def minify_js(js: str) -> str:
    """Strip comments and blank space while respecting strings, template
    literals and regex-free line structure. Keeps newlines between
    statements (no ASI hazards)."""
    out: list[str] = []
    i, n = 0, len(js)
    while i < n:
        c = js[i]
        if c in "\"'`":
            quote = c
            j = i + 1
            while j < n:
                if js[j] == "\\":
                    j += 2
                    continue
                if js[j] == quote:
                    j += 1
                    break
                j += 1
            out.append(js[i:j])
            i = j
            continue
        if c == "/" and i + 1 < n and js[i + 1] == "/":
            while i < n and js[i] != "\n":
                i += 1
            continue
        if c == "/" and i + 1 < n and js[i + 1] == "*":
            j = js.find("*/", i + 2)
            i = n if j < 0 else j + 2
            continue
        out.append(c)
        i += 1
    text = "".join(out)
    lines = [line.strip() for line in text.splitlines()]
    return "\n".join(line for line in lines if line)


JS_BUNDLE = ("tex.js", "app.js")  # load order matters: app.js calls texToHtml


def main() -> int:
    built = []
    css_path = os.path.join(STATIC, "style.css")
    sources = [
        os.path.join(STATIC, name)
        for name in JS_BUNDLE
        if os.path.exists(os.path.join(STATIC, name))
    ]
    if sources:
        parts = []
        for path in sources:
            with open(path) as f:
                parts.append(minify_js(f.read()))
        with open(os.path.join(STATIC, "script.min.js"), "w") as f:
            f.write("\n".join(parts))
        built.append("script.min.js")
    if os.path.exists(css_path):
        with open(css_path) as f:
            src = f.read()
        with open(os.path.join(STATIC, "style.min.css"), "w") as f:
            f.write(minify_css(src))
        built.append("style.min.css")
    print(f"built: {', '.join(built) or 'nothing'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
