"""Asset minifier sanity (tools/build_assets.py; reference app/app.py bundle
step equivalent)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from build_assets import minify_css, minify_js  # noqa: E402


def test_css_minify_preserves_rules():
    css = "/* c */\nbody {\n  color: red;\n  margin: 0;\n}\na:hover { color: blue }"
    out = minify_css(css)
    assert "/*" not in out
    assert "body{color:red;margin:0}" in out
    assert out.count("{") == out.count("}")


def test_js_minify_preserves_strings_and_structure():
    js = (
        "// comment\n"
        "const s = \"a // not comment\"; /* block */\n"
        "const t = `tpl ${x} /* keep */`;\n"
        "function f() {\n  return s + t;\n}\n"
    )
    out = minify_js(js)
    assert "// comment" not in out
    assert "block" not in out.replace("not comment", "")
    assert '"a // not comment"' in out
    assert "`tpl ${x} /* keep */`" in out
    assert out.count("{") == out.count("}")


def test_real_assets_minify():
    static = os.path.join(
        os.path.dirname(__file__), "..", "outline_rag_tpu", "serve", "static"
    )
    with open(os.path.join(static, "app.js")) as f:
        js = f.read()
    out = minify_js(js)
    assert len(out) < len(js)
    # the minifier must not eat brackets; raw counts can be legitimately
    # unbalanced as text (regex char classes like [^)\s]), so compare the
    # input/output imbalance instead of asserting absolute balance
    assert out.count("{") - out.count("}") == js.count("{") - js.count("}")
    assert out.count("(") - out.count(")") == js.count("(") - js.count(")")
    with open(os.path.join(static, "style.css")) as f:
        css = f.read()
    outc = minify_css(css)
    assert len(outc) < len(css)
    assert outc.count("{") == outc.count("}")
