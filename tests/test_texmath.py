"""DOM-free unit tests over the TeX typesetter's HTML-string output
(VERDICT round 1 item 4: math typesetting). The canonical algorithm is
``utils/texmath.py``; the browser runs the line-faithful JS port
``serve/static/tex.js`` whose symbol table must stay byte-identical
(pinned below, since no JS runtime exists in this environment)."""

import json
import os
import re

import pytest

from outline_rag_tpu.utils.texmath import (
    SYMBOLS,
    render_fragment,
    render_math,
)


def test_symbols_and_variables():
    h = render_fragment(r"\alpha + x \leq \infty")
    assert "α" in h and "≤" in h and "∞" in h
    assert '<i class="tex-v">x</i>' in h


def test_superscript_subscript():
    h = render_fragment(r"x^2")
    assert 'class="tex-sup">2' in h
    h = render_fragment(r"a_{ij}^{2k}")
    assert 'class="tex-sub">' in h and 'class="tex-sup">' in h
    # combined: both scripts on one base
    assert h.count("tex-scripts") == 1


def test_fraction_nested():
    h = render_fragment(r"\frac{a+b}{\frac{c}{d}}")
    assert h.count('class="tex-frac"') == 2
    assert 'class="tex-num">' in h and 'class="tex-den">' in h


def test_sqrt_with_index():
    h = render_fragment(r"\sqrt{x}")
    assert "tex-sqrt" in h and "√" in h
    h = render_fragment(r"\sqrt[3]{x+1}")
    assert 'class="tex-root">' in h and "3" in h


def test_text_and_styles():
    h = render_fragment(r"\text{if } x > 0")
    assert '<span class="tex-text">if </span>' in h
    h = render_fragment(r"\mathbf{v} \mathbb{R}")
    assert 'class="tex-bf"' in h and 'class="tex-bb"' in h


def test_accents():
    h = render_fragment(r"\vec{v} \hat{x}")
    assert h.count("tex-accent-mark") == 2


def test_big_operator_with_limits():
    h = render_fragment(r"\sum_{i=0}^{n} x_i")
    assert 'class="tex-op">∑' in h
    # the sum's scripts render in limits (above/below) style
    assert "tex-limits" in h
    # the x_i scripts render in normal side style
    assert "tex-scripts" in h


def test_functions_upright():
    h = render_fragment(r"\sin x + \log y")
    assert 'class="tex-fn">sin' in h and 'class="tex-fn">log' in h


def test_left_right_stretchy():
    h = render_fragment(r"\left( \frac{a}{b} \right)")
    assert h.count("tex-stretchy") == 2
    # \left. is an invisible delimiter
    assert "tex-stretchy" not in render_fragment(r"\left. x \right.")


def test_matrix_environments():
    h = render_fragment(r"\begin{pmatrix} a & b \\ c & d \end{pmatrix}")
    assert h.count("tex-row") == 2
    assert h.count("tex-cell") == 4
    assert "(" in h and ")" in h
    h = render_fragment(r"\begin{cases} x & x>0 \\ -x & x\le 0 \end{cases}")
    assert h.count("tex-row") == 2 and "{" in h


def test_escaping_and_safety():
    # HTML in the TeX source must come out escaped
    h = render_math("<script>alert(1)</script>")
    assert "<script>" not in h
    assert "&lt;" in h and "&gt;" in h
    # unknown commands degrade to visible literals, never raise
    h = render_fragment(r"\notacommand{x}")
    assert "tex-unk" in h and "notacommand" in h


def test_block_vs_inline_wrapper():
    assert render_math("x", block=False).startswith('<span class="tex">')
    assert render_math("x", block=True).startswith('<div class="tex tex-block">')


def test_never_raises_on_garbage():
    for garbage in ("{{{", "}}}", "\\", "^", "_^", "\\frac{", "\\begin{x}",
                    "a & b \\\\ c", "\\left", "$$$", "\x00\x01"):
        out = render_math(garbage)
        assert out.startswith("<")


def test_realistic_formulas():
    # quadratic formula
    h = render_fragment(r"x = \frac{-b \pm \sqrt{b^2 - 4ac}}{2a}")
    assert "±" in h and "tex-frac" in h and "tex-sqrt" in h
    # gaussian integral
    h = render_fragment(
        r"\int_{-\infty}^{\infty} e^{-x^2} \, dx = \sqrt{\pi}"
    )
    assert "∫" in h and "π" in h
    # softmax
    h = render_fragment(
        r"\mathrm{softmax}(z)_i = \frac{e^{z_i}}{\sum_j e^{z_j}}"
    )
    assert "tex-frac" in h and "∑" in h


def test_js_port_symbol_table_in_sync():
    """The JS port must embed the exact same symbol table. The table is
    serialized between SYMBOLS-BEGIN/END markers in tex.js; this test
    compares it byte-for-byte against the canonical Python table."""
    path = os.path.join(
        os.path.dirname(__file__),
        "..",
        "outline_rag_tpu",
        "serve",
        "static",
        "tex.js",
    )
    with open(path) as f:
        src = f.read()
    m = re.search(
        r"/\*SYMBOLS-BEGIN\*/\s*const TEX_SYMBOLS = (\{.*?\});\s*/\*SYMBOLS-END\*/",
        src,
        re.S,
    )
    assert m, "tex.js must carry the SYMBOLS-BEGIN/END block"
    js_table = json.loads(m.group(1))
    assert js_table == SYMBOLS
    # the structural tables too
    for name in ("FUNCTIONS", "BIG_OPS", "ACCENTS", "STYLES", "MATRIX_ENVS"):
        m = re.search(
            rf"/\*{name}-BEGIN\*/\s*const TEX_{name} = (.*?);\s*/\*{name}-END\*/",
            src,
            re.S,
        )
        assert m, f"tex.js must carry the {name} block"
        import outline_rag_tpu.utils.texmath as tm

        py_val = getattr(tm, name)
        js_val = json.loads(m.group(1))
        if isinstance(py_val, (set, frozenset)):
            assert set(js_val) == py_val, name
        elif name == "MATRIX_ENVS":
            assert {k: tuple(v) for k, v in js_val.items()} == py_val, name
        else:
            assert js_val == py_val, name


def test_matrix_rows_with_escaped_braces():
    """\\{ and \\} inside a cases/matrix body must not skew the brace
    depth that guards \\\\ row splitting (set-builder notation)."""
    from outline_rag_tpu.utils.texmath import _split_rows, render_math

    rows = _split_rows(r"\{a\} & x \\ b & y")
    assert rows == [r"\{a\} & x ", "b & y"]
    html = render_math(r"\begin{cases} \{a\} & x \\ b & y \end{cases}")
    assert html.count('class="tex-row"') == 2


def test_operatorname_and_mathrm_render_upright_raw():
    """\\operatorname/\\mathrm bodies are raw upright text — per-letter
    .tex-v italic spans would override the parent tex-text class (the
    STYLES entry used to shadow the raw branch)."""
    h = render_math(r"\operatorname{argmax}")
    assert 'class="tex-text">argmax<' in h
    assert "tex-v" not in h
    h2 = render_math(r"\mathrm{softmax}")
    assert 'class="tex-text">softmax<' in h2
    assert "tex-v" not in h2


def test_nested_environments_keep_their_rows():
    """A pmatrix nested in a cases cell owns its \\\\ and & separators:
    the outer environment must see ONE cell, not a row cut mid-matrix.
    Same-name nesting must close on the MATCHING \\end."""
    h = render_math(
        r"\begin{cases} x & \begin{pmatrix} a \\ b \end{pmatrix}"
        r" \\ y & z \end{cases}"
    )
    # inner pmatrix intact: parenthesis delimiters and two rows inside
    assert h.count('tex-table') == 2
    assert "tex-unk" not in h  # no stray \end degraded to unknown
    # same-name nesting
    h2 = render_math(
        r"\begin{pmatrix} \begin{pmatrix} a \end{pmatrix} & b \end{pmatrix}"
    )
    assert h2.count("tex-table") == 2 and "tex-unk" not in h2


def test_js_port_behavioral_parity_via_jsrt():
    """Execute the SHIPPED tex.js under the first-party interpreter and
    compare its HTML output with the canonical Python renderer across
    representative formulas — behavior sync, not just table sync."""
    import sys
    from pathlib import Path

    sys.path.insert(
        0, str(Path(__file__).resolve().parent.parent / "tools")
    )
    from jsrt import Interpreter
    from jsrt.builtins import js_to_py

    src = (
        Path(__file__).resolve().parent.parent
        / "outline_rag_tpu" / "serve" / "static" / "tex.js"
    ).read_text()
    interp = Interpreter()
    interp.run(src)
    formulas = [
        r"E = mc^2",
        r"\frac{a+b}{c_1^2}",
        r"\operatorname{argmax}_x f(x)",
        r"\mathrm{d}x",
        r"\sqrt[3]{x+1}",
        r"\sum_{i=0}^{n} i^2",
        r"\begin{pmatrix} a & b \\ c & d \end{pmatrix}",
        r"\begin{cases} x & \begin{pmatrix} a \\ b \end{pmatrix} \\ y & z \end{cases}",
        r"\text{if } x > 0",
        r"\hat{y} \approx \alpha \cdot \beta",
    ]
    for f in formulas:
        js = js_to_py(
            interp.call_any(interp.globals.lookup("texToHtml"), None, [f, False])
        )
        assert js == render_math(f), f
