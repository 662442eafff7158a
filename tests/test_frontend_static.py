"""Static-integrity harness for the frontend (app.js / tex.js / html).

These string-level checks complement the execution harness: the shipped
frontend now actually RUNS in CI under tools/jsrt (a first-party JS
interpreter + DOM stub; see test_frontend_dom.py / test_jsrt.py). What
remains here are the cross-file contracts that are cheaper to pin
statically:

- a structural lint (``tools/jslint.py``): ES-aware lexing of strings /
  template literals / regexes / comments, then bracket balance — the
  breakage classes hand-edited vanilla JS actually hits;
- cross-file contracts: every DOM id the JS queries exists in
  ``index.html`` (or is created dynamically), every API path the JS
  calls resolves to a registered server route, and the tex.js <-> app.js
  typesetter seam lines up.

The *behavior* of the markdown/TeX pipeline is pinned separately by the
Python-canonical tests (``test_texmath.py``) against the same algorithm.
"""

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from jslint import lint_js  # noqa: E402

STATIC = Path(__file__).resolve().parent.parent / "outline_rag_tpu/serve/static"
APP_JS = (STATIC / "app.js").read_text()
TEX_JS = (STATIC / "tex.js").read_text()
HTML = (STATIC / "index.html").read_text()


# ---------------------------------------------------------------------------
# the linter itself must catch real breakage (it guards everything else)
# ---------------------------------------------------------------------------


def test_jslint_accepts_tricky_valid_js():
    ok = r"""
    "use strict";
    const re = /[/{(]+\d/g;                 // regex with brackets inside
    const s = "a } { \" ) string";
    const t = `template ${ {a: [1, (2)]}.a[0] } and ${x ? `${y}` : "z"}`;
    function f(a = {b: 1}) { return a / 2 / 3; }  /* division, not regex */
    const div = x / y / z;
    if (a) { b(); } else { c(); }
    const m = str.replace(/\}/g, ")");
    """
    assert lint_js(ok) == []


def test_jslint_catches_breakage_classes():
    assert lint_js("function f() { if (x) { y(); }")  # unclosed brace
    assert lint_js("const a = (1 + [2, 3);")  # mismatched pair
    assert lint_js('const s = "unterminated\nnext();')  # string eats line
    assert lint_js("const t = `never closed ${x}")  # template
    assert lint_js("/* comment never ends\ncode();")
    assert lint_js("const r = /unclosed[;\n")


def test_frontend_js_is_structurally_clean():
    for name, src in (("app.js", APP_JS), ("tex.js", TEX_JS)):
        assert lint_js(src, name) == [], f"{name} failed structural lint"


def test_bundled_assets_are_clean_too():
    if not (STATIC / "script.min.js").exists():
        # the min bundles are gitignored build artifacts — regenerate on
        # a fresh checkout instead of failing on a missing file
        import build_assets

        build_assets.main()
    bundle = (STATIC / "script.min.js").read_text()
    assert lint_js(bundle, "script.min.js") == []


# ---------------------------------------------------------------------------
# DOM contract: every id the JS queries exists (or is created dynamically)
# ---------------------------------------------------------------------------

# ids the JS creates at runtime before querying
DYNAMIC_IDS = {"toasts"}


def test_every_queried_dom_id_exists_in_html():
    queried = set(re.findall(r"""\$\(["']#([A-Za-z0-9_-]+)["']\)""", APP_JS))
    queried |= set(
        re.findall(r"""getElementById\(["']([A-Za-z0-9_-]+)["']\)""", APP_JS)
    )
    assert queried, "expected the app to query DOM ids"
    declared = set(re.findall(r"""id=["']([A-Za-z0-9_-]+)["']""", HTML))
    missing = queried - declared - DYNAMIC_IDS
    assert not missing, f"app.js queries ids missing from index.html: {missing}"


def test_static_assets_referenced_by_html_exist():
    for ref in re.findall(r"/chat/static/([A-Za-z0-9_./-]+)", HTML):
        assert (STATIC / ref).exists(), f"index.html references missing {ref}"


# ---------------------------------------------------------------------------
# API contract: every path the JS fetches is a registered server route
# ---------------------------------------------------------------------------


def _server_routes() -> set[str]:
    app_py = (
        Path(__file__).resolve().parent.parent / "outline_rag_tpu/serve/app.py"
    ).read_text()
    routes = set()
    for m in re.finditer(
        r"""@app\.(get|post|put|delete)\(\s*(?:prefix\s*\+\s*)?["']([^"']+)["']""",
        app_py,
    ):
        routes.add(m.group(2))
    return routes


def test_every_js_api_call_has_a_server_route():
    routes = _server_routes()
    assert routes, "route extraction found nothing — update the regex"

    def resolves(path: str) -> bool:
        for r in routes:
            pat = re.sub(r"\{[^}]+\}", "[^/]+", r)
            if re.fullmatch(pat, path) or re.fullmatch(pat, "/api" + path):
                return True
        return False

    # api("...") calls resolve under /api; template-literal args have the
    # ${...} segment as a path parameter
    calls = set()
    import posixpath

    for m in re.finditer(r"""api\(\s*["'`](/[^"'`]*)["'`]""", APP_JS):
        p = re.sub(r"\$\{[^}]*\}", "X", m.group(1))
        # the browser resolves api("/../update/all") against /chat/api
        calls.add(posixpath.normpath("/api" + p))
    # raw fetch(API + "/x") calls
    for m in re.finditer(r"""fetch\(API \+ ["'](/[^"']*)["']""", APP_JS):
        calls.add("/api" + m.group(1))
    assert calls, "expected api() call sites"
    unresolved = {c for c in calls if not resolves(c)}
    assert not unresolved, f"JS calls with no matching route: {unresolved}"


# ---------------------------------------------------------------------------
# typesetter seam: tex.js provides what app.js guards for
# ---------------------------------------------------------------------------


def test_texjs_exports_what_appjs_uses():
    assert re.search(r"function texToHtml\s*\(", TEX_JS)
    assert 'typeof texToHtml === "function"' in APP_JS
    # app.js loads tex.js first so the guard can see it
    order = [m.group(1) for m in re.finditer(r'src="/chat/static/(\w+\.js)"', HTML)]
    assert order.index("tex.js") < order.index("app.js")


def test_model_icon_and_favicon_wired():
    assert (STATIC / "favicon.svg").exists()
    assert 'rel="icon"' in HTML
    assert "function modelIcon" in APP_JS
    assert "model-icon" in HTML  # topbar badge element
