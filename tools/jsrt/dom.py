"""Browser-environment stub for executing the shipped frontend in CI.

``Browser`` parses the real ``index.html`` (stdlib HTMLParser) into a
live element tree, installs ``document`` / ``window`` / ``fetch`` /
``localStorage`` / timers into a jsrt Interpreter, executes the page's
``<script src>`` tags in order (tex.js, app.js — the actual shipped
files), and fires ``DOMContentLoaded``. Tests then drive flows exactly
like a user: ``browser.click("#send")``, ``browser.type_text(...)``,
push SSE frames into an in-flight fetch, and assert on serialized DOM.

Network is a host callback: ``browser.on_fetch = fn(url, opts) ->
FakeResponse`` — tests wire it to canned JSON or SSE streams (or to the
real dev server via httpx if they want an end-to-end run).
"""

from __future__ import annotations

import html as _pyhtml
import re as _pyre
from html.parser import HTMLParser

from .interp import (
    UNDEF, HostObject, Interpreter, JSArray, JSException, JSHost, JSObject,
    JSPromise, js_to_number, js_to_string, js_truthy,
)
from .builtins import js_to_py

_VOID_TAGS = {"br", "hr", "img", "input", "meta", "link", "source", "wbr"}

_BOOL_PROPS = {"hidden", "open", "disabled", "checked", "required"}


class Node:
    """Marker base for tree entries; raw HTML + text are plain wrappers."""


class Text(Node):
    def __init__(self, s):
        self.s = s


class Raw(Node):
    """An innerHTML / insertAdjacentHTML fragment kept as a string."""

    def __init__(self, s):
        self.s = s


class Element(HostObject, Node):
    def __init__(self, browser, tag):
        super().__init__()
        self.browser = browser
        self.tag = tag.lower()
        self.attrs = {}
        self.children = []  # Element | Text | Raw
        self.parent = None
        self.listeners = {}  # type -> [fn]
        self.dataset = _DataSet(self)
        self.style = JSObject()
        self._class_list = None

    # ---- tree helpers (Python side) --------------------------------------

    def walk(self):
        yield self
        for c in self.children:
            if isinstance(c, Element):
                yield from c.walk()

    def detach(self):
        if self.parent is not None:
            self.parent.children = [
                c for c in self.parent.children if c is not self
            ]
            self.parent = None

    def adopt(self, child, before=None):
        if isinstance(child, Element):
            child.detach()
            child.parent = self
        if before is None:
            self.children.append(child)
        else:
            idx = next(
                (i for i, c in enumerate(self.children) if c is before),
                len(self.children),
            )
            self.children.insert(idx, child)

    def classes(self):
        return [c for c in self.attrs.get("class", "").split() if c]

    def matches_simple(self, sel: str) -> bool:
        # compound simple selector: tag#id.class1.class2
        if any(c in sel for c in "[>:+~"):
            # fail LOUDLY on combinators/attribute/pseudo selectors the
            # engine doesn't implement — silently matching nothing makes
            # a test misattribute the miss to the frontend
            raise ValueError(
                f"jsrt selector engine does not support {sel!r} "
                "(tag/#id/.class compounds + descendant only)"
            )
        for part in _pyre.findall(r"[#.]?[^#.]+", sel):
            if part.startswith("#"):
                if self.attrs.get("id") != part[1:]:
                    return False
            elif part.startswith("."):
                if part[1:] not in self.classes():
                    return False
            elif part != "*" and self.tag != part.lower():
                return False
        return True

    def query(self, selector: str):
        parts = selector.strip().split()
        for el in self.walk():
            if el is self:
                continue
            if el.matches_simple(parts[-1]):
                # ancestors must match the earlier parts in order
                anc = el.parent
                need = len(parts) - 2
                while need >= 0 and anc is not None and anc is not self:
                    if anc.matches_simple(parts[need]):
                        need -= 1
                    anc = anc.parent
                if need < 0 or len(parts) == 1:
                    return el
        return None

    def query_all(self, selector: str):
        parts = selector.strip().split()
        out = []
        for el in self.walk():
            if el is self:
                continue
            if el.matches_simple(parts[-1]):
                anc = el.parent
                need = len(parts) - 2
                while need >= 0 and anc is not None and anc is not self:
                    if anc.matches_simple(parts[need]):
                        need -= 1
                    anc = anc.parent
                if need < 0 or len(parts) == 1:
                    out.append(el)
        return out

    def text(self) -> str:
        out = []
        for c in self.children:
            if isinstance(c, Text):
                out.append(c.s)
            elif isinstance(c, Raw):
                out.append(_pyhtml.unescape(_pyre.sub(r"<[^>]*>", "", c.s)))
            else:
                out.append(c.text())
        return "".join(out)

    def serialize(self) -> str:
        attrs = "".join(
            f' {k}="{_pyhtml.escape(str(v), quote=True)}"'
            for k, v in self.attrs.items()
            if v is not None and not (k in _BOOL_PROPS and not v)
        )
        inner = self.inner_html()
        if self.tag in _VOID_TAGS:
            return f"<{self.tag}{attrs}/>"
        return f"<{self.tag}{attrs}>{inner}</{self.tag}>"

    def inner_html(self) -> str:
        out = []
        for c in self.children:
            if isinstance(c, Text):
                out.append(_pyhtml.escape(c.s, quote=False))
            elif isinstance(c, Raw):
                out.append(c.s)
            else:
                out.append(c.serialize())
        return "".join(out)

    # ---- JS-visible surface ------------------------------------------------

    def js_get(self, name, interp):
        b = self.browser
        if name == "tagName":
            return self.tag.upper()
        if name == "id":
            return self.attrs.get("id", "")
        if name == "className":
            return self.attrs.get("class", "")
        if name == "classList":
            return self._classlist()
        if name == "dataset":
            return self.dataset
        if name == "style":
            return self.style
        if name == "textContent":
            return self.text()
        if name == "innerHTML":
            return self.inner_html()
        if name == "outerHTML":
            return self.serialize()
        if name == "value":
            if "value" in self.props:
                return self.props["value"]
            if self.tag == "select":
                # a real <select> defaults to its first option
                opt = self.query("option")
                if opt is not None:
                    v = opt.props.get("value", opt.attrs.get("value"))
                    return v if v is not None else opt.text()
            return self.attrs.get("value", "")
        if name == "parentNode" or name == "parentElement":
            return self.parent if self.parent is not None else None
        if name == "children":
            return JSArray([c for c in self.children
                            if isinstance(c, Element)])
        if name == "firstChild":
            return self.children[0] if self.children and isinstance(
                self.children[0], Element) else None
        if name == "scrollHeight":
            return self.props.get("scrollHeight", 100.0)
        if name == "scrollTop":
            return self.props.get("scrollTop", 0.0)
        if name in _BOOL_PROPS:
            if name in self.props:
                return self.props[name]
            return self.attrs.get(name) is not None and \
                self.attrs.get(name) is not False
        if name == "files":
            return self.props.get("files", JSArray([]))
        if name in ("title", "placeholder", "href", "src", "alt", "type",
                    "name"):
            return self.props.get(name, self.attrs.get(name, ""))
        if name in _ELEMENT_METHODS:
            fn = _ELEMENT_METHODS[name]
            return JSHost(name, lambda i, t, a, s=self, f=fn: f(s, i, a))
        return self.props.get(name, UNDEF)

    def js_set(self, name, value, interp):
        if name == "textContent":
            self.children = [Text(js_to_string(value))]
            return
        if name == "innerHTML":
            s = js_to_string(value)
            self.children = []
            for n in _parse_fragment(self.browser, s):
                self.adopt(n)
            return
        if name == "className":
            self.attrs["class"] = js_to_string(value)
            return
        if name == "id":
            self.attrs["id"] = js_to_string(value)
            return
        if name in ("title", "placeholder", "href", "src", "alt", "type",
                    "name"):
            self.props[name] = js_to_string(value)
            return
        if name in _BOOL_PROPS:
            self.props[name] = js_truthy(value)
            return
        self.props[name] = value

    def _classlist(self):
        if self._class_list is None:
            self._class_list = _ClassList(self)
        return self._class_list

    def __repr__(self):
        ident = self.attrs.get("id")
        return f"<Element {self.tag}{'#' + ident if ident else ''}>"


class _DataSet(HostObject):
    """el.dataset.fooBar ⇄ the data-foo-bar attribute, like a real DOM."""

    def __init__(self, el):
        super().__init__()
        self.el = el

    @staticmethod
    def _attr(name):
        return "data-" + _pyre.sub(r"([A-Z])", r"-\1", name).lower()

    def js_get(self, name, interp):
        v = self.el.attrs.get(self._attr(name))
        return v if v is not None else UNDEF

    def js_set(self, name, value, interp):
        self.el.attrs[self._attr(name)] = js_to_string(value)

    def js_delete(self, name, interp):
        self.el.attrs.pop(self._attr(name), None)


class _ClassList(HostObject):
    def __init__(self, el):
        super().__init__()
        self.el = el

    def js_get(self, name, interp):
        el = self.el

        def set_classes(cs):
            el.attrs["class"] = " ".join(cs)

        if name == "add":
            def _add(i, t, a):
                cs = el.classes()
                for x in a:
                    x = js_to_string(x)
                    if x not in cs:
                        cs.append(x)
                set_classes(cs)
                return UNDEF
            return JSHost("add", _add)
        if name == "remove":
            def _remove(i, t, a):
                names = {js_to_string(x) for x in a}
                set_classes([c for c in el.classes() if c not in names])
                return UNDEF
            return JSHost("remove", _remove)
        if name == "toggle":
            def _toggle(i, t, a):
                x = js_to_string(a[0] if a else UNDEF)
                force = a[1] if len(a) > 1 else UNDEF
                cs = el.classes()
                want = js_truthy(force) if force is not UNDEF \
                    else x not in cs
                if want and x not in cs:
                    cs.append(x)
                if not want and x in cs:
                    cs.remove(x)
                set_classes(cs)
                return want
            return JSHost("toggle", _toggle)
        if name == "contains":
            return JSHost("contains", lambda i, t, a:
                          js_to_string(a[0] if a else UNDEF)
                          in el.classes())
        if name == "length":
            return float(len(el.classes()))
        return UNDEF


def _method(name):
    def deco(fn):
        _ELEMENT_METHODS[name] = fn
        return fn
    return deco


_ELEMENT_METHODS = {}


@_method("appendChild")
def _el_appendchild(el, interp, args):
    child = args[0]
    el.adopt(child)
    return child


@_method("append")
def _el_append(el, interp, args):
    for a in args:
        if isinstance(a, Element):
            el.adopt(a)
        else:
            el.adopt(Text(js_to_string(a)))
    return UNDEF


@_method("insertBefore")
def _el_insertbefore(el, interp, args):
    child, ref = args[0], args[1] if len(args) > 1 else None
    el.adopt(child, before=ref if isinstance(ref, Element) else None)
    return child


@_method("removeChild")
def _el_removechild(el, interp, args):
    args[0].detach()
    return args[0]


@_method("remove")
def _el_remove(el, interp, args):
    el.detach()
    return UNDEF


@_method("contains")
def _el_contains(el, interp, args):
    target = args[0] if args else None
    if not isinstance(target, Element):
        return False
    return any(n is target for n in el.walk())


@_method("querySelector")
def _el_queryselector(el, interp, args):
    return el.query(js_to_string(args[0] if args else UNDEF)) or None


@_method("querySelectorAll")
def _el_queryselectorall(el, interp, args):
    return JSArray(el.query_all(js_to_string(args[0] if args else UNDEF)))


@_method("insertAdjacentHTML")
def _el_insertadjacent(el, interp, args):
    pos = js_to_string(args[0]).lower()
    nodes = _parse_fragment(el.browser, js_to_string(args[1]))
    if pos == "beforeend":
        for n in nodes:
            el.adopt(n)
    elif pos == "afterbegin":
        anchor = el.children[0] if el.children else None
        for n in nodes:
            el.adopt(n, before=anchor)
    elif pos == "beforebegin" and el.parent is not None:
        for n in nodes:
            el.parent.adopt(n, before=el)
    elif pos == "afterend" and el.parent is not None:
        idx = next(
            (i for i, c in enumerate(el.parent.children) if c is el), -1)
        for off, n in enumerate(nodes):
            el.parent.children.insert(idx + 1 + off, n)
            n.parent = el.parent
    return UNDEF


@_method("addEventListener")
def _el_addlistener(el, interp, args):
    el.listeners.setdefault(js_to_string(args[0]), []).append(args[1])
    return UNDEF


@_method("removeEventListener")
def _el_removelistener(el, interp, args):
    lst = el.listeners.get(js_to_string(args[0]), [])
    el.listeners[js_to_string(args[0])] = [f for f in lst if f is not
                                           args[1]]
    return UNDEF


@_method("setAttribute")
def _el_setattr(el, interp, args):
    el.attrs[js_to_string(args[0])] = js_to_string(args[1])
    return UNDEF


@_method("getAttribute")
def _el_getattr(el, interp, args):
    v = el.attrs.get(js_to_string(args[0]))
    return v if v is not None else None


@_method("focus")
def _el_focus(el, interp, args):
    el.browser.active_element = el
    return UNDEF


@_method("blur")
def _el_blur(el, interp, args):
    if el.browser.active_element is el:
        el.browser.active_element = None
    return UNDEF


@_method("select")
def _el_select(el, interp, args):
    return UNDEF


@_method("click")
def _el_click(el, interp, args):
    el.browser.dispatch(el, "click")
    return UNDEF


@_method("closest")
def _el_closest(el, interp, args):
    sel = js_to_string(args[0] if args else UNDEF)
    n = el
    while n is not None:
        if n.matches_simple(sel.strip()):
            return n
        n = n.parent
    return None


@_method("matches")
def _el_matches(el, interp, args):
    return el.matches_simple(js_to_string(args[0] if args else UNDEF))


@_method("scrollIntoView")
def _el_scrollintoview(el, interp, args):
    return UNDEF


# ---------------------------------------------------------------------------
# events


class Event(HostObject):
    def __init__(self, browser, type_, target, props=None):
        super().__init__()
        self.type = type_
        self.target = target
        self.default_prevented = False
        self.propagation_stopped = False
        if props:
            self.props.update(props)

    def js_get(self, name, interp):
        if name == "type":
            return self.type
        if name == "target":
            return self.target if self.target is not None else None
        if name == "defaultPrevented":
            return self.default_prevented
        if name == "preventDefault":
            def _pd(i, t, a):
                self.default_prevented = True
                return UNDEF
            return JSHost("preventDefault", _pd)
        if name == "stopPropagation":
            def _sp(i, t, a):
                self.propagation_stopped = True
                return UNDEF
            return JSHost("stopPropagation", _sp)
        if name in ("key", "shiftKey", "ctrlKey", "metaKey", "altKey"):
            return self.props.get(
                name, False if name.endswith("Key") else "")
        return self.props.get(name, UNDEF)


# ---------------------------------------------------------------------------
# fetch plumbing


class FakeResponse:
    """Python-side response the test's on_fetch returns.

    - ``FakeResponse.json_reply(obj, status=200)`` — a JSON body.
    - ``FakeResponse.stream()`` — an SSE stream; push chunks with
      ``resp.push("data: ...\\n\\n")`` then ``resp.finish()``.
    - ``resp.defer()`` — don't resolve the fetch promise until
      ``resp.deliver()`` (for in-flight-state tests).
    """

    def __init__(self, status=200, json_body=None, streaming=False,
                 text_body=None):
        self.status = status
        self.json_body = json_body
        self.text_body = text_body
        self.streaming = streaming
        self.chunks = []
        self.done = False
        self.deferred = False
        self._browser = None
        self._fetch_promise = None
        self._pending_read = None
        self._aborted = False

    @classmethod
    def json_reply(cls, obj, status=200):
        return cls(status=status, json_body=obj)

    @classmethod
    def stream(cls, status=200):
        return cls(status=status, streaming=True)

    def defer(self):
        self.deferred = True
        return self

    # ---- test-side controls ------------------------------------------------

    def deliver(self):
        """Resolve the fetch promise (deferred responses only)."""
        if self._fetch_promise is not None:
            self._fetch_promise.resolve(self._js_response())
            self._browser.pump()

    def push(self, chunk: str):
        self.chunks.append(chunk)
        self._wake_reader()
        if self._browser is not None:
            self._browser.pump()

    def finish(self):
        self.done = True
        self._wake_reader()
        if self._browser is not None:
            self._browser.pump()

    def abort(self):
        self._aborted = True
        self._wake_reader()
        if self._browser is not None:
            self._browser.pump()

    def fail(self, name="NetworkError"):
        """Reject the in-flight read (mid-stream connection loss)."""
        self._error_name = name
        self._aborted = True
        self._wake_reader()
        if self._browser is not None:
            self._browser.pump()

    def _wake_reader(self):
        p, self._pending_read = self._pending_read, None
        if p is None:
            return
        interp = self._browser.interp
        if self._aborted:
            p.reject(interp.make_error(
                getattr(self, "_error_name", "AbortError"), "aborted"))
        elif self.chunks:
            chunk = self.chunks.pop(0)
            p.resolve(JSObject({"done": False, "value": chunk}))
        elif self.done:
            p.resolve(JSObject({"done": True, "value": UNDEF}))

    # ---- JS-side object ----------------------------------------------------

    def _js_response(self):
        browser = self._browser
        interp = browser.interp
        resp = self

        class _Body(HostObject):
            def js_get(self, name, i):
                if name == "getReader":
                    def _get_reader(i2, t, a):
                        class _Reader(HostObject):
                            def js_get(self, name2, i3):
                                if name2 == "read":
                                    def _read(i4, t2, a2):
                                        p = JSPromise(interp)
                                        if resp._aborted:
                                            p.reject(interp.make_error(
                                                getattr(resp, "_error_name",
                                                        "AbortError"),
                                                "aborted"))
                                        elif resp.chunks:
                                            chunk = resp.chunks.pop(0)
                                            p.resolve(JSObject({
                                                "done": False,
                                                "value": chunk,
                                            }))
                                        elif resp.done:
                                            p.resolve(JSObject({
                                                "done": True,
                                                "value": UNDEF,
                                            }))
                                        else:
                                            resp._pending_read = p
                                        return p
                                    return JSHost("read", _read)
                                if name2 == "cancel":
                                    return JSHost(
                                        "cancel",
                                        lambda i4, t2, a2:
                                        interp._resolved(UNDEF))
                                return UNDEF
                        return _Reader()
                    return JSHost("getReader", _get_reader)
                return UNDEF

        class _Response(HostObject):
            def js_get(self, name, i):
                if name == "status":
                    return float(resp.status)
                if name == "ok":
                    return 200 <= resp.status < 300
                if name == "json":
                    def _json(i2, t, a):
                        from .builtins import _py_to_js
                        if resp.json_body is None:
                            return interp._resolved(JSObject())
                        return interp._resolved(_py_to_js(resp.json_body))
                    return JSHost("json", _json)
                if name == "text":
                    return JSHost("text", lambda i2, t, a:
                                  interp._resolved(resp.text_body or ""))
                if name == "body":
                    return _Body()
                return UNDEF

        return _Response()


# ---------------------------------------------------------------------------
# HTML loading


class _TreeBuilder(HTMLParser):
    def __init__(self, browser):
        super().__init__(convert_charrefs=True)
        self.browser = browser
        self.root = Element(browser, "document-root")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        el = Element(self.browser, tag)
        el.attrs = {k: (v if v is not None else "") for k, v in attrs}
        self.stack[-1].adopt(el)
        if tag.lower() not in _VOID_TAGS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        el = Element(self.browser, tag)
        el.attrs = {k: (v if v is not None else "") for k, v in attrs}
        self.stack[-1].adopt(el)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag.lower():
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].adopt(Text(data))


def _parse_fragment(browser, s: str):
    """Parse an HTML fragment into real nodes so queries/listeners see
    innerHTML-built markup (a real browser parses too; Raw strings were
    invisible to querySelector)."""
    if not s:
        return []
    tb = _TreeBuilder(browser)
    tb.feed(s)
    tb.close()
    return list(tb.root.children)


# ---------------------------------------------------------------------------
# the browser


class Browser:
    def __init__(self, html_path=None, static_dir=None, pathname="/chat/",
                 dark_query=False):
        self.interp = Interpreter()
        self.active_element = None
        self.local_storage = {}
        self.navigations = []  # (kind, url)
        self.clipboard = []
        self.fetches = []  # (url, opts_py, FakeResponse)
        self.on_fetch = lambda url, opts: FakeResponse.json_reply({})
        self.pathname = pathname
        self.media_dark = dark_query
        self._media_listeners = []
        self.static_dir = static_dir
        self.root = None
        self.document = None
        self._doc_host = None
        self._win_listeners = {}
        if html_path is not None:
            with open(html_path) as f:
                self.load_html(f.read())
        self._install()

    # ---- DOM bootstrap -----------------------------------------------------

    def load_html(self, html_src: str):
        tb = _TreeBuilder(self)
        tb.feed(html_src)
        self.root = tb.root

    def _ensure_root(self):
        if self.root is None:
            self.load_html("<html><head></head><body></body></html>")

    def _install(self):
        self._ensure_root()
        interp = self.interp
        browser = self

        html_el = self.root.query("html") or self.root
        body_el = self.root.query("body")
        if body_el is None:
            body_el = Element(self, "body")
            html_el.adopt(body_el)

        class _Document(HostObject):
            def js_get(self, name, i):
                if name == "body":
                    return body_el
                if name == "documentElement":
                    return html_el
                if name == "activeElement":
                    ae = browser.active_element
                    return ae if ae is not None else body_el
                if name == "createElement":
                    def _create(i2, t, a):
                        return Element(browser, js_to_string(a[0]))
                    return JSHost("createElement", _create)
                if name == "createTextNode":
                    def _ctn(i2, t, a):
                        el = Element(browser, "span")
                        el.children = [Text(js_to_string(a[0]))]
                        return el
                    return JSHost("createTextNode", _ctn)
                if name == "querySelector":
                    def _qs(i2, t, a):
                        return browser.root.query(js_to_string(a[0])) or None
                    return JSHost("querySelector", _qs)
                if name == "querySelectorAll":
                    def _qsa(i2, t, a):
                        return JSArray(
                            browser.root.query_all(js_to_string(a[0])))
                    return JSHost("querySelectorAll", _qsa)
                if name == "getElementById":
                    def _gbi(i2, t, a):
                        return browser.root.query(
                            "#" + js_to_string(a[0])) or None
                    return JSHost("getElementById", _gbi)
                if name == "addEventListener":
                    def _ael(i2, t, a):
                        browser._doc_listeners.setdefault(
                            js_to_string(a[0]), []).append(a[1])
                        return UNDEF
                    return JSHost("addEventListener", _ael)
                if name == "removeEventListener":
                    def _rel(i2, t, a):
                        lst = browser._doc_listeners.get(
                            js_to_string(a[0]), [])
                        browser._doc_listeners[js_to_string(a[0])] = [
                            f for f in lst if f is not a[1]]
                        return UNDEF
                    return JSHost("removeEventListener", _rel)
                return UNDEF

        self._doc_listeners = {}
        self._doc_host = _Document()
        self.document = self._doc_host
        interp.globals.declare("document", self._doc_host)

        # ---- window ---------------------------------------------------------

        class _Location(HostObject):
            def js_get(self, name, i):
                if name == "pathname":
                    return browser.pathname
                if name == "href":
                    return "http://testhost" + browser.pathname
                if name == "origin":
                    return "http://testhost"
                return UNDEF

            def js_set(self, name, value, i):
                if name == "href":
                    browser.navigations.append(
                        ("href", js_to_string(value)))

        location = _Location()

        class _History(HostObject):
            def js_get(self, name, i):
                if name == "pushState":
                    def _push(i2, t, a):
                        url = js_to_string(a[2]) if len(a) > 2 else ""
                        browser.pathname = url or browser.pathname
                        browser.navigations.append(("pushState", url))
                        return UNDEF
                    return JSHost("pushState", _push)
                if name == "replaceState":
                    def _replace(i2, t, a):
                        url = js_to_string(a[2]) if len(a) > 2 else ""
                        browser.pathname = url or browser.pathname
                        browser.navigations.append(("replaceState", url))
                        return UNDEF
                    return JSHost("replaceState", _replace)
                if name == "back":
                    return JSHost("back", lambda i2, t, a: UNDEF)
                return UNDEF

        class _MediaQuery(HostObject):
            def js_get(self, name, i):
                if name == "matches":
                    return browser.media_dark
                if name == "addEventListener":
                    def _ael(i2, t, a):
                        browser._media_listeners.append(a[1])
                        return UNDEF
                    return JSHost("addEventListener", _ael)
                return UNDEF

        class _Window(HostObject):
            def js_get(self, name, i):
                if name == "location":
                    return location
                if name == "history":
                    return _History()
                if name == "matchMedia":
                    return JSHost(
                        "matchMedia", lambda i2, t, a: _MediaQuery())
                if name == "addEventListener":
                    def _ael(i2, t, a):
                        browser._win_listeners.setdefault(
                            js_to_string(a[0]), []).append(a[1])
                        return UNDEF
                    return JSHost("addEventListener", _ael)
                if name == "removeEventListener":
                    return JSHost("removeEventListener",
                                  lambda i2, t, a: UNDEF)
                if name == "document":
                    return browser._doc_host
                if name in self.props:
                    # expandos set via window.x = v must read back
                    return self.props[name]
                return i.globals.vars.get(name, UNDEF)

        win = _Window()
        interp.globals.declare("window", win)
        interp.globals.declare("history", _History())
        interp.globals.declare("location", location)

        # ---- localStorage ---------------------------------------------------

        class _Storage(HostObject):
            def js_get(self, name, i):
                if name == "getItem":
                    def _get(i2, t, a):
                        k = js_to_string(a[0])
                        v = browser.local_storage.get(k)
                        return v if v is not None else None
                    return JSHost("getItem", _get)
                if name == "setItem":
                    def _set(i2, t, a):
                        browser.local_storage[js_to_string(a[0])] = \
                            js_to_string(a[1])
                        return UNDEF
                    return JSHost("setItem", _set)
                if name == "removeItem":
                    def _rm(i2, t, a):
                        browser.local_storage.pop(js_to_string(a[0]), None)
                        return UNDEF
                    return JSHost("removeItem", _rm)
                return UNDEF

        interp.globals.declare("localStorage", _Storage())

        # ---- navigator.clipboard ----------------------------------------------

        class _Clipboard(HostObject):
            def js_get(self, name, i):
                if name == "writeText":
                    def _write(i2, t, a):
                        browser.clipboard.append(js_to_string(a[0]))
                        return interp._resolved(UNDEF)
                    return JSHost("writeText", _write)
                return UNDEF

        class _Navigator(HostObject):
            def js_get(self, name, i):
                if name == "clipboard":
                    return _Clipboard()
                if name == "userAgent":
                    return "jsrt/1.0"
                return UNDEF

        interp.globals.declare("navigator", _Navigator())

        # ---- fetch / streams ------------------------------------------------

        def _fetch(i, t, a):
            url = js_to_string(a[0] if a else UNDEF)
            opts_js = a[1] if len(a) > 1 else JSObject()
            opts = {}
            signal = None
            if isinstance(opts_js, JSObject):
                for k, v in opts_js.props.items():
                    if k == "signal":
                        signal = v
                    elif k == "body" and isinstance(v, _FormData):
                        opts[k] = v.entries
                    else:
                        opts[k] = js_to_py(v)
            resp = browser.on_fetch(url, opts)
            if not isinstance(resp, FakeResponse):
                resp = FakeResponse.json_reply(resp or {})
            resp._browser = browser
            browser.fetches.append((url, opts, resp))
            p = JSPromise(interp)
            resp._fetch_promise = p
            if signal is not None and isinstance(signal, _AbortSignal):
                signal.on_abort.append(resp)
            if not resp.deferred:
                p.resolve(resp._js_response())
            return p

        interp.globals.declare("fetch", JSHost("fetch", _fetch))

        class _AbortSignal(HostObject):
            def __init__(self):
                super().__init__()
                self.aborted = False
                self.on_abort = []

            def js_get(self, name, i):
                if name == "aborted":
                    return self.aborted
                return UNDEF

        class _AbortController(HostObject):
            def __init__(self):
                super().__init__()
                self.signal = _AbortSignal()

            def js_get(self, name, i):
                if name == "signal":
                    return self.signal
                if name == "abort":
                    def _abort(i2, t, a):
                        self.signal.aborted = True
                        for resp in self.signal.on_abort:
                            resp.abort()
                        return UNDEF
                    return JSHost("abort", _abort)
                return UNDEF

        interp.globals.declare("AbortController", JSHost(
            "AbortController", lambda i, t, a: _AbortController()))

        class _TextDecoder(HostObject):
            def js_get(self, name, i):
                if name == "decode":
                    def _decode(i2, t, a):
                        v = a[0] if a else UNDEF
                        if isinstance(v, str):
                            return v
                        if v is UNDEF:
                            return ""
                        return js_to_string(v)
                    return JSHost("decode", _decode)
                return UNDEF

        interp.globals.declare("TextDecoder", JSHost(
            "TextDecoder", lambda i, t, a: _TextDecoder()))

        class _FormData(HostObject):
            def __init__(self):
                super().__init__()
                self.entries = []

            def js_get(self, name, i):
                if name == "append":
                    def _append(i2, t, a):
                        self.entries.append(
                            (js_to_string(a[0]),
                             a[1] if len(a) > 1 else UNDEF))
                        return UNDEF
                    return JSHost("append", _append)
                return UNDEF

        self._formdata_cls = _FormData
        interp.globals.declare("FormData", JSHost(
            "FormData", lambda i, t, a: _FormData()))

    # ---- script execution ---------------------------------------------------

    def run_scripts(self):
        """Execute the page's <script src> tags, in order, from disk."""
        import os
        assert self.static_dir is not None, "static_dir required"
        for el in self.root.walk():
            if el.tag == "script" and el.attrs.get("src"):
                fname = os.path.basename(el.attrs["src"])
                path = os.path.join(self.static_dir, fname)
                with open(path) as f:
                    self.interp.run(f.read(), fname)

    def boot(self):
        """run scripts + DOMContentLoaded + quiesce (the full page load)."""
        self.run_scripts()
        self.fire_window("DOMContentLoaded")
        self.pump()

    # ---- event dispatch ---------------------------------------------------

    def dispatch(self, el, type_, props=None):
        ev = Event(self, type_, el, props)
        node = el
        while node is not None:
            if ev.propagation_stopped:
                break
            handlers = list(node.listeners.get(type_, []))
            onprop = node.props.get("on" + type_)
            if onprop is not None and onprop is not UNDEF:
                handlers.append(onprop)
            for fn in handlers:
                self.interp.call_any(fn, node, [ev])
            node = node.parent
        if not ev.propagation_stopped:
            for fn in self._doc_listeners.get(type_, []):
                self.interp.call_any(fn, UNDEF, [ev])
        self.pump()
        return ev

    def fire_window(self, type_, props=None):
        ev = Event(self, type_, None, props)
        for fn in self._win_listeners.get(type_, []):
            self.interp.call_any(fn, UNDEF, [ev])
        self.pump()
        return ev

    def fire_media_change(self, dark: bool):
        self.media_dark = dark
        for fn in list(self._media_listeners):
            self.interp.call_any(fn, UNDEF, [Event(self, "change", None)])
        self.pump()

    # ---- test-facing conveniences ----------------------------------------

    def pump(self):
        self.interp.run_jobs()

    def advance(self, ms: float):
        self.interp.advance_time(ms)

    def q(self, selector: str) -> Element:
        el = self.root.query(selector)
        if el is None:
            raise AssertionError(f"no element matches {selector!r}")
        return el

    def maybe(self, selector: str):
        return self.root.query(selector)

    def click(self, selector: str):
        return self.dispatch(self.q(selector), "click")

    def type_text(self, selector: str, text: str):
        el = self.q(selector)
        el.props["value"] = text
        self.dispatch(el, "input")

    def press(self, selector: str, key: str, **mods):
        props = {"key": key}
        props.update({k: v for k, v in mods.items()})
        return self.dispatch(self.q(selector), "keydown", props)

    def html(self, selector: str) -> str:
        return self.q(selector).serialize()

    def text(self, selector: str) -> str:
        return self.q(selector).text()
