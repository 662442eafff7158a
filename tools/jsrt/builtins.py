"""Host globals + primitive method dispatch for jsrt.

Covers the builtin surface the first-party frontend actually uses (the
inventory is pinned by tests/test_jsrt.py) plus the obvious neighbours;
anything else returns undefined and fails loudly at the call site.
"""

from __future__ import annotations

import math as _pymath
import re as _pyre

from .interp import (
    NAN, UNDEF, HostObject, Interpreter, JSArray, JSClass, JSException,
    JSFunction, JSHost, JSMap, JSObject, JSPromise, JSRegExp, JSSet,
    _canon_zero, _hashable, _replacement_to_py, js_num_to_str, js_to_number,
    js_to_string, js_truthy,
)


class JSMatch(HostObject):
    """A regex match result: array-like with .index/.input."""

    def __init__(self, groups, index, input_str):
        super().__init__()
        self.items = groups  # [full, g1, g2, ...] with UNDEF holes
        self.index = index
        self.input = input_str

    def js_get(self, name, interp):
        if name == "index":
            return float(self.index)
        if name == "input":
            return self.input
        if name == "length":
            return float(len(self.items))
        try:
            i = int(name)
        except ValueError:
            return self.props.get(name, UNDEF)
        if 0 <= i < len(self.items):
            return self.items[i]
        return UNDEF


def _match_groups(m) -> list:
    out = [m.group(0)]
    for g in m.groups():
        out.append(UNDEF if g is None else g)
    return out


def _as_regex(interp, pat) -> JSRegExp:
    if isinstance(pat, JSRegExp):
        return pat
    interp.throw_type("expected a RegExp")


def _call(interp, fn, args):
    return interp.call_any(fn, UNDEF, args)


# ---------------------------------------------------------------------------
# string methods


def _str_replace(interp, s, args):
    pat = args[0] if args else UNDEF
    repl = args[1] if len(args) > 1 else UNDEF

    def do_one(text, m):
        if isinstance(repl, str):
            return None  # handled wholesale below
        groups = _match_groups(m)
        r = _call(interp, repl,
                  groups + [float(m.start()), text])
        return js_to_string(r)

    if isinstance(pat, str):
        if isinstance(repl, str):
            return s.replace(pat, repl.replace("$$", "$"), 1)
        i = s.find(pat)
        if i < 0:
            return s
        r = _call(interp, repl, [pat, float(i), s])
        return s[:i] + js_to_string(r) + s[i + len(pat):]
    rx = _as_regex(interp, pat)
    count = 0 if "g" in rx.flags else 1
    if isinstance(repl, str):
        return rx.py.sub(_replacement_to_py(repl), s, count=count)
    return rx.py.sub(lambda m: do_one(s, m), s, count=count)


def _str_match(interp, s, args):
    rx = _as_regex(interp, args[0] if args else UNDEF)
    if "g" in rx.flags:
        found = rx.py.findall(s)
        if not found:
            return None
        # findall returns tuples when groups exist; JS returns full texts
        full = [m.group(0) for m in rx.py.finditer(s)]
        return JSArray(full)
    m = rx.py.search(s)
    if m is None:
        return None
    return JSMatch(_match_groups(m), m.start(), s)


def _str_split(interp, s, args):
    sep = args[0] if args else UNDEF
    if sep is UNDEF:
        return JSArray([s])
    if isinstance(sep, JSRegExp):
        parts = sep.py.split(s)
        return JSArray([UNDEF if p is None else p for p in parts])
    sep = js_to_string(sep)
    if sep == "":
        return JSArray(list(s))
    return JSArray(s.split(sep))


def _norm_slice(i, n, default):
    if i is UNDEF or i is None:
        return default
    i = int(js_to_number(i)) if not _pymath.isnan(js_to_number(i)) else 0
    if i < 0:
        i = max(0, n + i)
    return min(i, n)


STRING_METHODS = {}


def _smethod(name):
    def deco(fn):
        STRING_METHODS[name] = fn
        return fn
    return deco


_smethod("replace")(_str_replace)
_smethod("match")(_str_match)
_smethod("split")(_str_split)
_smethod("trim")(lambda i, s, a: s.strip())
_smethod("trimStart")(lambda i, s, a: s.lstrip())
_smethod("trimEnd")(lambda i, s, a: s.rstrip())
_smethod("toLowerCase")(lambda i, s, a: s.lower())
_smethod("toUpperCase")(lambda i, s, a: s.upper())
_smethod("toString")(lambda i, s, a: s)


@_smethod("slice")
def _str_slice(interp, s, args):
    n = len(s)
    start = _norm_slice(args[0] if args else UNDEF, n, 0)
    end = _norm_slice(args[1] if len(args) > 1 else UNDEF, n, n)
    return s[start:end] if start < end else ""


@_smethod("substring")
def _str_substring(interp, s, args):
    n = len(s)
    a = _norm_slice(args[0] if args else UNDEF, n, 0)
    b = _norm_slice(args[1] if len(args) > 1 else UNDEF, n, n)
    if a > b:
        a, b = b, a
    return s[a:b]


@_smethod("startsWith")
def _str_startswith(interp, s, args):
    pos = int(js_to_number(args[1])) if len(args) > 1 else 0
    return s.startswith(js_to_string(args[0] if args else UNDEF), pos)


@_smethod("endsWith")
def _str_endswith(interp, s, args):
    return s.endswith(js_to_string(args[0] if args else UNDEF))


@_smethod("includes")
def _str_includes(interp, s, args):
    return js_to_string(args[0] if args else UNDEF) in s


@_smethod("indexOf")
def _str_indexof(interp, s, args):
    start = int(js_to_number(args[1])) if len(args) > 1 else 0
    return float(s.find(js_to_string(args[0] if args else UNDEF), start))


@_smethod("lastIndexOf")
def _str_lastindexof(interp, s, args):
    needle = js_to_string(args[0] if args else UNDEF)
    if len(args) > 1:
        end = js_to_number(args[1])
        if _pymath.isnan(end):
            return float(s.rfind(needle))
        return float(s.rfind(needle, 0, int(end) + len(needle)))
    return float(s.rfind(needle))


@_smethod("charCodeAt")
def _str_charcodeat(interp, s, args):
    i = int(js_to_number(args[0])) if args else 0
    if 0 <= i < len(s):
        return float(ord(s[i]))
    return NAN


@_smethod("codePointAt")
def _str_codepointat(interp, s, args):
    i = int(js_to_number(args[0])) if args else 0
    if 0 <= i < len(s):
        return float(ord(s[i]))
    return UNDEF


@_smethod("charAt")
def _str_charat(interp, s, args):
    i = int(js_to_number(args[0])) if args else 0
    return s[i] if 0 <= i < len(s) else ""


@_smethod("at")
def _str_at(interp, s, args):
    i = int(js_to_number(args[0])) if args else 0
    if i < 0:
        i += len(s)
    return s[i] if 0 <= i < len(s) else UNDEF


@_smethod("repeat")
def _str_repeat(interp, s, args):
    return s * int(js_to_number(args[0])) if args else ""


@_smethod("padStart")
def _str_padstart(interp, s, args):
    n = int(js_to_number(args[0])) if args else 0
    fill = js_to_string(args[1]) if len(args) > 1 and \
        args[1] is not UNDEF else " "
    if not fill or len(s) >= n:
        return s
    reps = -(-(n - len(s)) // len(fill))
    return (fill * reps)[:n - len(s)] + s


@_smethod("padEnd")
def _str_padend(interp, s, args):
    n = int(js_to_number(args[0])) if args else 0
    fill = js_to_string(args[1]) if len(args) > 1 and \
        args[1] is not UNDEF else " "
    if not fill or len(s) >= n:
        return s
    reps = -(-(n - len(s)) // len(fill))
    return s + (fill * reps)[:n - len(s)]


@_smethod("concat")
def _str_concat(interp, s, args):
    return s + "".join(js_to_string(a) for a in args)


# ---------------------------------------------------------------------------
# array methods

ARRAY_METHODS = {}


def _amethod(name):
    def deco(fn):
        ARRAY_METHODS[name] = fn
        return fn
    return deco


@_amethod("push")
def _arr_push(interp, arr, args):
    arr.items.extend(args)
    return float(len(arr.items))


@_amethod("pop")
def _arr_pop(interp, arr, args):
    return arr.items.pop() if arr.items else UNDEF


@_amethod("shift")
def _arr_shift(interp, arr, args):
    return arr.items.pop(0) if arr.items else UNDEF


@_amethod("unshift")
def _arr_unshift(interp, arr, args):
    arr.items[0:0] = args
    return float(len(arr.items))


@_amethod("map")
def _arr_map(interp, arr, args):
    fn = args[0]
    return JSArray([
        _call(interp, fn, [v, float(i), arr])
        for i, v in enumerate(list(arr.items))
    ])


@_amethod("filter")
def _arr_filter(interp, arr, args):
    fn = args[0]
    return JSArray([
        v for i, v in enumerate(list(arr.items))
        if js_truthy(_call(interp, fn, [v, float(i), arr]))
    ])


@_amethod("find")
def _arr_find(interp, arr, args):
    fn = args[0]
    for i, v in enumerate(list(arr.items)):
        if js_truthy(_call(interp, fn, [v, float(i), arr])):
            return v
    return UNDEF


@_amethod("findIndex")
def _arr_findindex(interp, arr, args):
    fn = args[0]
    for i, v in enumerate(list(arr.items)):
        if js_truthy(_call(interp, fn, [v, float(i), arr])):
            return float(i)
    return -1.0


@_amethod("forEach")
def _arr_foreach(interp, arr, args):
    fn = args[0]
    for i, v in enumerate(list(arr.items)):
        _call(interp, fn, [v, float(i), arr])
    return UNDEF


@_amethod("join")
def _arr_join(interp, arr, args):
    sep = js_to_string(args[0]) if args and args[0] is not UNDEF else ","
    return sep.join(
        "" if v is UNDEF or v is None else js_to_string(v)
        for v in arr.items
    )


@_amethod("slice")
def _arr_slice(interp, arr, args):
    n = len(arr.items)
    start = _norm_slice(args[0] if args else UNDEF, n, 0)
    end = _norm_slice(args[1] if len(args) > 1 else UNDEF, n, n)
    return JSArray(arr.items[start:end])


@_amethod("splice")
def _arr_splice(interp, arr, args):
    n = len(arr.items)
    start = _norm_slice(args[0] if args else UNDEF, n, 0)
    if len(args) > 1:
        c = js_to_number(args[1])
        # JS clamps: NaN/undefined/negative -> 0, huge -> rest of array
        count = 0 if _pymath.isnan(c) else max(0, min(int(c), n - start))
    else:
        count = n - start
    removed = arr.items[start:start + count]
    arr.items[start:start + count] = list(args[2:])
    return JSArray(removed)


@_amethod("includes")
def _arr_includes(interp, arr, args):
    needle = args[0] if args else UNDEF
    return any(interp.strict_eq(v, needle) for v in arr.items)


@_amethod("indexOf")
def _arr_indexof(interp, arr, args):
    needle = args[0] if args else UNDEF
    for i, v in enumerate(arr.items):
        if interp.strict_eq(v, needle):
            return float(i)
    return -1.0


@_amethod("lastIndexOf")
def _arr_lastindexof(interp, arr, args):
    needle = args[0] if args else UNDEF
    for i in range(len(arr.items) - 1, -1, -1):
        if interp.strict_eq(arr.items[i], needle):
            return float(i)
    return -1.0


@_amethod("concat")
def _arr_concat(interp, arr, args):
    out = list(arr.items)
    for a in args:
        if isinstance(a, JSArray):
            out.extend(a.items)
        else:
            out.append(a)
    return JSArray(out)


@_amethod("some")
def _arr_some(interp, arr, args):
    fn = args[0]
    return any(
        js_truthy(_call(interp, fn, [v, float(i), arr]))
        for i, v in enumerate(list(arr.items))
    )


@_amethod("every")
def _arr_every(interp, arr, args):
    fn = args[0]
    return all(
        js_truthy(_call(interp, fn, [v, float(i), arr]))
        for i, v in enumerate(list(arr.items))
    )


@_amethod("reverse")
def _arr_reverse(interp, arr, args):
    arr.items.reverse()
    return arr


@_amethod("flat")
def _arr_flat(interp, arr, args):
    depth = int(js_to_number(args[0])) if args else 1

    def go(items, d):
        out = []
        for v in items:
            if isinstance(v, JSArray) and d > 0:
                out.extend(go(v.items, d - 1))
            else:
                out.append(v)
        return out

    return JSArray(go(arr.items, depth))


@_amethod("reduce")
def _arr_reduce(interp, arr, args):
    fn = args[0]
    items = list(arr.items)
    if len(args) > 1:
        acc = args[1]
        start = 0
    else:
        if not items:
            interp.throw_type("reduce of empty array with no initial value")
        acc = items[0]
        start = 1
    for i in range(start, len(items)):
        acc = _call(interp, fn, [acc, items[i], float(i), arr])
    return acc


@_amethod("sort")
def _arr_sort(interp, arr, args):
    import functools
    if args and args[0] is not UNDEF:
        fn = args[0]

        def cmp(a, b):
            r = js_to_number(_call(interp, fn, [a, b]))
            return -1 if r < 0 else (1 if r > 0 else 0)

        arr.items.sort(key=functools.cmp_to_key(cmp))
    else:
        arr.items.sort(key=js_to_string)
    return arr


@_amethod("fill")
def _arr_fill(interp, arr, args):
    v = args[0] if args else UNDEF
    for i in range(len(arr.items)):
        arr.items[i] = v
    return arr


@_amethod("keys")
def _arr_keys(interp, arr, args):
    return JSArray([float(i) for i in range(len(arr.items))])


@_amethod("toString")
def _arr_tostring(interp, arr, args):
    return js_to_string(arr)


# ---------------------------------------------------------------------------
# primitive member dispatch


def primitive_member(interp: Interpreter, base, name: str):
    if isinstance(base, str):
        if name == "length":
            return float(len(base))
        try:
            i = int(name)
            if 0 <= i < len(base):
                return base[i]
            return UNDEF
        except ValueError:
            pass
        m = STRING_METHODS.get(name)
        if m is None:
            return UNDEF
        return JSHost(name, lambda i_, t, a, b=base, m=m: m(i_, b, a))
    if isinstance(base, JSArray):
        if name == "length":
            return float(len(base.items))
        try:
            i = int(name)
            if 0 <= i < len(base.items):
                return base.items[i]
            return UNDEF
        except ValueError:
            pass
        m = ARRAY_METHODS.get(name)
        if m is None:
            return UNDEF
        return JSHost(name, lambda i_, t, a, b=base, m=m: m(i_, b, a))
    if isinstance(base, JSRegExp):
        if name == "source":
            return base.source
        if name == "flags":
            return base.flags
        if name == "lastIndex":
            return float(base.last_index)
        if name == "global":
            return "g" in base.flags
        if name == "test":
            def _test(i_, t, a):
                s = js_to_string(a[0] if a else UNDEF)
                if "g" in base.flags:
                    m = base.py.search(s, base.last_index)
                    base.last_index = m.end() if m else 0
                    return m is not None
                return base.py.search(s) is not None
            return JSHost("test", _test)
        if name == "exec":
            def _exec(i_, t, a):
                s = js_to_string(a[0] if a else UNDEF)
                start = base.last_index if "g" in base.flags else 0
                if start > len(s):
                    base.last_index = 0
                    return None
                m = base.py.search(s, start)
                if m is None:
                    if "g" in base.flags:
                        base.last_index = 0
                    return None
                if "g" in base.flags:
                    base.last_index = m.end()
                return JSMatch(_match_groups(m), m.start(), s)
            return JSHost("exec", _exec)
        return UNDEF
    if isinstance(base, JSPromise):
        if name == "then":
            def _then(i_, t, a):
                nxt = JSPromise(interp)
                on_ok = a[0] if a and a[0] is not UNDEF else None
                on_err = a[1] if len(a) > 1 and a[1] is not UNDEF else None
                base.callbacks.append((on_ok, on_err, nxt))
                base._drain()
                return nxt
            return JSHost("then", _then)
        if name == "catch":
            def _catch(i_, t, a):
                nxt = JSPromise(interp)
                base.callbacks.append(
                    (None, a[0] if a else None, nxt))
                base._drain()
                return nxt
            return JSHost("catch", _catch)
        if name == "finally":
            def _finally(i_, t, a):
                nxt = JSPromise(interp)
                fn = a[0] if a else None

                def run_then(i2, t2, a2, ok=True):
                    if fn is not None:
                        interp.call_any(fn, UNDEF, [])
                    if ok:
                        nxt.resolve(a2[0] if a2 else UNDEF)
                    else:
                        nxt.reject(a2[0] if a2 else UNDEF)

                base.callbacks.append((
                    JSHost("", lambda i2, t2, a2: run_then(
                        i2, t2, a2, True)),
                    JSHost("", lambda i2, t2, a2: run_then(
                        i2, t2, a2, False)),
                    None,
                ))
                base._drain()
                return nxt
            return JSHost("finally", _finally)
        return UNDEF
    if isinstance(base, JSSet):
        if name == "size":
            return float(len(base.d))
        if name == "has":
            return JSHost("has", lambda i_, t, a:
                          _hashable(a[0] if a else UNDEF) in base.d)
        if name == "add":
            def _add(i_, t, a):
                v = a[0] if a else UNDEF
                # no-op on re-insert; -0 stored as +0 (spec: add step 1)
                base.d.setdefault(_hashable(v), _canon_zero(v))
                return base
            return JSHost("add", _add)
        if name == "delete":
            def _del(i_, t, a, _miss=object()):
                return base.d.pop(
                    _hashable(a[0] if a else UNDEF), _miss) is not _miss
            return JSHost("delete", _del)
        if name == "forEach":
            def _fe(i_, t, a):
                for v in list(base.d.values()):
                    _call(interp, a[0], [v, v, base])
                return UNDEF
            return JSHost("forEach", _fe)
        return UNDEF
    if isinstance(base, JSMap):
        if name == "size":
            return float(len(base.d))
        if name == "get":
            return JSHost("get", lambda i_, t, a: base.d.get(
                _hashable(a[0] if a else UNDEF), (None, UNDEF))[1])
        if name == "set":
            def _set(i_, t, a):
                k = a[0] if a else UNDEF
                # stored key normalizes -0 to +0 (spec: Map.set step 1)
                base.d[_hashable(k)] = (
                    _canon_zero(k), a[1] if len(a) > 1 else UNDEF)
                return base
            return JSHost("set", _set)
        if name == "has":
            return JSHost("has", lambda i_, t, a:
                          _hashable(a[0] if a else UNDEF) in base.d)
        return UNDEF
    if isinstance(base, (JSFunction, JSHost, JSClass)):
        if isinstance(base, JSHost) and name in base.props:
            return base.props[name]
        if name == "name":
            return getattr(base, "name", "")
        if name == "call":
            def _fcall(i_, t, a):
                return interp.call_any(
                    base, a[0] if a else UNDEF, a[1:])
            return JSHost("call", _fcall)
        if name == "apply":
            def _fapply(i_, t, a):
                args = a[1].items if len(a) > 1 and \
                    isinstance(a[1], JSArray) else []
                return interp.call_any(base, a[0] if a else UNDEF, args)
            return JSHost("apply", _fapply)
        if name == "bind":
            def _fbind(i_, t, a):
                bound_this = a[0] if a else UNDEF
                pre = a[1:]
                return JSHost(
                    getattr(base, "name", "bound"),
                    lambda i2, t2, a2: interp.call_any(
                        base, bound_this, pre + a2))
            return JSHost("bind", _fbind)
        return UNDEF
    if isinstance(base, float):
        if name == "toFixed":
            def _tf(i_, t, a):
                nd = int(js_to_number(a[0])) if a else 0
                return f"{base:.{nd}f}"
            return JSHost("toFixed", _tf)
        if name == "toString":
            return JSHost("toString", lambda i_, t, a: js_num_to_str(base))
        return UNDEF
    if isinstance(base, bool):
        if name == "toString":
            return JSHost(
                "toString", lambda i_, t, a: "true" if base else "false")
        return UNDEF
    return UNDEF


# ---------------------------------------------------------------------------
# JSON


def _json_parse(interp, args):
    text = js_to_string(args[0] if args else UNDEF)
    try:
        py = _pyjson_loads(text)
    except Exception as exc:
        raise JSException(interp.make_error("SyntaxError", str(exc)))
    return _py_to_js(py)


def _pyjson_loads(text):
    import json
    return json.loads(text)


def _py_to_js(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        return v
    if isinstance(v, list):
        return JSArray([_py_to_js(x) for x in v])
    if isinstance(v, dict):
        return JSObject({k: _py_to_js(x) for k, x in v.items()})
    raise TypeError(v)


def js_to_py(v):
    """Best-effort JS→Python for host-side assertions and JSON."""
    if v is UNDEF:
        return None
    if v is None or isinstance(v, (bool, str)):
        return v
    if isinstance(v, float):
        return int(v) if v.is_integer() and abs(v) < 2**53 else v
    if isinstance(v, JSArray):
        return [js_to_py(x) for x in v.items]
    if isinstance(v, JSMatch):
        return [js_to_py(x) for x in v.items]
    if isinstance(v, JSObject):
        return {k: js_to_py(x) for k, x in v.props.items()}
    return repr(v)


def _json_stringify(interp, args):
    v = args[0] if args else UNDEF
    indent = None
    if len(args) > 2 and args[2] is not UNDEF:
        sp = args[2]
        indent = int(js_to_number(sp)) if isinstance(sp, float) else \
            js_to_string(sp)

    def ser(x, depth=0):
        if depth > 64:
            raise JSException(interp.make_error(
                "TypeError", "Converting circular structure to JSON"))
        if x is True:
            return "true"
        if x is False:
            return "false"
        if x is None:
            return "null"
        if isinstance(x, float):
            if _pymath.isnan(x) or _pymath.isinf(x):
                return "null"
            return js_num_to_str(x)
        if isinstance(x, str):
            import json
            return json.dumps(x)
        if isinstance(x, JSArray):
            return "[" + ",".join(
                "null" if e is UNDEF or isinstance(
                    e, (JSFunction, JSHost, JSClass))
                else ser(e, depth + 1)
                for e in x.items
            ) + "]"
        if isinstance(x, JSObject):
            import json
            parts = []
            for k, val in x.props.items():
                if val is UNDEF or isinstance(
                        val, (JSFunction, JSHost, JSClass)):
                    continue
                parts.append(json.dumps(k) + ":" + ser(val, depth + 1))
            return "{" + ",".join(parts) + "}"
        return "null"

    if v is UNDEF or isinstance(v, (JSFunction, JSHost, JSClass)):
        return UNDEF
    out = ser(v)
    if indent:
        import json
        return json.dumps(_pyjson_loads(out), indent=(
            indent if isinstance(indent, int) else 2))
    return out


# ---------------------------------------------------------------------------
# install


def install(interp: Interpreter):
    g = interp.globals

    def host(name, fn):
        g.declare(name, JSHost(name, fn))

    # -- JSON / Math -----------------------------------------------------
    g.declare("JSON", JSObject({
        "parse": JSHost("parse", lambda i, t, a: _json_parse(i, a)),
        "stringify": JSHost(
            "stringify", lambda i, t, a: _json_stringify(i, a)),
    }))

    def _math1(fn):
        def call(i, t, a):
            x = js_to_number(a[0] if a else UNDEF)
            try:
                return float(fn(x))
            except (ValueError, OverflowError):
                # JS semantics: floor/ceil/trunc pass NaN/Infinity
                # through; sqrt(-1) is NaN — never a host crash
                if _pymath.isnan(x):
                    return NAN
                if _pymath.isinf(x):
                    return x
                return NAN
        return call

    g.declare("Math", JSObject({
        "round": JSHost("round", _math1(
            lambda x: _pymath.floor(x + 0.5) if not _pymath.isnan(x)
            else NAN)),
        "floor": JSHost("floor", _math1(_pymath.floor)),
        "ceil": JSHost("ceil", _math1(_pymath.ceil)),
        "trunc": JSHost("trunc", _math1(_pymath.trunc)),
        "abs": JSHost("abs", _math1(abs)),
        "sqrt": JSHost("sqrt", _math1(_pymath.sqrt)),
        "sign": JSHost("sign", _math1(
            lambda x: (x > 0) - (x < 0) if not _pymath.isnan(x) else NAN)),
        "min": JSHost("min", lambda i, t, a: float(min(
            (js_to_number(x) for x in a), default=_pymath.inf))),
        "max": JSHost("max", lambda i, t, a: float(max(
            (js_to_number(x) for x in a), default=-_pymath.inf))),
        "pow": JSHost("pow", lambda i, t, a: js_to_number(a[0]) **
                      js_to_number(a[1])),
        "random": JSHost("random", lambda i, t, a: 0.42),  # deterministic
        "PI": float(_pymath.pi),
        "E": float(_pymath.e),
    }))

    # -- Date (deterministic subset) ---------------------------------------
    # Parses epoch-ms numbers, ISO 8601, and sqlite's "YYYY-MM-DD HH:MM:SS"
    # (UTC when no offset). Argless construction / Date.now() return a
    # FIXED instant — jsrt runs in CI, where nondeterminism is a bug, not
    # a feature (same policy as Math.random above).
    _DATE_EPOCH_FIXED = 1767225600000.0  # 2026-01-01T00:00:00Z

    def _date_parse_ms(s):
        import datetime as _dt

        s = s.strip()
        m = _pyre.match(
            r"(\d{4})-(\d{2})-(\d{2})(?:[T ](\d{2}):(\d{2})(?::(\d{2}))?"
            r"(?:\.(\d+))?(Z|[+-]\d{2}:?\d{2})?)?$",
            s,
        )
        if not m:
            return NAN
        tz = _dt.timezone.utc
        off = m.group(8)
        if off and off != "Z":
            sign = 1 if off[0] == "+" else -1
            hh, mm = int(off[1:3]), int(off[-2:])
            tz = _dt.timezone(sign * _dt.timedelta(hours=hh, minutes=mm))
        frac = float("0." + m.group(7)) if m.group(7) else 0.0
        try:
            d = _dt.datetime(
                int(m.group(1)), int(m.group(2)), int(m.group(3)),
                int(m.group(4) or 0), int(m.group(5) or 0),
                int(m.group(6) or 0), int(frac * 1e6), tzinfo=tz,
            )
        except ValueError:
            return NAN
        return d.timestamp() * 1000.0

    _MONTH_ABBR = ("Jan", "Feb", "Mar", "Apr", "May", "Jun",
                   "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

    def _date_obj(ms):
        import datetime as _dt

        # JS clips |ms| > 8.64e15 to an Invalid Date (NaN time value)
        valid = not (isinstance(ms, float) and _pymath.isnan(ms)) \
            and abs(ms) <= 8.64e15
        if not valid:
            ms = NAN
        try:
            d = (_dt.datetime.fromtimestamp(ms / 1000.0, _dt.timezone.utc)
                 if valid else None)
        except (ValueError, OverflowError, OSError):
            valid, ms, d = False, NAN, None

        def fmt_locale(i, t, a):
            if not valid:
                return "Invalid Date"
            # honors the shape the app uses ({month:short, day, 2-digit
            # hour/minute}); good enough for any locale-ish caller
            return (f"{_MONTH_ABBR[d.month - 1]} {d.day}, "
                    f"{d.hour:02d}:{d.minute:02d}")

        def iso(i, t, a):
            if not valid:
                i.throw_type("Invalid time value")
            return d.strftime("%Y-%m-%dT%H:%M:%S.") + \
                f"{d.microsecond // 1000:03d}Z"

        return JSObject({
            "getTime": JSHost("getTime", lambda i, t, a: ms),
            "valueOf": JSHost("valueOf", lambda i, t, a: ms),
            "getFullYear": JSHost(
                "getFullYear",
                lambda i, t, a: float(d.year) if valid else NAN),
            "getMonth": JSHost(
                "getMonth",
                lambda i, t, a: float(d.month - 1) if valid else NAN),
            "getDate": JSHost(
                "getDate", lambda i, t, a: float(d.day) if valid else NAN),
            "getHours": JSHost(
                "getHours", lambda i, t, a: float(d.hour) if valid else NAN),
            "getMinutes": JSHost(
                "getMinutes",
                lambda i, t, a: float(d.minute) if valid else NAN),
            "getSeconds": JSHost(
                "getSeconds",
                lambda i, t, a: float(d.second) if valid else NAN),
            "toLocaleString": JSHost("toLocaleString", fmt_locale),
            "toLocaleDateString": JSHost("toLocaleDateString", fmt_locale),
            "toLocaleTimeString": JSHost(
                "toLocaleTimeString",
                lambda i, t, a: f"{d.hour:02d}:{d.minute:02d}"
                if valid else "Invalid Date"),
            "toISOString": JSHost("toISOString", iso),
        })

    def _date_ctor(i, t, a):
        if t == "__instanceof__":
            return isinstance(a[0], JSObject) and "getTime" in a[0].props \
                and "toISOString" in a[0].props
        if len(a) > 1:
            i.throw_type(
                "new Date(year, month, ...) is outside the jsrt subset "
                "(pass an epoch-ms number or an ISO string)"
            )
        if not a or a[0] is UNDEF:
            return _date_obj(_DATE_EPOCH_FIXED)
        v = a[0]
        if isinstance(v, str):
            return _date_obj(_date_parse_ms(v))
        return _date_obj(js_to_number(v))

    g.declare("Date", JSHost("Date", _date_ctor, props={
        "now": JSHost("now", lambda i, t, a: _DATE_EPOCH_FIXED),
        "parse": JSHost("parse", lambda i, t, a: _date_parse_ms(
            js_to_string(a[0] if a else UNDEF))),
    }))

    # -- numbers -----------------------------------------------------------
    def _parse_int(i, t, a):
        s = js_to_string(a[0] if a else UNDEF).strip()
        radix = int(js_to_number(a[1])) if len(a) > 1 and \
            a[1] is not UNDEF else 10
        if radix == 16 or (radix == 10 and s[:2].lower() == "0x"):
            m = _pyre.match(r"[+-]?(0[xX])?[0-9a-fA-F]+", s)
            return float(int(m.group(0), 16)) if m else NAN
        chars = "0123456789abcdefghijklmnopqrstuvwxyz"[:radix]
        m = _pyre.match(rf"[+-]?[{chars}]+", s, _pyre.I)
        return float(int(m.group(0), radix)) if m else NAN

    host("parseInt", _parse_int)

    def _parse_float(i, t, a):
        s = js_to_string(a[0] if a else UNDEF).strip()
        m = _pyre.match(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", s)
        return float(m.group(0)) if m else NAN

    host("parseFloat", _parse_float)
    host("isNaN", lambda i, t, a: _pymath.isnan(
        js_to_number(a[0] if a else UNDEF)))
    host("isFinite", lambda i, t, a: _pymath.isfinite(
        js_to_number(a[0] if a else UNDEF)))
    g.declare("NaN", NAN)
    g.declare("Infinity", _pymath.inf)

    def _string_ctor(i, t, a):
        if t == "__new__":
            i.throw_type("new String() boxing is outside the jsrt subset")
        if t == "__instanceof__":
            return False
        return js_to_string(a[0]) if a else ""

    g.declare("String", JSHost("String", _string_ctor, props={
        "fromCharCode": JSHost("fromCharCode", lambda i, t, a: "".join(
            chr(int(js_to_number(x))) for x in a)),
    }))

    def _number_ctor(i, t, a):
        if t == "__instanceof__":
            return False
        return js_to_number(a[0]) if a else 0.0

    g.declare("Number", JSHost("Number", _number_ctor, props={
        "isInteger": JSHost("isInteger", lambda i, t, a: isinstance(
            a[0] if a else UNDEF, float) and float(a[0]).is_integer()),
        "isNaN": JSHost("isNaN", lambda i, t, a: isinstance(
            a[0] if a else UNDEF, float) and _pymath.isnan(a[0])),
        "parseFloat": JSHost("parseFloat", lambda i, t, a: _parse_float(
            i, t, a)),
        "MAX_SAFE_INTEGER": float(2**53 - 1),
    }))
    g.declare("Boolean", JSHost(
        "Boolean", lambda i, t, a: js_truthy(a[0]) if a else False))

    # -- Object / Array statics -------------------------------------------
    g.declare("Object", JSObject({
        "keys": JSHost("keys", lambda i, t, a: JSArray(
            list(a[0].props.keys()) if isinstance(a[0], JSObject) else [])),
        "values": JSHost("values", lambda i, t, a: JSArray(
            list(a[0].props.values()) if isinstance(a[0], JSObject)
            else [])),
        "entries": JSHost("entries", lambda i, t, a: JSArray([
            JSArray([k, v]) for k, v in a[0].props.items()
        ] if isinstance(a[0], JSObject) else [])),
        "assign": JSHost("assign", lambda i, t, a: _object_assign(a)),
        "freeze": JSHost("freeze", lambda i, t, a: a[0] if a else UNDEF),
    }))

    def _object_assign(a):
        target = a[0]
        for src in a[1:]:
            if isinstance(src, JSObject):
                target.props.update(src.props)
        return target

    def _array_ctor(i, t, a):
        if t == "__instanceof__":
            return isinstance(a[0], JSArray)
        if len(a) == 1 and isinstance(a[0], float):
            return JSArray([UNDEF] * int(a[0]))
        return JSArray(list(a))

    def _array_from(i, t, a):
        items = i._iterate(a[0]) if a else []
        if len(a) > 1 and a[1] is not UNDEF:
            items = [
                i.call_any(a[1], UNDEF, [v, float(j)])
                for j, v in enumerate(items)
            ]
        return JSArray(items)

    g.declare("Array", JSHost("Array", _array_ctor, props={
        "isArray": JSHost("isArray", lambda i, t, a:
                          isinstance(a[0] if a else UNDEF, JSArray)),
        "from": JSHost("from", _array_from),
        "of": JSHost("of", lambda i, t, a: JSArray(list(a))),
    }))

    # -- collections -------------------------------------------------------
    def _set_ctor(i, t, a):
        if t == "__instanceof__":
            return isinstance(a[0], JSSet)
        items = i._iterate(a[0]) if a and a[0] is not UNDEF and \
            a[0] is not None else []
        return JSSet(items)

    g.declare("Set", JSHost("Set", _set_ctor))
    g.declare("Map", JSHost("Map", lambda i, t, a: JSMap()))

    # -- errors ------------------------------------------------------------
    _ERROR_NAMES = ("Error", "TypeError", "RangeError", "SyntaxError")

    def _error_ctor_factory(error_name):
        def _ctor(i, t, a):
            if t == "__instanceof__":
                if not (isinstance(a[0], JSObject)
                        and "message" in a[0].props):
                    return False
                name = a[0].props.get("name")
                # every builtin error subtype IS an Error (JS hierarchy)
                if error_name == "Error":
                    return name in _ERROR_NAMES
                return name == error_name
            msg = js_to_string(a[0]) if a and a[0] is not UNDEF else ""
            return i.make_error(error_name, msg)
        return _ctor

    for error_name in ("Error", "TypeError", "RangeError", "SyntaxError"):
        g.declare(error_name, JSHost(
            error_name, _error_ctor_factory(error_name)))

    # -- promises ------------------------------------------------------------
    def _promise_ctor(i, t, a):
        if t == "__instanceof__":
            return isinstance(a[0], JSPromise)
        p = JSPromise(i)
        executor = a[0] if a else UNDEF
        resolve = JSHost("resolve", lambda i2, t2, a2: p.resolve(
            a2[0] if a2 else UNDEF))
        reject = JSHost("reject", lambda i2, t2, a2: p.reject(
            a2[0] if a2 else UNDEF))
        try:
            i.call_any(executor, UNDEF, [resolve, reject])
        except JSException as exc:
            p.reject(exc.value)
        return p

    def _rejected(i, v):
        p = JSPromise(i)
        p.reject(v)
        return p

    g.declare("Promise", JSHost("Promise", _promise_ctor, props={
        "resolve": JSHost("resolve", lambda i, t, a:
                          i._resolved(a[0] if a else UNDEF)),
        "reject": JSHost("reject", lambda i, t, a: _rejected(
            i, a[0] if a else UNDEF)),
        "all": JSHost("all", lambda i, t, a: _promise_all(i, a)),
    }))

    def _promise_all(i, a):
        items = i._iterate(a[0]) if a else []
        out = JSPromise(i)
        results = [UNDEF] * len(items)
        remaining = [len(items)]
        if not items:
            out.resolve(JSArray([]))
            return out
        for idx, item in enumerate(items):
            p = item if isinstance(item, JSPromise) else i._resolved(item)

            def on_ok(i2, t2, a2, idx=idx):
                results[idx] = a2[0] if a2 else UNDEF
                remaining[0] -= 1
                if remaining[0] == 0:
                    out.resolve(JSArray(results))

            p.callbacks.append((
                JSHost("", on_ok),
                JSHost("", lambda i2, t2, a2: out.reject(
                    a2[0] if a2 else UNDEF)),
                None,
            ))
            p._drain()
        return out

    # -- timers --------------------------------------------------------------
    def _set_timer(i, t, a, interval):
        fn = a[0] if a else UNDEF
        ms = js_to_number(a[1]) if len(a) > 1 else 0.0
        if _pymath.isnan(ms):
            ms = 0.0
        # browsers clamp tiny intervals; a 0ms interval would respawn at
        # the same due time and spin advance_time forever
        rep = max(ms, 1.0) if interval else None
        tid = i._timer_seq
        i._timer_seq += 1
        i.timers[tid] = (i.time_ms + ms, rep, fn, list(a[2:]))
        return float(tid)

    host("setTimeout", lambda i, t, a: _set_timer(i, t, a, False))
    host("setInterval", lambda i, t, a: _set_timer(i, t, a, True))

    def _clear_timer(i, t, a):
        if a and isinstance(a[0], float):
            i.timers.pop(int(a[0]), None)
        return UNDEF

    host("clearTimeout", _clear_timer)
    host("clearInterval", _clear_timer)

    # -- console -------------------------------------------------------------
    interp.console_lines = []

    def _console(level):
        def fn(i, t, a):
            i.console_lines.append(
                (level, " ".join(js_to_string(x) for x in a)))
            return UNDEF
        return fn

    g.declare("console", JSObject({
        "log": JSHost("log", _console("log")),
        "warn": JSHost("warn", _console("warn")),
        "error": JSHost("error", _console("error")),
        "info": JSHost("info", _console("info")),
        "debug": JSHost("debug", _console("debug")),
    }))
