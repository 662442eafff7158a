"""Tree-walking evaluator for the jsrt ES2020 subset.

Execution model
---------------
Every evaluator method is a Python *generator*: ``await`` propagates as
a yielded ``('await', value)`` effect through ``yield from`` chains up
to the owning async-function driver. Sync entry points drive the
generator and treat any yield as "await outside an async function".
Async JS functions run as scheduler jobs: each yield parks the
generator on the awaited promise; resolution re-queues it. Timers use a
virtual clock (``advance_time``), so tests are deterministic and fast.

JS values map to Python: ``undefined`` → ``UNDEF`` sentinel, ``null`` →
``None``, numbers → ``float``, strings → ``str``, plus JSObject /
JSArray / JSFunction / JSClass / JSRegExp / JSPromise / JSSet wrappers.
Host objects (the DOM stub) subclass ``HostObject`` and expose
``js_get`` / ``js_set`` / ``js_call_method``.
"""

from __future__ import annotations

import json as _pyjson
import math as _pymath
import re as _pyre
from collections import deque

from .parser import parse


class _Undefined:
    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self):
        return "undefined"

    def __bool__(self):
        return False


UNDEF = _Undefined()
NAN = float("nan")


class JSError(Exception):
    """Raised to the *host* when JS evaluation fails uncatchably."""


class JSException(Exception):
    """A thrown JS value in flight."""

    def __init__(self, value):
        super().__init__(repr(value))
        self.value = value


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


class _OptionalShort(Exception):
    """?. hit a nullish base — the whole chain evaluates to undefined."""


# ---------------------------------------------------------------------------
# value wrappers


class JSObject:
    def __init__(self, props=None, class_ref=None):
        self.props = props if props is not None else {}
        self.class_ref = class_ref

    def __repr__(self):
        return f"JSObject({self.props!r})"


class HostObject(JSObject):
    """Base for Python-implemented JS objects (DOM nodes, responses...).

    Subclasses override ``js_get``/``js_set``; unknown names fall back to
    the plain prop dict so scripts can hang expando properties on them.
    """

    def js_get(self, name, interp):
        return self.props.get(name, UNDEF)

    def js_set(self, name, value, interp):
        self.props[name] = value


class JSArray:
    def __init__(self, items=None):
        self.items = items if items is not None else []

    def __repr__(self):
        return f"JSArray({self.items!r})"


class JSFunction:
    def __init__(self, name, params, body, env, is_async, is_arrow,
                 this_val=UNDEF):
        self.name = name or ""
        self.params = params
        self.body = body
        self.env = env
        self.is_async = is_async
        self.is_arrow = is_arrow
        self.this_val = this_val  # captured lexically for arrows

    def __repr__(self):
        return f"<JSFunction {self.name or '(anon)'}>"


class JSHost:
    """A host (Python) function exposed to JS: fn(interp, this, args).

    ``props`` holds statics (``Promise.resolve``, ``Array.isArray``) so a
    host constructor can carry methods like a real JS function object.
    """

    def __init__(self, name, fn, props=None):
        self.name = name
        self.fn = fn
        self.props = props or {}

    def __repr__(self):
        return f"<JSHost {self.name}>"


class JSClass:
    def __init__(self, name, ctor, methods):
        self.name = name or ""
        self.ctor = ctor  # JSFunction | None
        self.methods = methods  # dict name -> JSFunction

    def __repr__(self):
        return f"<JSClass {self.name}>"


class JSRegExp:
    def __init__(self, pattern, flags):
        self.source = pattern
        self.flags = flags
        self.last_index = 0
        py_flags = 0
        if "i" in flags:
            py_flags |= _pyre.I
        if "m" in flags:
            py_flags |= _pyre.M
        if "s" in flags:
            py_flags |= _pyre.S
        self.py = _pyre.compile(_js_regex_to_py(pattern), py_flags)

    def __repr__(self):
        return f"/{self.source}/{self.flags}"


class JSPromise:
    PENDING, FULFILLED, REJECTED = 0, 1, 2

    def __init__(self, interp):
        self.interp = interp
        self.state = self.PENDING
        self.value = UNDEF
        self.callbacks = []  # (on_ok, on_err, next_promise)

    def resolve(self, value):
        if self.state != self.PENDING:
            return
        if isinstance(value, JSPromise):
            value.callbacks.append((
                JSHost("", lambda i, t, a: self.resolve(a[0] if a else UNDEF)),
                JSHost("", lambda i, t, a: self.reject(a[0] if a else UNDEF)),
                None,
            ))
            value._drain()
            return
        self.state = self.FULFILLED
        self.value = value
        self._drain()

    def reject(self, value):
        if self.state != self.PENDING:
            return
        self.state = self.REJECTED
        self.value = value
        self._drain()

    def _drain(self):
        if self.state == self.PENDING:
            return
        cbs, self.callbacks = self.callbacks, []
        for on_ok, on_err, nxt in cbs:
            self.interp.microtasks.append(
                (self, on_ok if self.state == self.FULFILLED else on_err,
                 self.value, nxt)
            )

    def __repr__(self):
        return f"<JSPromise {('pending', 'ok', 'err')[self.state]}>"


class JSSet:
    def __init__(self, items=()):
        # tag -> ORIGINAL value: the tagged key gives SameValueZero
        # semantics, but iteration (for-of, spread, forEach) must yield
        # the original values, not ('n', 1.0)-style tag tuples.
        # Re-adding an existing member is a no-op on the stored value;
        # the only pair SameValueZero collapses with distinct values is
        # +0/-0, which Set.prototype.add stores as +0 (_canon_zero).
        self.d = {}
        for v in items:
            self.d.setdefault(_hashable(v), _canon_zero(v))

    def __repr__(self):
        return f"JSSet({list(self.d.values())!r})"


class JSMap:
    def __init__(self):
        self.d = {}


def _canon_zero(v):
    # JS Set.prototype.add / Map.prototype.set normalize -0 to +0
    # before storing ("If value is -0F, set value to +0F") — observable
    # via iteration: 1/[...new Set([-0])][0] is +Infinity in JS.
    return 0.0 if isinstance(v, float) and v == 0.0 else v


def _hashable(v):
    # SameValueZero-ish key: tag by type so true !== 1 as a Set/Map key
    # (Python hashes True == 1.0 together), and canonicalize NaN so it
    # dedupes (float("nan") != float("nan") as dict keys)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if _pymath.isnan(v):
            return ("n", "nan")
        return ("n", v)
    if isinstance(v, str) or v is None or v is UNDEF:
        return v
    return id(v)


# ---------------------------------------------------------------------------
# conversions


def js_truthy(v) -> bool:
    if v is UNDEF or v is None or v is False:
        return False
    if v is True:
        return True
    if isinstance(v, float):
        return not (v == 0 or _pymath.isnan(v))
    if isinstance(v, str):
        return len(v) > 0
    return True


def js_num_to_str(f: float) -> str:
    if _pymath.isnan(f):
        return "NaN"
    if f == _pymath.inf:
        return "Infinity"
    if f == -_pymath.inf:
        return "-Infinity"
    if f == int(f) and abs(f) < 1e21:
        return str(int(f))
    return repr(f)


def js_to_string(v) -> str:
    if isinstance(v, str):
        return v
    if v is UNDEF:
        return "undefined"
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, float):
        return js_num_to_str(v)
    if isinstance(v, JSArray):
        return ",".join(
            "" if x is UNDEF or x is None else js_to_string(x)
            for x in v.items
        )
    if isinstance(v, (JSFunction, JSHost, JSClass)):
        return f"function {getattr(v, 'name', '')}() {{ [jsrt] }}"
    if isinstance(v, JSRegExp):
        return repr(v)
    if isinstance(v, JSObject):
        return "[object Object]"
    return str(v)


def js_to_number(v) -> float:
    if isinstance(v, float):
        return v
    if v is True:
        return 1.0
    if v is False or v is None:
        return 0.0
    if v is UNDEF:
        return NAN
    if isinstance(v, str):
        s = v.strip()
        if not s:
            return 0.0
        try:
            if s.startswith(("0x", "0X")):
                return float(int(s, 16))
            return float(s)
        except ValueError:
            return NAN
    if isinstance(v, JSArray):
        if not v.items:
            return 0.0
        if len(v.items) == 1:
            return js_to_number(v.items[0])
    return NAN


def _to_int32(f: float) -> int:
    if _pymath.isnan(f) or _pymath.isinf(f):
        return 0
    n = int(f) & 0xFFFFFFFF
    return n - 0x100000000 if n >= 0x80000000 else n


def _to_uint32(f: float) -> int:
    if _pymath.isnan(f) or _pymath.isinf(f):
        return 0
    return int(f) & 0xFFFFFFFF


def _js_regex_to_py(pattern: str) -> str:
    """JS and Python regex syntax agree on everything the frontend uses;
    the one systematic difference worth translating is ``\\cX`` (absent)
    and ``$`` semantics (same). Keep literal."""
    return pattern


def _replacement_to_py(tpl: str) -> str:
    """Convert a JS replacement template ($1, $&, $$) to Python (\\1...)."""
    out = []
    i = 0
    while i < len(tpl):
        c = tpl[i]
        if c == "\\":
            out.append("\\\\")
            i += 1
        elif c == "$" and i + 1 < len(tpl):
            n = tpl[i + 1]
            if n == "$":
                out.append("$")
                i += 2
            elif n == "&":
                out.append("\\g<0>")
                i += 2
            elif n.isdigit():
                j = i + 1
                while j < len(tpl) and tpl[j].isdigit():
                    j += 1
                out.append(f"\\g<{tpl[i + 1:j]}>")
                i = j
            else:
                out.append("$")
                i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


# ---------------------------------------------------------------------------
# scopes


class Scope:
    __slots__ = ("vars", "parent", "this_val")

    def __init__(self, parent=None, this_val=None):
        self.vars = {}
        self.parent = parent
        # this_val None means "inherit from parent"
        self.this_val = this_val

    def lookup(self, name):
        s = self
        while s is not None:
            if name in s.vars:
                return s.vars[name]
            s = s.parent
        raise KeyError(name)

    def assign(self, name, value):
        s = self
        while s is not None:
            if name in s.vars:
                s.vars[name] = value
                return
            s = s.parent
        raise KeyError(name)

    def declare(self, name, value):
        self.vars[name] = value

    def get_this(self):
        s = self
        while s is not None:
            if s.this_val is not None:
                return s.this_val
            s = s.parent
        return UNDEF


def _run_sync(gen):
    """Drive an evaluator generator that must not await.

    A generator-returned ``None`` IS JS ``null`` — every value-producing
    evaluator path returns explicitly (``UNDEF`` for undefined), so the
    bare-return ambiguity never reaches a consumer.
    """
    try:
        effect = next(gen)
    except StopIteration as stop:
        return stop.value
    raise JSError(f"await used outside an async function: {effect!r}")


# ---------------------------------------------------------------------------
# the interpreter


class Interpreter:
    def __init__(self):
        self.globals = Scope()
        self.globals.this_val = UNDEF
        self.microtasks = deque()
        self.timers = {}  # id -> (due_ms, interval_ms|None, fn, args)
        self._timer_seq = 1
        self.time_ms = 0.0
        self.unhandled = []  # (promise, value) rejections nobody caught
        from . import builtins as _b
        self._b = _b  # cached: avoids per-access import (and shutdown noise)
        _b.install(self)

    # ---- public API ------------------------------------------------------

    def run(self, src: str, name: str = "<js>"):
        """Execute a script in the global scope (synchronously)."""
        prog = parse(src, name)
        return _run_sync(self.exec_block(prog, self.globals))

    def call_any(self, fn, this=UNDEF, args=()):
        """Host-side call: sync fns run now; async fns return a promise."""
        if isinstance(fn, (JSFunction, JSHost, JSClass)):
            return _run_sync(self.call_function(fn, this, list(args)))
        raise JSError(f"not callable: {fn!r}")

    def run_jobs(self, max_jobs: int = 100_000):
        """Pump the microtask queue to quiescence."""
        n = 0
        while self.microtasks:
            entry = self.microtasks.popleft()
            n += 1
            if n > max_jobs:
                raise JSError("microtask queue did not quiesce (loop?)")
            self._run_job(entry)
        return n

    def advance_time(self, ms: float):
        """Advance the virtual clock, firing due timers + microtasks."""
        self.run_jobs()
        target = self.time_ms + ms
        while True:
            due = [
                (t[0], tid) for tid, t in self.timers.items()
                if t[0] <= target
            ]
            if not due:
                break
            due.sort()
            _, tid = due[0]
            due_ms, interval, fn, args = self.timers[tid]
            self.time_ms = max(self.time_ms, due_ms)
            if interval is None:
                del self.timers[tid]
            else:
                self.timers[tid] = (due_ms + interval, interval, fn, args)
            self.call_any(fn, UNDEF, args)
            self.run_jobs()
        self.time_ms = target
        self.run_jobs()

    def _run_job(self, entry):
        src_promise, cb, value, nxt = entry
        if cb is None:
            # no handler at this link: propagate along the chain
            if nxt is not None:
                if src_promise.state == JSPromise.REJECTED:
                    nxt.reject(value)
                else:
                    nxt.resolve(value)
            elif src_promise.state == JSPromise.REJECTED:
                self.unhandled.append((src_promise, value))
            return
        if isinstance(cb, JSHost) and cb.name == "":
            cb.fn(self, UNDEF, [value])  # internal plumbing callback
            return
        try:
            result = self.call_any(cb, UNDEF, [value])
        except JSException as exc:
            if nxt is not None:
                nxt.reject(exc.value)
            else:
                self.unhandled.append((src_promise, exc.value))
            return
        if nxt is not None:
            nxt.resolve(result)

    # ---- function calls ----------------------------------------------------

    def call_function(self, fn, this, args):
        """Generator: call fn; yields propagate awaits from sync bodies
        (which is an error caught at the driver) — async fns return a
        JSPromise immediately and run as scheduler jobs."""
        if isinstance(fn, JSHost):
            return fn.fn(self, this, args)
        if isinstance(fn, JSClass):
            raise JSException(self.make_error(
                "TypeError", f"class {fn.name} requires 'new'"))
        if not isinstance(fn, JSFunction):
            raise JSException(self.make_error(
                "TypeError", f"{js_to_string(fn)} is not a function"))
        env = Scope(fn.env)
        if fn.is_arrow:
            pass  # `this` inherits lexically through the scope chain
        else:
            env.this_val = this if this is not UNDEF else UNDEF
            if env.this_val is UNDEF:
                env.this_val = UNDEF
            env.vars["arguments"] = JSArray(list(args))
        yield from self.bind_params(fn.params, args, env)
        if fn.is_async:
            promise = JSPromise(self)
            gen = self._exec_fn_body(fn, env)
            self._schedule_async(gen, promise)
            return promise
        try:
            yield from self.exec_block(fn.body[1], env) \
                if fn.body[0] == "block" else self.exec_stmt(fn.body, env)
        except _Return as r:
            return r.value
        return UNDEF

    def _exec_fn_body(self, fn, env):
        try:
            if fn.body[0] == "block":
                yield from self.exec_block(fn.body[1], env)
            else:
                yield from self.exec_stmt(fn.body, env)
        except _Return as r:
            return r.value
        return UNDEF

    def _schedule_async(self, gen, promise, send_val=None, throw_exc=None):
        """Step an async function's generator until it awaits or ends."""
        try:
            if throw_exc is not None:
                effect = gen.throw(throw_exc)
            else:
                effect = gen.send(send_val)
        except StopIteration as stop:
            promise.resolve(stop.value)
            return
        except JSException as exc:
            promise.reject(exc.value)
            return
        kind, val = effect
        assert kind == "await", effect
        p = val if isinstance(val, JSPromise) else self._resolved(val)
        p.callbacks.append((
            JSHost("", lambda i, t, a, g=gen, pr=promise:
                   self._schedule_async(g, pr, send_val=a[0] if a else UNDEF)),
            JSHost("", lambda i, t, a, g=gen, pr=promise:
                   self._schedule_async(
                       g, pr,
                       throw_exc=JSException(a[0] if a else UNDEF))),
            None,
        ))
        p._drain()

    def _resolved(self, value):
        p = JSPromise(self)
        p.resolve(value)
        return p

    def bind_params(self, params, args, env):
        i = 0
        for p in params:
            if p[0] == "prest":
                env.declare(p[1], JSArray(list(args[i:])))
                break
            pat, default = p
            val = args[i] if i < len(args) else UNDEF
            if val is UNDEF and default is not None:
                val = yield from self.eval_expr(default, env)
            yield from self.bind_pattern(pat, val, env)
            i += 1

    def bind_pattern(self, pat, value, env):
        kind = pat[0]
        if kind == "pname":
            env.declare(pat[1], value)
        elif kind == "pobj":
            for key, sub, default in pat[1]:
                v = yield from self.get_member_gen(value, key)
                if v is UNDEF and default is not None:
                    v = yield from self.eval_expr(default, env)
                yield from self.bind_pattern(sub, v, env)
        elif kind == "parr":
            items = self._iterate(value)
            for idx, elem in enumerate(pat[1]):
                if elem is None:
                    continue
                sub, default = elem
                v = items[idx] if idx < len(items) else UNDEF
                if v is UNDEF and default is not None:
                    v = yield from self.eval_expr(default, env)
                yield from self.bind_pattern(sub, v, env)
        else:  # pragma: no cover
            raise JSError(f"bad pattern {pat!r}")

    def construct(self, cls, args):
        """Generator: `new cls(...)`."""
        if isinstance(cls, JSHost):
            return cls.fn(self, "__new__", args)
        if isinstance(cls, JSClass):
            obj = JSObject(class_ref=cls)
            if cls.ctor is not None:
                yield from self.call_function(cls.ctor, obj, args)
            return obj
        if isinstance(cls, JSFunction):
            obj = JSObject()
            r = yield from self.call_function(cls, obj, args)
            return r if isinstance(r, JSObject) else obj
        raise JSException(self.make_error(
            "TypeError", f"{js_to_string(cls)} is not a constructor"))

    def make_error(self, name, message):
        return JSObject({"name": name, "message": message,
                         "stack": f"{name}: {message}"})

    def throw_type(self, message):
        raise JSException(self.make_error("TypeError", message))

    # ---- statements ---------------------------------------------------------

    def exec_block(self, stmts, env):
        # hoist function declarations
        for s in stmts:
            if s[0] == "fndecl":
                fn = s[1]
                env.declare(fn[1], JSFunction(
                    fn[1], fn[2], fn[3], env, fn[4], fn[5]))
        last = UNDEF
        for s in stmts:
            if s[0] == "fndecl":
                continue
            last = yield from self.exec_stmt(s, env)
        return last

    def exec_stmt(self, node, env):
        kind = node[0]
        if kind == "expr":
            return (yield from self.eval_expr(node[1], env))
        if kind == "vardecl":
            for pat, init in node[2]:
                val = UNDEF
                if init is not None:
                    val = yield from self.eval_expr(init, env)
                    if isinstance(val, JSFunction) and not val.name and \
                            pat[0] == "pname":
                        val.name = pat[1]
                yield from self.bind_pattern(pat, val, env)
            return UNDEF
        if kind == "block":
            return (yield from self.exec_block(node[1], Scope(env)))
        if kind == "if":
            c = yield from self.eval_expr(node[1], env)
            if js_truthy(c):
                return (yield from self.exec_stmt(node[2], Scope(env)))
            if node[3] is not None:
                return (yield from self.exec_stmt(node[3], Scope(env)))
            return UNDEF
        if kind == "while":
            while True:
                c = yield from self.eval_expr(node[1], env)
                if not js_truthy(c):
                    break
                try:
                    yield from self.exec_stmt(node[2], Scope(env))
                except _Break:
                    break
                except _Continue:
                    continue
            return UNDEF
        if kind == "dowhile":
            while True:
                try:
                    yield from self.exec_stmt(node[1], Scope(env))
                except _Break:
                    break
                except _Continue:
                    pass
                c = yield from self.eval_expr(node[2], env)
                if not js_truthy(c):
                    break
            return UNDEF
        if kind == "for":
            scope = Scope(env)
            if node[1] is not None:
                yield from self.exec_stmt(node[1], scope)
            while True:
                if node[2] is not None:
                    c = yield from self.eval_expr(node[2], scope)
                    if not js_truthy(c):
                        break
                try:
                    yield from self.exec_stmt(node[4], Scope(scope))
                except _Break:
                    break
                except _Continue:
                    pass
                if node[3] is not None:
                    yield from self.eval_expr(node[3], scope)
            return UNDEF
        if kind == "forof":
            it = yield from self.eval_expr(node[3], env)
            for item in self._iterate(it):
                scope = Scope(env)
                yield from self.bind_pattern(node[2], item, scope)
                try:
                    yield from self.exec_stmt(node[4], scope)
                except _Break:
                    break
                except _Continue:
                    continue
            return UNDEF
        if kind == "forin":
            obj = yield from self.eval_expr(node[3], env)
            keys = self._enum_keys(obj)
            for k in keys:
                scope = Scope(env)
                yield from self.bind_pattern(node[2], k, scope)
                try:
                    yield from self.exec_stmt(node[4], scope)
                except _Break:
                    break
                except _Continue:
                    continue
            return UNDEF
        if kind == "return":
            v = UNDEF
            if node[1] is not None:
                v = yield from self.eval_expr(node[1], env)
            raise _Return(v)
        if kind == "break":
            raise _Break()
        if kind == "continue":
            raise _Continue()
        if kind == "throw":
            v = yield from self.eval_expr(node[1], env)
            raise JSException(v)
        if kind == "try":
            # Python's try/except/finally maps exactly: the finally block
            # also runs on _Return/_Break/_Continue unwinds, like JS.
            try:
                try:
                    yield from self.exec_stmt(node[1], Scope(env))
                except JSException as exc:
                    if node[3] is None:
                        raise
                    scope = Scope(env)
                    if node[2] is not None:
                        yield from self.bind_pattern(
                            node[2], exc.value, scope)
                    yield from self.exec_stmt(node[3], scope)
            finally:
                if node[4] is not None:
                    yield from self.exec_stmt(node[4], Scope(env))
            return UNDEF
        if kind == "classdecl":
            cls = self._make_class(node[1], env)
            env.declare(cls.name, cls)
            return UNDEF
        if kind == "empty":
            return UNDEF
        if kind == "fndecl":  # already hoisted
            return UNDEF
        raise JSError(f"unknown statement {kind!r}")  # pragma: no cover

    def _make_class(self, node, env):
        _, name, methods, _line = node
        ctor = None
        mdict = {}
        for mname, fnnode in methods:
            f = JSFunction(mname, fnnode[2], fnnode[3], env, fnnode[4],
                           fnnode[5])
            if mname == "constructor":
                ctor = f
            else:
                mdict[mname] = f
        return JSClass(name, ctor, mdict)

    # ---- expressions ---------------------------------------------------------

    def eval_expr(self, node, env):
        kind = node[0]
        if kind == "num":
            return node[1]
        if kind == "str":
            return node[1]
        if kind == "bool":
            return node[1]
        if kind == "null":
            return None
        if kind == "undef":
            return UNDEF
        if kind == "name":
            try:
                return env.lookup(node[1])
            except KeyError:
                raise JSException(self.make_error(
                    "ReferenceError", f"{node[1]} is not defined"))
        if kind == "this":
            return env.get_this()
        if kind == "tpl":
            quasis, exprs = node[1], node[2]
            parts = [quasis[0]]
            for i, e in enumerate(exprs):
                v = yield from self.eval_expr(e, env)
                parts.append(js_to_string(v))
                parts.append(quasis[i + 1])
            return "".join(parts)
        if kind == "regex":
            return JSRegExp(node[1], node[2])
        if kind == "arr":
            items = []
            for e in node[1]:
                if e[0] == "spread":
                    v = yield from self.eval_expr(e[1], env)
                    items.extend(self._iterate(v))
                else:
                    items.append((yield from self.eval_expr(e, env)))
            return JSArray(items)
        if kind == "obj":
            obj = JSObject()
            for p in node[1]:
                if p[0] == "spread":
                    v = yield from self.eval_expr(p[1], env)
                    if isinstance(v, JSObject):
                        obj.props.update(v.props)
                elif p[0] == "computed":
                    k = yield from self.eval_expr(p[1], env)
                    v = yield from self.eval_expr(p[2], env)
                    obj.props[js_to_string(k)] = v
                else:
                    v = yield from self.eval_expr(p[2], env)
                    obj.props[p[1]] = v
            return obj
        if kind == "fn":
            return JSFunction(node[1], node[2], node[3], env, node[4],
                              node[5])
        if kind == "class":
            return self._make_class(node, env)
        if kind == "seq":
            v = UNDEF
            for e in node[1]:
                v = yield from self.eval_expr(e, env)
            return v
        if kind == "cond":
            c = yield from self.eval_expr(node[1], env)
            branch = node[2] if js_truthy(c) else node[3]
            return (yield from self.eval_expr(branch, env))
        if kind == "logic":
            op = node[1]
            left = yield from self.eval_expr(node[2], env)
            if op == "&&":
                if not js_truthy(left):
                    return left
            elif op == "||":
                if js_truthy(left):
                    return left
            else:  # ??
                if left is not None and left is not UNDEF:
                    return left
            return (yield from self.eval_expr(node[3], env))
        if kind == "binop":
            left = yield from self.eval_expr(node[2], env)
            right = yield from self.eval_expr(node[3], env)
            return self.binop(node[1], left, right)
        if kind == "unary":
            return (yield from self.eval_unary(node, env))
        if kind == "update":
            return (yield from self.eval_update(node, env))
        if kind == "assign":
            return (yield from self.eval_assign(node, env))
        if kind == "await":
            v = yield from self.eval_expr(node[1], env)
            result = yield ("await", v)
            return result
        if kind == "chain":
            try:
                return (yield from self.eval_expr(node[1], env))
            except _OptionalShort:
                return UNDEF
        if kind == "member":
            base = yield from self.eval_expr(node[1], env)
            if node[3] and (base is None or base is UNDEF):
                raise _OptionalShort()
            return (yield from self.get_member_gen(base, node[2]))
        if kind == "index":
            base = yield from self.eval_expr(node[1], env)
            if node[3] and (base is None or base is UNDEF):
                raise _OptionalShort()
            idx = yield from self.eval_expr(node[2], env)
            return (yield from self.get_member_gen(base, self._key(idx)))
        if kind == "call":
            return (yield from self.eval_call(node, env))
        if kind == "new":
            callee = yield from self.eval_expr(node[1], env)
            args = yield from self.eval_args(node[2], env)
            return (yield from self.construct(callee, args))
        raise JSError(f"unknown expression {kind!r}")  # pragma: no cover

    def _key(self, idx):
        if isinstance(idx, float):
            return js_num_to_str(idx)
        return js_to_string(idx)

    def eval_args(self, arg_nodes, env):
        args = []
        for a in arg_nodes:
            if a[0] == "spread":
                v = yield from self.eval_expr(a[1], env)
                args.extend(self._iterate(v))
            else:
                args.append((yield from self.eval_expr(a, env)))
        return args

    def eval_call(self, node, env):
        _, callee, arg_nodes, optional, line = node
        this = UNDEF
        if callee[0] in ("member", "index"):
            base = yield from self.eval_expr(callee[1], env)
            if callee[3] and (base is None or base is UNDEF):
                raise _OptionalShort()
            if callee[0] == "member":
                name = callee[2]
            else:
                idx = yield from self.eval_expr(callee[2], env)
                name = self._key(idx)
            fn = yield from self.get_member_gen(base, name)
            this = base
        else:
            fn = yield from self.eval_expr(callee, env)
        if optional and (fn is None or fn is UNDEF):
            raise _OptionalShort()
        if fn is UNDEF or fn is None:
            desc = callee[2] if callee[0] == "member" else "expression"
            raise JSException(self.make_error(
                "TypeError", f"{desc} is not a function (line {line})"))
        args = yield from self.eval_args(arg_nodes, env)
        return (yield from self.call_function(fn, this, args))

    def eval_unary(self, node, env):
        op = node[1]
        target = node[2]
        if op == "typeof":
            if target[0] == "name":
                try:
                    v = env.lookup(target[1])
                except KeyError:
                    return "undefined"
            else:
                v = yield from self.eval_expr(target, env)
            return self._typeof(v)
        if op == "delete":
            if target[0] == "member":
                base = yield from self.eval_expr(target[1], env)
                if hasattr(base, "js_delete"):
                    base.js_delete(target[2], self)
                elif isinstance(base, JSObject):
                    base.props.pop(target[2], None)
                return True
            if target[0] == "index":
                base = yield from self.eval_expr(target[1], env)
                idx = yield from self.eval_expr(target[2], env)
                if isinstance(base, JSObject):
                    base.props.pop(self._key(idx), None)
                elif isinstance(base, JSArray):
                    i = int(js_to_number(idx))
                    if 0 <= i < len(base.items):
                        base.items[i] = UNDEF
                return True
            return True
        v = yield from self.eval_expr(target, env)
        if op == "!":
            return not js_truthy(v)
        if op == "-":
            return -js_to_number(v)
        if op == "+":
            return js_to_number(v)
        if op == "~":
            return float(~_to_int32(js_to_number(v)))
        if op == "void":
            return UNDEF
        raise JSError(f"unknown unary {op!r}")  # pragma: no cover

    @staticmethod
    def _typeof(v):
        if v is UNDEF:
            return "undefined"
        if v is None:
            return "object"
        if isinstance(v, bool):
            return "boolean"
        if isinstance(v, float):
            return "number"
        if isinstance(v, str):
            return "string"
        if isinstance(v, (JSFunction, JSHost, JSClass)):
            return "function"
        return "object"

    def eval_update(self, node, env):
        _, op, prefix, target, line = node
        kind = target[0]
        if kind in ("member", "index"):
            # evaluate the REFERENCE once: a side-effecting base or index
            # (arr[i++]--) must not run twice for the read and the write
            base = yield from self.eval_expr(target[1], env)
            key = (
                target[2] if kind == "member"
                else self._key((yield from self.eval_expr(target[2], env)))
            )
            old = js_to_number(self.get_member(base, key))
            new = old + (1.0 if op == "++" else -1.0)
            self.set_member(base, key, new)
            return new if prefix else old
        old = js_to_number((yield from self.eval_expr(target, env)))
        new = old + (1.0 if op == "++" else -1.0)
        yield from self.assign_to(target, new, env)
        return new if prefix else old

    def eval_assign(self, node, env):
        _, op, target, value_node, line = node
        if op == "=":
            value = yield from self.eval_expr(value_node, env)
            if isinstance(value, JSFunction) and not value.name and \
                    target[0] == "name":
                value.name = target[1]
            yield from self.assign_to(target, value, env)
            return value
        if op in ("&&=", "||=", "??="):
            # evaluate the REFERENCE once (see eval_update): a[i++] ||= v
            # must not re-run the base/index for the conditional write
            kind0 = target[0]
            if kind0 in ("member", "index"):
                base = yield from self.eval_expr(target[1], env)
                key = (
                    target[2] if kind0 == "member"
                    else self._key((yield from self.eval_expr(target[2], env)))
                )
                cur = self.get_member(base, key)
            else:
                base = key = None
                cur = yield from self.eval_expr(target, env)
            do = (
                js_truthy(cur) if op == "&&="
                else not js_truthy(cur) if op == "||="
                else cur is None or cur is UNDEF
            )
            if not do:
                return cur
            value = yield from self.eval_expr(value_node, env)
            if kind0 in ("member", "index"):
                self.set_member(base, key, value)
            else:
                yield from self.assign_to(target, value, env)
            return value
        kind = target[0]
        if kind in ("member", "index"):
            # evaluate the REFERENCE once (see eval_update): obj[f()] +=
            # must not call f() for the read and again for the write
            base = yield from self.eval_expr(target[1], env)
            key = (
                target[2] if kind == "member"
                else self._key((yield from self.eval_expr(target[2], env)))
            )
            cur = self.get_member(base, key)
            value = yield from self.eval_expr(value_node, env)
            result = self.binop(op[:-1], cur, value)
            self.set_member(base, key, result)
            return result
        cur = yield from self.eval_expr(target, env)
        value = yield from self.eval_expr(value_node, env)
        result = self.binop(op[:-1], cur, value)
        yield from self.assign_to(target, result, env)
        return result

    def assign_to(self, target, value, env):
        kind = target[0]
        if kind == "name":
            try:
                env.assign(target[1], value)
            except KeyError:
                # implicit global (sloppy); the frontend is strict-mode
                # clean, but the DOM harness pokes globals this way
                self.globals.declare(target[1], value)
            return
        if kind == "member":
            base = yield from self.eval_expr(target[1], env)
            self.set_member(base, target[2], value)
            return
        if kind == "index":
            base = yield from self.eval_expr(target[1], env)
            idx = yield from self.eval_expr(target[2], env)
            if isinstance(base, JSArray):
                i = js_to_number(idx)
                if not _pymath.isnan(i) and i >= 0 and i == int(i):
                    i = int(i)
                    while len(base.items) <= i:
                        base.items.append(UNDEF)
                    base.items[i] = value
                    return
            self.set_member(base, self._key(idx), value)
            return
        if kind == "chain":
            raise JSError("assignment to optional chain")
        raise JSError(f"bad assignment target {kind!r}")

    # ---- operators -------------------------------------------------------

    def binop(self, op, a, b):
        if op == "+":
            if isinstance(a, str) or isinstance(b, str) or \
                    isinstance(a, (JSArray, JSObject)) or \
                    isinstance(b, (JSArray, JSObject)):
                return js_to_string(a) + js_to_string(b)
            return js_to_number(a) + js_to_number(b)
        if op == "-":
            return js_to_number(a) - js_to_number(b)
        if op == "*":
            return js_to_number(a) * js_to_number(b)
        if op == "/":
            x, y = js_to_number(a), js_to_number(b)
            if y == 0:
                if x == 0 or _pymath.isnan(x):
                    return NAN
                return _pymath.inf if (x > 0) == (
                    not str(y).startswith("-")) else -_pymath.inf
            return x / y
        if op == "%":
            x, y = js_to_number(a), js_to_number(b)
            if y == 0 or _pymath.isnan(x) or _pymath.isinf(x):
                return NAN
            return _pymath.fmod(x, y)
        if op == "**":
            return js_to_number(a) ** js_to_number(b)
        if op == "===":
            return self.strict_eq(a, b)
        if op == "!==":
            return not self.strict_eq(a, b)
        if op == "==":
            return self.loose_eq(a, b)
        if op == "!=":
            return not self.loose_eq(a, b)
        if op in ("<", ">", "<=", ">="):
            if isinstance(a, str) and isinstance(b, str):
                return {"<": a < b, ">": a > b,
                        "<=": a <= b, ">=": a >= b}[op]
            x, y = js_to_number(a), js_to_number(b)
            if _pymath.isnan(x) or _pymath.isnan(y):
                return False
            return {"<": x < y, ">": x > y, "<=": x <= y, ">=": x >= y}[op]
        if op == "&":
            return float(_to_int32(js_to_number(a)) &
                         _to_int32(js_to_number(b)))
        if op == "|":
            return float(_to_int32(js_to_number(a)) |
                         _to_int32(js_to_number(b)))
        if op == "^":
            return float(_to_int32(js_to_number(a)) ^
                         _to_int32(js_to_number(b)))
        if op == "<<":
            return float(_to_int32(
                _to_int32(js_to_number(a)) <<
                (_to_uint32(js_to_number(b)) & 31)))
        if op == ">>":
            return float(_to_int32(js_to_number(a)) >>
                         (_to_uint32(js_to_number(b)) & 31))
        if op == ">>>":
            return float(_to_uint32(js_to_number(a)) >>
                         (_to_uint32(js_to_number(b)) & 31))
        if op == "instanceof":
            if isinstance(b, JSClass):
                return isinstance(a, JSObject) and a.class_ref is b
            if isinstance(b, JSHost):
                return bool(b.fn(self, "__instanceof__", [a]))
            return False
        if op == "in":
            key = js_to_string(a)
            if isinstance(b, JSArray):
                i = js_to_number(a)
                return 0 <= i < len(b.items)
            if isinstance(b, JSObject):
                return key in b.props
            return False
        raise JSError(f"unknown binop {op!r}")  # pragma: no cover

    @staticmethod
    def strict_eq(a, b):
        if isinstance(a, bool) or isinstance(b, bool):
            return a is b
        if isinstance(a, float) and isinstance(b, float):
            return a == b
        if isinstance(a, str) and isinstance(b, str):
            return a == b
        if a is None and b is None:
            return True
        if a is UNDEF and b is UNDEF:
            return True
        return a is b

    def loose_eq(self, a, b):
        nullish_a = a is None or a is UNDEF
        nullish_b = b is None or b is UNDEF
        if nullish_a or nullish_b:
            return nullish_a and nullish_b
        if type(a) is type(b) or (isinstance(a, JSObject) and
                                  isinstance(b, JSObject)):
            return self.strict_eq(a, b)
        if isinstance(a, (float, bool)) or isinstance(b, (float, bool)):
            return js_to_number(a) == js_to_number(b)
        return self.strict_eq(a, b)

    # ---- member access ------------------------------------------------------

    def get_member_gen(self, base, name):
        """Generator form so host getters may (in principle) run JS."""
        return self.get_member(base, name)
        yield  # pragma: no cover — makes this a generator

    def get_member(self, base, name):
        _b = self._b
        if base is None or base is UNDEF:
            self.throw_type(
                f"cannot read property {name!r} of {js_to_string(base)}")
        if isinstance(base, HostObject):
            return base.js_get(name, self)
        if isinstance(base, JSObject):
            if name in base.props:
                return base.props[name]
            if base.class_ref is not None and name in base.class_ref.methods:
                return base.class_ref.methods[name]
            return UNDEF
        return _b.primitive_member(self, base, name)

    def set_member(self, base, name, value):
        _b = self._b
        if base is None or base is UNDEF:
            self.throw_type(f"cannot set property {name!r} of "
                            f"{js_to_string(base)}")
        if isinstance(base, HostObject):
            base.js_set(name, value, self)
            return
        if isinstance(base, JSObject):
            base.props[name] = value
            return
        if isinstance(base, JSArray):
            if name == "length":
                n = int(js_to_number(value))
                del base.items[n:]
                while len(base.items) < n:
                    base.items.append(UNDEF)
                return
            try:
                i = int(name)
            except ValueError:
                return  # expando on array: ignored (not used)
            if i < 0:
                # JS would create a "-1" property; the subset ignores it —
                # Python items[-1] would silently clobber the LAST element
                return
            while len(base.items) <= i:
                base.items.append(UNDEF)
            base.items[i] = value
            return
        if isinstance(base, (JSRegExp,)):
            if name == "lastIndex":
                base.last_index = int(js_to_number(value))
                return
        if isinstance(base, JSPromise) or isinstance(base, JSSet):
            return
        # setting props on primitives is a silent no-op in sloppy JS
        return

    # ---- iteration -------------------------------------------------------

    def _iterate(self, v):
        if isinstance(v, JSArray):
            return list(v.items)
        if isinstance(v, str):
            return list(v)
        if isinstance(v, JSSet):
            return list(v.d.values())
        if isinstance(v, HostObject):
            it = v.js_get("__iterate__", self)
            if it is not UNDEF:
                return it
        self.throw_type(f"{js_to_string(v)} is not iterable")

    def _enum_keys(self, v):
        if isinstance(v, JSObject):
            return list(v.props.keys())
        if isinstance(v, JSArray):
            return [str(i) for i in range(len(v.items))]
        return []
