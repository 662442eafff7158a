"""Recursive-descent / Pratt parser for the jsrt ES2020 subset.

Produces tuple ASTs: ``(kind, ...fields)``. Unsupported syntax raises
``ParseError`` with a file:line — the harness must fail loudly when the
frontend starts using a construct the interpreter doesn't model.

Supported: const/let/var (object+array destructuring with defaults),
functions (decl/expr/arrow/async), classes (constructor + methods),
if/else, for(;;), for-of, for-in, while, do-while, try/catch/finally,
throw, template literals, regex literals, spread in calls/arrays/objects,
optional chaining (?. ?.[ ?.( ), nullish coalescing, ternary, sequence,
tagged ASI (semicolons required except before } / EOF / newline).
Deliberately absent (not used by the first-party frontend): generators,
getters/setters, extends/super, labels, switch, with, eval.
"""

from __future__ import annotations

from .lexer import Lexer, Token, tokenize


class ParseError(SyntaxError):
    pass


_ASSIGN_OPS = {"=", "+=", "-=", "*=", "/=", "%=", "**=", "<<=", ">>=",
               ">>>=", "&=", "|=", "^=", "&&=", "||=", "??="}

# binary precedence (higher binds tighter)
_BINOPS = {
    "??": 1, "||": 2, "&&": 3,
    "|": 4, "^": 5, "&": 6,
    "==": 7, "!=": 7, "===": 7, "!==": 7,
    "<": 8, ">": 8, "<=": 8, ">=": 8, "instanceof": 8, "in": 8,
    "<<": 9, ">>": 9, ">>>": 9,
    "+": 10, "-": 10,
    "*": 11, "/": 11, "%": 11,
    "**": 12,
}

_RESERVED_STMT = {"const", "let", "var", "function", "class", "if", "for",
                  "while", "do", "return", "break", "continue", "throw",
                  "try", "async"}


class Parser:
    def __init__(self, toks: list, name: str = "<js>"):
        self.toks = toks
        self.pos = 0
        self.name = name

    # ---- token plumbing --------------------------------------------------

    def peek(self, off: int = 0) -> Token:
        j = min(self.pos + off, len(self.toks) - 1)
        return self.toks[j]

    def next(self) -> Token:
        t = self.toks[self.pos]
        if t.type != "eof":
            self.pos += 1
        return t

    def at(self, type_: str, value=None, off: int = 0) -> bool:
        t = self.peek(off)
        return t.type == type_ and (value is None or t.value == value)

    def eat(self, type_: str, value=None) -> Token | None:
        if self.at(type_, value):
            return self.next()
        return None

    def expect(self, type_: str, value=None) -> Token:
        t = self.next()
        if t.type != type_ or (value is not None and t.value != value):
            want = value if value is not None else type_
            raise ParseError(
                f"{self.name}:{t.line}: expected {want!r}, got "
                f"{t.value!r} ({t.type})"
            )
        return t

    def error(self, msg: str) -> ParseError:
        return ParseError(f"{self.name}:{self.peek().line}: {msg}")

    def semi(self) -> None:
        if self.eat("punct", ";"):
            return
        t = self.peek()
        if t.type == "eof" or (t.type == "punct" and t.value == "}"):
            return
        if t.nl_before:
            return  # ASI
        raise self.error(f"expected ';' before {t.value!r}")

    # ---- program ---------------------------------------------------------

    def program(self) -> list:
        stmts = []
        # directive prologue ("use strict") is a no-op
        while not self.at("eof"):
            stmts.append(self.statement())
        return stmts

    # ---- statements --------------------------------------------------------

    def statement(self):
        t = self.peek()
        if t.type == "punct":
            if t.value == "{":
                return self.block()
            if t.value == ";":
                self.next()
                return ("empty",)
        if t.type == "name":
            v = t.value
            if v in ("const", "let", "var"):
                return self.var_decl()
            if v == "function":
                return ("fndecl", self.function(is_async=False))
            if v == "async" and self.at("name", "function", 1):
                self.next()
                return ("fndecl", self.function(is_async=True))
            if v == "class":
                return ("classdecl", self.class_node())
            if v == "if":
                return self.if_stmt()
            if v == "for":
                return self.for_stmt()
            if v == "while":
                self.next()
                self.expect("punct", "(")
                cond = self.expression()
                self.expect("punct", ")")
                return ("while", cond, self.statement())
            if v == "do":
                self.next()
                body = self.statement()
                self.expect("name", "while")
                self.expect("punct", "(")
                cond = self.expression()
                self.expect("punct", ")")
                self.semi()
                return ("dowhile", body, cond)
            if v == "return":
                self.next()
                nt = self.peek()
                if (nt.type == "punct" and nt.value in (";", "}")) or \
                        nt.type == "eof" or nt.nl_before:
                    self.semi()
                    return ("return", None)
                e = self.expression()
                self.semi()
                return ("return", e)
            if v == "break":
                self.next()
                self.semi()
                return ("break",)
            if v == "continue":
                self.next()
                self.semi()
                return ("continue",)
            if v == "throw":
                self.next()
                e = self.expression()
                self.semi()
                return ("throw", e, t.line)
            if v == "try":
                return self.try_stmt()
            if v in ("switch", "with"):
                raise self.error(f"unsupported statement {v!r} (jsrt subset)")
            # labeled statement: IDENT ':' STMT — detect by lookahead
            # (the old check keyed on the literal identifier "label",
            # which rejected any variable of that name)
            if t.type == "name" and self.at("punct", ":", off=1):
                raise self.error(
                    "unsupported labeled statement (jsrt subset)"
                )
        e = self.expression()
        self.semi()
        return ("expr", e)

    def block(self):
        self.expect("punct", "{")
        stmts = []
        while not self.eat("punct", "}"):
            if self.at("eof"):
                raise self.error("unterminated block")
            stmts.append(self.statement())
        return ("block", stmts)

    def var_decl(self):
        kind = self.next().value
        decls = []
        while True:
            pat = self.binding_pattern()
            init = None
            if self.eat("punct", "="):
                init = self.assignment()
            decls.append((pat, init))
            if not self.eat("punct", ","):
                break
        self.semi()
        return ("vardecl", kind, decls)

    def binding_pattern(self):
        if self.at("punct", "{"):
            return self.object_pattern()
        if self.at("punct", "["):
            return self.array_pattern()
        name = self.expect("name").value
        return ("pname", name, None)

    def object_pattern(self):
        self.expect("punct", "{")
        props = []
        while not self.eat("punct", "}"):
            key = self.expect("name").value
            sub = ("pname", key, None)
            if self.eat("punct", ":"):
                sub = self.binding_pattern()
            default = None
            if self.eat("punct", "="):
                default = self.assignment()
            props.append((key, sub, default))
            if not self.at("punct", "}"):
                self.expect("punct", ",")
        return ("pobj", props)

    def array_pattern(self):
        self.expect("punct", "[")
        elems = []
        while not self.eat("punct", "]"):
            if self.eat("punct", ","):
                elems.append(None)  # hole
                continue
            sub = self.binding_pattern()
            default = None
            if self.eat("punct", "="):
                default = self.assignment()
            elems.append((sub, default))
            if not self.at("punct", "]"):
                self.expect("punct", ",")
        return ("parr", elems)

    def if_stmt(self):
        self.next()
        self.expect("punct", "(")
        cond = self.expression()
        self.expect("punct", ")")
        then = self.statement()
        other = None
        if self.at("name", "else"):
            self.next()
            other = self.statement()
        return ("if", cond, then, other)

    def for_stmt(self):
        self.next()
        self.expect("punct", "(")
        # for (;;) / for (init; test; update) / for (decl of iter)
        init = None
        if self.at("punct", ";"):
            self.next()
        elif self.at("name") and self.peek().value in ("const", "let", "var"):
            kind = self.next().value
            pat = self.binding_pattern()
            nt = self.peek()
            if nt.type == "name" and nt.value in ("of", "in"):
                mode = self.next().value
                it = self.expression()
                self.expect("punct", ")")
                return ("for" + mode, kind, pat, it, self.statement())
            ini = None
            if self.eat("punct", "="):
                ini = self.assignment()
            decls = [(pat, ini)]
            while self.eat("punct", ","):
                p2 = self.binding_pattern()
                i2 = None
                if self.eat("punct", "="):
                    i2 = self.assignment()
                decls.append((p2, i2))
            init = ("vardecl", kind, decls)
            self.expect("punct", ";")
        else:
            e = self.expression()
            nt = self.peek()
            if nt.type == "name" and nt.value in ("of", "in"):
                raise self.error("for-of/in over a bare expression target "
                                 "is outside the jsrt subset")
            init = ("expr", e)
            self.expect("punct", ";")
        test = None
        if not self.at("punct", ";"):
            test = self.expression()
        self.expect("punct", ";")
        update = None
        if not self.at("punct", ")"):
            update = self.expression()
        self.expect("punct", ")")
        return ("for", init, test, update, self.statement())

    def try_stmt(self):
        self.next()
        block = self.block()
        param = None
        handler = None
        final = None
        if self.at("name", "catch"):
            self.next()
            if self.eat("punct", "("):
                param = self.binding_pattern()
                self.expect("punct", ")")
            handler = self.block()
        if self.at("name", "finally"):
            self.next()
            final = self.block()
        if handler is None and final is None:
            raise self.error("try without catch/finally")
        return ("try", block, param, handler, final)

    # ---- functions / classes ----------------------------------------------

    def function(self, is_async: bool):
        line = self.expect("name", "function").line
        name = None
        if self.at("name") and self.peek().value != "(":
            name = self.next().value
        params = self.param_list()
        body = self.block()
        return ("fn", name, params, body, is_async, False, line)

    def param_list(self):
        self.expect("punct", "(")
        params = []
        while not self.eat("punct", ")"):
            if self.eat("punct", "..."):
                params.append(("prest", self.expect("name").value))
            else:
                pat = self.binding_pattern()
                default = None
                if self.eat("punct", "="):
                    default = self.assignment()
                params.append((pat, default))
            if not self.at("punct", ")"):
                self.expect("punct", ",")
        return params

    def class_node(self):
        line = self.expect("name", "class").line
        name = None
        if self.at("name") and not self.at("punct", "{"):
            name = self.next().value
        if self.at("name", "extends"):
            raise self.error("class extends is outside the jsrt subset")
        self.expect("punct", "{")
        methods = []
        while not self.eat("punct", "}"):
            if self.eat("punct", ";"):
                continue
            if self.at("name", "static") or self.at("name", "get") or \
                    self.at("name", "set"):
                nxt = self.peek(1)
                if not (nxt.type == "punct" and nxt.value == "("):
                    raise self.error("static/get/set methods are outside "
                                     "the jsrt subset")
            mline = self.peek().line
            mname = self.next()
            if mname.type not in ("name", "str"):
                raise self.error(f"bad class member {mname.value!r}")
            params = self.param_list()
            body = self.block()
            methods.append(
                (mname.value, ("fn", mname.value, params, body, False,
                               False, mline))
            )
        return ("class", name, methods, line)

    # ---- expressions -------------------------------------------------------

    def expression(self):
        e = self.assignment()
        if self.at("punct", ","):
            exprs = [e]
            while self.eat("punct", ","):
                exprs.append(self.assignment())
            return ("seq", exprs)
        return e

    def assignment(self):
        arrow = self.try_arrow()
        if arrow is not None:
            return arrow
        left = self.conditional()
        t = self.peek()
        if t.type == "punct" and t.value in _ASSIGN_OPS:
            self.next()
            right = self.assignment()
            return ("assign", t.value, left, right, t.line)
        return left

    def try_arrow(self):
        """Detect `x =>`, `(a, b) =>`, `async x =>`, `async (…) =>`."""
        start = self.pos
        is_async = False
        if self.at("name", "async") and not self.peek(1).nl_before and (
                self.at("name", None, 1) or self.at("punct", "(", 1)):
            nxt = self.peek(1)
            if nxt.type == "name" and nxt.value == "function":
                return None
            is_async = True
            off = 1
        else:
            off = 0
        t = self.peek(off)
        if t.type == "name" and t.value not in _RESERVED_STMT and \
                self.at("punct", "=>", off + 1):
            for _ in range(off + 2):
                self.next()
            body = self.arrow_body()
            return ("fn", None, [(("pname", t.value, None), None)], body,
                    is_async, True, t.line)
        if t.type == "punct" and t.value == "(":
            # scan to the matching ) and check for =>
            depth = 0
            j = self.pos + off
            while j < len(self.toks):
                tk = self.toks[j]
                if tk.type == "punct" and tk.value in ("(", "[", "{"):
                    depth += 1
                elif tk.type == "punct" and tk.value in (")", "]", "}"):
                    depth -= 1
                    if depth == 0:
                        break
                elif tk.type == "eof":
                    return None
                j += 1
            if j + 1 < len(self.toks):
                after = self.toks[j + 1]
                if after.type == "punct" and after.value == "=>":
                    for _ in range(off):
                        self.next()
                    params = self.param_list()
                    self.expect("punct", "=>")
                    body = self.arrow_body()
                    return ("fn", None, params, body, is_async, True, t.line)
        self.pos = start
        return None

    def arrow_body(self):
        if self.at("punct", "{"):
            return self.block()
        return ("return", self.assignment())

    def conditional(self):
        cond = self.binary(0)
        if self.eat("punct", "?"):
            a = self.assignment()
            self.expect("punct", ":")
            b = self.assignment()
            return ("cond", cond, a, b)
        return cond

    def binary(self, min_prec: int):
        left = self.unary()
        while True:
            t = self.peek()
            op = None
            if t.type == "punct" and t.value in _BINOPS:
                op = t.value
            elif t.type == "name" and t.value in ("instanceof", "in"):
                op = t.value
            if op is None:
                return left
            prec = _BINOPS[op]
            if prec < min_prec:
                return left
            self.next()
            # ** is right-assoc; everything else left-assoc
            right = self.binary(prec if op == "**" else prec + 1)
            if op in ("&&", "||", "??"):
                left = ("logic", op, left, right)
            else:
                left = ("binop", op, left, right, t.line)

    def unary(self):
        t = self.peek()
        if t.type == "punct" and t.value in ("!", "~", "+", "-"):
            self.next()
            return ("unary", t.value, self.unary())
        if t.type == "punct" and t.value in ("++", "--"):
            self.next()
            return ("update", t.value, True, self.unary(), t.line)
        if t.type == "name" and t.value in ("typeof", "void", "delete"):
            self.next()
            return ("unary", t.value, self.unary())
        if t.type == "name" and t.value == "await":
            self.next()
            return ("await", self.unary(), t.line)
        return self.postfix()

    def postfix(self):
        e = self.call_member()
        t = self.peek()
        if t.type == "punct" and t.value in ("++", "--") and not t.nl_before:
            self.next()
            return ("update", t.value, False, e, t.line)
        return e

    def call_member(self):
        t = self.peek()
        if t.type == "name" and t.value == "new":
            self.next()
            callee = self.member_only(self.primary())
            args = []
            if self.at("punct", "("):
                args = self.call_args()
            e = ("new", callee, args, t.line)
            return self.member_chain(e)
        return self.member_chain(self.primary())

    def member_only(self, e):
        """Member accesses only (no calls) — for `new a.b.C(...)`."""
        while True:
            if self.at("punct", "."):
                self.next()
                name = self.expect("name").value
                e = ("member", e, name, False)
            elif self.at("punct", "["):
                self.next()
                idx = self.expression()
                self.expect("punct", "]")
                e = ("index", e, idx, False)
            else:
                return e

    def member_chain(self, e):
        has_optional = False
        while True:
            t = self.peek()
            if t.type == "punct" and t.value == ".":
                self.next()
                e = ("member", e, self.expect("name").value, False)
            elif t.type == "punct" and t.value == "?.":
                self.next()
                has_optional = True
                if self.at("punct", "("):
                    e = ("call", e, self.call_args(), True, t.line)
                elif self.at("punct", "["):
                    self.next()
                    idx = self.expression()
                    self.expect("punct", "]")
                    e = ("index", e, idx, True)
                else:
                    e = ("member", e, self.expect("name").value, True)
            elif t.type == "punct" and t.value == "[":
                self.next()
                idx = self.expression()
                self.expect("punct", "]")
                e = ("index", e, idx, False)
            elif t.type == "punct" and t.value == "(":
                e = ("call", e, self.call_args(), False, t.line)
            elif t.type == "template":
                raise self.error("tagged templates are outside the jsrt "
                                 "subset")
            else:
                break
        if has_optional:
            return ("chain", e)
        return e

    def call_args(self):
        self.expect("punct", "(")
        args = []
        while not self.eat("punct", ")"):
            if self.eat("punct", "..."):
                args.append(("spread", self.assignment()))
            else:
                args.append(self.assignment())
            if not self.at("punct", ")"):
                self.expect("punct", ",")
        return args

    def primary(self):
        t = self.next()
        if t.type == "num":
            return ("num", t.value)
        if t.type == "str":
            return ("str", t.value)
        if t.type == "regex":
            return ("regex", t.value[0], t.value[1], t.line)
        if t.type == "template":
            exprs = [Parser(toks, self.name).expression() for toks in t.exprs]
            return ("tpl", t.quasis, exprs)
        if t.type == "punct":
            if t.value == "(":
                e = self.expression()
                self.expect("punct", ")")
                return e
            if t.value == "[":
                elems = []
                while not self.at("punct", "]"):
                    if self.eat("punct", "..."):
                        elems.append(("spread", self.assignment()))
                    else:
                        elems.append(self.assignment())
                    if not self.at("punct", "]"):
                        self.expect("punct", ",")
                self.expect("punct", "]")
                return ("arr", elems)
            if t.value == "{":
                return self.object_literal(t.line)
        if t.type == "name":
            v = t.value
            if v == "function":
                self.pos -= 1
                return self.function(is_async=False)
            if v == "async" and self.at("name", "function"):
                return self.function(is_async=True)
            if v == "class":
                self.pos -= 1
                return self.class_node()
            if v == "this":
                return ("this",)
            if v == "true":
                return ("bool", True)
            if v == "false":
                return ("bool", False)
            if v == "null":
                return ("null",)
            if v == "undefined":
                return ("undef",)
            return ("name", v, t.line)
        raise ParseError(
            f"{self.name}:{t.line}: unexpected {t.value!r} ({t.type})"
        )

    def object_literal(self, line):
        props = []
        while not self.eat("punct", "}"):
            if self.eat("punct", "..."):
                props.append(("spread", self.assignment()))
            elif self.at("punct", "["):
                self.next()
                key = self.assignment()
                self.expect("punct", "]")
                self.expect("punct", ":")
                props.append(("computed", key, self.assignment()))
            else:
                kt = self.next()
                if kt.type not in ("name", "str", "num"):
                    raise ParseError(
                        f"{self.name}:{kt.line}: bad object key {kt.value!r}"
                    )
                key = kt.value if kt.type != "num" else _numkey(kt.value)
                if self.at("punct", "("):
                    params = self.param_list()
                    body = self.block()
                    props.append(("kv", key, ("fn", key, params, body,
                                              False, False, kt.line)))
                elif self.eat("punct", ":"):
                    props.append(("kv", key, self.assignment()))
                else:
                    props.append(("kv", key, ("name", key, kt.line)))
            if not self.at("punct", "}"):
                self.expect("punct", ",")
        return ("obj", props)


def _numkey(v: float) -> str:
    return str(int(v)) if float(v).is_integer() else repr(v)


def parse(src: str, name: str = "<js>") -> list:
    return Parser(tokenize(src, name), name).program()
